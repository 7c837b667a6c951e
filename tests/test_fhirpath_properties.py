"""Property-based tests (hypothesis) for the FHIRPath subset evaluator —
the one piece of custom parsing/eval logic where edge-case crashes would
surface as executor failures mid-job at scale. No Spark session needed:
these exercise the pure-Python core the pandas UDFs wrap."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_examples_spark.functions.fhirpath import (
    eval_fhirpath,
    eval_fhirpath_one,
    parse_path,
)

_name = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True)
_url = st.from_regex(r"http://[a-z]{1,8}\.org/[a-z]{1,8}", fullmatch=True)


@st.composite
def _paths(draw):
    segs = []
    for _ in range(draw(st.integers(1, 4))):
        name = draw(_name)
        if draw(st.booleans()):
            seg = f"extension('{draw(_url)}')"
        else:
            idx = "".join(f"[{i}]" for i in draw(st.lists(st.integers(0, 3), max_size=2)))
            seg = name + idx
        segs.append(seg)
    return ".".join(segs)


_json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-1000, 1000), st.text(max_size=8)
)
_json_docs = st.recursive(
    _json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(_name, children, max_size=3),
    ),
    max_leaves=12,
)


@given(_paths())
@settings(max_examples=200, deadline=None)
def test_parse_path_roundtrips_every_generated_path(path):
    segs = parse_path(path)
    assert len(segs) >= 1
    for name, arg, idxs in segs:
        assert name and isinstance(idxs, tuple)


@given(_paths(), _json_docs)
@settings(max_examples=300, deadline=None)
def test_eval_never_raises_and_one_is_prefix(path, doc):
    js = json.dumps(doc)
    matches = eval_fhirpath(js, path)  # must never raise on any JSON shape
    one = eval_fhirpath_one(js, path)
    if not matches:
        assert one is None
    else:
        # 'one' is the first match, stringified
        first = matches[0]
        if isinstance(first, (dict, list)):
            assert one == json.dumps(first, separators=(",", ":"))
        elif isinstance(first, bool):
            assert one == ("true" if first else "false")
        else:
            assert one == str(first)


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_eval_tolerates_arbitrary_non_json_input(garbage):
    # malformed resource strings must yield no matches, never exceptions
    assert eval_fhirpath(garbage, "Patient.gender") in ([],) or isinstance(
        eval_fhirpath(garbage, "Patient.gender"), list
    )


def test_known_shapes():
    doc = {
        "resourceType": "Patient",
        "extension": [
            {
                "url": "http://x.org/race",
                "extension": [
                    {"url": "ombCategory", "valueCoding": {"code": "C1", "display": "D1"}}
                ],
            }
        ],
        "identifier": [{"value": "G123"}, {"value": "G456"}],
    }
    js = json.dumps(doc)
    assert (
        eval_fhirpath_one(js, "Patient.extension('http://x.org/race')"
                              ".extension('ombCategory').valueCoding.code")
        == "C1"
    )
    assert eval_fhirpath_one(js, "Patient.identifier[0].value") == "G123"
    assert eval_fhirpath_one(js, "Patient.identifier[1].value") == "G456"
    assert eval_fhirpath_one(js, "Observation.identifier[0].value") is None  # type gate
