"""Property-based test (hypothesis) for the versioned table layout —
the pointer/retention algebra must hold for ARBITRARY interleavings of
writes and vacuums, not just the unit-test scripts:

* the pointer always names the last successful write's snapshot,
  bit-for-bit;
* every as-of read of a retained version returns that version's rows
  exactly (immutability under later writes);
* vacuum never removes a version inside the retention window, always
  removes everything published outside it, and never moves the pointer.

A dict model (version -> row count) plays the spec; each generated
program interleaves write/vacuum/read ops against one table dir.
Spark is only needed to materialize tiny range frames; examples are
capped so the suite stays fast.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_examples_spark.sources.versioned import (
    latest_version,
    read_version,
    vacuum,
    write_version,
)

# op: ("write", n_rows) | ("vacuum", keep)
_ops = st.lists(
    st.one_of(
        st.tuples(st.just("write"), st.integers(0, 7)),
        st.tuples(st.just("vacuum"), st.integers(1, 3)),
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(program=_ops)
def test_pointer_retention_and_immutability(spark, program):
    tdir = tempfile.mkdtemp(prefix="versioned_prop_")
    try:
        model: dict[int, int] = {}  # retained published versions -> rows
        published: int | None = None
        for op, arg in program:
            if op == "write":
                v = write_version(spark.range(arg), tdir)
                assert published is None or v == published + 1
                published = v
                model[v] = arg
            else:
                removed = vacuum(tdir, keep=arg)
                if published is not None:
                    expected_gone = sorted(
                        v for v in model if v <= published - arg
                    )
                    assert removed == expected_gone, (removed, model, arg)
                    for v in removed:
                        del model[v]
                else:
                    assert removed == []
            # invariants after every op
            assert latest_version(tdir) == published
            for v, n in model.items():
                got = read_version(spark, tdir, v)
                assert got.count() == n
                assert sorted(r.id for r in got.collect()) == list(range(n))
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
