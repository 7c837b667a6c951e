"""Unit tests for tools/regress.py's bench-subprocess stdout parsing
(r12 verdict ask #4): the isolated re-bench must survive trailing JVM
noise after the bench JSON line, and fail with the captured stdout tail
— never a traceback — when no record is present."""

from __future__ import annotations

import json

import pytest

from tools.regress import parse_bench_stdout

RECORD = json.dumps(
    {"metric": "bench", "value": 3.2, "unit": "sec",
     "queries": {"q01_pricing_summary": 1.1, "q23_ngram_jaccard_pairs": 2.1},
     "sf": 0.1}
)


def test_parses_clean_last_line():
    out = "# warmup\n" + RECORD + "\n"
    assert parse_bench_stdout(out)["q01_pricing_summary"] == 1.1


def test_survives_trailing_jvm_noise():
    """The exact failure shape the verdict named: a successful re-bench
    whose stdout ends in shutdown noise (log4j appender warnings, a
    stray '{' line that is not JSON) must still return the medians."""
    out = (
        RECORD
        + "\nWARN ShutdownHookManager: Shutdown hook called\n"
        + "{not json at all\n"
        + "ERROR Appenders contains an invalid element\n"
    )
    assert parse_bench_stdout(out) == {
        "q01_pricing_summary": 1.1, "q23_ngram_jaccard_pairs": 2.1,
    }


def test_skips_json_lines_without_queries_map():
    out = RECORD + "\n" + json.dumps({"drained": True}) + "\n"
    assert "q23_ngram_jaccard_pairs" in parse_bench_stdout(out)


def test_no_record_raises_systemexit_with_tail():
    with pytest.raises(SystemExit) as exc:
        parse_bench_stdout("only noise\nmore noise\n")
    assert "stdout tail" in str(exc.value)
    assert "more noise" in str(exc.value)
