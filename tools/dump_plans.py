"""Dump ``explain("formatted")`` for named queries to plans/<tag>/.

Usage:
    python tools/dump_plans.py r13/_before q53_rollup_returns q142_variant_ingest
    SPARK_GRAFT_SF_DIR=... python tools/dump_plans.py r13/_after q53_rollup_returns

Writes plans/r13/<query>_before.txt (the suffix comes from the tag after
the slash), capturing the pre-execution physical plan — the artifact the
optimization-round judge checks plan claims against.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_examples_spark.plans import all_specs  # noqa: E402
from data_engineering_examples_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]  # e.g. "r13/_before"
    rel_dir, suffix = tag.rsplit("/", 1)
    names = sys.argv[2:]
    specs = all_specs()
    unknown = [n for n in names if n not in specs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        rel_dir,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
