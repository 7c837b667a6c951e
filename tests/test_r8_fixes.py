"""Round-8 defect fixes, each pinned by the advisor/judge:

* JPEG fill bytes — ITU-T T.81 B.1.1.2 allows any number of 0xFF fill
  bytes before a marker code; the decoder must skip the run, not raise.
* q193/q219 landing-zone determinism — per-file row counts must be a
  pure function of the data (hash-bucketed on event_id), NOT of the
  upstream split layout, so the DuckDB oracle stays valid at any sf /
  maxPartitionBytes / AQE setting.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from data_engineering_examples_spark.operators.media import decode_image
from data_engineering_examples_spark.plans import all_specs
from data_engineering_examples_spark.plans.analytics import (
    Q193_FILES,
    load_tables,
)
from tools.media_encoders import jpeg_encode

SF = "/root/testdata/sf0.001"


def _gradient_rgb(w: int, h: int) -> bytes:
    return bytes(
        c
        for y in range(h)
        for x in range(w)
        for c in ((x * 255) // max(1, w - 1), (y * 255) // max(1, h - 1), 128)
    )


def test_jpeg_fill_bytes_before_markers_are_skipped():
    rgb = _gradient_rgb(16, 16)
    clean = jpeg_encode(rgb, 16, 16)
    base = decode_image(clean)

    # inject runs of 0xFF fill bytes before every marker AFTER SOI
    # (fill is legal between segments, not inside entropy-coded data —
    # segments carry explicit lengths, so marker positions are walkable)
    out = bytearray(clean[:2])
    pos = 2
    while pos + 1 < len(clean):
        assert clean[pos] == 0xFF
        marker = clean[pos + 1]
        out += b"\xff\xff\xff"  # three fill bytes, then the real marker
        if marker == 0xDA:  # SOS: length-prefixed header, then ECS to EOI
            out += clean[pos:]
            break
        seglen = int.from_bytes(clean[pos + 2 : pos + 4], "big")
        out += clean[pos : pos + 2 + seglen]
        pos += 2 + seglen

    padded = decode_image(bytes(out))
    assert (padded.width, padded.height) == (base.width, base.height)
    assert padded.pixels == base.pixels


def test_bucketed_landing_counts_survive_multi_split_scans(spark):
    """The advisor's exact failure mode: force the events scan to read
    as MANY input splits and assert the per-file histogram still equals
    the oracle's bucket-key histogram (round-robin would scatter here)."""
    ev = load_tables(spark, SF, ["events"])["events"]
    truth = sorted(
        r["count"]
        for r in ev.groupBy(F.pmod(F.col("event_id"), F.lit(Q193_FILES)))
        .count()
        .collect()
    )
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
    try:
        rows = all_specs()["q193_small_files_audit"].fn(spark, SF).collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    got = sorted(
        c for r in rows for c in [r.rows_per_file] * r.n_files
    )
    assert got == truth
