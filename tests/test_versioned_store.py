"""Versioned parquet table layout (sources/versioned.py): snapshot
publish atomicity, as-of reads, crash-orphan behavior, vacuum retention.
"""

from __future__ import annotations

import os

import pytest

from data_engineering_examples_spark.sources.versioned import (
    latest_version,
    read_version,
    vacuum,
    write_version,
)


def test_publish_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "dim")
    assert latest_version(t) is None
    with pytest.raises(ValueError, match="nothing published"):
        read_version(spark, t)

    v1 = write_version(spark.range(5), t)
    v2 = write_version(spark.range(9), t)
    assert (v1, v2) == (1, 2)
    assert latest_version(t) == 2
    assert read_version(spark, t).count() == 9  # pointer -> latest
    assert read_version(spark, t, 1).count() == 5  # as-of read
    with pytest.raises(ValueError, match="version 7 not found"):
        read_version(spark, t, 7)


def test_crashed_write_is_invisible_and_never_reused(spark, tmp_path):
    t = str(tmp_path / "dim")
    write_version(spark.range(5), t)
    # simulate a crash mid-write: data dir exists, pointer never swapped
    os.makedirs(f"{t}/v=2")
    open(f"{t}/v=2/part-half.parquet", "w").close()
    assert latest_version(t) == 1  # orphan invisible to readers
    assert read_version(spark, t).count() == 5
    # next writer skips the orphaned name instead of colliding with it
    v = write_version(spark.range(3), t)
    assert v == 3
    assert read_version(spark, t).count() == 3
    # vacuum: an orphan BELOW the pointer is indistinguishable from a
    # superseded snapshot and rides the retention window (v2 stays at
    # keep=2); the out-of-window v1 retires
    removed = vacuum(t, keep=2)
    assert removed == [1]
    removed = vacuum(t, keep=1)
    assert removed == [2]
    assert read_version(spark, t).count() == 3


def test_vacuum_retention(spark, tmp_path):
    t = str(tmp_path / "dim")
    for n in (4, 5, 6, 7):
        write_version(spark.range(n), t)
    removed = vacuum(t, keep=2)
    assert removed == [1, 2]
    assert read_version(spark, t, 3).count() == 6  # retained
    assert read_version(spark, t).count() == 7
    with pytest.raises(ValueError, match="version 1 not found"):
        read_version(spark, t, 1)


def test_reader_resolved_snapshot_survives_new_publish(spark, tmp_path):
    t = str(tmp_path / "dim")
    write_version(spark.range(5), t)
    old = read_version(spark, t)  # resolves v1's immutable files
    write_version(spark.range(100), t)
    # the already-resolved reader still sees its snapshot
    assert old.count() == 5
    assert read_version(spark, t).count() == 100
