"""Versioned parquet tables: snapshot writes, as-of reads, vacuum.

The plain-parquet answer to Delta/Iceberg time travel, for stores where
the transactional layer isn't available (the same gap
``sinks/merge_writer.py`` documents for MERGE): every write lands in a
NEW immutable version directory ``v=<n>/`` and publication is a single
``os.replace`` of the ``_LATEST`` pointer file — readers resolve the
pointer first, so they always see a complete snapshot (the previous one
until the instant the pointer swaps, the new one after), never a
half-written directory.  Old versions stay readable for as-of queries
until ``vacuum`` retires them.

Guarantees and honest limits:

* **Atomic publish** — pointer swap via temp-file + ``os.replace``;
  a crash mid-write leaves an orphaned ``v=<n>`` directory (invisible:
  the pointer still names the old version) that the next ``vacuum``
  sweeps.
* **Snapshot isolation for readers** — a reader that resolved version
  n keeps reading n's immutable files even if n+1 publishes mid-query;
  ``vacuum`` retention is the reader lease, exactly like Delta's
  ``delete-after-retention``.
* **Single writer** — concurrent writers would race the pointer
  (last-swap-wins, no lost data but a lost VERSION). Real multi-writer
  arbitration needs a log with optimistic concurrency (Delta/Iceberg);
  this module documents the boundary instead of pretending.

Reference context: the reference re-imports the monthly ODS drop in
place (``dags/ODSImport.py``) — with this layout each drop is a
version, "what did this dimension look like in July" is
``read_version(dir, n)``, and the changeset between two drops is
``operators/merge.changeset`` over two as-of reads (q208).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"
_VDIR = re.compile(r"^v=(\d+)$")


def _versions_on_disk(table_dir: str) -> list[int]:
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        m = _VDIR.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(table_dir: str) -> int | None:
    """The published version per the pointer (None: nothing published).
    Orphaned ``v=<n>`` dirs beyond the pointer are NOT visible."""
    p = os.path.join(table_dir, _POINTER)
    if not os.path.exists(p):
        return None
    return int(open(p).read().strip())


def write_version(df: DataFrame, table_dir: str) -> int:
    """Write ``df`` as the next version and atomically publish it.

    Returns the published version number. The data write happens into
    the (not-yet-referenced) ``v=<n>`` directory first; only the final
    pointer swap makes it visible, so failure at any earlier point
    leaves the table exactly as it was."""
    os.makedirs(table_dir, exist_ok=True)
    current = latest_version(table_dir)
    nxt = (current or 0) + 1
    # skip over orphans from crashed writes — never reuse a dir name
    on_disk = _versions_on_disk(table_dir)
    if on_disk:
        nxt = max(nxt, on_disk[-1] + 1)
    vdir = os.path.join(table_dir, f"v={nxt}")
    df.write.parquet(vdir)
    tmp = os.path.join(table_dir, f".{_POINTER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(nxt))
    os.replace(tmp, os.path.join(table_dir, _POINTER))
    return nxt


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """As-of read (``version=None`` → the published latest)."""
    v = latest_version(table_dir) if version is None else version
    if v is None:
        raise ValueError(f"versioned table {table_dir}: nothing published")
    vdir = os.path.join(table_dir, f"v={v}")
    if not os.path.isdir(vdir):
        raise ValueError(f"versioned table {table_dir}: version {v} not found")
    return spark.read.parquet(vdir)


def vacuum(table_dir: str, keep: int = 2) -> list[int]:
    """Retire old versions, keeping the latest ``keep`` versions at or
    below the pointer; orphaned dirs BEYOND the pointer are always
    swept (a crash orphan below the pointer is indistinguishable from a
    superseded snapshot and simply rides the retention window out).
    Returns the removed version numbers.

    A writer-side operation (same single-writer contract as
    ``write_version``): an orphan past the pointer is indistinguishable
    from a write in progress, so never run vacuum concurrently with a
    write."""
    latest = latest_version(table_dir)
    if latest is None:
        return []
    removed = []
    for v in _versions_on_disk(table_dir):
        published = v <= latest
        retained = published and v > latest - keep
        if retained:
            continue
        shutil.rmtree(os.path.join(table_dir, f"v={v}"), ignore_errors=True)
        removed.append(v)
    return removed
