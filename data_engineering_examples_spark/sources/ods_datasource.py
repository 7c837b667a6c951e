"""Spark 4 Python DataSource for the ODS TRUD ZIP archives (SURVEY §2 S1).

The reference acquires NHS ODS master data as a ZIP of headerless
positional CSVs (HTTP GET + ``zipfile.ZipFile`` + member extract,
``dags/ODSImport.py:77-100``) and then parses fixed positions.  This
module makes the ARCHIVE itself a first-class Spark table via the
Python DataSource API (``pyspark.sql.datasource``, Spark 4):

* ``partitions()`` plans ONE input partition per CSV member, so a
  monthly TRUD drop with many member files (epraccur, epracarc,
  regional splits) ingests in parallel across executors instead of
  through a single driver-side unzip loop.
* ``pushFilters()`` accepts ``EqualTo`` / ``IsNotNull`` /
  ``StringStartsWith`` conjuncts on any column and applies them DURING
  member decode — rows are dropped before they ever cross the
  Python→JVM Arrow boundary, the moral equivalent of parquet predicate
  pushdown for this format.  Everything else is returned to Spark
  unhandled (per the API contract).
* Empty CSV fields are surfaced as NULL, matching what
  ``spark.read.csv`` (and the reference's pandas ``read_csv`` +
  ``isna`` guards) produce, so the downstream ``read_epraccur``
  semantics in ``ods.py`` are unchanged.
* The Python→JVM boundary is ARROW in both directions (optimization
  guide §4.1): readers yield one ``pyarrow.RecordBatch`` per decoded
  member chunk instead of per-row tuples (which the worker would
  pickle row-at-a-time), and the writers subclass the Arrow writer
  bases so incoming data arrives as RecordBatches rather than pickled
  Rows.  Decode/encode semantics are bit-identical — the same
  ``csv`` module does the parsing/formatting; only the transport
  format across the worker boundary changes.

Scope note (same as ``ods.py``): the HTTP fetch stays a driver-side /
upstream concern; the archive path handed to this source must be on
storage all executors can read (object store / shared FS in a real
deployment, local disk under ``local[*]``).
"""

from __future__ import annotations

import csv
import io
import zipfile
from typing import Iterator, List, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    InputPartition,
    IsNotNull,
    StringStartsWith,
)
from pyspark.sql.types import StringType, StructField, StructType

from .ods import EPRACCUR_COLS

FORMAT_NAME = "ods_zip"

#: rows per Arrow RecordBatch yielded by the readers.  One batch per
#: member would hold an entire member in memory at once; real TRUD
#: members are hundreds of thousands of rows, so flush every chunk —
#: large enough for the columnar transport to amortize, small enough
#: to bound per-task memory (guide §4.2 batch-size note).
_ARROW_CHUNK_ROWS = 1 << 16


def _member_batches(zf: zipfile.ZipFile, member_name: str, cols, pushed_ord):
    """Decode one CSV member into Arrow RecordBatches: pad/truncate to
    the positional layout, '' -> NULL (spark.read.csv semantics), pushed
    filters applied during decode.  Columnar transport replaces the
    per-row tuple pickling of the worker boundary; the produced VALUES
    are identical to the old row path."""
    import pyarrow as pa

    n = len(cols)
    data: list[list] = [[] for _ in range(n)]
    n_buf = 0
    with zf.open(member_name) as member:
        text = io.TextIOWrapper(member, encoding="utf-8", newline="")
        for rec in csv.reader(text):
            if not rec:
                continue
            row = tuple(
                (rec[i] if i < len(rec) and rec[i] != "" else None)
                for i in range(n)
            )
            if pushed_ord and not OdsZipReader._row_passes(row, pushed_ord):
                continue
            for i in range(n):
                data[i].append(row[i])
            n_buf += 1
            if n_buf >= _ARROW_CHUNK_ROWS:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(c, type=pa.string()) for c in data], names=list(cols)
                )
                data = [[] for _ in range(n)]
                n_buf = 0
    if n_buf:
        yield pa.RecordBatch.from_arrays(
            [pa.array(c, type=pa.string()) for c in data], names=list(cols)
        )


class OdsZipDataSource(DataSource):
    """``spark.read.format("ods_zip").schema(...).load("<archive.zip>")``.

    Options: ``path`` (the archive), ``member_suffix`` (which members
    are data files, default ``.csv``).  Default schema is the epraccur
    positional layout; pass an explicit schema for other ODS files.
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return StructType([StructField(c, StringType()) for c in EPRACCUR_COLS])

    def reader(self, schema: StructType) -> "OdsZipReader":
        # pushFilters is opt-in (option("pushdown", "true")): merely
        # IMPLEMENTING it trips Spark's [DATA_SOURCE_PUSHDOWN_DISABLED]
        # assertion when spark.sql.python.filterPushdown.enabled is
        # false, so a plain session must get the plain reader.
        if self.options.get("pushdown", "false").lower() == "true":
            return OdsZipPushdownReader(schema, dict(self.options))
        return OdsZipReader(schema, dict(self.options))

    def streamReader(self, schema: StructType) -> "OdsZipStreamReader":
        return OdsZipStreamReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> "OdsZipWriter":
        return OdsZipWriter(schema, dict(self.options), overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> "OdsZipStreamWriter":
        return OdsZipStreamWriter(schema, dict(self.options), overwrite)


class OdsZipReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("ods_zip: a zip archive path is required")
        self.path = path
        self.member_suffix = options.get("member_suffix", ".csv")
        self.cols: List[str] = [f.name for f in schema.fields]
        self.pushed: List[Filter] = []

    def _pushed_ordinals(self) -> List[Tuple[int, Filter]]:
        """Resolve each pushed filter's column ordinal ONCE per read —
        the decode loop below runs per row, and a per-row list scan per
        filter would put O(n_cols) work in the hot path of a source
        whose whole point is scan-side efficiency."""
        return [(self.cols.index(f.attribute[0]), f) for f in self.pushed]

    @staticmethod
    def _row_passes(row: Sequence, pushed_ord: Sequence[Tuple[int, Filter]]) -> bool:
        for idx, f in pushed_ord:
            v = row[idx]
            if isinstance(f, IsNotNull):
                if v is None:
                    return False
            elif isinstance(f, EqualTo):
                if v != f.value:
                    return False
            elif isinstance(f, StringStartsWith):
                if v is None or not v.startswith(f.value):
                    return False
        return True

    # -- partition planning -------------------------------------------------
    def partitions(self) -> List[InputPartition]:
        with zipfile.ZipFile(self.path) as z:
            members = [
                n for n in sorted(z.namelist()) if n.endswith(self.member_suffix)
            ]
        if not members:
            raise ValueError(
                f"ods_zip: no '*{self.member_suffix}' members in {self.path}"
            )
        return [InputPartition(m) for m in members]

    # -- per-partition decode (runs on executors) ---------------------------
    def read(self, partition: InputPartition) -> Iterator:
        pushed_ord = self._pushed_ordinals()
        with zipfile.ZipFile(self.path) as z:
            yield from _member_batches(z, partition.value, self.cols, pushed_ord)


class OdsZipPushdownReader(OdsZipReader):
    """The pushdown-capable variant (requires
    ``spark.sql.python.filterPushdown.enabled=true``): accepted
    conjuncts are applied during member decode, dropping rows before
    they cross the Python→JVM Arrow boundary."""

    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, (EqualTo, IsNotNull, StringStartsWith)) and (
                len(f.attribute) == 1 and f.attribute[0] in self.cols
            ):
                self.pushed.append(f)  # applied in read(); Spark may skip re-check
            else:
                yield f  # unsupported — Spark evaluates it post-scan


def register(spark) -> None:
    """Idempotently register the format with a live session."""
    spark.dataSource.register(OdsZipDataSource)


# ---------------------------------------------------------------------------
# Streaming form: a ZIP-archive FEED (the monthly TRUD drop cadence) as
# a checkpointable Structured Streaming source.  The offset is simply
# {"processed": <n archives>} over the name-sorted archive list — new
# drops append to the order, so an offset prefix is stable across
# restarts; partitions(start, end) plans one InputPartition per
# (archive, member) so each micro-batch decodes its drop's members in
# parallel.  commit() is a no-op (offsets fully describe progress);
# Spark's checkpoint persists them.

class OdsZipStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        feed = options.get("path")
        if not feed:
            raise ValueError("ods_zip stream: a feed directory is required")
        self.feed = feed
        self.member_suffix = options.get("member_suffix", ".csv")
        self.cols: List[str] = [f.name for f in schema.fields]

    def _archives(self) -> List[str]:
        import os

        return sorted(
            f for f in os.listdir(self.feed) if f.endswith(".zip")
        )

    def initialOffset(self) -> dict:
        return {"processed": 0}

    def latestOffset(self) -> dict:
        return {"processed": len(self._archives())}

    def partitions(self, start: dict, end: dict) -> List[InputPartition]:
        import os

        parts: List[InputPartition] = []
        for name in self._archives()[start["processed"] : end["processed"]]:
            path = os.path.join(self.feed, name)
            with zipfile.ZipFile(path) as z:
                for m in sorted(z.namelist()):
                    if m.endswith(self.member_suffix):
                        parts.append(InputPartition((path, m)))
        return parts

    def read(self, partition: InputPartition) -> Iterator:
        path, member_name = partition.value
        with zipfile.ZipFile(path) as z:
            yield from _member_batches(z, member_name, self.cols, [])

    def commit(self, end: dict) -> None:
        pass  # offsets are self-describing; the checkpoint owns them

    def stop(self) -> None:
        pass


# ---------------------------------------------------------------------------
# Writer: the outbound half of the archive round-trip, with the API's
# TWO-PHASE COMMIT contract.  Each task serializes its partition to a
# staged positional-CSV part file and returns a WriterCommitMessage;
# only the driver-side commit() — which runs iff every task succeeded —
# assembles the parts into the final ZIP and os.replace()s it into
# place, so readers never observe a partial archive.  abort() discards
# the staging directory.  One part file per input partition keeps the
# archive's member structure parallel-readable by OdsZipReader, closing
# the round trip.  NULL fields serialize as '' (the inverse of the
# reader's '' -> NULL mapping).

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    n_rows: int


def _write_part_csv(staging: str, cols, iterator) -> _PartFile:
    """Serialize this task's Arrow batches to one staged positional-CSV
    part file (NULL -> '' — the inverse of the readers' '' -> NULL).
    Column-wise ``to_pylist`` + ``zip`` keeps the per-row Python work to
    the csv.writer call itself; the bytes written are identical to the
    old Row path."""
    import os
    import uuid

    os.makedirs(staging, exist_ok=True)
    part = os.path.join(staging, f"part-{uuid.uuid4().hex}.csv")
    n = 0
    with open(part, "w", encoding="utf-8", newline="") as fh:
        w = csv.writer(fh)
        for batch in iterator:
            columns = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
            for row in zip(*columns):
                w.writerow(["" if v is None else v for v in row])
            n += batch.num_rows
    return _PartFile(path=part, n_rows=n)


class OdsZipWriter(DataSourceArrowWriter):
    """Two-phase archive writer.

    SHARED-FILESYSTEM REQUIREMENT: ``write()`` stages part files on
    whatever filesystem the executors see at ``path + '.staging-<job>'``
    and ``commit()`` reads them back on the DRIVER — so driver and
    executors must share that filesystem (local[*], NFS, a mounted
    object store). On a cluster with executor-local disks this writer
    needs a shared staging location instead; the READER has the same
    scope note at the module level.

    The staging directory carries a per-job UUID so two concurrent jobs
    targeting the same archive — or a retry racing an aborted run —
    stage disjoint file sets and cannot interleave part files; the
    archive itself is still last-publish-wins via the atomic rename."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        import uuid as _uuid

        if not overwrite:
            raise ValueError(
                "ods_zip: only mode('overwrite') is supported — archives "
                "are immutable drops, not append targets"
            )
        path = options.get("path")
        if not path:
            raise ValueError("ods_zip: a target archive path is required")
        self.path = path
        # the writer instance is pickled to executors, so every task of
        # THIS job shares the UUID while a concurrent job gets its own
        self.staging = f"{path}.staging-{_uuid.uuid4().hex}"
        self.cols = [f.name for f in schema.fields]

    def write(self, iterator) -> _PartFile:  # executes on executors
        return _write_part_csv(self.staging, self.cols, iterator)

    def commit(self, messages) -> None:  # driver, all tasks succeeded
        import os
        import shutil

        tmp = self.path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for i, m in enumerate(sorted(messages, key=lambda m: m.path)):
                if m.n_rows:
                    z.write(m.path, arcname=f"member_{i:05d}.csv")
        os.replace(tmp, self.path)  # atomic publish
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages) -> None:  # driver, some task failed
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming form of the writer: each micro-batch publishes ONE archive
# drop into a feed directory — exactly the layout OdsZipStreamReader
# consumes (drop_<batch>.zip per drop, one CSV member per task), so a
# streaming pipeline can round-trip archives end to end.  Tasks stage
# part CSVs under a per-query staging dir; commit(batchId) assembles
# them into `.tmp` and os.replace()s the final `drop_<batchId>.zip`
# into the feed — readers never observe a partial drop, a crashed batch
# leaves only staging garbage for abort()/the next query to clear, and
# batch replay (at-least-once restart) republishes the SAME archive
# name, making the commit idempotent at the feed level.  Same
# shared-filesystem scope note as OdsZipWriter.  Staging dirs are
# per-query UUIDs, so a CRASHED query's leftovers are invisible to any
# later instance's own abort(); commit()/abort() therefore finish by
# sweeping every remaining `.staging-*` dir.  The sweep CANNOT live in
# __init__: Spark re-instantiates the writer (fresh __init__) for each
# driver-side commit — between the executors staging parts and the
# commit zipping them — so an __init__ sweep would eat the live batch.
# At commit/abort time the current batch's dirs are already cleared
# via the messages' own paths, batches are serial within a query, and
# the feed has a single-active-query contract, so anything still
# matching `.staging-*` is a dead query's garbage.


class OdsZipStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        import uuid as _uuid

        path = options.get("path")
        if not path:
            raise ValueError("ods_zip streaming write: a feed directory is required")
        self.path = path.rstrip("/")
        self.staging = f"{self.path}/.staging-{_uuid.uuid4().hex}"
        self.cols = [f.name for f in schema.fields]

    def write(self, iterator) -> _PartFile:  # executors
        return _write_part_csv(self.staging, self.cols, iterator)

    def _parts(self, messages) -> List[_PartFile]:
        return sorted(
            (m for m in messages if m is not None and m.n_rows),
            key=lambda m: m.path,
        )

    def _clear_staged(self, messages) -> None:
        # NB: Spark may construct a fresh StreamWriter instance for the
        # driver-side commit/abort, so self.staging can differ from the
        # dir the executors wrote into — derive cleanup targets from the
        # messages' own paths.
        import os

        dirs = set()
        for m in messages:
            if m is not None:
                dirs.add(os.path.dirname(m.path))
                try:
                    os.remove(m.path)
                except OSError:
                    pass
        for d in dirs:
            try:
                os.rmdir(d)  # next batch's write() re-creates its dir
            except OSError:
                pass
        # crash-garbage sweep (see class comment): any `.staging-*` dir
        # still present after the live batch's cleanup belongs to a dead
        # query — serial batches + single-active-query feed contract
        import glob
        import shutil

        for stale in glob.glob(f"{self.path}/.staging-*"):
            shutil.rmtree(stale, ignore_errors=True)

    def commit(self, messages, batchId: int) -> None:  # driver
        import os

        parts = self._parts(messages)
        if parts:
            os.makedirs(self.path, exist_ok=True)
            tmp = f"{self.path}/.drop-{batchId}.zip.tmp"
            with zipfile.ZipFile(tmp, "w") as z:
                for i, m in enumerate(parts):
                    z.write(m.path, arcname=f"member_{i:05d}.csv")
            os.replace(tmp, f"{self.path}/drop_{batchId:06d}.zip")
        self._clear_staged(messages)

    def abort(self, messages, batchId: int) -> None:  # driver
        self._clear_staged(messages)
