"""L5/L6 — external-service sink pattern (SURVEY §2 S10, S6-S9 transport).

The reference POSTs/PUTs one HTTP request per pandas row from the driver
(``dags/ODSImport.py:246-256``; ``dags/ConsultationNoteWritebackX.py:
413-519`` — $validate, $transform-EMISOpen, $send-EMISOpen). The Spark
form is ``foreachPartition``: each partition opens ONE transport/session,
streams its rows through it, and closes — connection setup is amortized
per partition instead of per row, and the work scales with executor
count instead of serializing through the driver.

The transport is injected (``Callable[[str], int]`` → status code), so
tests run with a recording fake and production supplies a real HTTP
session factory; this module deliberately contains NO network code.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame

TransportFactory = Callable[[], Callable[[str], int]]


def post_partitionwise(
    df: DataFrame,
    payload_col: str,
    transport_factory: TransportFactory,
    ok_status: int = 201,
) -> tuple[int, int]:
    """Send ``payload_col`` of every row through a per-partition transport.
    Returns (n_sent, n_failed) via accumulators — the only driver-visible
    state; rows never collect to the driver."""
    sc = df.sparkSession.sparkContext
    sent = sc.accumulator(0)
    failed = sc.accumulator(0)

    def handle(rows: Iterator) -> None:
        send = transport_factory()  # one connection per partition
        for row in rows:
            status = send(row[payload_col])
            if status == ok_status:
                sent.add(1)
            else:
                failed.add(1)

    df.select(payload_col).foreachPartition(handle)
    return sent.value, failed.value
