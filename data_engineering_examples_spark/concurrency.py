"""Driver-side job overlap for INDEPENDENT Spark actions (guide §2.6).

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls them
sequentially.  Several queries stage two or more independent inputs
(two bucketed tables, the two sides of a stream-stream join feed, two
published index tables) with back-to-back blocking writes — each write's
task tail leaves the executors idle while the next write waits on the
driver.  Submitting them from a small thread pool lets the second job's
tasks back-fill the first job's tail; on the local bench this removes
most of one write's wall time, and on a cluster it is the §2.6
"overlap independent jobs" pattern verbatim.

Only use this for actions that are truly independent: different output
paths / table names, no ordering contract between them (file-feed
staging whose mtime ORDER is load-bearing must keep its sequential
writes).  Errors propagate: the first failure is re-raised after all
threads finish, so a failed write can never be silently swallowed.

``pyspark.InheritableThread`` is the documented way to run driver
threads so JVM thread-locals (job group, description) are inherited and
cleaned up; job descriptions set by the caller therefore label all
overlapped jobs.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark import InheritableThread


def run_concurrently(*thunks: Callable[[], Any]) -> list[Any]:
    """Run each zero-arg thunk in its own driver thread; return their
    results in order.  Re-raises the first exception after every thread
    has finished (no orphaned half-started jobs hiding behind an early
    raise)."""
    if len(thunks) == 1:
        return [thunks[0]()]
    results: list[Any] = [None] * len(thunks)
    errors: list[BaseException] = []

    def _runner(i: int, fn: Callable[[], Any]) -> None:
        try:
            results[i] = fn()
        except BaseException as exc:  # noqa: BLE001 — collected, re-raised
            errors.append(exc)

    threads = [
        InheritableThread(target=_runner, args=(i, fn))
        for i, fn in enumerate(thunks)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        if len(errors) > 1:
            # don't lose the other failures' tracebacks: raise them as
            # one group so every overlapped write's error is reported
            raise BaseExceptionGroup(
                f"{len(errors)} of {len(thunks)} concurrent actions failed",
                errors,
            )
        raise errors[0]
    return results
