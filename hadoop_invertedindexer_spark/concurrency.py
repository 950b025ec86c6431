"""Overlap independent Spark actions from a small driver thread pool.

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls them
sequentially (guide §2.6). The index-build lifecycles
(``build_ivfpq_index`` etc.) end in several *independent* sinks —
different output directories, no read-after-write between them — and
their cost at bench scale is dominated by per-action driver gaps
(planning, py4j, parquet metadata), not compute: profiled r15,
maintain_ivfpq_index spent 10.8 s of a 23 s wall in gaps between 77
jobs. Submitting the sinks from a pool overlaps those gaps and lets the
small metadata writes back-fill executor slots while the big write's
tail drains. At cluster scale the same overlap fills the stragglers'
idle capacity — the §2.6 posture, not a local-only trick.

Jobs submitted from different threads are independent FIFO entries in
the scheduler; job groups/descriptions are thread-local, so concurrent
jobs stay correctly labeled. Exceptions propagate to the caller (the
first failure is re-raised after all thunks settle, so no write is
silently abandoned mid-flight).
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

# 2-3 jobs in flight is plenty (guide §2.6): enough to fill the tail,
# not so many that they fight for executor slots.
DEFAULT_MAX_WORKERS = 3


def run_overlapped(
    *thunks: Callable[[], None], max_workers: int = DEFAULT_MAX_WORKERS
) -> None:
    """Run each zero-arg thunk (typically a ``df.write...`` action) on a
    small thread pool and wait for all of them. Re-raises the first
    failure after every thunk has settled."""
    if len(thunks) <= 1:
        for t in thunks:
            t()
        return
    with ThreadPoolExecutor(max_workers=min(max_workers, len(thunks))) as pool:
        futures = [pool.submit(t) for t in thunks]
        first_err: BaseException | None = None
        for fut in futures:
            try:
                fut.result()
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                if first_err is None:
                    first_err = exc
        if first_err is not None:
            raise first_err
