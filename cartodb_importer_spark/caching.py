"""Query-body persist tracking (VERDICT r12 item 2 / ADVICE r12).

Query functions persist frames whose consumers all live in the RETURNED
plan — the consuming action (the bench's noop write, the driver's hash
collect) runs in the caller, so the query body can never unpersist them
itself without destroying the very reuse the persist exists for. Left
alone, every invocation in a long-lived session leaks its entries:
Spark's CacheManager holds them by logical plan until session end, and
the r12 full-registry sweep measured real tail inflation from exactly
this accumulation (OPTIMIZATION_r12.md methodology note).

The contract: a query body registers each persisted frame with
``tracked(df.persist())``; a caller that runs MANY queries in one
session calls ``release_tracked_caches()`` between queries — after the
previous query's action has completed — so storage memory stays flat
across a 290-query sweep instead of growing monotonically. Callers that
run one query (or want warm re-invocation reuse, like the bench's
min-of-5 loop) simply never call release and nothing changes.

Persists that are consumed AND released inside one function (e.g. the
k-means trainers' feature-frame persist/unpersist in a ``finally``) do
not need tracking — they never outlive their query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def tracked(df: DataFrame) -> DataFrame:
    """Register an (already persisted) frame for later release."""
    _LIVE.append(df)
    return df


def release_tracked_caches(blocking: bool = False) -> int:
    """Unpersist every tracked frame (newest first); returns the count.

    Best-effort by design: a frame whose session has been stopped (or
    that was already unpersisted) is skipped, never raised — release
    runs between queries in sweeps and must not fail the sweep."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:  # noqa: BLE001 — release is best-effort
            pass
    return n
