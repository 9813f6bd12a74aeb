"""Registry for operator-internal persists, with a caller release hook.

Two operator families persist a bounded intermediate as part of their
plan — `queries._pin` (shared subtrees of multi-consumer plans) and
`operators.pack.pack_offsets` (its input re-runs under 3 actions).
The persist MUST outlive the caller's action (unpersisting earlier
would silently recompute the lineage the pin exists to share), so the
operator cannot release it itself. The bench harness isolates queries
with `spark.catalog.clearCache()`; any OTHER long-lived caller that
runs several such plans (the engine facade, a notebook, a server
session) should call :func:`release_pins` after materializing each
result, or the MEMORY_AND_DISK blocks accumulate until session end
(r15 advisory: bounded per call, but bounded × many calls is still a
leak).

`register` is deliberately append-only and idempotent-safe: releasing
an already-unpersisted frame is a no-op in Spark, so callers may call
`release_pins()` defensively at any boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ACTIVE: list[DataFrame] = []


def register(df: DataFrame) -> DataFrame:
    """Track a frame persisted by an operator so `release_pins` can
    drop it once the caller has materialized its result."""
    _ACTIVE.append(df)
    return df


def release_pins() -> int:
    """Unpersist every registered frame (lazily — blocks are dropped,
    in-flight jobs finish on recomputation semantics) and clear the
    registry. Returns the number of frames released. Safe to call at
    any time; released frames recompute from source if re-used."""
    n = 0
    while _ACTIVE:
        df = _ACTIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # a stopped session or an already-freed frame is not an
            # error at release time
            pass
    return n
