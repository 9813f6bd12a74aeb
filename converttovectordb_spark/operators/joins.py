"""Join-shaped operators beyond plain equi-joins: as-of (time-travel)
join and band (range) join.

The reference has no joins at all (SURVEY §2.5) — these are the join
shapes a training-data / event pipeline needs that Spark does not ship
as single primitives, each built so the plan scales:

  asof_join — for every left row, the latest right row with
      right_ts <= left_ts for the same key. Implemented as the
      union + last(ignorenulls) running-window trick: ONE shuffle on
      the key, no range-join pair explosion (a naive
      ``l JOIN r ON key AND r.ts <= l.ts`` + max() materializes
      O(|L|·|R|) pairs per key before aggregating).
  band_join — map rows to [lo, hi) bands from a tiny band table via a
      broadcast range join (BroadcastNestedLoopJoin). The band table is
      always broadcast; never use this shape for two large sides — at
      scale, pre-bucket the big side instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join (inclusive): attach to each left row the
    right row with the greatest ``right_ts <= left_ts`` per ``on`` key;
    null payload when no prior right row exists (left-outer semantics).

    Right rows are first deduplicated to one per (key, ts) — the as-of
    contract is ambiguous otherwise; the kept row is the last by the
    payload column order. Equal timestamps match (right sorts before
    left at the same instant via the _side key).

    Plan: union the two sides → single hash shuffle on ``on`` → one
    running ``last(ignorenulls)`` window pass. Linear in |L| + |R|.
    """
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    w_dedup = Window.partitionBy(on, right_ts).orderBy(
        *[F.col(c).desc() for c in right_payload]
    )
    r = (
        right.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(on),
            F.col(right_ts).alias("_ats"),
            F.lit(0).alias("_side"),
            payload_struct.alias("_rp"),
        )
    )
    left_cols = [c for c in left.columns]
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_lp"),
    )
    r = r.withColumn("_lp", F.lit(None).cast(l.schema["_lp"].dataType))
    both = l.unionByName(r.select(*l.columns))
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select(
        *[F.col(f"_lp.{c}").alias(c) for c in left_cols],
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_payload],
    )
    return out


def band_join(
    df: DataFrame,
    bands: DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Inner join rows to [lo, hi) bands. ``bands`` must be small (it is
    broadcast; the range predicate forces a nested-loop probe, which is
    fine only because every big-side row scans the handful of bands)."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return df.join(F.broadcast(bands), cond)
