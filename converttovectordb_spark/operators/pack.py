"""Sequence packing: concat-and-chunk offsets for pretraining bins.

The standard GPT-style packing op: concatenate every document's tokens
in a fixed global order and cut the stream every ``ctx`` tokens; a
document belongs to the bin its FIRST token lands in. The load-bearing
primitive is a global prefix sum (each doc's start offset = total
tokens of all earlier docs) — the naive Spark spelling is a window
over one global ordering, which moves the whole corpus into a single
partition (WindowExec warns exactly this). At 100 TB that is not a
plan, it is an outage.

So the prefix sum here is TWO-PHASE (the classic distributed scan):

  1. range-bucket the ordering key into ``n_buckets`` contiguous id
     ranges (one min/max agg to size the buckets — no sort);
  2. per-bucket token totals (one groupBy over n_buckets rows), prefix
     them driver-side (n_buckets is tiny), broadcast the per-bucket
     base offsets back;
  3. the within-bucket cumulative sum runs as a window PARTITIONED BY
     bucket — every partition bounded by the bucket width, no global
     exchange.

Semantics are exactly the single-window formulation (the DuckDB oracle
runs that directly); only the physical plan differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
    n_buckets: int | None = None,
) -> DataFrame:
    """Add ``start`` — each row's global token offset in ascending
    ``id_col`` order (sum of all earlier rows' ``tokens_col``) — via
    the two-phase prefix sum described in the module docstring.

    ``id_col`` must be numeric and unique (the documents table's dense
    doc_id); ties would make "earlier" ambiguous. ``n_buckets``
    defaults to the session's shuffle width.
    """
    spark = docs.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # The two-phase prefix sum evaluates ``docs`` three times (min/max
    # probe, bucket-totals collect, the returned windowed plan). When
    # the input carries an expensive lineage — sequence_pack tokenizes
    # every document to get ``toks``; curation_pipeline's input is the
    # whole gopher→substring-cut pipeline — that lineage re-runs 3×.
    # Persist it once (MEMORY_AND_DISK: spills at scale rather than
    # OOMs; the frame is id/token-count scalars per doc by contract,
    # a few dozen bytes per row). The persist must outlive the
    # RETURNED windowed plan's action, so it cannot be released here:
    # it is registered with `pins`, and long-lived callers should
    # `pins.release_pins()` after materializing (the bench's
    # clearCache covers the bench; see pins module docstring).
    from converttovectordb_spark import pins

    docs = pins.register(docs.persist())
    lo, hi = docs.agg(
        F.min(id_col), F.max(id_col)
    ).first() or (None, None)
    if lo is None:
        return docs.withColumn("start", F.lit(0).cast("bigint"))
    width = max((int(hi) - int(lo)) // int(n_buckets) + 1, 1)
    bucketed = docs.withColumn(
        "_bucket",
        ((F.col(id_col) - F.lit(int(lo))) / F.lit(width)).cast("int"),
    )
    totals = (
        bucketed.groupBy("_bucket")
        .agg(F.sum(tokens_col).alias("_btoks"))
        .collect()
    )
    base, acc = [], 0
    for r in sorted(totals, key=lambda r: r["_bucket"]):
        base.append((r["_bucket"], acc))
        # a bucket whose rows are all NULL-token sums to NULL — count
        # it as 0 (matching sum's null-skipping everywhere else)
        # instead of TypeError-ing the whole pack
        acc += int(r["_btoks"] or 0)
    base_df = F.broadcast(
        spark.createDataFrame(base, "_bucket int, _base bigint")
    )
    w = Window.partitionBy("_bucket").orderBy(F.col(id_col).asc())
    return (
        bucketed.join(base_df, on="_bucket")
        .withColumn(
            "start",
            (
                F.col("_base")
                + F.coalesce(
                    F.sum(tokens_col).over(
                        w.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
            ).cast("bigint"),
        )
        .drop("_bucket", "_base")
    )


def pack_bins(
    docs: DataFrame,
    ctx: int,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
    n_buckets: int | None = None,
) -> DataFrame:
    """Per-bin packing stats: assign each doc to ``floor(start/ctx)``
    (the bin its first token lands in) and aggregate — (bin, n_docs,
    bin_tokens, first_doc). ``bin_tokens`` may exceed ``ctx``: a doc
    straddling a boundary spills into the next window, which is the
    documented concat-and-chunk behavior (the spilled tokens are not
    re-counted — they belong to the doc's OWN bin stats)."""
    if ctx < 1:
        raise ValueError(f"ctx must be >= 1, got {ctx}")
    offs = pack_offsets(
        docs, id_col=id_col, tokens_col=tokens_col, n_buckets=n_buckets
    )
    # bin stays BIGINT: at 100 TB (~1e13 tokens) bin ids pass 2^31 at
    # any realistic ctx, and a 32-bit cast would silently wrap into
    # colliding/negative ids; callers bound to small scales downcast
    # at their own edge
    return (
        offs.withColumn(
            "bin", F.floor(F.col("start") / F.lit(int(ctx))).cast("bigint")
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tokens_col).cast("bigint").alias("bin_tokens"),
            F.min(id_col).alias("first_doc"),
        )
    )
