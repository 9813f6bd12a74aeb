"""Composed curation-pipeline scaling probe (q_curation_pipeline).

r12 (VERDICT #3): the suite's largest graded entry (~6 s at sf0.1) is
the flagship "production run" shape — gopher filter → substring cut →
temperature weights → prefix-sum pack. Both prior plan pathologies
(HOF-no-CSE, filter-over-computed-signals) were found by probes, not
grading, so this probe measures the COMPOSED lineage at [1, 4, 16]×
sf0.1 documents (disjoint doc ids) and attributes time per stage.

Method: the pipeline is re-declared stage for stage from the same
operators the graded query uses (`_gopher_quality_frame`,
`cut_duplicate_spans`, `pack_offsets`) over the scaled frame, then
timed at four CUMULATIVE sinks (survivor count → cut token sum →
weighted token sum → packed-bin count). Stage attribution is the
difference of consecutive cumulative sinks — upstream re-execution is
present in both terms and cancels to first order — plus the honest
un-segmented end-to-end run. Linear scaling means sec/mult roughly
constant down the column; a super-linear column names the stage to fix.

    python tools/curation_scale_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
MULTS = [1, 4, 16, 64]
ID_STRIDE = 10_000_000

#: width policy (r13): the pipeline's heaviest shuffle is the cut
#: stage's gram inverted index (~one row per token); size the INITIAL
#: shuffle width for ~2M gram rows per partition and let AQE coalesce
#: the light stages back down. Fixed 32 is right below ~64M gram rows
#: (every SF the suite grades); past that the fixed width makes
#: partitions grow linearly with data — the probe measures both.
GRAMS_PER_PARTITION = 2_000_000


def _scaled_docs(spark, mult: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    if mult == 1:
        out = base
    else:
        reps = spark.range(mult).select(
            F.col("id").cast("bigint").alias("_rep")
        )
        out = base.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("_rep") * F.lit(ID_STRIDE)).alias(
                "doc_id"
            ),
            "text",
            "lang",
        )
    parallelism = spark.sparkContext.defaultParallelism
    return out.repartition(max(parallelism, mult * 8))


def _stages(docs):
    """The graded query's four stages over an arbitrary docs frame —
    returns (survivors, cut, weighted, packed) lazily declared, same
    operators and plan shapes as queries.q_curation_pipeline."""
    from converttovectordb_spark.operators.dedup import cut_duplicate_spans
    from converttovectordb_spark.operators.pack import pack_offsets
    from converttovectordb_spark.queries import _gopher_quality_frame

    g = _gopher_quality_frame(docs)
    kept_ids = (
        g.withColumn("_keep_m", F.explode(F.array(F.col("keep"))))
        .filter(F.col("_keep_m"))
        .select("doc_id")
    )
    survivors = docs.join(kept_ids, "doc_id", "left_semi")
    cut = cut_duplicate_spans(survivors, k=8, min_occ=2)
    cleaned = cut.select("doc_id", F.col("n_kept").alias("toks")).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    per = cleaned.groupBy("lang").agg(
        F.sum("toks").cast("bigint").alias("_ltok")
    )
    per = per.withColumn(
        "_s",
        F.round(F.sqrt(F.col("_ltok").cast("double")), 6).cast(
            "decimal(18,6)"
        ),
    )
    denom = per.agg(F.sum("_s").alias("_denom"))
    wt = per.crossJoin(F.broadcast(denom)).select(
        "lang",
        F.round(
            F.col("_s").cast("double") / F.col("_denom").cast("double"), 6
        )
        .cast("decimal(18,6)")
        .alias("_w"),
    )
    weighted = cleaned.join(F.broadcast(wt), "lang")
    offs = pack_offsets(weighted, id_col="doc_id", tokens_col="toks")
    packed = (
        offs.withColumn(
            "bin", F.floor(F.col("start") / F.lit(1024)).cast("int")
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("_w") * F.col("toks")).alias("_wsum"),
        )
    )
    return survivors, cut, weighted, packed


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("curation-scale-probe")
        .master("local[32]")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # per-token estimate for the width policy, one tiny agg on the base
    base_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    avg_toks = float(
        base_docs.agg(
            F.avg(F.size(F.split(F.col("text"), r"\s+")))
        ).first()[0]
    )

    print(
        "| mult | docs | e2e cold sec | e2e policy-width warm sec "
        "(width) | gopher sec | cut sec | weights sec | pack sec "
        "| e2e sec/mult |",
        flush=True,
    )
    print("|---|---|---|---|---|---|---|---|---|", flush=True)
    for mult in MULTS:
        docs = _scaled_docs(spark, mult)
        n = docs.count()  # materialize the scan outside the timings

        # honest end-to-end first (cold for this mult, no extra sinks)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        survivors, cut, weighted, packed = _stages(docs)
        t0 = time.time()
        packed.count()
        e2e = time.time() - t0

        # width policy: initial width sized to the gram table, AQE
        # coalesces the light stages back down
        import math

        width = max(32, math.ceil(n * avg_toks / GRAMS_PER_PARTITION))
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )
        survivors, cut, weighted, packed = _stages(docs)
        t0 = time.time()
        packed.count()
        e2e_aqe = time.time() - t0
        spark.conf.set("spark.sql.shuffle.partitions", "32")

        # cumulative sinks for stage attribution
        survivors, cut, weighted, packed = _stages(docs)
        t0 = time.time()
        survivors.count()
        c1 = time.time() - t0
        t0 = time.time()
        cut.agg(F.sum("n_kept")).collect()
        c2 = time.time() - t0
        t0 = time.time()
        weighted.agg(F.sum("toks")).collect()
        c3 = time.time() - t0
        t0 = time.time()
        packed.count()
        c4 = time.time() - t0
        gopher = c1
        cut_s = max(c2 - c1, 0.0)
        weights_s = max(c3 - c2, 0.0)
        pack_s = max(c4 - c3, 0.0)
        print(
            f"| {mult} | {n} | {e2e:.2f} | {e2e_aqe:.2f} ({width}) "
            f"| {gopher:.2f} | {cut_s:.2f} "
            f"| {weights_s:.2f} | {pack_s:.2f} | {e2e / mult:.2f} |",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
