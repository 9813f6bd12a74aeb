"""Top-of-the-bench queries, one order of magnitude up (r14 verdict
#3): the 2×-vs-baseline bar is graded at sf0.1 where everything fits
one machine's noise floor, and the per-operator probes cover
individual shapes — but no round had measured the GRADED queries
themselves at 10× the graded SF. This probe synthesizes a 10× sf0.1
dir and runs the ten most expensive bench queries (BENCH_local.json
top of table) at 1× and 10× in the same session, printing the slope —
the cheapest way to catch a superlinear term before the driver ever
grades a bigger SF.

Replication rules (disjoint keys; density-honest):

  * events — event_id + k·N, user_id + k·1e6 (the analytics-probe
    rule: same time range, so per-hour density grows — the honest
    stream condition; user count grows with rows, so per-user state
    and join fan-in stay constant).
  * documents — doc_id + k·N, text salted with a per-copy suffix so
    exact/ngram stages keep honest cardinality; n_chars recomputed.
  * embeddings — vec_id + k·N; copy k's vector is
    centroid(label) + π_k(residual) where π_k is a per-copy stride
    permutation of the residual's coordinates. Validated against the
    real sf0.1 data: src-vs-copy and copy-vs-copy cosine distributions
    match the original within-label baseline (mean ≈ 0.01, ~1% above
    the 0.3 near-dup threshold), while each copy PRESERVES the
    original's planted near-dup pairs internally (similar residuals
    stay similar under one permutation) — so pair count grows ~10×
    like fresh data, never 100× from 10-member duplicate clusters AS
    A DATA ARTIFACT. (First attempt used a sin-ramp additive jitter;
    every such noise vector lies in the 2-D span of (sin ψ_i, cos ψ_i)
    so copies correlated at ~0.88 and the LSH query's pair space blew
    up 37× — kept here as the cautionary note.)

Each query runs min-of-2 per scale (run 1 absorbs the per-dir
artifact builds the bench prewarms once). Run:

    python tools/suite_scale_probe.py
    python tools/suite_scale_probe.py --quick   # 3 cheapest queries
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
MULT = 10

#: BENCH_local.json r14 top of table (VERDICT r14 "Next round" #3).
QUERY_NAMES = [
    "curation_pipeline",
    "adc_recall_curve",
    "hard_negatives_corpus",
    "stream_funnel",
    "stream_sessionize",
    "ivf_recall_curve",
    "vector_knn_selfjoin_ivf",
    "stream_click_purchase",
    "embedding_neardup_lsh",
    "repetition_signals",
]


def _replicate_into(spark, out_dir: str, mult: int) -> None:
    from converttovectordb_spark.queries import load_events

    os.makedirs(out_dir, exist_ok=True)
    # small tables ride along untouched (single-file symlinks)
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem",
    ):
        os.symlink(
            os.path.abspath(f"{SF_DIR}/{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
        )

    ev0 = load_events(spark, SF_DIR).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    n_ev = ev0.count()
    ev = ev0
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_doc = docs0.count()
    docs = docs0
    emb0 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_emb = emb0.count()
    d = len(emb0.select("embedding").first()[0])
    cent = (
        emb0.select(
            "label", F.posexplode("embedding").alias("pos", "x")
        )
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "c"))
            ).alias("cs")
        )
        .select(
            "label", F.expr("transform(cs, s -> s.c)").alias("_cent")
        )
    )
    emb0c = emb0.join(F.broadcast(cent), "label")
    emb = emb0
    for k in range(1, mult):
        ev = ev.unionByName(
            ev0.withColumn("event_id", F.col("event_id") + F.lit(k * n_ev))
            .withColumn("user_id", F.col("user_id") + F.lit(k * 1_000_000))
        )
        dk = docs0.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * n_doc)
        ).withColumn(
            "text", F.concat(F.col("text"), F.lit(f" copy{k}"))
        )
        docs = docs.unionByName(
            dk.withColumn("n_chars", F.length("text").cast("long"))
        )
        import math

        stride = 2 * k + 3  # odd covers power-of-two dims; guard rest
        while math.gcd(stride, d) != 1:
            stride += 2
        ek = (
            emb0c.withColumn(
                "vec_id", F.col("vec_id") + F.lit(k * n_emb)
            )
            .withColumn(
                "embedding",
                F.expr(
                    f"transform(sequence(0, {d - 1}), i -> cast("
                    "element_at(_cent, i + 1) + "
                    "cast(element_at(embedding, "
                    f"pmod(i * {stride} + {k}, {d}) + 1) as double) - "
                    f"element_at(_cent, pmod(i * {stride} + {k}, {d}) "
                    "+ 1) as float))"
                ),
            )
            .drop("_cent")
            .select(*emb0.columns)
        )
        emb = emb.unionByName(ek)
    ev.repartition(4 * mult).write.parquet(f"{out_dir}/events.parquet")
    docs.repartition(2 * mult).write.parquet(
        f"{out_dir}/documents.parquet"
    )
    emb.repartition(2 * mult).write.parquet(
        f"{out_dir}/embeddings.parquet"
    )


def main() -> int:
    quick = "--quick" in sys.argv
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("suite-scale-probe")
        .master("local[32]")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from converttovectordb_spark.queries import QUERIES

    names = (
        ["repetition_signals", "embedding_neardup_lsh", "ivf_recall_curve"]
        if quick
        else QUERY_NAMES
    )
    root = tempfile.mkdtemp(prefix="suite_scale_")
    try:
        big = os.path.join(root, f"x{MULT}")
        t0 = time.time()
        _replicate_into(spark, big, MULT)
        print(f"replicated sf0.1 × {MULT} in {time.time() - t0:.1f}s")

        results: dict[str, dict[str, float]] = {}
        for name in names:
            fn = QUERIES[name]
            row: dict[str, float] = {}
            for tag, d in (("1x", SF_DIR), (f"{MULT}x", big)):
                best = None
                for _ in range(2):
                    t0 = time.time()
                    n_rows = len(fn(spark, d).collect())
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                    spark.catalog.clearCache()
                row[tag] = best
                print(f"{name:26s} {tag:>4s} {best:7.2f} s ({n_rows} rows)")
            results[name] = row
        print(f"\n| query | sf0.1 s | {MULT}x s | slope |")
        print("|---|---|---|---|")
        for name, r in results.items():
            print(
                f"| {name} | {r['1x']:.2f} | {r[f'{MULT}x']:.2f} "
                f"| {r[f'{MULT}x'] / r['1x']:.1f}x |"
            )
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
