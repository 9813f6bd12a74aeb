"""Hot-cluster salt sizing probe (ivf_knn_join_shuffled, salt_buckets).

The claim under test: on a SKEWED cluster histogram, the per-cluster
adaptive sizing (`salt_buckets="auto"` → `auto_salt_buckets`) bounds
the hot cluster's per-task pair count at `target_pairs_per_task`
without replicating the cold tail's probes, and that beats both no
salting (the hot cluster serializes onto one task) and a small uniform
S (hot task still oversized, every cold probe still replicated S×).

Corpus: sf0.1 embeddings (d=64) replicated 4× → 8k rows; 40% land in
ONE hot cluster, the rest spread over 39 cold clusters (~123 rows
each). Every row is a query (top-3, nprobe=2, self excluded) to a noop
sink. Expected hot-cluster pair work ≈ 6.4k probes × 3.2k docs ≈ 20M
pairs — ~20 s of single-task compute if unsplit.

    python tools/salt_sizing_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
MULT = 4
COLD_CLUSTERS = 39
HOT_FRACTION = 0.4


def main() -> int:
    from pyspark.sql import SparkSession

    from converttovectordb_spark.operators.search import (
        auto_salt_buckets,
        ivf_knn_join_shuffled,
    )

    spark = (
        SparkSession.builder.appName("salt-sizing-probe")
        .master("local[32]")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_base = base.count()
    rep = base
    for k in range(1, MULT):
        rep = rep.unionByName(
            base.withColumn("vec_id", F.col("vec_id") + F.lit(k * n_base))
        )
    # deterministic skew: ids with vec_id % 5 < 2 (40%) form cluster 0
    rep = (
        rep.withColumn(
            "label",
            F.when(F.col("vec_id") % 5 < 2, 0)
            .otherwise(
                (F.col("vec_id") % COLD_CLUSTERS).cast("int") + 1
            )
            .cast("int"),
        )
        .repartition(32)
        .cache()
    )
    n = rep.count()
    hist = rep.groupBy("label").count().collect()
    sizes = {r["label"]: r["count"] for r in hist}
    hot_n = sizes[0]
    print(
        f"corpus: {n} rows, hot cluster 0 = {hot_n} rows, "
        f"{len(sizes) - 1} cold clusters ~{(n - hot_n) // COLD_CLUSTERS}",
        flush=True,
    )
    s_hot = auto_salt_buckets(hot_n, n, n, 2)
    s_cold = auto_salt_buckets((n - hot_n) // COLD_CLUSTERS, n, n, 2)
    print(f"auto sizing: hot S={s_hot}, cold S={s_cold}", flush=True)

    probes = rep.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    def run(salt) -> float:
        def once() -> None:
            ivf_knn_join_shuffled(
                probes,
                rep,
                top_k=3,
                nprobe=2,
                salt_buckets=salt,
                exclude_self=True,
            ).write.format("noop").mode("overwrite").save()

        once()  # warm
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            once()
            best = min(best, time.time() - t0)
        return best

    print("| salt_buckets | self-join sec |", flush=True)
    print("|---|---|", flush=True)
    for salt in (1, 4, "auto"):
        sec = run(salt)
        print(f"| {salt} | {sec:.2f} |", flush=True)
    rep.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
