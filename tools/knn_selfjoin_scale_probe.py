"""Corpus-scale KNN self-join scaling probe (ivf_knn_join_shuffled).

The claim under test: the shuffled IVF join's pairwise work is
Σ_c |Q_c|·|D_c| ≈ N·nprobe·cluster_size — LINEAR in N when the cluster
COUNT grows with the corpus (cluster size held constant, the way a real
index is provisioned), and quadratic if the cluster count is left fixed
(the misconfiguration the probe demonstrates on purpose).

Embeddings at sf0.1 (2000 rows, d=64) are replicated with disjoint ids
at [1, 4, 16]; labels are re-assigned as vec_id % C with C = 10·mult so
the cluster size stays ~200 at every scale. Every run includes the full
self-join (every row is a query, top-3, nprobe=2, salt_buckets=4) to a
count() sink. Output feeds SCALING.md.

    python tools/knn_selfjoin_scale_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
MULTS = [1, 4, 16]
BASE_CLUSTERS = 10
NPROBE = 2


def main() -> int:
    from pyspark.sql import SparkSession

    from converttovectordb_spark.operators.search import ivf_knn_join_shuffled

    spark = (
        SparkSession.builder.appName("knn-selfjoin-scale-probe")
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
    print(f"base corpus: {n_base} vectors, d=64", flush=True)
    print(
        "| N | clusters | cluster size | self-join sec | µs/query |",
        flush=True,
    )
    print("|---|---|---|---|---|", flush=True)

    def run(mult: int, clusters: int) -> tuple[int, float]:
        rep = base
        for k in range(1, mult):
            rep = rep.unionByName(
                base.withColumn("vec_id", F.col("vec_id") + F.lit(k * n_base))
            )
        rep = (
            rep.withColumn(
                "label", (F.col("vec_id") % clusters).cast("int")
            )
            .repartition(32)
            .cache()
        )
        n = rep.count()
        probes = rep.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

        def once() -> None:
            ivf_knn_join_shuffled(
                probes,
                rep,
                top_k=3,
                nprobe=NPROBE,
                salt_buckets=4,
                exclude_self=True,
            ).write.format("noop").mode("overwrite").save()

        once()  # warm codegen/scheduler
        best = min(
            (lambda t0=time.time(): (once(), time.time() - t0)[1])()
            for _ in range(2)
        )
        rep.unpersist()
        return n, best

    # LINEAR regime: cluster size constant (C grows with N)
    for mult in MULTS:
        n, sec = run(mult, BASE_CLUSTERS * mult)
        print(
            f"| {n} | {BASE_CLUSTERS * mult} | ~{n // (BASE_CLUSTERS * mult)} "
            f"| {sec:.2f} | {sec / n * 1e6:.1f} |",
            flush=True,
        )

    # QUADRATIC contrast: cluster count left at the 1x provisioning
    print("\nfixed C=10 (mis-provisioned) contrast:", flush=True)
    print("| N | clusters | self-join sec | µs/query |", flush=True)
    print("|---|---|---|---|", flush=True)
    for mult in [1, 4]:
        n, sec = run(mult, BASE_CLUSTERS)
        print(
            f"| {n} | {BASE_CLUSTERS} | {sec:.2f} | {sec / n * 1e6:.1f} |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
