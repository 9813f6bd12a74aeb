"""Serving-latency probe: decompose the cached-DF point-query floor.

Backs the "Cached-DF point-query floor, decomposed" table in
SCALING.md. Builds the reference-matched corpus (N=13,515 chunks,
d=384, prenormed cache) and measures, interleaved round-robin so host
drift hits every variant equally:

  * bare count() on the cached corpus        (pure job floor)
  * trivial-score top-k (same plan, no math) (floor + plan shape)
  * full knn_topk, AQE on vs off             (+ scoring, +/- AQE)
  * full knn_topk across partition counts    (task sizing sweep)

Run:  python tools/serving_latency_probe.py  [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

REPS = 10
PARTITION_SWEEP = (32, 16, 8, 4, 1)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from pyspark.sql import functions as F

    from converttovectordb_spark.functions.vector import NORM_COL
    from converttovectordb_spark.operators.search import knn_topk
    from converttovectordb_spark.session import get_spark
    from tools.matched_corpus import matched_reference_corpus

    spark = get_spark("serving-latency-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    # the SAME corpus recipe bench.py's knn_matched_* numbers use
    base = matched_reference_corpus(spark, sf_dir, int(cpus))
    cached = {}
    for p in PARTITION_SWEEP:
        m = base.repartition(p).cache()
        m.count()
        cached[p] = m.select("vec_id", "embedding", NORM_COL)
    probe = [
        float(x) for x in cached[16].select("embedding").first()[0]
    ]

    def knn(df):
        knn_topk(
            df, probe, 5, id_cols=["vec_id"], expected_dim=384
        ).collect()

    def trivial(df):
        (
            df.withColumn("score", F.col(NORM_COL))
            .drop(NORM_COL, "embedding")
            .orderBy(F.col("score").desc(), F.col("vec_id").asc())
            .limit(5)
            .filter(F.col("score") >= 0.1)
            .collect()
        )

    df16 = cached[16]
    variants: dict[str, tuple] = {
        "count (job floor)": (lambda: df16.count(), "false"),
        "trivial-score topk": (lambda: trivial(df16), "false"),
        "knn AQE=on  p16": (lambda: knn(df16), "true"),
    }
    # the p16 sweep entry below is the AQE=off twin of the line above
    for p in PARTITION_SWEEP:
        variants[f"knn AQE=off p{p}"] = (
            (lambda d=cached[p]: knn(d)),
            "false",
        )

    samples: dict[str, list[float]] = {k: [] for k in variants}
    for k, (fn, aqe) in variants.items():  # warm (codegen, cache read)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        fn()
    for _ in range(REPS):
        for k, (fn, aqe) in variants.items():
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            t0 = time.time()
            fn()
            samples[k].append(time.time() - t0)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    print(f"\nN=13,515 d=384 prenormed cache, local[{cpus}], "
          f"{REPS} interleaved reps")
    print(f"{'variant':24s} {'min':>8s} {'median':>8s}")
    for k, v in samples.items():
        print(
            f"{k:24s} {min(v):8.4f} {statistics.median(v):8.4f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
