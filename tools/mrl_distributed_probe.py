"""MRL dial at the DISTRIBUTED (indexed) tier: priced, not assumed.

The matrix-tier Matryoshka dial is measured (SCALING.md r13: d'=32
prefix+rerank 0.289 ms p50 vs 0.542 ms full at N=13.5k), but
`IVFIndex.search(mrl_dim=...)`'s distributed prefix fold had no slope
(r13 verdict #5): the SQL fold's cost is length-proportional only if
Catalyst evaluates `slice(vec, 1, d')` cheaply per row, and the dial
adds a second per-query window (prefix shortlist) whose shuffle could
cost more than the saved arithmetic at small probed-row counts. This
probe measures full-dim vs d' ∈ {16, 64} on the indexed door over a
synthesized d=384 corpus at a 16× N ladder (Q=8 queries, C=64
clusters, nprobe=8 → ~N/8 probed rows per query), and asserts the MRL
plan still carries the probe's PartitionFilters (the slice must not
defeat the static cluster pruning).

    python tools/mrl_distributed_probe.py            # full ladder
    python tools/mrl_distributed_probe.py --quick    # smallest N only
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

REPS = 5
TOP_K = 5
DIM = 384
N_QUERIES = 8
NPROBE = 8
CLUSTERS = 64


def _mk_corpus(spark, n: int):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), "
            "i -> sin(cast(id as double) * 0.7 + i * 1.3))"
        ).alias("embedding"),
    )


def main() -> int:
    quick = "--quick" in sys.argv
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    import tempfile

    from pyspark.sql import functions as F

    from pyspark.sql import SparkSession

    from converttovectordb_spark.plans.bucketing import physical_plan
    from converttovectordb_spark.plans.ivf_index import build_ivf_index

    # own session: the index build at the big rungs OOMs the default
    # 1g driver heap (same sizing as tools/bits_tier_probe.py)
    spark = (
        SparkSession.builder.appName("mrl-distributed-probe")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", "24g")
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if "--n" in sys.argv:  # single rung, e.g. --n 400000
        ladder = [int(sys.argv[sys.argv.index("--n") + 1])]
    elif quick:
        ladder = [100_000]
    else:
        ladder = [100_000, 400_000, 1_600_000]
    for n in ladder:
        corpus = _mk_corpus(spark, n)
        with tempfile.TemporaryDirectory(prefix="mrl_probe_") as tmp:
            t0 = time.perf_counter()
            idx = build_ivf_index(
                corpus, f"{tmp}/ivf", num_clusters=CLUSTERS, seed=7
            )
            build_s = time.perf_counter() - t0
            queries = _mk_corpus(spark, N_QUERIES).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )

            def run(mrl_dim):
                df = idx.search(
                    queries, TOP_K, NPROBE, mrl_dim=mrl_dim
                )
                t0 = time.perf_counter()
                rows = df.collect()
                return time.perf_counter() - t0, rows

            # plan contract: the MRL branch must keep the static
            # cluster PartitionFilters on the corpus scan (the slice
            # lives ABOVE the scan; the centroid scan's filters are
            # legitimately empty, so check EVERY block)
            import re as _re

            plan = physical_plan(
                idx.search(queries, TOP_K, NPROBE, mrl_dim=16)
            )
            blocks = _re.findall(r"PartitionFilters: \[[^\]]*", plan)
            assert any(
                "cluster_id" in b and "IN" in b for b in blocks
            ), f"MRL plan lost the cluster partition pruning: {blocks}"
            # (renders as `IN (...)` for small probe sets, `INSET ...`
            # past Spark's optimizer threshold — both are the static
            # partition filter)

            results = {}
            timings = {}
            for label, d in (("full", None), ("d'=64", 64), ("d'=16", 16)):
                ts = []
                _, rows = run(d)  # warm
                for _ in range(REPS):
                    t, rows = run(d)
                    ts.append(t)
                timings[label] = (min(ts), sorted(ts)[len(ts) // 2])
                results[label] = {
                    (r["query_id"], r["rank"]): r["vec_id"] for r in rows
                }
            # recall of the dialed doors vs the exact indexed door
            base = results["full"]
            line = f"N={n:>9,} (build {build_s:.0f}s, ~{n // NPROBE:,} probed rows/query over {NPROBE}/{CLUSTERS} clusters)"
            for label in ("full", "d'=64", "d'=16"):
                mn, p50 = timings[label]
                agree = sum(
                    1 for k, v in results[label].items() if base.get(k) == v
                )
                line += (
                    f"\n  {label:6s}: min {mn:.3f}s  p50 {p50:.3f}s  "
                    f"top-{TOP_K}×{N_QUERIES} agree {agree}/{len(base)}"
                )
            print(line)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
