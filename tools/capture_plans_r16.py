"""Capture `.explain("formatted")` for the optimization round's target
queries into plans/r16/<query>_<tag>.txt (tag = before/after).

Usage: python tools/capture_plans_r16.py <tag> [query ...]

Runs each query builder at the BENCH scale factor (sf0.1 by default —
override with SPARK_GRAFT_SF_DIR) and writes the formatted physical
plan. Queries whose builders execute eager work (streaming replays,
driver-side LUT collects) pay that work here; the artifact is the plan
of the RETURNED DataFrame, which is what the noop sink executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

DEFAULT_TARGETS = [
    "curation_pipeline",
    "adc_recall_curve",
    "ivf_recall_curve",
    "hard_negatives_corpus",
    "minhash_accuracy",
    "mrl_recall_curve",
    "vector_knn_selfjoin_ivf",
    "dsir_weights",
    "pq_recall",
    "embedding_neardup_lsh",
    "repetition_signals",
    "substring_dedup_cut",
    "neardup_clusters_distributed",
    "region_revenue",
    "hybrid_rrf",
    "semantic_dedup",
    "tfidf_topterms",
    "sequence_pack",
    "ivf_recall_kmeans",
    "ivf_recall",
    "dedup_corpus",
    "substring_dedup",
    "index_drift",
    "hamming_bits_tier_knn",
]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    targets = sys.argv[2:] or DEFAULT_TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from converttovectordb_spark.queries import QUERIES
    from converttovectordb_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    for name in targets:
        fn = QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep going; record the failure
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        n_scan = plan.count("Scan parquet")
        print(f"{name}: {len(plan)} bytes, Exchange x{n_exch}, "
              f"Scan parquet x{n_scan} -> {path}", flush=True)
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
