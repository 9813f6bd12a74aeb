"""Lexical-index probe cost vs query-term count and hot-term skew.

r12 measured the bm25_indexed probe flat vs CORPUS growth; this probe
closes the other two axes the verdict named:

  1. |query terms| 3 → 30: each extra term adds its buckets' postings
     bytes — the slope should be ~linear in the DISTINCT BUCKETS hit,
     not in corpus size.
  2. A stopword-heavy term whose postings list is a large fraction of
     the corpus: one hot term drags in O(N) postings rows for a
     near-zero idf contribution. The hot-term registry + the
     ``bm25(max_df_frac=...)`` elision dial (plans/lex_index.py) drop
     it DRIVER-side — its bucket is never probed; this probe measures
     what that buys.

Corpus: sf0.1 documents replicated 4× with disjoint ids (~240k docs),
indexed once outside the timed region. Timings are min-of-3 warm.

    python tools/lex_skew_probe.py
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
REPLICAS = 4

#: rare-ish content words present in the synthetic documents corpus
RARE_POOL = [
    "pipeline", "quality", "vector", "cluster", "metric", "sample",
    "window", "filter", "shuffle", "penguin", "gradient", "token",
    "partition", "schema", "index", "stream", "batch", "cache",
    "join", "scan", "sort", "merge", "spill", "probe", "bucket",
    "fold", "slice", "rank", "score", "weight",
]


def main() -> int:
    from pyspark.sql import SparkSession

    from converttovectordb_spark.plans.lex_index import (
        build_lexical_index,
    )

    spark = (
        SparkSession.builder.appName("lex-skew-probe")
        .master("local[32]")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text"
    )
    n_base = base.count()
    parts = [
        base.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
        )
        for i in range(REPLICAS)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    idx = build_lexical_index(
        corpus,
        tempfile.mkdtemp(prefix="lex_skew_") + "/lex",
        lowercase=True,
    )
    meta = idx.meta()
    n_docs = meta["n_docs"]
    hot = meta["hot_df"]
    hot_sorted = sorted(hot.items(), key=lambda kv: -kv[1])
    print(f"corpus: {n_docs} docs ({REPLICAS}x sf0.1, base {n_base})")
    print(
        f"hot-term registry: {len(hot)} terms; top: "
        + ", ".join(f"{t}={d}" for t, d in hot_sorted[:5])
    )

    def timed(terms, **kw) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            idx.bm25(list(terms), **kw).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    print("\n| query shape | terms | probe s | note |")
    print("|---|---|---|---|")
    for k in (3, 10, 30):
        t = timed(RARE_POOL[:k])
        print(f"| rare terms | {k} | {t:.3f} | |")

    if hot_sorted:
        hot_term, hot_df_v = hot_sorted[0]
        mix = RARE_POOL[:3] + [hot_term]
        t_full = timed(mix)
        t_elide = timed(mix, max_df_frac=0.5)
        t_rare = timed(RARE_POOL[:3])
        frac = hot_df_v / n_docs
        print(
            f"| 3 rare + hot {hot_term!r} (df {frac:.0%}) | 4 | "
            f"{t_full:.3f} | full scoring |"
        )
        print(
            f"| same, max_df_frac=0.5 | 4 | {t_elide:.3f} | hot term "
            "elided driver-side |"
        )
        print(f"| 3 rare only (floor) | 3 | {t_rare:.3f} | |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
