"""Indexed-hybrid scaling probe: brute vs IVF+postings arms.

r12 built the scale path for BOTH hybrid arms (`search_hybrid(
use_index=True, use_lex_index=True)`): the semantic candidates come
from the IVF probe (~nprobe/C of the corpus files) and the BM25
candidates from the query terms' postings buckets — neither ranking
arm scans the corpus. This probe measures the claim end to end:
sf0.1 documents hash-embedded at d=384, replicated with disjoint ids
at [1, 4, 16]; per scale, an engine store + transactional IVF (C=16)
+ lexical index are built OUTSIDE the timed region, then the SAME
query runs through the brute door and the fully indexed door (warm,
min of 3). Expectation: brute grows with N (two full scans + a
tokenize per query), indexed stays ~flat (probe + postings buckets +
a bounded display join).

    python tools/hybrid_scale_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
MULTS = [1, 4, 16]
QUERY = "vector data pipeline quality"


def main() -> int:
    import os
    import tempfile

    from pyspark.sql import SparkSession

    from converttovectordb_spark.embeddings import hash_embedder
    from converttovectordb_spark.engine import VectorEngine

    spark = (
        SparkSession.builder.appName("hybrid-scale-probe")
        .master("local[32]")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .selectExpr("cast(doc_id as bigint) AS doc_id", "text")
    )
    emb = hash_embedder(384)

    print(
        "| mult | docs | brute hybrid sec | indexed hybrid sec "
        "(nprobe=2/16) |",
        flush=True,
    )
    print("|---|---|---|---|", flush=True)
    for mult in MULTS:
        if mult == 1:
            docs = base
        else:
            reps = spark.range(mult).select(
                F.col("id").cast("bigint").alias("_rep")
            )
            docs = base.crossJoin(F.broadcast(reps)).select(
                (F.col("doc_id") + F.col("_rep") * F.lit(10_000_000)).alias(
                    "doc_id"
                ),
                "text",
            )
        tmp = tempfile.mkdtemp(prefix=f"hybrid_probe_{mult}x_")
        eng = VectorEngine(
            spark, os.path.join(tmp, "store"), embedder=emb, dim=384
        )
        from converttovectordb_spark.embeddings import embed_column

        rows = embed_column(
            docs.selectExpr(
                "cast(doc_id as string) AS path",
                "'.txt' AS extension",
                "0 AS chunk_index",
                "1 AS total_chunks",
                "text AS content",
            ).repartition(32),
            "content",
            "embedding",
            emb,
            384,
        ).withColumn("timestamp", F.lit(0.0))
        eng.store.append(rows)
        n = eng.store.load().count()
        eng.build_index(num_clusters=16, transactional=True)
        eng.build_lex_index()

        def timed(**kw) -> float:
            eng.search_hybrid(QUERY, top_k=5, **kw).collect()  # warm
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                eng.search_hybrid(QUERY, top_k=5, **kw).collect()
                best = min(best, time.time() - t0)
            return best

        brute = timed()
        indexed = timed(use_index=True, nprobe=2, use_lex_index=True)
        print(
            f"| {mult} | {n} | {brute:.2f} | {indexed:.2f} |",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
