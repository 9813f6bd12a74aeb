"""Benchmark harness — runs the engine's query suite end-to-end.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default 32).

Each query is materialized with a `noop` write (full execution, no
driver collect bottleneck) — the honest measure of plan cost.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from converttovectordb_spark.queries import QUERIES
    from converttovectordb_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM/codegen paths so the first timed query doesn't absorb
    # session startup cost.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Warm table metadata (file listing + parquet footers) the same way
    # for every table, so per-query timings measure the QUERY, not
    # whichever query happens to touch a table first. (Data pages are
    # NOT cached — each query still scans.)
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").schema
        except Exception:
            pass

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # keep the bench alive; report the failure
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            timings[name] = -1.0
            continue
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"bench: {name} {dt:.2f}s", file=sys.stderr)
        # drop any intermediates the query materialized (persisted
        # signature tables etc.) so later timings see a flat heap
        spark.catalog.clearCache()

    # Reference-comparable headline numbers (BASELINE.md):
    #  * knn_scan_warm_sec — brute-force cosine top-k over the CACHED
    #    corpus (the serving path; reference: 0.11 s at N=13.5k, O(N)).
    #  * ingest_chunks_per_sec — chunk + hash-embed + write throughput
    #    (reference: ~32-74 chunks/s on the embedding-dominated path).
    from pyspark.sql import functions as F

    from converttovectordb_spark.operators.search import knn_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_vecs = emb.count()
    probe = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    probe = [float(x) for x in probe]

    def knn_once() -> None:
        # The PRODUCTION serving operator (threshold-after-limit and
        # all): the headline number measures the path users hit.
        knn_topk(
            emb, probe, 5, id_cols=["vec_id"], expected_dim=len(probe)
        ).collect()

    knn_once()  # warm
    knn_warm = None
    for _ in range(3):  # min-of-3: the serving-path number, noise-robust
        t0 = time.time()
        knn_once()
        knn_warm = min(knn_warm or 1e9, round(time.time() - t0, 4))
    emb.unpersist()

    import tempfile

    from converttovectordb_spark.embeddings import embed_column
    from converttovectordb_spark.sources.chunker import explode_chunks

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("cast(doc_id as string) AS path", "text AS content")
        .repartition(int(cpus))
    )
    # Warm the Python/Arrow workers first (one tiny embed pass): the
    # measured number is steady-state pipeline throughput, matching the
    # reference's long-running-process condition — not worker spin-up.
    with tempfile.TemporaryDirectory(prefix="bench_warm_") as tmp:
        embed_column(
            docs.limit(512), "content", "embedding", None, 64
        ).write.mode("overwrite").parquet(f"{tmp}/warm")
    t0 = time.time()
    with tempfile.TemporaryDirectory(prefix="bench_ingest_") as tmp:
        chunks = explode_chunks(docs, chunk_size=200, overlap=40)
        embedded = embed_column(chunks, "content", "embedding", None, 64)
        embedded.write.mode("overwrite").parquet(f"{tmp}/store")
        n_chunks = spark.read.parquet(f"{tmp}/store").count()
    ingest_sec = time.time() - t0
    chunks_per_sec = round(n_chunks / ingest_sec, 1)

    print(
        json.dumps(
            {
                "metric": "query_suite_total_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reference_comparison": {
                    "knn_scan_warm_sec": knn_warm,
                    "knn_corpus_size": n_vecs,
                    "ingest_chunks_per_sec": chunks_per_sec,
                    "ingest_n_chunks": n_chunks,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
