"""Streaming retrain stall probe (retrain_index_if_drifted in-epoch).

r12 (VERDICT #5): `stream_ingest_indexed(retrain_shift_threshold=t)`
runs the drift check after every epoch's commits and, past the
threshold, executes the REBUILD inside the micro-batch — the stream
stalls for the full rebuild duration. This probe measures, at sf0.1
scale on local[32]:

  1. the per-epoch baseline (store.append + index.append of a
     batch-sized epoch, txn-committed),
  2. the per-epoch drift CHECK (index_drift_report + collect — paid
     every epoch while armed),
  3. the no-op retrain call (check under threshold),
  4. the full in-epoch rebuild-and-swap STALL (drift injected past the
     threshold: kmeans retrain + corpus rewrite + txn carry + publish).

Output feeds SCALING.md's policy paragraph: the stall is a scheduled
maintenance pause, linear in corpus size, and epochs queue behind it
(availableNow/maxFilesPerTrigger bound the backlog); staging the
rebuild async would trade that pause for double-writes during the
overlap window.

    python tools/retrain_stall_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
EPOCH_ROWS = 500


def main() -> int:
    import os
    import tempfile

    from pyspark.sql import SparkSession

    from converttovectordb_spark.embeddings import embed_column
    from converttovectordb_spark.plans.ivf_index import (
        TransactionalIVFIndex,
        index_drift_report,
    )
    from converttovectordb_spark.sources.store import (
        TransactionalDocumentStore,
    )
    from converttovectordb_spark.streaming.jobs import (
        retrain_index_if_drifted,
    )

    spark = (
        SparkSession.builder.appName("retrain-stall-probe")
        .master("local[32]")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    tmp = tempfile.mkdtemp(prefix="retrain_stall_")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .selectExpr(
            "cast(doc_id as string) AS path",
            "'.txt' AS extension",
            "0 AS chunk_index",
            "1 AS total_chunks",
            "text AS content",
        )
        .repartition(32)
    )
    embedded = embed_column(docs, "content", "embedding", None, 64)
    embedded = embedded.withColumn("timestamp", F.lit(0.0))
    store = TransactionalDocumentStore(spark, os.path.join(tmp, "store"))
    store.append(embedded)
    n = store.load().count()

    base = os.path.join(tmp, "tivf")
    os.makedirs(base)
    first_dir = os.path.join(base, "v0")
    t0 = time.time()
    index = TransactionalIVFIndex.build(
        store.load(), first_dir, num_clusters=16
    )
    TransactionalIVFIndex.publish_current(base, first_dir)
    build_sec = time.time() - t0
    print(f"corpus: {n} docs dim=64; initial build {build_sec:.2f}s")

    # 1. baseline epoch: store.append + index.append, txn-committed
    batch = embedded.limit(EPOCH_ROWS).withColumn(
        "path", F.concat(F.lit("epoch1/"), F.col("path"))
    ).persist()
    batch.count()
    t0 = time.time()
    store.append(batch, txn_id="probe-e1")
    index.append(batch, txn_id="probe-e1", materialized=True)
    epoch_sec = time.time() - t0
    batch.unpersist()

    # 2. per-epoch drift check (paid every epoch while armed)
    t0 = time.time()
    report = index_drift_report(index, store.load()).collect()
    check_sec = time.time() - t0
    max_shift = max(
        float(r["centroid_shift"])
        for r in report
        if r["centroid_shift"] is not None
    )

    # 3. armed but under threshold: check + no-op
    t0 = time.time()
    same = retrain_index_if_drifted(store, index, max_shift + 1.0)
    noop_sec = time.time() - t0
    assert same.path == index.path

    # 4. drift injected past the threshold → full in-epoch stall
    drift = embedded.limit(EPOCH_ROWS * 4).select(
        F.concat(F.lit("drift/"), F.col("path")).alias("path"),
        "extension",
        "chunk_index",
        "total_chunks",
        "content",
        F.transform(
            F.col("embedding"), lambda x: x * F.lit(0.0) + F.lit(7.5)
        ).cast("array<float>").alias("embedding"),
        "timestamp",
    ).persist()
    drift.count()
    store.append(drift, txn_id="probe-drift")
    index.append(drift, txn_id="probe-drift", materialized=True)
    drift.unpersist()
    t0 = time.time()
    new_index = retrain_index_if_drifted(store, index, max_shift + 0.01)
    stall_sec = time.time() - t0
    assert new_index.path != index.path

    # r12: a retrain of an index that carried a measured recall curve
    # additionally RE-MEASURES it before publish — price that term
    # separately (it adds to the stall only for curve-carrying indexes)
    from converttovectordb_spark.plans.ivf_index import (
        measure_recall_curve,
    )

    t0 = time.time()
    measure_recall_curve(
        new_index, top_k=5, sample=16, doc_id_col="path"
    )
    curve_sec = time.time() - t0

    print(f"| epoch commit ({EPOCH_ROWS} rows) | {epoch_sec:.2f} s |")
    print(f"| drift check (every armed epoch) | {check_sec:.2f} s |")
    print(f"| armed no-op retrain call | {noop_sec:.2f} s |")
    print(
        f"| in-epoch rebuild-and-swap STALL ({store.load().count()} "
        f"rows) | {stall_sec:.2f} s |"
    )
    print(
        f"| + recall-curve re-measure (curve-carrying indexes only) "
        f"| {curve_sec:.2f} s |"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
