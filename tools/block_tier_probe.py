"""Distributed point-query floor: is a Python-RDD block plan faster?

CLOSED NEGATIVE (r13, SCALING.md "Distributed point-query floor,
closed"). The cached-DataFrame fallback straddled the 2× bar for three
rounds; the r12 verdict asked for one more run at the floor via a
single-action mapPartitions-side-heap + driver-merge plan. This probe
builds that plan two ways on the reference-matched corpus (N=13,515,
d=384) and measures, interleaved, min of 12:

  1. cached-DF `knn_topk` (production: prenormed cache, AQE off,
     compute-sized partitions) — the incumbent;
  2. numpy-block RDD: per-partition (matrix, norms, payload) blocks
     cached as a Python RDD, one job of per-block BLAS + boundary-tie
     top-k, driver merge;
  3. broadcast-cached blocks: same scoring, blocks shipped once as
     per-partition broadcasts (reused Python workers cache `.value`
     in-process), job = tiny index RDD;
  4. the bare K-task Python-RDD job (floor of 2/3 with no work at all).

Measured (this host, min/p50 of 12): DF 0.202/0.268 s; block RDD
0.219/0.234 s (every query re-fetches + unpickles the cached blocks
JVM→Python); broadcast-cached 0.434/0.787 s; bare Python job
0.349/0.542 s. The BARE Python-RDD job costs more than the ENTIRE
DataFrame query — Python task orchestration (worker round-trips,
closure pickling) is a higher floor than the JVM DataFrame job it was
meant to undercut, so no Python-side physical plan can win here. The
DF plan's own decomposition (SCALING.md r9: ~0.08 s job launch +
~0.05 s scoring fold) stands as final; the driver-matrix tier
(~0.0006 s at this N) is the answer below its admission budget.

    python tools/block_tier_probe.py  [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

REPS = 12


def _rows_to_block(embedding_col):
    def fn(it):
        rows = list(it)
        if not rows:
            return
        dim = len(rows[0][embedding_col])
        m = np.empty((len(rows), dim), dtype=np.float64)
        ids = []
        for i, r in enumerate(rows):
            m[i] = r[embedding_col]
            ids.append(r["vec_id"])
        yield (m, np.sqrt(np.einsum("ij,ij->i", m, m)), ids)

    return fn


def _block_topk(q, top_k):
    qn = math.sqrt(float(np.dot(q, q)))

    def fn(it):
        for m, norms, ids in it:
            with np.errstate(divide="ignore", invalid="ignore"):
                scores = np.where(norms == 0.0, 0.0, (m @ q) / (norms * qn))
            k = min(top_k, len(scores))
            part = np.argpartition(-scores, k - 1)[:k]
            kth = scores[part].min()
            for i in np.nonzero(scores >= kth)[0].tolist():
                yield (float(scores[i]), ids[i])

    return fn


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from converttovectordb_spark.embeddings import hash_embedder
    from converttovectordb_spark.operators.search import knn_topk
    from converttovectordb_spark.operators.serving import (
        fill_serving_cache,
        point_query_mode,
    )
    from converttovectordb_spark.session import get_spark
    from tools.matched_corpus import matched_reference_corpus

    spark = get_spark("block-tier-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = matched_reference_corpus(spark, sf_dir, int(cpus))
    cached, n = fill_serving_cache(base, int(cpus))
    blocks_rdd = cached.rdd.mapPartitions(_rows_to_block("embedding"))
    blocks_rdd = blocks_rdd.cache()
    K = blocks_rdd.count()
    blocks_local = blocks_rdd.collect()
    bcs = [sc.broadcast(b) for b in blocks_local]
    idx_rdd = sc.parallelize(range(K), K).cache()
    idx_rdd.count()
    print(f"matched corpus: n={n}, blocks={K}")

    q = np.asarray(
        hash_embedder(384)(["vector data pipeline quality"])[0],
        dtype=np.float64,
    )
    top_k = 5
    qn = math.sqrt(float(np.dot(q, q)))

    def bc_job(i):
        m, norms, ids = bcs[i].value
        with np.errstate(divide="ignore", invalid="ignore"):
            scores = np.where(norms == 0.0, 0.0, (m @ q) / (norms * qn))
        k = min(top_k, len(scores))
        part = np.argpartition(-scores, k - 1)[:k]
        kth = scores[part].min()
        return [
            (float(scores[i2]), ids[i2])
            for i2 in np.nonzero(scores >= kth)[0].tolist()
        ]

    def run_df():
        with point_query_mode(spark):
            return knn_topk(
                cached, list(q), top_k, id_cols=["vec_id"]
            ).collect()

    def run_blocks():
        cands = blocks_rdd.mapPartitions(_block_topk(q, top_k)).collect()
        return sorted(cands, key=lambda sr: (-sr[0], sr[1]))[:top_k]

    def run_bc():
        cands = [c for part in idx_rdd.map(bc_job).collect() for c in part]
        return sorted(cands, key=lambda sr: (-sr[0], sr[1]))[:top_k]

    def run_bare():
        return idx_rdd.map(lambda i: i).collect()

    # warm + parity
    a, b, c = run_df(), run_blocks(), run_bc()
    assert [r["vec_id"] for r in a] == [i for _, i in b] == [
        i for _, i in c
    ], "plans disagree"
    run_bare()
    print("result parity: OK")

    times = {k: [] for k in ("df", "blocks", "bcast", "bare")}
    for _ in range(REPS):
        for name, fn in (
            ("df", run_df), ("blocks", run_blocks),
            ("bcast", run_bc), ("bare", run_bare),
        ):
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)

    for name, label in (
        ("df", "cached-DF knn_topk (prod)"),
        ("blocks", "numpy-block RDD"),
        ("bcast", "broadcast-cached blocks"),
        ("bare", "bare K-task python job"),
    ):
        ts = sorted(times[name])
        print(
            f"{label:26s}: min {ts[0]:.4f}  p50 {ts[len(ts)//2]:.4f}  "
            f"max {ts[-1]:.4f}"
        )
    print("reference baseline        : 0.1100 (vector_db_api.log:736-738)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
