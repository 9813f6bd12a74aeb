"""Bits-tier crossover: where the sign-bit layout finally WINS.

The r13 measurement closed the matrix-tier story: Hamming prefiltering
LOSES to one BLAS GEMV at every N the float matrix admits (integer
multi-pass vs fused multiply-add — SCALING.md r13 "The consumed
dials"). The packed layout's real value is BYTES: 1 bit/dim vs 64, so
the same driver budget admits 64× the rows. This probe measures the
regime the r13 verdict asked for (next-round #1): corpora PAST the
float matrix's admission budget (200M cells → N > 520,833 at d=384),
where the serving choice is

  * distributed exact scan (cached prenormed DataFrame + knn_topk —
    the incumbent fallback; every query re-reads n×d×8 bytes of cache), vs
  * the bits tier (`BitsMatrixIndex`): driver-resident popcount scan
    over n×d/8 bytes + ONE bounded Spark job fetching the shortlist's
    full-precision rows from the on-disk sidecar (row-group-pruned
    ``IN`` filter).

Corpora are synthesized at d=384 with deterministic per-id vectors
(sin ramp — varied signs, no RNG) so the probe needs no testdata past
sf0.1's 2k rows. Also reports the matrix tier at an admitted N for the
below-budget context line, the bits tier's fill cost (sidecar write +
collect), driver-resident bytes vs the float matrix's hypothetical
bytes, and the dialed result's top-k overlap vs exact (the recall the
`binary_quant_recall` query grades at the graded SF).

    python tools/bits_tier_probe.py            # full ladder
    python tools/bits_tier_probe.py --quick    # smallest N only
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

REPS = 7
TOP_K = 5
SHORTLIST = 4 * TOP_K
DIM = 384


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
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("bits-tier-probe")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", "24g")
        # the context line Arrow-collects a ~1.5 GiB float matrix (the
        # full admission budget); the default 1g result cap rejects it
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from converttovectordb_spark.operators.search import knn_topk
    from converttovectordb_spark.operators.serving import (
        DEFAULT_MAX_CELLS,
        BitsMatrixIndex,
        DriverMatrixIndex,
        fill_serving_cache,
        point_query_mode,
    )

    import tempfile

    q = np.sin(0.7 * 123457.0 + 1.3 * np.arange(DIM)).tolist()

    # --- context line: the matrix tier at an ADMITTED N ----------------
    # (skipped under --n: single-rung re-runs want just that rung)
    if "--n" not in sys.argv:
        n_ctx = 500_000
        ctx = _mk_corpus(spark, n_ctx)
        t0 = time.perf_counter()
        midx = DriverMatrixIndex.from_dataframe(ctx)
        fill_m = time.perf_counter() - t0
        assert midx is not None
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            midx.query(q, TOP_K, id_cols=["vec_id"])
            ts.append(time.perf_counter() - t0)
        print(
            f"N={n_ctx:>9,} (admitted)  matrix GEMV        : "
            f"min {min(ts):.4f}s  (fill {fill_m:.1f}s, "
            f"{midx.matrix.nbytes / 2**20:.0f} MiB driver)"
        )
        del midx

    if "--n" in sys.argv:  # single rung, e.g. --n 2400000
        ladder = [int(sys.argv[sys.argv.index("--n") + 1])]
    elif quick:
        ladder = [600_000]
    else:
        ladder = [600_000, 1_200_000, 2_400_000]
    for n in ladder:
        assert n * DIM > DEFAULT_MAX_CELLS, "ladder must be past-budget"
        corpus = _mk_corpus(spark, n)

        # incumbent: distributed exact over a cached prenormed corpus
        from converttovectordb_spark.functions.vector import (
            with_query_norms,
        )

        t0 = time.perf_counter()
        cached, n_rows = fill_serving_cache(with_query_norms(corpus), cpus)
        fill_df = time.perf_counter() - t0

        def run_exact():
            with point_query_mode(spark):
                return knn_topk(cached, q, TOP_K, id_cols=["vec_id"]).collect()

        exact = run_exact()
        ts_e = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            run_exact()
            ts_e.append(time.perf_counter() - t0)

        # challenger: bits tier — built through the PERSISTED path
        # (same corpus pass as the ephemeral fill) so the probe also
        # prices the restart story: load_current must open the packed
        # words + row ids with zero corpus jobs
        root = os.path.join(
            tempfile.gettempdir(), f"bits_probe_root_{n}"
        )
        t0 = time.perf_counter()
        bits = BitsMatrixIndex.build_current(
            corpus, root, store_token="probe"
        )
        fill_b = time.perf_counter() - t0
        assert bits is not None, "bits admission must hold on the ladder"
        t0 = time.perf_counter()
        reloaded = BitsMatrixIndex.load_current(spark, root)
        load_b = time.perf_counter() - t0
        assert reloaded is not None and reloaded.n == n
        reloaded.release()

        def run_bits():
            with point_query_mode(spark):
                return bits.query(
                    q, TOP_K, id_cols=["vec_id"],
                    hamming_shortlist=SHORTLIST,
                )

        dialed = run_bits()
        ts_b = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            run_bits()
            ts_b.append(time.perf_counter() - t0)

        overlap = len(
            {r["vec_id"] for r in exact} & {r["vec_id"] for r in dialed}
        )
        float_mib = n * DIM * 8 / 2**20
        # resident = packed words + row ids, the WHOLE driver set
        # (r15: display payload rides the rerank fetch, not the heap)
        bits_mib = (bits.words.nbytes + bits.row_ids.nbytes) / 2**20
        print(
            f"N={n:>9,} (past budget)"
            f"\n  distributed exact : min {min(ts_e):.4f}s  "
            f"p50 {sorted(ts_e)[len(ts_e)//2]:.4f}s  (cache fill {fill_df:.1f}s)"
            f"\n  bits tier dialed  : min {min(ts_b):.4f}s  "
            f"p50 {sorted(ts_b)[len(ts_b)//2]:.4f}s  (fill {fill_b:.1f}s, "
            f"restart load {load_b:.2f}s, "
            f"{bits_mib:.0f} MiB driver vs {float_mib:.0f} MiB float)"
            f"\n  top-{TOP_K} overlap dialed∩exact: {overlap}/{TOP_K}  "
            f"(shortlist={SHORTLIST})"
        )
        bits.close()
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        cached.unpersist()

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
