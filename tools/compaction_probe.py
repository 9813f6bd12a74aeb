"""Small-files debt probe: what per-batch commits cost the READ path,
and what the write-door auto-compaction policy buys back.

The push/stream doors commit one batch dir per call. Each live version
adds a parquet scan branch to every load() — manifest reads, footer
reads, per-dir task setup — so read latency grows with the commit
count until someone compacts. ``auto_compact_after=K`` bounds live
versions at K; this probe measures both sides:

  1. N tiny appends with NO policy → load().count() latency vs live
     version count (the debt curve);
  2. the same N appends with auto_compact_after=8 → per-append cost
     including the amortized rewrites, and the post-run read latency.

    python tools/compaction_probe.py
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")


N_APPENDS = 64
ROWS_PER_BATCH = 50
POLICY_K = 8


def main() -> int:
    from pyspark.sql import SparkSession

    from converttovectordb_spark.sources.store import (
        TransactionalDocumentStore,
    )

    spark = (
        SparkSession.builder.appName("compaction-probe")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def mk_batch(tag: int):
        return spark.createDataFrame(
            [
                (f"{tag}/f{i}.txt", f"doc {tag}-{i} " * 20, [1.0, 2.0])
                for i in range(ROWS_PER_BATCH)
            ],
            "path string, content string, embedding array<float>",
        )

    def read_ms(store) -> float:
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            store.load(require_embedding=False).count()
            best = min(best, time.time() - t0)
        return best * 1000

    with tempfile.TemporaryDirectory(prefix="cprobe_") as tmp:
        # -- no policy: the debt curve ---------------------------------
        plain = TransactionalDocumentStore(spark, f"{tmp}/plain")
        print("| live versions | load().count() ms |", flush=True)
        print("|---|---|", flush=True)
        for i in range(N_APPENDS):
            plain.append(mk_batch(i))
            if (i + 1) in (1, 8, 16, 32, 64):
                print(
                    f"| {i + 1} | {read_ms(plain):.0f} |",
                    flush=True,
                )

        # -- policy armed: amortized write cost + flat reads -----------
        pol = TransactionalDocumentStore(
            spark, f"{tmp}/pol", auto_compact_after=POLICY_K
        )
        t0 = time.time()
        for i in range(N_APPENDS):
            pol.append(mk_batch(i))
        pol_total = time.time() - t0
        live = len(pol._live_versions(pol._versions()))
        print(
            f"\npolicy K={POLICY_K}: {N_APPENDS} appends in "
            f"{pol_total:.1f}s ({pol_total / N_APPENDS * 1000:.0f} "
            f"ms/append amortized), live versions now {live}, "
            f"read {read_ms(pol):.0f} ms",
            flush=True,
        )
        t0 = time.time()
        for i in range(N_APPENDS):
            plain.append(mk_batch(1000 + i))
        plain_total = time.time() - t0
        print(
            f"no policy: {N_APPENDS} more appends in {plain_total:.1f}s "
            f"({plain_total / N_APPENDS * 1000:.0f} ms/append), live "
            f"versions {len(plain._live_versions(plain._versions()))}, "
            f"read {read_ms(plain):.0f} ms",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
