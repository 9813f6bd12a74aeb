"""Sigstore small-files debt probe: what per-batch lexical-dedup
appends cost the artifact READ path, and what the r11 write-door fold
policy buys back.

Every lexical-dedup batch appends one parquet dir to the signature
artifact; each dir adds footer reads and task setup to the streaming
artifact scan every later batch's candidate join performs. This probe
measures the debt curve (N appends, no policy → load().count()
latency vs dir count) and the policed steady state
(auto_compact_after=8 → per-append cost including amortized folds,
post-run read latency). Run:

    python tools/sigstore_compaction_probe.py
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

N_APPENDS = 48
ROWS_PER_BATCH = 200
POLICY_K = 8


def main() -> int:
    from converttovectordb_spark.session import get_spark
    from converttovectordb_spark.sources.sigstore import (
        MinHashSignatureStore,
    )

    spark = get_spark("sigstore-compaction-probe")

    def batch(i: int):
        rows = [
            (
                f"p{i}_{j}#0",
                [i * 1000 + j + h for h in range(32)],
                j % 8,
                (i * 7919 + j) % 10_000,
                i * 100_003 + j,
            )
            for j in range(ROWS_PER_BATCH)
        ]
        return spark.createDataFrame(
            rows,
            "rid string, sig array<int>, band_id int, band_key bigint, "
            "chash bigint",
        )

    def read_latency(store) -> float:
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            store.load().count()
            best = min(best, time.time() - t0)
        return round(best, 4)

    with tempfile.TemporaryDirectory(prefix="sig_probe_") as td:
        unpoliced = MinHashSignatureStore(
            spark, f"{td}/raw", auto_compact_after=None
        )
        curve = []
        for i in range(N_APPENDS):
            unpoliced.append(batch(i), digest=f"d{i}")
            if (i + 1) in (1, 8, 16, 32, N_APPENDS):
                curve.append(
                    {
                        "dirs": len(unpoliced._batch_dirs()),
                        "read_sec": read_latency(unpoliced),
                    }
                )
        print(f"unpoliced debt curve: {curve}")

        policed = MinHashSignatureStore(
            spark, f"{td}/policed", auto_compact_after=POLICY_K
        )
        t0 = time.time()
        for i in range(N_APPENDS):
            policed.append(batch(i), digest=f"d{i}")
        per_append = round((time.time() - t0) / N_APPENDS, 4)
        print(
            f"policed (K={POLICY_K}): {per_append} s/append amortized, "
            f"{len(policed._batch_dirs())} live dirs, "
            f"read {read_latency(policed)} s"
        )
        rows_p = policed.load().count()
        rows_u = unpoliced.load().count()
        assert rows_p == rows_u == N_APPENDS * ROWS_PER_BATCH
        print(f"row parity ok: {rows_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
