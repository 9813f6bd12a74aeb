"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over
the same sf dir, then compares row count, column names, and exact
values (columns sorted by name, rows sorted by all columns). Run:

    python tools/parity_check.py [sf_dir] [query ...]

With PARITY_JSON=<path> set, also writes a per-query result map in the
driver's CORRECTNESS format — committed as PARITY_full.json each round
so out-of-window queries (the driver gate caps at 50 entries) still
have an in-repo verified record.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    import datetime
    import math

    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(round(v, 9))
        if isinstance(v, datetime.datetime):
            return v.isoformat()
        return repr(v)

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    import duckdb

    from converttovectordb_spark.queries import ORACLES, QUERIES
    from converttovectordb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    results: dict[str, dict] = {}

    def record(name, **kw):
        base = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        base.update(kw)
        results[name] = base

    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            record(name, err=f"spark error: {e}")
            print(f"FAIL {name}: spark error: {e}")
            continue
        spark_t = time.time() - t0
        if name not in ORACLES:
            record(name, rows_match=True, schema_match=True,
                   hash_match=None, spark_rows=len(srows),
                   err="rows-only (no oracle by design)")
            print(f"ok   {name}: rows-only ({len(srows)} rows, {spark_t:.1f}s)")
            continue
        try:
            rel = con.sql(ORACLES[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            record(name, spark_rows=len(srows), err=f"duckdb error: {e}")
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        record(name, spark_rows=len(srows), oracle_rows=len(drows),
               rows_match=len(srows) == len(drows),
               schema_match=sorted(scols) == sorted(dcols))
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        ns, nd = normalize(srows, scols), normalize(drows, dcols)
        if ns != nd:
            failures.append(name)
            bad = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            continue
        results[name]["hash_match"] = True
        print(f"ok   {name}: {len(srows)} rows match ({spark_t:.1f}s)")

    import json
    import os

    out_path = os.environ.get("PARITY_JSON")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump({"sf_dir": sf_dir, "results": results}, fh, indent=1)
        print(f"wrote {out_path}")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
