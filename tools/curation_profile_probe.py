"""Decompose curation_pipeline's residual wall (r15 verdict #7).

Times each pipeline prefix with the noop sink, interleaved, one
session: the gopher signal battery, + the substring-cut, + the lang
join (the pinned `cleaned` frame), and the full graded query. The
difference between consecutive prefixes is that stage's marginal cost;
if the cut + gopher together are the wall and each is evaluated once
(the r15 after-plan), the query is floor-bound and the residual gets
recorded, not re-litigated.

Usage: python tools/curation_profile_probe.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from converttovectordb_spark import pins
    from converttovectordb_spark import queries as Q
    from converttovectordb_spark.operators.dedup import cut_duplicate_spans
    from converttovectordb_spark.session import get_spark

    spark = get_spark("curation-profile")
    spark.sparkContext.setLogLevel("ERROR")

    def gopher_stage():
        docs = Q._spread(spark, Q.load(spark, sf_dir, "documents"))
        g = Q._gopher_quality_frame(docs)
        kept = (
            g.withColumn("_keep_m", F.explode(F.array(F.col("keep"))))
            .filter(F.col("_keep_m"))
            .select("doc_id")
        )
        return docs.join(kept, "doc_id", "left_semi")

    def cut_stage():
        return cut_duplicate_spans(gopher_stage(), k=8, min_occ=2).select(
            "doc_id", "n_kept"
        )

    def cleaned_stage():
        docs = Q._spread(spark, Q.load(spark, sf_dir, "documents"))
        return (
            cut_duplicate_spans(gopher_stage(), k=8, min_occ=2)
            .select("doc_id", F.col("n_kept").alias("toks"))
            .join(docs.select("doc_id", "lang"), "doc_id")
        )

    def full():
        return Q.QUERIES["curation_pipeline"](spark, sf_dir)

    stages = [
        ("gopher+filter", lambda: gopher_stage()),
        ("  +cut", lambda: cut_stage()),
        ("    +lang join", lambda: cleaned_stage()),
        ("full query", lambda: full()),
    ]

    def timed(mk) -> float:
        t0 = time.time()
        mk().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        pins.release_pins()
        return round(dt, 3)

    for name, mk in stages:
        timed(mk)  # warm
    acc = {}
    for name, mk in stages:
        acc[name] = []
    for _ in range(reps):
        for name, mk in stages:
            acc[name].append(timed(mk))
    for name, xs in acc.items():
        print(
            f"{name:16s} min {min(xs):.2f} med {statistics.median(xs):.2f} "
            f"{xs}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
