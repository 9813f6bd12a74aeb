"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: brute-force cosine top-k over the embeddings
    table at sf0.001 (the reference's core read path)."""
    from converttovectordb_spark.queries import q_vector_topk

    return q_vector_topk(spark, "/root/testdata/sf0.001")


def _round_number() -> int:
    """Current build round, inferred from the driver's committed
    CORRECTNESS_r{N}.json artifacts (next round = max recorded + 1).
    Used only to seed the rotation below; any failure degrades to a
    fixed order, never an error."""
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    ns = []
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            ns.append(int(m.group(1)))
    return (max(ns) + 1) if ns else 1


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All graded queries, in a per-round ROTATED order: the driver's
    correctness gate caps at 50 entries and sampled the same curated
    first-50 for three rounds running (r14 verdict #5), leaving the
    rest on builder-run parity alone. A stable shuffle keyed on the
    round number keeps each round's 50-entry window deterministic and
    reproducible while rotating WHICH queries it covers, so every
    entry is eventually independently re-verified by the driver.
    Content is unchanged — same keys, same callables, and every entry
    stays green at sf0.01 (PARITY_full.json is the full-suite record
    either way)."""
    import random

    from converttovectordb_spark.queries import QUERIES

    names = list(QUERIES)
    random.Random(_round_number()).shuffle(names)
    return {name: QUERIES[name] for name in names}


def oracle_sql() -> dict[str, str]:
    from converttovectordb_spark.queries import ORACLES

    return dict(ORACLES)
