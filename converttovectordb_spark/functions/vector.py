"""Vector math as native Catalyst column expressions.

The reference computes cosine similarity per-row in NumPy
(mock_vector_db_api.py:37-52: dot(a,b)/(norm(a)*norm(b)), returning 0.0
when either norm is zero). Here the same math is expressed with
``zip_with`` + ``aggregate`` higher-order functions, so it runs JVM-side
inside whole-stage codegen — no Python worker, no Arrow transfer — and
Catalyst can pipeline it with the scan.

All arithmetic is float64 (the reference uses NumPy float64); inputs are
cast from ``array<float>`` storage to ``array<double>`` first so the
fold order (sequential, index 0..d-1) and precision match a NumPy/DuckDB
sequential sum closely enough for 6-decimal rounding parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a sequential left-fold in float64."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_sq_distance(a: Column, b: Column) -> Column:
    """Σ (a_i − b_i)² as a sequential left-fold in float64 — the
    squared-Euclidean used by centroid assignment and drift; one
    definition so the fold order (and thus oracle bit-parity) cannot
    drift between call sites."""
    return F.aggregate(
        F.zip_with(
            _as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    """√(Σ a_i²) in float64."""
    ad = _as_double(a)
    return F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, v: acc + v * v))


def l2_normalize(a: Column) -> Column:
    """a / ‖a‖; zero vectors pass through unchanged (norm 0 guard).

    Normalizing once and joining on dot products alone is the scale
    optimization the reference misses — it recomputes both norms for
    every (query, row) pair (mock_vector_db_api.py:48-49). At 100 TB the
    norm is computed once per row at write time, not per query.
    """
    ad = _as_double(a)
    n = l2_norm(a)
    return F.when(n == 0.0, ad).otherwise(
        F.transform(ad, lambda x: x / n)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b)/(‖a‖·‖b‖) with the reference's zero-norm→0.0 guard
    (mock_vector_db_api.py:50-51)."""
    na = l2_norm(a)
    nb = l2_norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        dot_product(a, b) / (na * nb)
    )


def cosine_to_query(emb_col_name: str, query: list[float]) -> Column:
    """``cosine_similarity(col, lit(query))`` built as ONE SQL string.

    Semantically identical to the column-API form (same float64 casts,
    same sequential fold order, same zero-norm→0.0 guard), but the whole
    expression reaches the JVM in a single ``F.expr`` parse instead of
    ~150 Py4J round-trips building lambda closures. On the warm serving
    path that construction cost dominates a cached-corpus scan (measured
    ~0.25 s → ~0.12 s per query at dim 64); at scale it is pure driver
    latency, so this matters precisely where the reference's 0.11 s
    warm-scan number lives, not on throughput.

    The query norm is folded in driver-side (``math.sqrt`` and the JVM's
    ``sqrt`` are both correctly rounded IEEE754, and ``repr(float)``
    round-trips exactly, so parity with the column-API form is bit-wise,
    which the shared DuckDB oracle checks).
    """
    import math

    q = [float(x) for x in query]
    if not all(math.isfinite(x) for x in q):
        # repr() would render these as `infD`/`nanD`, which the SQL parser
        # treats as unresolvable column names — fail clearly instead.
        raise ValueError(
            "query embedding contains non-finite values (NaN/Infinity)"
        )
    # Sequential (not fsum) accumulation: bit-matches the JVM's
    # left-fold in l2_norm, keeping the two forms interchangeable.
    sq_sum = 0.0
    for x in q:
        sq_sum += x * x
    qn = math.sqrt(sq_sum)
    if qn == 0.0:
        return F.lit(0.0)
    col = f"`{emb_col_name}`"
    q_sql = "array(" + ",".join(f"{x!r}D" for x in q) + ")"
    sq = f"aggregate({col}, 0D, (acc, v) -> acc + cast(v AS double)*cast(v AS double))"
    dot = (
        f"aggregate(zip_with(cast({col} AS array<double>), {q_sql}, "
        f"(x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    )
    return F.expr(
        f"CASE WHEN {sq} = 0D THEN 0D ELSE {dot} / (sqrt({sq}) * {qn!r}D) END"
    )


def cosine_to_query_prefix(
    emb_col_name: str, query: list[float], d: int
) -> Column:
    """``cosine_to_query`` over the first ``d`` dimensions of both
    sides — the Matryoshka prefix stage of ``knn_topk(mrl_dim=...)``.
    Same single ``F.expr`` parse, same sequential float64 fold, same
    zero-norm→0.0 guard; the corpus side is ``slice(col, 1, d)`` so
    the d-wide arithmetic never runs in the prefilter pass."""
    import math

    d = int(d)
    if d < 1:
        raise ValueError(f"prefix dimension must be >= 1, got {d}")
    q = [float(x) for x in query[:d]]
    if not all(math.isfinite(x) for x in q):
        raise ValueError(
            "query embedding contains non-finite values (NaN/Infinity)"
        )
    sq_sum = 0.0
    for x in q:
        sq_sum += x * x
    qn = math.sqrt(sq_sum)
    if qn == 0.0:
        return F.lit(0.0)
    col = f"slice(cast(`{emb_col_name}` AS array<double>), 1, {d})"
    q_sql = "array(" + ",".join(f"{x!r}D" for x in q) + ")"
    sq = f"aggregate({col}, 0D, (acc, v) -> acc + v * v)"
    dot = (
        f"aggregate(zip_with({col}, {q_sql}, "
        f"(x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    )
    return F.expr(
        f"CASE WHEN {sq} = 0D THEN 0D ELSE {dot} / (sqrt({sq}) * {qn!r}D) END"
    )


#: Column name the serving caches use for the precomputed corpus norm.
NORM_COL = "_emb_norm"


def with_query_norms(
    df, emb_col: str = "embedding", norm_col: str = NORM_COL
):
    """Serving-cache fill step: pre-cast the embedding column to
    ``array<double>`` and attach its L2 norm as ``norm_col``.

    This is SURVEY §7 phase-4's prescription made concrete: the
    reference recomputes both norms for every (query, row) pair
    (mock_vector_db_api.py:48-49); on our warm path the corpus-side
    norm (and the float→double conversion) is paid ONCE when the cache
    fills, so each query's scan does a single dot-product aggregate per
    row. The norm is computed with the EXACT expression
    ``cosine_to_query`` folds inline — same sequential fold, same
    casts — so prenormed scores are bit-identical to the cold path (the
    DuckDB oracle checks 6-decimal parity either way).

    Apply only to scan caches (server corpus cache, bench serving
    corpus); stored tables keep their compact float32 arrays.
    """
    col = f"`{emb_col}`"
    sq = (
        f"aggregate({col}, 0D, (acc, v) -> acc + cast(v AS double)"
        f"*cast(v AS double))"
    )
    return df.withColumn(norm_col, F.expr(f"sqrt({sq})")).withColumn(
        emb_col, F.col(emb_col).cast("array<double>")
    )


def cosine_to_query_prenormed(
    emb_col_name: str, norm_col_name: str, query: list[float]
) -> Column:
    """``cosine_to_query`` for corpora prepared by ``with_query_norms``:
    reads the cached corpus norm instead of re-aggregating Σv² per row,
    halving the per-row flops on the warm serving path. Same single
    ``F.expr`` parse, same zero-norm→0.0 guard, same fold order — the
    division uses the identical sqrt value the inline form would
    compute, so results are bit-identical.
    """
    import math

    q = [float(x) for x in query]
    if not all(math.isfinite(x) for x in q):
        raise ValueError(
            "query embedding contains non-finite values (NaN/Infinity)"
        )
    sq_sum = 0.0
    for x in q:
        sq_sum += x * x
    qn = math.sqrt(sq_sum)
    if qn == 0.0:
        return F.lit(0.0)
    col = f"`{emb_col_name}`"
    ncol = f"`{norm_col_name}`"
    q_sql = "array(" + ",".join(f"{x!r}D" for x in q) + ")"
    dot = (
        f"aggregate(zip_with(cast({col} AS array<double>), {q_sql}, "
        f"(x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    )
    return F.expr(
        f"CASE WHEN {ncol} = 0D THEN 0D ELSE {dot} / ({ncol} * {qn!r}D) END"
    )
