"""Product-quantization (PQ) codec for embedding columns.

The 100 TB memory story for vector search: a d=384 float32 embedding is
1,536 bytes/row; its PQ code at m=8 subspaces × k=16 centroids is 8
bytes — a ~200× shrink (64-dim test vectors: 256 B → 8 B, 32×). The
compressed corpus of a 100 TB store fits in executor memory, so
asymmetric-distance (ADC) scoring scans codes instead of vectors and
only the top candidates touch full-precision data for rerank. This is
the IVFADC decomposition from the FAISS literature (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011),
expressed Spark-first:

* TRAIN (offline, once): one seeded k-means per subspace over the
  L2-normalized corpus' subvector slices — m small `pyspark.ml` fits.
* ENCODE (offline, once): m model.transform passes append one code
  column each; codes pack into a single ``array<int>`` column. No
  crossJoin — assignment is the model's O(N·k) pass per subspace.
* ADC SCORE (query time): the query builds an m×k lookup table of
  subvector·centroid dots DRIVER-side (tiny), inlined as a literal
  array into ONE codegen expression — per row the score is m array
  lookups + m adds, no vector arithmetic at all. Cosine semantics come
  from normalizing both sides: score ≈ dot(q̂, reconstruction(d̂)).

Reference parity note: the reference has no compression or index at
all (brute NumPy scan, mock_vector_db_api.py:274-279); PQ is part of
the engine's scale surface, correctness-gated by the `pq_recall` query
whose oracle re-runs ADC from the exported codebooks/codes in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from converttovectordb_spark.functions.vector import l2_normalize


def train_pq(
    docs: DataFrame,
    *,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    seed: int = 7,
    max_iter: int = 20,
    normalize: bool = True,
) -> list:
    """Train one k-means per subspace; returns the list of m fitted
    pyspark.ml KMeans models (driver-held, build-time only).

    The embedding dimension must divide evenly into ``m`` subspaces
    (checked against the first row)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    first = docs.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("cannot train PQ on an empty corpus")
    d = int(first["d"])
    if d % m != 0:
        raise ValueError(f"dimension {d} is not divisible into m={m} subspaces")
    # Clamp k to the corpus size: Spark 4.1's block-mode KMeans
    # aggregator can AIOOBE when k exceeds the row count (observed on a
    # 3-row corpus with k=4), and a codebook with more centroids than
    # points is meaningless anyway. One count, build-time only (the
    # engine builds train over an already-persisted frame); a clamped
    # codebook stays self-consistent downstream — codes, LUT width,
    # and retrain family inference all derive from the trained centers.
    n_rows = docs.count()
    k_eff = max(1, min(int(k), int(n_rows)))
    if k_eff < k:
        import warnings

        warnings.warn(
            f"pq_k={k} exceeds the corpus size ({n_rows} rows); "
            f"training {k_eff} centroids per subspace instead",
            RuntimeWarning,
            stacklevel=2,
        )
    ds = d // m
    vec = (
        l2_normalize(F.col(vec_col)) if normalize
        else F.col(vec_col).cast("array<double>")
    )
    base = docs.select(vec.alias("_v"))
    models = []
    for s in range(m):
        feat = base.select(
            array_to_vector(F.slice(F.col("_v"), s * ds + 1, ds)).alias(
                "_features"
            )
        )
        models.append(
            KMeans(
                k=k_eff, seed=seed + s, maxIter=max_iter,
                featuresCol="_features",
            ).fit(feat)
        )
    return models


def codebooks_df(spark, models) -> DataFrame:
    """Flatten trained models into DataFrame(sub, code, centroid) —
    m×k rows, the broadcast-/export-sized representation."""
    rows = [
        (s, c, [float(x) for x in center])
        for s, model in enumerate(models)
        for c, center in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(
        rows, "sub int, code int, centroid array<double>"
    )


def pq_encode(
    docs: DataFrame,
    models,
    *,
    vec_col: str = "embedding",
    codes_col: str = "codes",
    normalize: bool = True,
) -> DataFrame:
    """Append ``codes_col`` (array<int>, length m): each subvector's
    nearest-centroid id. m model.transform passes — each is the ml
    assignment pass, linear in N, no join or explode."""
    from pyspark.ml.functions import array_to_vector

    m = len(models)
    d = models[0].clusterCenters()[0].shape[0] * m
    ds = d // m
    vec = (
        l2_normalize(F.col(vec_col)) if normalize
        else F.col(vec_col).cast("array<double>")
    )
    out = docs.withColumn("_vn", vec)
    for s, model in enumerate(models):
        out = (
            model.copy()
            .setFeaturesCol("_features")
            .setPredictionCol(f"_code_{s}")
            .transform(
                out.withColumn(
                    "_features",
                    array_to_vector(F.slice(F.col("_vn"), s * ds + 1, ds)),
                )
            )
            .drop("_features")
        )
    return out.withColumn(
        codes_col, F.array(*[F.col(f"_code_{s}") for s in range(m)])
    ).drop("_vn", *[f"_code_{s}" for s in range(m)])


def adc_lut(query_vector, codebooks_rows, *, m: int, k: int) -> list[float]:
    """Driver-side ADC lookup table: lut[s*k + c] = dot(q_sub_s,
    centroid(s, c)) over the L2-normalized query.

    The dot is a SEQUENTIAL left-to-right float64 sum — deliberately
    NOT numpy's pairwise dot — so it folds in exactly the order the
    DuckDB oracle's ``list_sum(list_transform(...))`` does; scores then
    match bit-for-bit and top-k tie behavior is identical."""
    import math

    q = [float(x) for x in query_vector]
    n = math.sqrt(sum(x * x for x in q))
    if n != 0.0:
        q = [x / n for x in q]
    ds = len(q) // m
    lut = [0.0] * (m * k)
    for r in codebooks_rows:
        s, c, cent = r["sub"], r["code"], r["centroid"]
        acc = 0.0
        for i in range(ds):
            acc += q[s * ds + i] * float(cent[i])
        lut[s * k + c] = acc
    return lut


def adc_score(lut: list[float], k: int, codes_col: str = "codes") -> Column:
    """Codegen ADC score expression: Σ_s lut[s*k + codes[s]].

    The lut inlines as a literal array; per row this is m element_at
    lookups folded left-to-right — no per-row vector math, which is
    the point of PQ at scale."""
    lut_arr = F.array(*[F.lit(float(v)) for v in lut])
    return F.aggregate(
        F.transform(
            F.col(codes_col),
            lambda c, i: F.element_at(lut_arr, c + i * F.lit(k) + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode_frozen(
    docs: DataFrame,
    codebooks: DataFrame,
    *,
    vec_col: str = "embedding",
    codes_col: str = "codes",
    normalize: bool = True,
) -> DataFrame:
    """Encode against FROZEN, already-persisted codebooks — the
    incremental-maintenance twin of `pq_encode` (which needs the
    driver-held trained models and exists for build time only).

    The m×k codebook is collected driver-side (tiny, the same move
    `adc_lut` makes) and inlined as ONE literal codegen expression:
    each row's m codes are m argmins over k explicit squared-distance
    sums written term-by-term over ``element_at`` calls (ties → lowest
    code id, matching the ml KMeans assignment rule). Same sequential
    left-to-right accumulation as the original fold, so outputs are
    bit-identical — but it runs inside whole-stage codegen at
    microseconds/row, where the earlier nested-HOF-over-packed-structs
    formulation was measured at ~9 ms/row (the per-row constant
    re-evaluation pathology SCALING.md documents for literal arrays in
    Catalyst lambdas; an append epoch of 2,400 rows dropped from
    22.4 s to sub-second after this rewrite).
    """
    rows = codebooks.collect()
    by_sub: dict = {}
    for r in rows:
        by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["code"]), [float(x) for x in r["centroid"]])
        )
    if not by_sub:
        raise ValueError("empty codebooks")
    ds = len(next(iter(by_sub.values()))[0][1])
    vec = (
        l2_normalize(F.col(vec_col))
        if normalize
        else F.col(vec_col).cast("array<double>")
    )
    sub_exprs = []
    for s in sorted(by_sub):
        cands = []
        for code, cent in sorted(by_sub[s]):
            # parenthesize the literal: a negative w would otherwise
            # render `x--0.05D`, and `--` starts a SQL line comment
            terms = "+".join(
                f"(element_at(_vn,{s * ds + j + 1})-({w!r}D))"
                f"*(element_at(_vn,{s * ds + j + 1})-({w!r}D))"
                for j, w in enumerate(cent)
            )
            cands.append(f"struct({terms} AS d, {code} AS code)")
        sub_exprs.append(f"array_min(array({','.join(cands)})).code")
    return (
        docs.withColumn("_vn", vec)
        .withColumn(
            codes_col, F.expr("array(" + ",".join(sub_exprs) + ")")
        )
        .drop("_vn")
    )
