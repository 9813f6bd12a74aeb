"""Deduplication operators for LLM-corpus curation.

Not present in the reference (it has no dedup at all — SURVEY §2.5);
these are the standard large-corpus curation operators, each designed
around Spark's shuffle model:

  exact_dedup       — md5(content) groupBy; one shuffle on the hash.
  jaccard_neardup   — word-shingle INVERTED-INDEX join (never a cross
                      join): pairs only form where a shingle is shared,
                      so cost ~ Σ_shingle df(shingle)² instead of N².
                      Hot shingles are capped (stop-shingle pruning) —
                      the classic skew guard at corpus scale.
  minhash_lsh_neardup — MinHash signatures (min over md5(seed‖shingle))
                      banded into buckets; candidate pairs only within
                      a bucket, verified by true Jaccard. The 100 TB
                      path: cost is linear in N + bucket collisions.
  simhash           — 64-bit SimHash fingerprint per doc from token
                      hashes; near-dup = small Hamming distance.
  embedding_neardup — cosine near-duplicate pairs over an embedding
                      column via the normalized dot-product join.

The md5-based hashing is deliberate: both Spark and DuckDB expose
identical md5 → substring → hex-to-int primitives, so every operator
here has a bit-exact ANSI-SQL oracle formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from converttovectordb_spark.functions.text import tokens, word_shingles
from converttovectordb_spark.functions.vector import dot_product, l2_normalize


def _materialize(df: DataFrame) -> DataFrame:
    """Persist + force a small intermediate that multiple join sides
    re-derive (signatures, shingles). Without this, Spark re-executes
    the whole upstream pipeline once per reference — e.g. a self-join
    recomputes the 60-aggregate SimHash job for BOTH sides. At cluster
    scale the equivalent move is writing the signature table out once
    and joining against the materialized copy."""
    df = df.persist()
    df.count()
    return df


def _exploded_shingles(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, shingle) rows, one per DISTINCT word n-gram per document.

    Tokens are materialized as a projected column FIRST: referencing the
    tokenize expression inside the shingle lambda would re-run the regex
    split once per shingle position (whole-stage codegen does not CSE
    inside higher-order-function lambdas) — a ~100× blowup on long docs.
    """
    toked = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    t = F.col("_toks")
    shingles = F.when(
        F.size(t) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + k + 1).cast("int")) for k in range(n)]
            ),
        )
    )
    # explode_OUTER + null filter: plain explode makes Catalyst infer a
    # size() > 0 filter and push the WHOLE shingle expression into the
    # scan stage (see duplicate_spans; measured 7.8 s -> ~1 s at sf0.1)
    return toked.select(
        F.col(id_col),
        F.explode_outer(F.array_distinct(shingles)).alias("shingle"),
    ).filter(F.col("shingle").isNotNull())


def exact_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep the lowest-id row per exact content hash.

    One row_number window partitioned by md5(text) — a single hash
    shuffle on a 32-byte key, independent of document size. At scale
    prefer this over groupBy+join-back (one shuffle, not two).
    """
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dup_stats(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group duplication report: rows, distinct contents, dup count."""
    return (
        docs.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5(F.col(text_col))).alias("n_unique"),
            (
                F.count(F.lit(1)) - F.countDistinct(F.md5(F.col(text_col)))
            ).alias("n_dups"),
        )
    )


def jaccard_neardup_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs by word-shingle Jaccard similarity.

    Inverted-index join: explode distinct shingles, self-join on the
    shingle value, count common shingles per (a,b) pair, then
    jaccard = common / (|A| + |B| - common), keep >= threshold, a < b.

    ``max_shingle_df`` drops shingles occurring in more than that many
    docs before the join — the skew/stop-shingle guard: one shingle in
    every doc would otherwise create an N² partition.
    """
    # NOT materialized: the a/b self-join sides read the same
    # repartition Exchange (ReuseExchange), so recompute is ~free and
    # a persist here measurably loses to it (cache round-trip + extra
    # count job > one cheap explode).
    sh = _exploded_shingles(docs, id_col, text_col, shingle_words)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).filter(
            F.col("df") > max_shingle_df
        )
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    # Explicit hash-partition on the join key: the shingle rows are few
    # BYTES but the pair fanout downstream is CPU-heavy — AQE's
    # size-based coalescing would collapse this to one task otherwise.
    # User-specified repartition counts are preserved by AQE.
    par = sh.sparkSession.sparkContext.defaultParallelism
    sh = sh.repartition(par, F.col("shingle"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _minhash_sig(shingle_col, seed: int):
    """One MinHash component: lexicographic min of md5(seed‖shingle).

    Using the md5 hex string itself as the hash keeps the operator
    bit-identical between Spark and any ANSI-SQL oracle engine.
    """
    return F.min(F.md5(F.concat(F.lit(f"s{seed}|"), shingle_col)))


def _band_key_array(num_hashes: int, bands: int):
    """Per-band md5 keys as ONE array column over h0..h{n-1} — a
    per-band union would re-execute the whole signature pipeline once
    per band per join side."""
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"h{i}")
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )


def _minhash_signature_agg(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_words: int,
    num_hashes: int,
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-doc h0..h{n-1} MinHash components. Documents with fewer than
    ``shingle_words`` tokens produce NO row (no shingles → no
    signature → never a candidate) — the minhash family's documented
    blind spot for very short texts."""
    sh = (
        _shingles
        if _shingles is not None
        else _exploded_shingles(docs, id_col, text_col, shingle_words)
    )
    return sh.groupBy(id_col).agg(
        *[
            _minhash_sig(F.col("shingle"), i).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )


def minhash_band_keys(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, band_id, band_key) rows — the LSH candidate surface: two
    docs are candidates iff they share a (band_id, band_key) pair.
    `bands` tiny md5-string rows per doc; the only shuffle is the
    per-doc signature groupBy, linear in the corpus."""
    sig = _minhash_signature_agg(
        docs, id_col, text_col, shingle_words, num_hashes, _shingles
    )
    return sig.select(
        F.col(id_col),
        F.posexplode(_band_key_array(num_hashes, bands)).alias(
            "band_id", "band_key"
        ),
    )


def minhash_signature_rows(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, sig, band_id, band_key) rows — the PERSISTABLE signature
    surface for dedup-on-arrival: band keys drive the candidate join
    and the full component array ``sig`` lets a consumer decide on the
    ESTIMATED Jaccard (matching components / num_hashes) without ever
    touching the source text again. The sig array repeats per band row
    (storage is `bands` × ~0.5 KB per doc — corpus-linear but tiny
    next to the corpus itself)."""
    sig = _minhash_signature_agg(
        docs, id_col, text_col, shingle_words, num_hashes
    )
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
        F.posexplode(_band_key_array(num_hashes, bands)).alias(
            "band_id", "band_key"
        ),
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: documents sharing at least one band of
    identical MinHash components.

    num_hashes/bands rows per doc after banding — the only shuffle is
    the groupBy on (band_id, band_key), linear in N. With r = hashes
    per band = num_hashes/bands, P(candidate) = 1-(1-j^r)^bands.
    ``_shingles`` lets a caller pass an already-materialized shingle
    DataFrame so the explode isn't recomputed.
    """
    banded = minhash_band_keys(
        docs,
        id_col=id_col,
        text_col=text_col,
        shingle_words=shingle_words,
        num_hashes=num_hashes,
        bands=bands,
        _shingles=_shingles,
    )
    left = banded.select(
        F.col(id_col).alias("a"), "band_id", "band_key"
    )
    right = banded.select(
        F.col(id_col).alias("b"), "band_id", "band_key"
    )
    return (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_verify_jaccard(
    docs: DataFrame,
    cands: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs (a, b).

    Shingles are computed ONLY for documents that appear in some
    candidate pair — the verification cost is proportional to the
    candidate set, not the corpus, which is what lets a persisted
    candidate table (built once at ingest) turn the whole near-dup
    query into candidate-sized work.

    ``shingles``: optionally pass the candidate docs' exploded-shingle
    frame (``_exploded_shingles`` output — (id_col, shingle), distinct
    per doc) when the caller already has it materialized; the three
    consumers below (both join sides + the size aggregate) then share
    one computation instead of re-shingling per consumer. When it is
    passed, ``docs``/``text_col``/``shingle_words`` are IGNORED — the
    caller vouches that the frame was shingled with the same
    parameters and covers every id in ``cands`` (a stale or
    differently-parameterized frame yields wrong jaccard values or
    silently dropped pairs); the column contract is asserted here."""
    if shingles is not None:
        missing = {id_col, "shingle"} - set(shingles.columns)
        if missing:
            raise ValueError(
                "shingles= frame must carry columns "
                f"({id_col!r}, 'shingle'); missing {sorted(missing)}"
            )
        sh = shingles
    else:
        ids = (
            cands.select(F.col("a").alias(id_col))
            .union(cands.select(F.col("b").alias(id_col)))
            .distinct()
        )
        cdocs = docs.join(ids, id_col, "inner")
        sh = _exploded_shingles(cdocs, id_col, text_col, shingle_words)
    sa = sh.select(F.col(id_col).alias("a"), F.col("shingle"))
    sb = sh.select(F.col(id_col).alias("b"), F.col("shingle"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        cands.join(sa, "a")
        .join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("n_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("n_b")), "b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def jaccard_verify_cross(
    docs_a: DataFrame,
    docs_b: DataFrame,
    cands: DataFrame,
    *,
    text_col: str = "text",
    shingle_words: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard verification of CROSS-corpus candidate pairs:
    ``cands`` is (a, b) where ``a`` keys ``docs_a`` (column ``a``) and
    ``b`` keys ``docs_b`` (column ``b``) — the two-sided twin of
    `minhash_verify_jaccard` for batch-vs-committed-corpus checks.
    Shingles are computed only for rows that appear in a candidate
    pair, so the cost is candidate-sized on both sides."""
    a_ids = cands.select("a").distinct()
    b_ids = cands.select("b").distinct()
    sh_a = _exploded_shingles(
        docs_a.join(a_ids, "a", "left_semi"), "a", text_col, shingle_words
    )
    sh_b = _exploded_shingles(
        docs_b.join(b_ids, "b", "left_semi"), "b", text_col, shingle_words
    )
    size_a = sh_a.groupBy("a").agg(F.count(F.lit(1)).alias("n_a"))
    size_b = sh_b.groupBy("b").agg(F.count(F.lit(1)).alias("n_b"))
    common = (
        cands.join(sh_a, "a")
        .join(sh_b, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(size_a, "a")
        .join(size_b, "b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                "double"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_lsh_neardup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """LSH candidates verified with true shingle Jaccard (exact check
    only on the candidate set — the two-phase pattern that makes
    near-dup linear at corpus scale). Pass ``candidates`` (a, b) from a
    persisted signature index so only the verification runs."""
    cands = (
        candidates
        if candidates is not None
        else minhash_lsh_candidates(
            docs,
            id_col=id_col,
            text_col=text_col,
            shingle_words=shingle_words,
            num_hashes=num_hashes,
            bands=bands,
        )
    )
    return minhash_verify_jaccard(
        docs,
        cands,
        id_col=id_col,
        text_col=text_col,
        shingle_words=shingle_words,
        threshold=threshold,
    )


SIMHASH_BITS = 60  # stays inside a signed bigint


def simhash_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """60-bit SimHash per document → DataFrame(id, simhash bigint).

    Shape: explode tokens → hash each token ONCE (md5 hex → first 15
    hex chars → bigint) → one groupBy(id) computing all 60 bit-sums as
    independent ±1 aggregates → sign → weighted bit sum. One shuffle on
    the doc id; the md5 runs once per token, not once per (token, bit).
    """
    from converttovectordb_spark.functions.text import tokens

    tok = docs.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("_tok"),
    ).withColumn(
        "_h", F.conv(F.substring(F.md5(F.col("_tok")), 1, 15), 16, 10).cast("bigint")
    )
    bit_sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias(f"_b{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fingerprint = None
    for b in range(SIMHASH_BITS):
        term = F.when(
            F.col(f"_b{b}") > 0, F.lit(1 << b).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return bit_sums.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    band_bits: int = 15,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup: bucket by 4 bands of 15 bits (any pair within
    Hamming distance 3 of a 60-bit hash shares at least one exact band
    — pigeonhole), verify Hamming distance on candidates. Pass
    ``fingerprints`` (id, simhash) from a persisted signature table to
    skip the 60-aggregate fingerprint pass."""
    fp = (
        fingerprints
        if fingerprints is not None
        else _materialize(
            simhash_fingerprints(docs, id_col=id_col, text_col=text_col)
        )
    )
    # All 4 band keys in one pass over the (tiny, materialized)
    # fingerprint table — a per-band union would scan it 4× per side.
    band_arr = F.array(
        *[
            F.shiftright(F.col("simhash"), b * band_bits).bitwiseAND(
                F.lit((1 << band_bits) - 1)
            )
            for b in range(4)
        ]
    )
    bands = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(band_arr).alias("band_id", "band_key"),
    )
    left = bands.select(
        F.col(id_col).alias("a"), F.col("simhash").alias("sh_a"), "band_id", "band_key"
    )
    right = bands.select(
        F.col(id_col).alias("b"), F.col("simhash").alias("sh_b"), "band_id", "band_key"
    )
    cand = (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def connected_components(
    edges: DataFrame,
    *,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    driver_threshold: int = 500_000,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over an undirected pair graph →
    DataFrame(node, component) with component = min reachable node id.

    This is what turns near-dup PAIRS into dedup GROUPS (keep the
    min-id representative per component, drop the rest) — the step
    between pair mining and an actually-deduplicated corpus.

    Two physical strategies, same result (deterministic — min is
    order-free, hence SQL-checkable against a recursive-CTE oracle):

    * edge count ≤ ``driver_threshold``: collect the edge list and run
      union-find on the driver. The mined pair graph is the DUPLICATES
      — a small fraction of the corpus — so this is the common case,
      and it is the same small-side reasoning as a broadcast join
      (500k edges ≈ 8 MB of longs; α(n) union-find is instant).
    * larger graphs: distributed min-label propagation (Pregel-lite as
      join+groupBy rounds), converging in O(component diameter) rounds
      — shallow for dup clusters. Each round's labels are
      ``localCheckpoint``-ed: persist alone does NOT truncate the
      logical plan, and since ``labels`` feeds ``new`` twice per round
      the un-truncated plan DOUBLES every iteration (driver OOM near
      round 15 just stringifying the tree). Checkpointing caps the plan
      at one round's depth; on a durable cluster job swap in
      ``checkpoint()`` with a checkpoint dir to also survive executor
      loss.

    ``stats`` (optional dict) receives observability fields after the
    run: ``strategy`` ('driver' | 'distributed'), ``n_edges``, and for
    the distributed path ``rounds`` — the number of propagation rounds
    executed including the final no-change detection round (= component
    diameter + 1 for synchronous 1-hop min spreading). Convergence
    tests pin this so a regression in the propagation shape (e.g. an
    accidental 2-hop variant or a broken fixpoint check) is caught.
    """
    raw = _materialize(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    n_edges = raw.count()
    spark = edges.sparkSession

    if n_edges == 0:
        # typed empty result BEFORE strategy selection: the driver
        # path's createDataFrame([]) cannot infer a schema (a corpus
        # with zero near-dup pairs used to CRASH both cluster
        # queries), and there is nothing to propagate distributedly —
        # derive the (node, comp) schema from the edge columns
        out = raw.select(
            F.col("u").alias("node"), F.col("u").alias("comp")
        ).limit(0)
        raw.unpersist()
        if stats is not None:
            stats.update(strategy="empty", n_edges=0)
        return out

    if n_edges <= driver_threshold:
        # Union-find is direction- and duplicate-insensitive, so the
        # RAW mined pairs are collected as-is — no symmetrize-union, no
        # distinct shuffle. Those only pay off on the distributed path.
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for u, v in raw.collect():
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by MIN id so the label is the component minimum
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
        rows = [(n, find(n)) for n in parent]
        out = spark.createDataFrame(rows, ["node", "comp"])
        raw.unpersist()
        if stats is not None:
            stats.update(strategy="driver", n_edges=n_edges)
        return out

    sym = _materialize(
        raw.union(raw.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    )
    raw.unpersist()
    labels = _materialize(
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    changed = 0
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        nbr = sym.join(
            labels.withColumnRenamed("node", "v"), on="v"
        ).select(F.col("u").alias("node"), F.col("comp"))
        # localCheckpoint (NOT persist): truncates lineage so the plan
        # stays one-round deep instead of doubling per iteration.
        new = (
            labels.select("node", "comp")
            .union(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.withColumnRenamed("comp", "_new")
            .join(labels, on="node")
            .filter(F.col("_new") != F.col("comp"))
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    if changed != 0:
        # A component with diameter > max_iter (chain-shaped dup
        # clusters) would otherwise return wrong labels SILENTLY,
        # breaking the bit-identical-to-the-recursive-CTE contract.
        # Propagation halves the effective diameter only via min-label
        # hops, so raise rather than hand back a partial fixpoint.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"rounds ({changed} labels still changing); raise max_iter "
            "— component diameter exceeds the iteration budget"
        )
    if stats is not None:
        stats.update(strategy="distributed", n_edges=n_edges, rounds=rounds)
    return labels


def rademacher_signs(seed: int, num_bits: int, dim: int) -> list[list[float]]:
    """±1 hyperplane components from md5 parity of ``seed_bit_dim`` —
    reproducible in ANY engine with md5 (the SQL oracle inlines the same
    literals), so signed-random-projection LSH is itself oracle-checkable.
    Generated once driver-side; the hot path multiplies, never hashes."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(f"{seed}_{i}_{j}".encode()).hexdigest()[0]
            in "02468ace"
            else -1.0
            for j in range(dim)
        ]
        for i in range(num_bits)
    ]


def embedding_neardup_pairs(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bucket_col: str | None = None,
    lsh_bands: int | None = None,
    lsh_band_bits: int = 3,
    lsh_seed: int = 42,
    dim: int | None = None,
    banded: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    With ``bucket_col`` (e.g. a coarse cluster label) the join is
    equi-bucketed — near-dups almost surely share a cluster, and the
    pair space shrinks from N² to Σ bucket². Without it, a full
    normalized dot-product self-join (exact, small-N fallback).

    With ``lsh_bands`` (requires ``dim``), candidates must ALSO share at
    least one hyperplane-LSH band inside the bucket — the 100 TB shape:
    in-bucket pair space drops from quadratic to Σ (band-bucket)², a
    ~2^band_bits reduction per band, at the cost of missing pairs whose
    angle is large enough to disagree on every band (recall → 1 as bands
    grow; deterministic given the seed, so the decision is
    oracle-checkable — see queries.embedding_neardup_lsh).

    ``banded`` injects an already-computed signature table (same schema
    as ``embedding_lsh_bands`` with this bucket_col) — e.g. a persisted
    artifact — so only the collision join runs at query time.
    """
    if lsh_bands is None and banded is None:
        n = vectors.select(
            F.col(id_col), l2_normalize(F.col(vec_col)).alias("_v"),
            *([F.col(bucket_col)] if bucket_col else []),
        )
        a = n.select(
            F.col(id_col).alias("a"), F.col("_v").alias("_va"),
            *([F.col(bucket_col)] if bucket_col else []),
        )
        b = n.select(
            F.col(id_col).alias("b"), F.col("_v").alias("_vb"),
            *([F.col(bucket_col)] if bucket_col else []),
        )
        joined = a.join(b, on=bucket_col) if bucket_col else a.crossJoin(b)
        return (
            joined.filter(F.col("a") < F.col("b"))
            .withColumn("cosine", dot_product(F.col("_va"), F.col("_vb")))
            .filter(F.col("cosine") >= threshold)
            .select("a", "b", "cosine")
        )
    if banded is None and dim is None:
        raise ValueError("dim is required when lsh_bands is set")
    # Materialize the banded signature table ONCE: the self-join would
    # otherwise re-evaluate all bands×bits hyperplane projections for
    # BOTH sides (same move as the SimHash fingerprint table).
    bands = banded if banded is not None else _materialize(embedding_lsh_bands(
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        bucket_col=bucket_col,
        num_bands=lsh_bands,
        band_bits=lsh_band_bits,
        seed=lsh_seed,
        dim=dim,
    ))
    keys = ([bucket_col] if bucket_col else []) + ["band_id", "band_key"]
    a = bands.select(
        F.col(id_col).alias("a"), F.col("_v").alias("_va"), *keys
    )
    b = bands.select(
        F.col(id_col).alias("b"), F.col("_v").alias("_vb"), *keys
    )
    # Cosine BEFORE the distinct: a candidate pair appears in ≤ lsh_bands
    # band-buckets, and re-scoring a dup is cheaper than joining vectors
    # back onto deduplicated ids.
    return (
        a.join(b, on=keys)
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", dot_product(F.col("_va"), F.col("_vb")))
        .select("a", "b", "cosine")
        .distinct()
        .filter(F.col("cosine") >= threshold)
    )


def embedding_lsh_bands(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
    num_bands: int = 8,
    band_bits: int = 3,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """One row per (vector, band): id, normalized vector, optional
    bucket, band_id, band_key. The candidate-generation half of
    LSH-bucketed embedding dedup, exposed for pair-space accounting.

    Shape: the hyperplane matrix lives as a TINY broadcast table
    (bits×dim rows), not as a per-row literal array — a literal matrix
    inside a lambda is re-constructed for every row (measured ~9 ms/row
    at 24×64), while posexplode → broadcast-join on position → grouped
    conditional sums stays in whole-stage codegen end to end. Bit i of
    the signature is sign(Σ_pos v[pos]·sign(i,pos)); the band key folds
    directly in the same aggregation via when(proj≥0, 2^k).
    """
    spark = vectors.sparkSession
    signs = rademacher_signs(seed, num_bands * band_bits, dim)
    signs_df = spark.createDataFrame(
        [
            (i, j, signs[i][j])
            for i in range(num_bands * band_bits)
            for j in range(dim)
        ],
        "bit_id int, pos int, sign double",
    )
    bucket = [F.col(bucket_col)] if bucket_col else []
    pos = vectors.select(
        F.col(id_col),
        *bucket,
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
    )
    proj = (
        pos.join(F.broadcast(signs_df), on="pos")
        .groupBy(F.col(id_col), *bucket, F.col("bit_id"))
        .agg(F.sum(F.col("val") * F.col("sign")).alias("proj"))
    )
    keys = (
        proj.withColumn("band_id", (F.col("bit_id") / band_bits).cast("int"))
        .withColumn("_w", F.expr(f"shiftleft(1, bit_id % {band_bits})"))
        .groupBy(F.col(id_col), *bucket, F.col("band_id"))
        .agg(
            F.sum(F.when(F.col("proj") >= 0, F.col("_w")).otherwise(0))
            .cast("bigint")
            .alias("band_key")
        )
    )
    n = vectors.select(
        F.col(id_col), l2_normalize(F.col(vec_col)).alias("_v")
    )
    return keys.join(n, on=id_col)


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_occ: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring duplication report per document (Lee et al.
    2021, "Deduplicating Training Data Makes Language Models Better").

    The suffix-array formulation finds every substring of >= k tokens
    that occurs more than once in the corpus; the Spark-native
    re-expression is positional k-gram hashing: a token span is
    duplicated iff every word k-gram inside it is duplicated, so the
    union of duplicated-k-gram extents IS the duplicated-substring
    coverage. Per doc this returns the merged maximal spans — count,
    covered token total, and covered fraction — the signal used to
    drop boilerplate-heavy documents or cut the repeated passages.

    Shuffle shape at 100 TB: (1) posexplode k-grams — linear, no
    shuffle; (2) gram occurrence groupBy — map-side combined, key
    space is the gram vocabulary; (3) LEFT SEMI join positions against
    the >=min_occ grams on the gram key — the inverted-index shape,
    position rows never multiply (semi, not inner); (4) per-doc
    windows + span groupBy — linear, partitioned by doc. Nothing
    quadratic; a white-hot gram (site boilerplate in millions of docs)
    costs one combined count row, and the semi-join keeps each
    position exactly once.

    Span-merge rule: grams at positions p < q overlap-or-touch iff
    q - p <= k (gram p covers tokens [p, p+k-1]), so a gap > k starts
    a new island; within an island coverage is contiguous, making
    max(pos) - min(pos) + k the exact union size.
    """
    from converttovectordb_spark.functions.text import word_shingles_of

    if k < 2:
        raise ValueError(f"duplicate_spans needs k >= 2, got {k}")
    if min_occ < 2:
        raise ValueError("min_occ < 2 would mark every gram duplicated")
    # tokens materialized FIRST — shingling through the raw text
    # expression re-runs the regex split per position (no CSE inside
    # HOF lambdas; measured ~5x on this path)
    base = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.size("_toks").cast("bigint").alias("n_tokens"),
        word_shingles_of(F.col("_toks"), k).alias("_grams"),
    )
    # posexplode_OUTER, then drop the null row: plain posexplode makes
    # Catalyst infer a `size(_grams) > 0` filter and push it below the
    # spread exchange with the WHOLE tokenize+shingle expression
    # substituted in — the heavy compute then runs inside the (few-
    # split at test SF, and always pre-spread) scan stage. Measured
    # 46 s → 4 s on the sf0.1 corpus. The null filter references the
    # generated column, so it cannot sink below the Generate.
    grams = base.select(
        id_col, F.posexplode_outer("_grams").alias("pos", "gram")
    ).filter(F.col("gram").isNotNull())
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .filter(F.col("_occ") >= min_occ)
        .select("gram")
    )
    dup_pos = grams.join(dup_grams, on="gram", how="left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = dup_pos.withColumn(
        "_new",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") - F.lag("pos").over(w) > k),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "_isl",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy(id_col, "_isl").agg(
        F.min("pos").alias("_s"), F.max("pos").alias("_e")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("dup_spans"),
        F.sum(F.col("_e") - F.col("_s") + k).cast("bigint").alias("dup_tokens"),
    )
    return (
        base.select(id_col, "n_tokens")
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("dup_spans"), F.lit(0)).cast("bigint").alias(
                "dup_spans"
            ),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("bigint").alias(
                "dup_tokens"
            ),
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.coalesce(F.col("dup_tokens"), F.lit(0))
                    / F.col("n_tokens").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
    )


def cut_duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_occ: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove EXCESS duplicated passages, keeping the corpus-first copy
    (Lee et al. 2021 cut semantics: every duplicated >=k-token
    substring survives exactly once).

    An occurrence of a duplicated k-gram is *excess* unless it is the
    lexicographically-first (doc_id, pos) occurrence of that gram
    string. Excess extents merge under the same gap>k island rule as
    `duplicate_spans`; covered tokens are dropped and the survivors
    re-joined with single spaces (output is whitespace-normalized —
    the tokenizer already collapses runs).

    Shuffle shape at 100 TB: the keeper is found by a map-side
    combinable min(struct(doc_id, pos)) aggregation per gram — NOT a
    per-gram window — so a boilerplate gram occurring in millions of
    docs costs one combined row, never a single-task sort. The rebuild
    avoids a range join: per-doc islands collect into a (small)
    interval array, equi-joined back on doc_id, and tokens filter
    through an exists() over that array JVM-side.
    """
    from converttovectordb_spark.functions.text import word_shingles_of

    if k < 2:
        raise ValueError(f"cut_duplicate_spans needs k >= 2, got {k}")
    if min_occ < 2:
        raise ValueError("min_occ < 2 would mark every gram duplicated")
    # tokens materialized first — see duplicate_spans
    base = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.col("_toks"),
        word_shingles_of(F.col("_toks"), k).alias("_grams"),
    )
    # posexplode_outer + null filter — see duplicate_spans (inferred
    # size()>0 filter would push the shingle compute into the scan)
    grams = base.select(
        id_col, F.posexplode_outer("_grams").alias("pos", "gram")
    ).filter(F.col("gram").isNotNull())
    keepers = (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("_occ"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first"),
        )
        .filter(F.col("_occ") >= min_occ)
        .select("gram", "_first")
    )
    excess = grams.join(keepers, on="gram").filter(
        (F.col(id_col) != F.col(f"_first.{id_col}"))
        | (F.col("pos") != F.col("_first.pos"))
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = excess.withColumn(
        "_new",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") - F.lag("pos").over(w) > k),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_isl", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    intervals = (
        islands.groupBy(id_col, "_isl")
        .agg(
            F.min("pos").cast("bigint").alias("_s"),
            (F.max("pos") + k - 1).cast("bigint").alias("_e"),
        )
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_s"), F.col("_e")))
            ).alias("_cuts")
        )
    )
    joined = base.join(intervals, on=id_col, how="left").withColumn(
        "_cuts",
        F.coalesce(
            F.col("_cuts"),
            F.array().cast("array<struct<_s:bigint,_e:bigint>>"),
        ),
    )
    kept = joined.select(
        id_col,
        F.size("_toks").cast("bigint").alias("n_tokens"),
        F.filter(
            F.transform(
                "_toks", lambda t, i: F.struct(i.alias("i"), t.alias("t"))
            ),
            lambda s: ~F.exists(
                "_cuts",
                lambda iv: (s["i"] >= iv["_s"]) & (s["i"] <= iv["_e"]),
            ),
        ).alias("_kept"),
    )
    return kept.select(
        id_col,
        "n_tokens",
        F.size("_kept").cast("bigint").alias("n_kept"),
        (F.col("n_tokens") - F.size("_kept")).cast("bigint").alias("n_cut"),
        F.array_join(
            F.transform("_kept", lambda s: s["t"]), " "
        ).alias("text_clean"),
    )
