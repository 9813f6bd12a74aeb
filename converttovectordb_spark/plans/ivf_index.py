"""Persisted IVF (inverted-file) vector index.

The round-1 `ivf_knn_join` recomputed centroids from the full corpus on
every query batch — a full-corpus pass that defeats the point of an
index at scale. This module is the fix: the index is MATERIALIZED once
at build time and every later search touches only

  * the centroid table (C rows — tiny, broadcast), and
  * the ``nprobe/C`` fraction of corpus *files* selected by partition
    pruning (the cluster id is the physical parquet partition key, so
    pruning happens at the directory level before any bytes are read).

Layout on disk::

    <index_path>/centroids/   parquet (cluster_id int, centroid array<double>)
    <index_path>/corpus/      parquet partitioned by cluster_id (all doc cols)

Reference parity: the reference has no vector index at all — its query
path is a brute-force NumPy scan (mock_vector_db_api.py:274-279). The
IVF design here is the standard inverted-file scheme from the FAISS /
IVFADC literature, expressed as Spark physical layout: "probe nprobe
lists" becomes "scan nprobe parquet partitions".

Training is either

  * ``cluster_col=...`` — use an existing coarse label as the cluster
    assignment and its per-cluster mean as the centroid (deterministic,
    SQL-expressible: the `vector_ivf_knn_indexed` oracle reuses the
    inline-IVF oracle because results are bit-identical), or
  * ``num_clusters=k`` — distributed k-means (``pyspark.ml.clustering
    .KMeans``, seeded) over the embedding column for unlabeled corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from converttovectordb_spark.functions.vector import (
    cosine_similarity,
    l2_sq_distance,
)

CENTROIDS_SUBDIR = "centroids"
CORPUS_SUBDIR = "corpus"
CLUSTER_COL = "cluster_id"
STATS_FILE = "_stats.json"


def _batch_histogram(assigned: DataFrame) -> dict:
    """Per-cluster row counts of an assigned (cluster-labeled) frame —
    computed at WRITE time, where the batch is already materialized, so
    query-time consumers (`ivf_knn_join_shuffled(salt_buckets="auto")`,
    nprobe sizing) never pay a stats job of their own. Keys are
    stringified for JSON manifests; `cluster_stats()` restores ints."""
    rows = assigned.groupBy(CLUSTER_COL).agg(
        F.count(F.lit(1)).alias("_n")
    ).collect()
    return {str(r[CLUSTER_COL]): int(r["_n"]) for r in rows}


def _merge_histograms(hists) -> dict:
    """Sum histograms keyed by cluster id. Keys are normalized to str
    first — inputs mix JSON-restored native keys and fresh stringified
    ones, and `3` vs `"3"` must sum, not shadow."""
    out: dict = {}
    for h in hists:
        for cid, n in h.items():
            k = str(cid)
            out[k] = out.get(k, 0) + int(n)
    return out


def _stats_keys_native(sizes: dict, key_type: str | None = None) -> dict:
    """Restore native cluster-id keys from a JSON manifest. When the
    manifest carries a ``key_type`` marker ("int"/"str", written from
    the corpus cluster column's dtype at commit time) the keys coerce
    to THAT type — a string-labeled corpus whose labels happen to be
    digit strings ("3") must come back as strings, or the salt_map
    `ivf_knn_join_shuffled` builds from these stats is typed against
    the corpus column and the join silently misses. Markerless (pre-r12)
    manifests fall back to the old inference: int() succeeding means
    the key round-tripped from an int corpus column in every artifact
    written before string labels could reach this path."""
    if key_type == "str":
        return {str(cid): int(n) for cid, n in sizes.items()}
    if key_type == "int":
        return {int(cid): int(n) for cid, n in sizes.items()}
    native = {}
    for cid, n in sizes.items():
        try:
            native[int(cid)] = int(n)
        except (TypeError, ValueError):
            native[cid] = int(n)
    return native


def _cluster_key_type(df: DataFrame) -> str:
    """The stats-manifest key-type marker for a cluster-labeled frame:
    the corpus column's own dtype is the authority (consumers join
    these keys against that column)."""
    from pyspark.sql.types import StringType

    dtype = df.schema[CLUSTER_COL].dataType
    return "str" if isinstance(dtype, StringType) else "int"

#: Ceiling on the number of queries `IVFIndex.search(adc_shortlist=...)`
#: accepts. The IVFADC plan builds ONE driver-side ADC leg per query
#: (each query's lookup table is inlined as a literal codegen
#: expression), so plan size grows linearly with Q — right for
#: serving-sized batches, pathological for curation-sized ones. The
#: guard turns the silent degradation into a loud redirect to the
#: corpus-scale path (`operators.search.ivf_knn_join_shuffled`), which
#: shuffles queries and corpus on the cluster key instead of building
#: per-query plans.
ADC_MAX_QUERIES = 64


def mean_centroids(
    docs: DataFrame,
    *,
    cluster_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster mean vector → DataFrame(cluster_id, centroid).

    Shape: posexplode every vector → groupBy(cluster, pos) avg →
    re-assemble in position order. The shuffle carries d×C rows after
    map-side partial aggregation — negligible at any corpus size.
    """
    pos = docs.select(
        F.col(cluster_col).alias(CLUSTER_COL),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
    )
    return (
        pos.groupBy(CLUSTER_COL, "pos")
        .agg(F.avg("val").alias("cval"))
        .groupBy(CLUSTER_COL)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("cval")))
                ),
                lambda s: s.getField("cval"),
            ).alias("centroid")
        )
    )


def kmeans_centroids(
    docs: DataFrame,
    *,
    vec_col: str = "embedding",
    num_clusters: int = 16,
    seed: int = 7,
    max_iter: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """Distributed k-means training for unlabeled corpora.

    Returns ``(centroids, assigned_docs)`` where ``assigned_docs`` is the
    input plus a ``cluster_id`` column. Uses ``pyspark.ml`` KMeans
    (Lloyd's with k-means|| init) — the training pass is O(iters × N)
    but runs ONCE at build time, never at query time.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = docs.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))
    # same clamp as train_pq: Spark 4.1's block-mode KMeans can AIOOBE
    # when k exceeds the row count; a build-time count is cheap next to
    # the fit and a clamped index stays self-consistent (probe width,
    # stats, drift report all derive from the trained centers)
    k_eff = max(1, min(int(num_clusters), int(docs.count())))
    model = KMeans(
        k=k_eff, seed=seed, maxIter=max_iter, featuresCol="_features"
    ).fit(feat)
    assigned = (
        model.transform(feat)
        .withColumnRenamed("prediction", CLUSTER_COL)
        .drop("_features")
    )
    spark = docs.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        f"{CLUSTER_COL} int, centroid array<double>",
    )
    return centroids, assigned


PQ_CODEBOOKS_SUBDIR = "pq_codebooks"
PQ_CODES_SUBDIR = "pq_codes"


def index_family_params(index) -> dict:
    """The live index's own build-shape — PQ (m, k) from the codebook
    table and the code table's id columns when PQ is present — so a
    drift rebuild reproduces the index FAMILY instead of silently
    changing it (dropping PQ on a retrain would break every ADC
    consumer). ONE implementation for both retrain doors
    (`VectorEngine.maybe_retrain` and
    `streaming.jobs.retrain_index_if_drifted`) — a copy in each door
    would let a future fix to one silently miss the other."""
    out: dict = {"pq_m": None, "pq_k": 16, "pq_id_cols": None}
    if index.has_pq():
        cb = (
            index.pq_codebooks()
            .agg(
                F.countDistinct("sub").alias("m"),
                (F.max("code") + 1).alias("k"),
            )
            .first()
        )
        out["pq_m"], out["pq_k"] = int(cb["m"]), int(cb["k"])
        out["pq_id_cols"] = tuple(
            c
            for c in index.pq_codes().columns
            if c not in (CLUSTER_COL, "codes")
        )
    return out


def build_ivf_index(
    docs: DataFrame,
    index_path: str,
    *,
    vec_col: str = "embedding",
    cluster_col: str | None = None,
    num_clusters: int = 16,
    seed: int = 7,
    pq_m: int | None = None,
    pq_k: int = 16,
    pq_id_cols: tuple | None = None,
) -> "IVFIndex":
    """Train + materialize the index: centroid table and a corpus
    re-written partitioned by cluster id. One full pass over the data,
    paid once; every subsequent search is partition-pruned.

    ``pq_m`` additionally trains a product-quantization codec
    (``plans/pq_index.py``) and materializes a cluster-partitioned
    CODES table beside the corpus — the IVFADC layout: searches can
    then ADC-scan m-byte codes of the probed partitions and only touch
    full vectors for the rerank shortlist
    (``IVFIndex.search(adc_shortlist=...)``).
    """
    # Drop the previous index's metadata BEFORE overwriting anything
    # (the build_lex_index convention): a crash mid-rebuild must not
    # leave an old _stats.json describing a half-overwritten corpus,
    # and curves measured on the OLD centroids must never bless the new
    # layout (their n_docs stamp can match while the geometry doesn't —
    # no staleness signal would fire). Stats are rewritten below;
    # curves are the caller's to (re-)measure — engine.build_index
    # captures the previous payloads before calling and re-measures
    # under the same contract after.
    import contextlib as _contextlib
    import os as _os

    for _f in (STATS_FILE, RECALL_CURVE_FILE, ADC_CURVE_FILE, MRL_CURVE_FILE):
        with _contextlib.suppress(OSError):
            _os.remove(_os.path.join(index_path, _f))
    if cluster_col is not None:
        centroids = mean_centroids(docs, cluster_col=cluster_col, vec_col=vec_col)
        assigned = docs.withColumn(CLUSTER_COL, F.col(cluster_col))
    else:
        centroids, assigned = kmeans_centroids(
            docs, vec_col=vec_col, num_clusters=num_clusters, seed=seed
        )
    centroids.coalesce(1).write.mode("overwrite").parquet(
        f"{index_path}/{CENTROIDS_SUBDIR}"
    )
    assigned.write.mode("overwrite").partitionBy(CLUSTER_COL).parquet(
        f"{index_path}/{CORPUS_SUBDIR}"
    )
    index = IVFIndex(docs.sparkSession, index_path)
    # Persist the cluster-size histogram beside the layout it describes:
    # computed from the WRITTEN corpus (the partition column needs only
    # file footers, not data pages), so auto salting and nprobe sizing
    # downstream read a manifest instead of re-running a corpus agg.
    # histogram from the WRITTEN footers (exact, no data pages), but the
    # key-type marker from the PRE-write frame: partition-column type
    # inference int-ifies digit-string labels on read-back, while the
    # caller's own corpus frame — what salt maps get typed against —
    # keeps the original dtype
    index._write_stats(
        _batch_histogram(index.corpus()),
        key_type=_cluster_key_type(assigned),
    )
    if pq_m is not None:
        from converttovectordb_spark.plans.pq_index import (
            codebooks_df,
            pq_encode,
            train_pq,
        )

        models = train_pq(
            assigned, vec_col=vec_col, m=pq_m, k=pq_k, seed=seed
        )
        codebooks_df(docs.sparkSession, models).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{index_path}/{PQ_CODEBOOKS_SUBDIR}")
        coded = pq_encode(assigned, models, vec_col=vec_col).drop(vec_col)
        if pq_id_cols is not None:
            # narrow codes table: id cols + cluster + codes (the point
            # of the codec is m-byte rows — don't drag display columns
            # like document content into it)
            coded = coded.select(*pq_id_cols, CLUSTER_COL, "codes")
        coded.write.mode("overwrite").partitionBy(CLUSTER_COL).parquet(
            f"{index_path}/{PQ_CODES_SUBDIR}"
        )
    return index


class IVFIndex:
    """A materialized IVF index: broadcast-able centroids + a
    cluster-partitioned corpus read with partition pruning."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/{CENTROIDS_SUBDIR}")

    # -- persisted cluster stats --------------------------------------
    def _stats_path(self) -> str:
        import os

        return os.path.join(self.path, STATS_FILE)

    def _write_stats(
        self, cluster_sizes: dict, *, key_type: str | None = None
    ) -> None:
        """Atomic (tmp + rename) publish of the histogram manifest. The
        plain index is single-maintainer by contract (its append is a
        bare parquet append), so read-merge-write in `append` is safe.
        ``key_type`` ("int"/"str") records the corpus cluster column's
        dtype so the JSON round-trip restores keys to the type the
        salt-map join needs (see `_stats_keys_native`)."""
        import json
        import os
        import uuid

        payload = {
            "n_docs": sum(int(n) for n in cluster_sizes.values()),
            "cluster_sizes": {
                str(c): int(n) for c, n in cluster_sizes.items()
            },
        }
        if key_type is not None:
            payload["key_type"] = key_type
        tmp = f"{self._stats_path()}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, self._stats_path())

    def cluster_stats(self) -> dict | None:
        """``{"n_docs": N, "cluster_sizes": {cid: n}}`` from the stats
        manifest written at build/append time, or None for a pre-stats
        artifact (consumers fall back to computing — never fail).

        This is the write-time answer to the auto-salting plan-time
        jobs: `ivf_knn_join_shuffled(salt_buckets="auto",
        cluster_sizes=index.cluster_stats()["cluster_sizes"], ...)`
        sizes per-cluster salts with ZERO extra Spark actions."""
        import json

        try:
            with open(self._stats_path()) as fh:
                raw = json.load(fh)
        except (FileNotFoundError, ValueError):
            return None
        sizes = _stats_keys_native(
            raw.get("cluster_sizes", {}), raw.get("key_type")
        )
        return {"n_docs": int(raw["n_docs"]), "cluster_sizes": sizes}

    def corpus(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/{CORPUS_SUBDIR}")

    def verify_stats(self) -> bool:
        """Detect-and-HEAL the plain append's crash window (corpus
        files landed, the histogram manifest rewrite didn't): the
        manifest would otherwise undercount FOREVER — `_write_stats`'s
        read-merge-write bases every later append on the stale count —
        silently blessing stale curves (`recall_curve_staleness`
        derives current_n_docs from it) and mis-sizing auto salting.
        Unlike the lexical index's torn append (whose postings are
        simply gone), these stats are fully DERIVABLE from the written
        layout, so a mismatch recomputes the histogram from partition
        footers instead of raising. Keeps the stored key_type marker
        (the pre-write frame is gone; the cluster dtype didn't change).
        Returns True when a heal rewrote the manifest. The
        transactional subclass overrides to a no-op — its histogram
        rides each O_EXCL-committed manifest, so the window does not
        exist there."""
        import json

        stats = self.cluster_stats()
        if stats is None:
            return False  # pre-stats artifact: consumers fall back
        actual = int(self.corpus().count())
        if int(stats["n_docs"]) == actual:
            return False
        try:
            with open(self._stats_path()) as fh:
                key_type = json.load(fh).get("key_type")
        except (OSError, ValueError):
            key_type = None
        self._write_stats(_batch_histogram(self.corpus()), key_type=key_type)
        return True

    def recall_curve(self) -> dict | None:
        """The persisted recall@k-vs-nprobe curve
        (`measure_recall_curve`), or None when never measured."""
        import json
        import os

        try:
            with open(os.path.join(self.path, RECALL_CURVE_FILE)) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    def recall_curve_staleness(self, payload: dict | None = None) -> dict | None:
        """How far the live corpus has grown/shrunk past the persisted
        recall curve's measurement stamp: ``{"measured_n_docs",
        "current_n_docs", "growth"}`` where growth is the absolute
        row-count delta as a fraction of the measured count. None when
        there is no curve or the curve predates the stamp (pre-r12).
        Zero Spark jobs when the stats manifest is present.

        ``payload``: pass the already-loaded curve to keep one read —
        re-reading here would let a concurrent re-measure swap the file
        between the resolver's read and this one, pairing the OLD
        curve's numbers with the NEW curve's staleness verdict."""
        if payload is None:
            payload = self.recall_curve()
        return self._staleness_from(payload)

    def _staleness_from(self, payload: dict | None) -> dict | None:
        """Shared stamp-vs-live-corpus arithmetic for BOTH persisted
        curves (one implementation — the budget semantics must not
        drift between the nprobe and shortlist knobs)."""
        if payload is None or payload.get("measured_n_docs") is None:
            return None
        measured = int(payload["measured_n_docs"])
        stats = self.cluster_stats()
        current = (
            int(stats["n_docs"])
            if stats is not None
            else int(self.corpus().count())
        )
        growth = abs(current - measured) / max(measured, 1)
        return {
            "measured_n_docs": measured,
            "current_n_docs": current,
            "growth": growth,
        }

    #: fraction of corpus change (vs the curve's measurement stamp)
    #: past which `nprobe_for_recall` flags the curve stale. 0.25 is
    #: the drift-report cadence heuristic: a quarter of the corpus
    #: arriving after measurement moves per-cluster recall enough that
    #: a resolved nprobe is a guess wearing a measurement's clothes.
    RECALL_CURVE_MAX_GROWTH = 0.25

    def nprobe_for_recall(
        self,
        target_recall: float,
        *,
        max_growth: float | None = None,
        strict: bool = False,
    ) -> int:
        """The measured MINIMAL nprobe whose held-out recall@k reaches
        ``target_recall`` — the stated-contract resolution of the
        index's one magic knob. Requires a persisted curve
        (`measure_recall_curve` at build time); raises otherwise
        rather than guessing. A target above every measured point
        resolves to the largest measured nprobe (the curve's
        exact-scan endpoint when measured with defaults) — the closest
        the index can honestly offer.

        Staleness budget: the curve is stamped with the corpus size at
        measurement; when the live corpus has drifted past
        ``max_growth`` (default `RECALL_CURVE_MAX_GROWTH`) the
        resolution WARNS — or raises under ``strict=True`` — instead
        of silently serving a measurement the appends have outgrown
        (re-measure, or retrain: rebuild-and-swap re-measures
        automatically when the old index carried a curve)."""
        if not 0.0 < target_recall <= 1.0:
            raise ValueError(
                f"target_recall must be in (0, 1], got {target_recall}"
            )
        payload = self.recall_curve()
        if payload is None or not payload.get("curve"):
            raise ValueError(
                f"no recall curve measured for {self.path}; run "
                "measure_recall_curve(index) (engine: "
                "build_index(recall_sample=...)) first"
            )
        budget = (
            self.RECALL_CURVE_MAX_GROWTH if max_growth is None else max_growth
        )
        stale = self.recall_curve_staleness(payload)
        if stale is not None and stale["growth"] > budget:
            msg = (
                f"recall curve for {self.path} is stale: corpus moved "
                f"{stale['measured_n_docs']} -> {stale['current_n_docs']} "
                f"rows ({stale['growth']:.0%} > budget {budget:.0%}) since "
                "measurement — re-measure (measure_recall_curve) or "
                "retrain; resolved nprobe reflects the OLD corpus"
            )
            if strict:
                raise ValueError(msg)
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        curve = sorted(payload["curve"], key=lambda c: int(c["nprobe"]))
        for point in curve:
            if float(point["recall"]) >= target_recall:
                return int(point["nprobe"])
        return int(curve[-1]["nprobe"])

    def adc_curve(self) -> dict | None:
        """The persisted shortlist→recall@k curve (`measure_adc_curve`),
        or None when never measured."""
        import json
        import os

        try:
            with open(os.path.join(self.path, ADC_CURVE_FILE)) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    def adc_curve_staleness(self, payload: dict | None = None) -> dict | None:
        """ADC twin of `recall_curve_staleness` — live-corpus drift vs
        the shortlist curve's measurement stamp (same preloaded-payload
        contract, same shared arithmetic)."""
        if payload is None:
            payload = self.adc_curve()
        return self._staleness_from(payload)

    def adc_shortlist_for_recall(
        self,
        target_recall: float,
        *,
        max_growth: float | None = None,
        strict: bool = False,
    ) -> int:
        """The measured MINIMAL ``adc_shortlist`` whose held-out
        recall@k (vs the exact-rerank path at the curve's stamped
        nprobe) reaches ``target_recall`` — the stated-contract
        resolution of the index's second magic knob, mirroring
        `nprobe_for_recall` (same staleness budget, same
        largest-measured fallback for unreachable targets, same
        loud-error-when-never-measured policy)."""
        if not 0.0 < target_recall <= 1.0:
            raise ValueError(
                f"target_recall must be in (0, 1], got {target_recall}"
            )
        payload = self.adc_curve()
        if payload is None or not payload.get("curve"):
            raise ValueError(
                f"no ADC shortlist curve measured for {self.path}; run "
                "measure_adc_curve(index) (engine: "
                "build_index(pq_m=..., adc_recall_sample=...)) first"
            )
        budget = (
            self.RECALL_CURVE_MAX_GROWTH if max_growth is None else max_growth
        )
        stale = self.adc_curve_staleness(payload)
        if stale is not None and stale["growth"] > budget:
            msg = (
                f"ADC shortlist curve for {self.path} is stale: corpus "
                f"moved {stale['measured_n_docs']} -> "
                f"{stale['current_n_docs']} rows ({stale['growth']:.0%} > "
                f"budget {budget:.0%}) since measurement — re-measure "
                "(measure_adc_curve) or retrain; resolved shortlist "
                "reflects the OLD corpus"
            )
            if strict:
                raise ValueError(msg)
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        curve = sorted(payload["curve"], key=lambda c: int(c["shortlist"]))
        for point in curve:
            if float(point["recall"]) >= target_recall:
                return int(point["shortlist"])
        return int(curve[-1]["shortlist"])

    def mrl_curve(self) -> dict | None:
        """The persisted dim→recall@k curve (`measure_mrl_curve`), or
        None when never measured."""
        import json
        import os

        try:
            with open(os.path.join(self.path, MRL_CURVE_FILE)) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    def mrl_curve_staleness(self, payload: dict | None = None) -> dict | None:
        """MRL twin of `recall_curve_staleness` — live-corpus drift vs
        the truncation curve's measurement stamp (same preloaded-payload
        contract, same shared arithmetic)."""
        if payload is None:
            payload = self.mrl_curve()
        return self._staleness_from(payload)

    def mrl_dim_for_recall(
        self,
        target_recall: float,
        *,
        max_growth: float | None = None,
        strict: bool = False,
    ) -> int:
        """The measured MINIMAL Matryoshka prefix dimension whose
        held-out recall@k (vs the exact-rerank path at the curve's
        stamped nprobe and shortlist) reaches ``target_recall`` — the
        stated-contract resolution of the index's THIRD magic knob,
        mirroring `nprobe_for_recall` and `adc_shortlist_for_recall`
        (same staleness budget, same loud-error-when-never-measured
        policy). Unlike nprobe and the shortlist, recall is NOT
        mathematically monotone in the prefix dimension (a longer
        prefix of an un-Matryoshka'd embedding can rank worse), so the
        resolution is "minimal MEASURED dim meeting the target"; the
        full-dimension endpoint is 1.0 by construction (prefix = whole
        vector), so every target resolves."""
        if not 0.0 < target_recall <= 1.0:
            raise ValueError(
                f"target_recall must be in (0, 1], got {target_recall}"
            )
        payload = self.mrl_curve()
        if payload is None or not payload.get("curve"):
            raise ValueError(
                f"no MRL truncation curve measured for {self.path}; run "
                "measure_mrl_curve(index) (engine: "
                "build_index(mrl_recall_sample=...)) first"
            )
        budget = (
            self.RECALL_CURVE_MAX_GROWTH if max_growth is None else max_growth
        )
        stale = self.mrl_curve_staleness(payload)
        if stale is not None and stale["growth"] > budget:
            msg = (
                f"MRL truncation curve for {self.path} is stale: corpus "
                f"moved {stale['measured_n_docs']} -> "
                f"{stale['current_n_docs']} rows ({stale['growth']:.0%} > "
                f"budget {budget:.0%}) since measurement — re-measure "
                "(measure_mrl_curve) or retrain; resolved dimension "
                "reflects the OLD corpus"
            )
            if strict:
                raise ValueError(msg)
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        curve = sorted(payload["curve"], key=lambda c: int(c["dim"]))
        for point in curve:
            if float(point["recall"]) >= target_recall:
                return int(point["dim"])
        return int(curve[-1]["dim"])

    def probe_clusters(
        self,
        queries: DataFrame,
        nprobe: int,
        *,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
    ) -> DataFrame:
        """nprobe nearest centroids per query — a Q×C cross of two tiny
        broadcast sides. Deterministic tie-break: cluster_id ascending.
        """
        qc = (
            F.broadcast(
                queries.select(
                    query_id_col, F.col(query_vec_col).alias("_qvec")
                )
            )
            .crossJoin(F.broadcast(self.centroids()))
            .withColumn(
                "csim", cosine_similarity(F.col("_qvec"), F.col("centroid"))
            )
        )
        wc = Window.partitionBy(query_id_col).orderBy(
            F.col("csim").desc(), F.col(CLUSTER_COL).asc()
        )
        return (
            qc.withColumn("crank", F.row_number().over(wc))
            .filter(F.col("crank") <= nprobe)
            .select(query_id_col, "_qvec", CLUSTER_COL)
        )

    def pruned_corpus(self, cluster_ids: list[int]) -> DataFrame:
        """Corpus scan restricted to the probed clusters. Because
        ``cluster_id`` is the physical partition key, the IN-filter is a
        PartitionFilter — directory-level pruning, zero bytes read from
        unprobed clusters (assert via `plans.physical_plan`).
        """
        return self.corpus().filter(
            F.col(CLUSTER_COL).isin([int(c) for c in cluster_ids])
        )

    def has_pq(self) -> bool:
        """PQ detection through the same storage layer every other
        read uses (an os.path check would break for hdfs://, s3a://,
        etc. even though the rest of the index is storage-agnostic)."""
        try:
            self.pq_codebooks().schema
            return True
        except Exception:
            return False

    def pq_codebooks(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/{PQ_CODEBOOKS_SUBDIR}")

    def pq_codes(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/{PQ_CODES_SUBDIR}")

    def search(
        self,
        queries: DataFrame,
        top_k: int = 5,
        nprobe: int = 2,
        *,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        doc_id_col: str = "vec_id",
        vec_col: str = "embedding",
        adc_shortlist: int | None = None,
        mrl_dim: int | None = None,
        mrl_shortlist: int | None = None,
        predicate=None,
    ) -> DataFrame:
        """Batch IVF search over the materialized index.

        ``predicate`` (a Column or SQL string) restricts results to
        matching rows — FILTERED ANN: the filter lands on the probed
        corpus scan, composing with the cluster partition pruning, so
        Catalyst pushes it into the parquet read (PushedFilters next to
        PartitionFilters). Filtering happens BEFORE the per-query
        top-k, the honest ANN-with-filter tradeoff: a selective filter
        can leave fewer than k matches inside the probed clusters —
        raise nprobe rather than silently widening the probe. On the
        ADC path the predicate applies at the full-vector rerank join
        (the m-byte codes table carries no metadata columns), so a
        selective filter also shrinks the surviving shortlist.

        Two stages:
          1. probe: Q×C centroid scoring (both sides broadcast), then a
             driver-side collect of the DISTINCT probed cluster ids —
             O(Q×nprobe) ints, the price of turning pruning into a
             *static* partition filter Catalyst applies at planning time.
          2. rerank: scan ONLY the probed partitions, equi-join the
             broadcast (query, cluster) assignment, exact cosine, and a
             per-query top-k window.

        At 100 TB with C=4096 and nprobe=8, stage 2 reads ~0.2% of the
        corpus files; nothing else touches the full table.

        ``adc_shortlist=N`` (requires a PQ-enabled index,
        ``build_ivf_index(pq_m=...)``) switches stage 2 to the IVFADC
        plan: ADC-scan the probed partitions' m-byte CODES (driver-built
        per-query lookup tables inlined as one codegen expression),
        keep the top-N per query, and run exact cosine only on those N
        full vectors — the probed partitions' embedding bytes are read
        for N rows per query instead of every row. The ADC mode is
        capped at ``ADC_MAX_QUERIES`` queries (one driver-built plan
        leg each — plan size is linear in Q); curation-sized query
        batches belong on `operators.search.ivf_knn_join_shuffled`,
        which raises here instead of degrading silently.

        ``mrl_dim=d'`` (Matryoshka truncation, Kusupati et al. 2022)
        switches the exact-rerank stage to a prefix-score-then-rerank
        plan: candidates in the probed partitions are scored on the
        FIRST d' dimensions only, the top ``mrl_shortlist`` per query
        (default 4×top_k) survive — deterministic (prefix-score desc,
        id asc) so a larger shortlist is a strict prefix-superset —
        and only the survivors are re-scored at full dimension. The
        per-candidate scoring cost drops from O(d) to O(d') FLOPs; the
        full-width fold runs for shortlist rows per query instead of
        every probed row (in this layout the dial trades scoring
        arithmetic, not bytes read — the byte-level dial is the PQ
        codes path). Recall vs d' is a MEASURED contract
        (`measure_mrl_curve` / `mrl_dim_for_recall`), mirroring nprobe
        and the ADC shortlist. d' ≥ the stored dimension degenerates
        to exact scoring (the prefix is the whole vector), so results
        equal the plain exact-rerank path by construction. Mutually
        exclusive with ``adc_shortlist`` — the two shortlist codecs
        answer the same question and stacking them compounds
        unmeasured loss.
        """
        if mrl_dim is not None and adc_shortlist is not None:
            raise ValueError(
                "mrl_dim and adc_shortlist are mutually exclusive — "
                "each is a separately measured shortlist codec; pick "
                "the dial whose curve you measured"
            )
        if mrl_dim is not None and int(mrl_dim) < 1:
            raise ValueError(f"mrl_dim must be >= 1, got {mrl_dim}")
        if mrl_shortlist is not None and mrl_dim is None:
            raise ValueError("mrl_shortlist requires mrl_dim")
        if mrl_shortlist is not None and int(mrl_shortlist) < int(top_k):
            raise ValueError(
                f"mrl_shortlist ({mrl_shortlist}) must be >= top_k "
                f"({top_k}) — a smaller shortlist cannot fill the "
                "result"
            )
        probe = self.probe_clusters(
            queries, nprobe, query_id_col=query_id_col, query_vec_col=query_vec_col
        )
        if adc_shortlist is not None and not self.has_pq():
            raise ValueError(
                "adc_shortlist requires a PQ-enabled index; rebuild "
                "with build_ivf_index(..., pq_m=...)"
            )
        # ONE driver action over the probe result serves everything the
        # two branches need: the distinct cluster ids for the static
        # partition filter, and (ADC branch) each query's own cluster
        # list + query vector for the per-query LUT legs. O(Q×nprobe)
        # rows — tiny by the serving contract.
        probe_rows = probe.collect()
        cluster_ids = sorted({int(r[CLUSTER_COL]) for r in probe_rows})
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        corpus_scan = self.pruned_corpus(cluster_ids)
        if pred is not None:
            corpus_scan = corpus_scan.filter(pred)
        if adc_shortlist is not None and probe_rows:
            from converttovectordb_spark.plans.pq_index import (
                adc_lut,
                adc_score,
            )

            book_rows = self.pq_codebooks().collect()
            m = 1 + max(r["sub"] for r in book_rows)
            k = 1 + max(r["code"] for r in book_rows)
            # per-query probe restriction (the IVF contract: each query
            # sees only ITS probed clusters, same as the exact path's
            # (query, cluster) equi-join)
            by_q: dict = {}
            for pr in probe_rows:
                qid = pr[query_id_col]
                by_q.setdefault(qid, ([], pr["_qvec"]))[0].append(
                    int(pr[CLUSTER_COL])
                )
            if len(by_q) > ADC_MAX_QUERIES:
                raise ValueError(
                    f"adc_shortlist builds one driver-side ADC plan leg "
                    f"per query and got {len(by_q)} queries "
                    f"(> ADC_MAX_QUERIES={ADC_MAX_QUERIES}) — this is a "
                    "serving path for small query batches; for "
                    "corpus-scale KNN joins use "
                    "operators.search.ivf_knn_join_shuffled"
                )
            all_codes = self.pq_codes()
            # One ADC leg per query (enforced serving-sized above);
            # each leg scans only that query's probed code partitions
            # (static partition filter) and keeps adc_shortlist rows.
            shortlists = []
            for qid, (clusters, qvec) in by_q.items():
                lut = adc_lut(qvec, book_rows, m=m, k=k)
                leg = all_codes.filter(F.col(CLUSTER_COL).isin(clusters))
                shortlists.append(
                    leg.withColumn("_adc", adc_score(lut, k))
                    .orderBy(F.col("_adc").desc(), F.col(doc_id_col).asc())
                    .limit(adc_shortlist)
                    .select(
                        F.lit(qid).alias(query_id_col),
                        F.col(doc_id_col),
                    )
                )
            short = shortlists[0]
            for s in shortlists[1:]:
                short = short.unionByName(s)
            cand = (
                F.broadcast(short)
                .join(
                    corpus_scan.select(doc_id_col, vec_col),
                    on=doc_id_col,
                )
                .join(
                    F.broadcast(
                        queries.select(
                            query_id_col,
                            F.col(query_vec_col).alias("_qvec"),
                        )
                    ),
                    on=query_id_col,
                )
            )
        else:
            # exact rerank over the probed partitions; also the shared
            # empty-probe path (no queries → empty probe → empty cand),
            # keeping both modes' empty-input behavior identical
            cand = F.broadcast(probe).join(
                corpus_scan, on=CLUSTER_COL, how="inner"
            )
            if mrl_dim is not None:
                # MRL prefix shortlist: score the first d' dims only,
                # keep the deterministic top-N per query, and let the
                # shared full-dimension rerank below finish the job.
                # Both windows partition on query_id, so Catalyst
                # reuses one exchange (two sorts, one shuffle).
                short_n = (
                    int(mrl_shortlist)
                    if mrl_shortlist is not None
                    else 4 * int(top_k)
                )
                w_pre = Window.partitionBy(query_id_col).orderBy(
                    F.col("_pre").desc(), F.col(doc_id_col).asc()
                )
                cand = (
                    cand.withColumn(
                        "_pre",
                        cosine_similarity(
                            F.slice(F.col("_qvec"), 1, int(mrl_dim)),
                            F.slice(F.col(vec_col), 1, int(mrl_dim)),
                        ),
                    )
                    .withColumn("_prn", F.row_number().over(w_pre))
                    .filter(F.col("_prn") <= short_n)
                    .drop("_pre", "_prn")
                )
        scored = cand.withColumn(
            "score", cosine_similarity(F.col("_qvec"), F.col(vec_col))
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("score").desc(), F.col(doc_id_col).asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select(query_id_col, doc_id_col, "score", "rank")
        )


    def assign_clusters(
        self, docs: DataFrame, *, vec_col: str = "embedding"
    ) -> DataFrame:
        """Nearest-centroid assignment against the FROZEN centroid
        table: squared Euclidean (the ml KMeans.transform rule, so an
        appended row lands where the build would have put it), ties →
        lowest cluster id.

        Plan: the C centroids are packed into one broadcast 1-row array
        and the argmin is a single HOF projection — map-side, O(rows·C),
        no shuffle, no training pass. Guards the embedding dimension
        against the frozen centroids first (a re-embedded corpus of a
        different dimension would otherwise zip_with into NULL
        distances and route every row arbitrarily — a silently garbage
        assignment where append and the drift report both need a loud
        error).
        """
        self._check_dim(docs, vec_col)
        packed = F.broadcast(
            self.centroids().agg(
                F.collect_list(
                    F.struct(
                        F.col(CLUSTER_COL).alias("cid"),
                        F.col("centroid").cast("array<double>").alias("cvec"),
                    )
                ).alias("_cents")
            )
        )
        return (
            docs.crossJoin(packed)
            .withColumn("_v", F.col(vec_col).cast("array<double>"))
            .withColumn(
                CLUSTER_COL,
                F.array_min(
                    F.transform(
                        F.col("_cents"),
                        lambda c: F.struct(
                            l2_sq_distance(F.col("_v"), c["cvec"]).alias(
                                "d"
                            ),
                            c["cid"].alias("cid"),
                        ),
                    )
                )["cid"],
            )
            .drop("_cents", "_v")
        )

    def _check_dim(self, docs: DataFrame, vec_col: str) -> None:
        """Loud dimension guard against the frozen centroids; no-op for
        an empty frame (callers handle empty separately)."""
        first = docs.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            return
        cent_first = self.centroids().select(
            F.size(F.col("centroid")).alias("d")
        ).first()
        if int(first["d"]) != int(cent_first["d"]):
            raise ValueError(
                f"append dimension {first['d']} != index dimension "
                f"{cent_first['d']}"
            )

    def append(
        self,
        new_docs: DataFrame,
        *,
        vec_col: str = "embedding",
        cluster_col: str | None = None,
        materialized: bool = False,
    ) -> None:
        """Incremental index maintenance: O(new rows), never O(corpus).

        A 100 TB index cannot be rebuilt per ingest batch — this routes
        an append batch into the EXISTING layout: assign each row to its
        nearest frozen centroid (or take ``cluster_col`` when the index
        was built from a label column), append-write into the
        cluster-partitioned corpus (new files inside existing partition
        directories — partition pruning is untouched), and, for a
        PQ-enabled index, encode against the frozen codebooks
        (`pq_encode_frozen`) and append the codes rows with the exact
        schema of the existing codes table.

        Centroids and codebooks stay FROZEN — append never retrains.
        Under distribution drift the index degrades gracefully (recall
        drops, correctness doesn't), and a periodic offline
        `build_ivf_index` rebuild remains the curator's job; the engine
        pairs this with its staleness token so searches know whether
        the index covers the store (`VectorEngine.append_to_index`).
        """
        # Materialize the batch BEFORE any probe/write: the dim check,
        # the corpus write, and the codes write are separate actions,
        # and a lazy upstream lineage (a scan->chunk->embed chain)
        # re-executed per action could write an index whose rows differ
        # from what the caller stored — the staleness token would then
        # bless a silently diverged index. ``materialized=True`` says
        # the caller already persisted the batch — don't cache a second
        # copy of the embeddings.
        we_persisted = not materialized
        if we_persisted:
            new_docs = new_docs.persist()
        try:
            assigned_src = self._route_batch(
                new_docs, vec_col=vec_col, cluster_col=cluster_col
            )
            if assigned_src is None:
                return  # empty batch: nothing to place
            self._append_staged(assigned_src, vec_col=vec_col)
        finally:
            if we_persisted:
                new_docs.unpersist()

    def _append_staged(self, assigned_src: DataFrame, *, vec_col: str) -> None:
        """The plain append's write phase over a LINEAGE-CUT batch
        (r13 fix; converttovectordb_spark.staging): the corpus write,
        the histogram merge, and the PQ codes write are separate
        actions over the routed batch, and the engine's heal delta
        READS the corpus path the first write APPENDS to —
        `.persist()` does not survive that (recacheByPath drops the
        cache; the codes action then re-executed the store-vs-corpus
        anti-join against the just-grown corpus, the delta evaluated
        EMPTY, and a PQ-enabled index silently lost the batch's codes
        forever; the histogram had the same hole). Staging the routed
        batch through a throwaway parquet dir makes every later action
        read only the stage. The TRANSACTIONAL append does not need
        this: it writes fresh uuid dirs, which never overlap an
        in-flight lineage's paths."""
        from converttovectordb_spark.staging import stage_batch

        corpus_cols = self.corpus().columns
        with stage_batch(
            assigned_src.select(*corpus_cols), self.path
        ) as assigned:
            # Batch histogram BEFORE the corpus write (r13 fix): the
            # write into the corpus path invalidates any cached plan
            # that READS that path — and the engine's append batch is
            # exactly such a plan (store ANTI-JOIN corpus). Computed
            # after the write, the recomputed anti-join saw its own
            # appended rows, returned an empty batch, and the merge
            # silently kept the OLD n_docs (healed only by the next
            # verify_stats — staleness budgets and auto-salting read
            # stale in between). The histogram describes the batch, not
            # the files, so its value is write-order independent.
            prev = self.cluster_stats()
            batch_hist = (
                _batch_histogram(assigned) if prev is not None else None
            )
            assigned.write.mode("append").partitionBy(
                CLUSTER_COL
            ).parquet(f"{self.path}/{CORPUS_SUBDIR}")
            # keep the histogram manifest current (read-merge-write is
            # sound: the plain index is single-maintainer by contract);
            # a pre-stats artifact stays stats-less rather than getting
            # a partial histogram that undercounts the base corpus
            if prev is not None:
                self._write_stats(
                    _merge_histograms([prev["cluster_sizes"], batch_hist]),
                    key_type=_cluster_key_type(assigned),
                )
            if self.has_pq():
                from converttovectordb_spark.plans.pq_index import (
                    pq_encode_frozen,
                )

                coded = pq_encode_frozen(
                    assigned, self.pq_codebooks(), vec_col=vec_col
                )
                codes_cols = self.pq_codes().columns
                coded.select(*codes_cols).write.mode("append").partitionBy(
                    CLUSTER_COL
                ).parquet(f"{self.path}/{PQ_CODES_SUBDIR}")

    def _route_batch(
        self,
        new_docs: DataFrame,
        *,
        vec_col: str,
        cluster_col: str | None,
    ) -> DataFrame | None:
        """Shared append routing: dimension guard against the frozen
        centroids, then cluster assignment (caller's label column or
        nearest-frozen-centroid). None for an empty batch."""
        if new_docs.select(F.lit(1)).first() is None:
            return None
        if cluster_col is not None:
            self._check_dim(new_docs, vec_col)
            return (
                new_docs
                if cluster_col == CLUSTER_COL
                else new_docs.withColumn(CLUSTER_COL, F.col(cluster_col))
            )
        return self.assign_clusters(new_docs, vec_col=vec_col)


class TransactionalIVFIndex(IVFIndex):
    """Manifest-committed IVF index: the index twin of
    `TransactionalDocumentStore`.

    The plain index's `append` is a bare parquet append — fine for a
    single offline maintainer, but it has a crash window (corpus files
    land, codes don't) and no replay protection, so it cannot sit
    behind a streaming sink. This variant stages each append batch into
    fresh uuid dirs (corpus AND pq codes) and publishes them with ONE
    O_EXCL manifest commit:

      * atomicity — a crash mid-write leaves orphan dirs that no reader
        ever sees (the manifest is the committed truth);
      * corpus/codes consistency — both sides of a batch become visible
        in the same commit or not at all;
      * idempotence — ``txn_id`` dedupes replayed epochs exactly like
        the store's append, which is what `stream_ingest_indexed`
        needs for end-to-end exactly-once (store and index share the
        epoch id);
      * compaction — many micro-batch appends mean many small files
        per cluster partition; `compact()` rewrites the snapshot as one
        batch pair and supersedes the old versions in the manifest
        (dirs stay until a vacuum, mirroring the store).

    Layout::

        <path>/centroids/              (unchanged, frozen)
        <path>/pq_codebooks/           (unchanged, frozen)
        <path>/corpus_batches/<uuid>/  parquet partitioned by cluster_id
        <path>/codes_batches/<uuid>/   parquet partitioned by cluster_id
        <path>/_manifest/<v>.json      {corpus_dir, codes_dir?, rows,
                                        txn_id?, replaces?}

    `search()` / `pruned_corpus()` are inherited: `corpus()` returns a
    union of committed batch scans, and Catalyst pushes the cluster-id
    filter into every branch, so file-level partition pruning holds
    per batch dir.
    """

    MANIFEST_DIR = "_manifest"
    CORPUS_BATCHES = "corpus_batches"
    CODES_BATCHES = "codes_batches"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        auto_compact_after: int | None = None,
    ):
        """``auto_compact_after=K``: after an append commit, when the
        live version count reaches K, run `compact()` — the same
        write-door policy as `TransactionalDocumentStore`, so a
        streaming maintainer's per-epoch commits cannot grow the
        manifest and small-file count unbounded. compact() already
        tolerates concurrent epochs (captured-set contract), so the
        policy composes with the streaming sink."""
        super().__init__(spark, path)
        if auto_compact_after is not None and auto_compact_after < 2:
            raise ValueError(
                f"auto_compact_after must be >= 2, got {auto_compact_after}"
            )
        self.auto_compact_after = auto_compact_after

    # -- manifest machinery (same O_EXCL-create-is-the-commit protocol
    # as TransactionalDocumentStore.append) --------------------------
    def _manifest_path(self) -> str:
        import os

        return os.path.join(self.path, self.MANIFEST_DIR)

    def _versions(self) -> list[int]:
        import os

        try:
            names = os.listdir(self._manifest_path())
        except FileNotFoundError:
            return []
        return sorted(
            int(n[:-5]) for n in names if n.endswith(".json")
        )

    def _read_manifest(self, version: int) -> dict:
        import json
        import os

        with open(
            os.path.join(self._manifest_path(), f"{version}.json")
        ) as fh:
            return json.load(fh)

    def _manifests(self) -> dict[int, dict]:
        """One pass over the manifest dir — every committed read below
        works from this dict instead of re-opening each JSON several
        times per operation (after thousands of micro-batch commits
        the repeated small-file opens are real I/O)."""
        return {v: self._read_manifest(v) for v in self._versions()}

    @staticmethod
    def _live_of(manifests: dict[int, dict]) -> list[int]:
        replaced: set[int] = set()
        for m in manifests.values():
            replaced.update(m.get("replaces", []))
        return [v for v in sorted(manifests) if v not in replaced]

    @staticmethod
    def _txn_ids_of(manifests: dict[int, dict]) -> set:
        """Every txn id this index must treat as already-committed:
        own commits' ``txn_id`` plus ``carried_txn_ids`` lists (epochs
        inherited from a replaced index at rebuild time). ALL manifests
        count, live or superseded — a vacuumed/compacted epoch replayed
        by a recovering stream must stay a no-op."""
        ids: set = set()
        for m in manifests.values():
            if m.get("txn_id") is not None:
                ids.add(m["txn_id"])
            ids.update(m.get("carried_txn_ids", []))
        return ids

    def committed_txn_ids(self) -> set:
        return self._txn_ids_of(self._manifests())

    def carry_txn_ids(self, txn_ids) -> int:
        """Seed this index's replay-dedup with epochs committed to a
        PREDECESSOR index — the rebuild-and-swap correctness step: a
        drift rebuild trains on the store's committed corpus (which
        already contains every applied epoch's rows), so a post-swap
        replay of an old epoch must dedup here exactly as it would
        have on the replaced index, or its rows land twice. The commit
        carries no data dirs — readers skip it; only the dedup sees
        it. Returns the committed manifest version (-1 if there was
        nothing new to carry)."""
        new = sorted(set(txn_ids) - self.committed_txn_ids())
        if not new:
            return -1
        return self._commit({"rows": 0, "carried_txn_ids": new})

    def _live_versions(self) -> list[int]:
        return self._live_of(self._manifests())

    def _commit(self, commit: dict) -> int:
        """O_EXCL-create IS the commit. For txn-carrying commits the
        dedup is re-checked immediately before each create attempt —
        the caller's early check can be minutes stale by the time the
        batch dirs are staged (a concurrent replica healing the same
        delta), and losing that race must become a no-op, not a
        duplicate insert. A microsecond TOCTOU window remains (this is
        a filesystem manifest, not a CAS register); the remaining
        callers are sequential by construction (one streaming query's
        epochs; replays). Returns the committed version, or -1 when
        the txn id was found already committed (staged dirs are left
        as invisible orphans, same as crash debris)."""
        import json
        import os

        os.makedirs(self._manifest_path(), exist_ok=True)
        version = (self._versions() or [-1])[-1] + 1
        while True:
            if commit.get("txn_id") is not None and commit[
                "txn_id"
            ] in self._txn_ids_of(self._manifests()):
                return -1
            target = os.path.join(self._manifest_path(), f"{version}.json")
            try:
                with open(target, "x") as fh:
                    json.dump(commit, fh)
                return version
            except FileExistsError:
                version += 1

    def version(self) -> int:
        return (self._versions() or [-1])[-1]

    def exists(self) -> bool:
        return bool(self._versions())

    # -- committed reads ---------------------------------------------
    def _union_dirs(self, dirs: list[str]) -> DataFrame:
        from functools import reduce

        parts = [self.spark.read.parquet(d) for d in dirs]
        return reduce(lambda x, y: x.unionByName(y), parts)

    def _union_batches(self, key: str) -> DataFrame:
        ms = self._manifests()
        dirs = [
            ms[v][key] for v in self._live_of(ms) if key in ms[v]
        ]
        if not dirs:
            raise FileNotFoundError(
                f"no committed {key} under {self.path}"
            )
        return self._union_dirs(dirs)

    def corpus(self) -> DataFrame:
        return self._union_batches("corpus_dir")

    def pq_codes(self) -> DataFrame:
        return self._union_batches("codes_dir")

    def cluster_stats(self) -> dict | None:
        """Live histogram = sum over live commits' write-time
        histograms — a manifest fold, NO Spark job. None when any live
        commit predates stats (a partial sum would silently undercount
        and mis-size the salts toward the hot-task failure mode)."""
        ms = self._manifests()
        # only corpus-bearing commits hold rows; carried-txn-id commits
        # (rebuild inheritance) contribute nothing to the histogram
        live = [v for v in self._live_of(ms) if "corpus_dir" in ms[v]]
        if not live:
            return None
        hists = []
        key_type = None
        for v in live:
            h = ms[v].get("cluster_sizes")
            if h is None:
                return None
            hists.append(h)
            # all live commits describe one corpus column — any marker
            # speaks for the set; markerless (pre-r12) commits fall back
            key_type = ms[v].get("cluster_key_type", key_type)
        sizes = _stats_keys_native(_merge_histograms(hists), key_type)
        return {
            "n_docs": sum(sizes.values()),
            "cluster_sizes": sizes,
        }

    def verify_stats(self) -> bool:
        """No-op override: the histogram rides each O_EXCL-committed
        manifest (a torn append is invisible until its commit lands),
        so the plain index's stats crash window does not exist here —
        and the plain heal's corpus count would be a wasted job."""
        return False

    # -- writes ------------------------------------------------------
    @classmethod
    def build(
        cls,
        docs: DataFrame,
        index_path: str,
        *,
        vec_col: str = "embedding",
        cluster_col: str | None = None,
        num_clusters: int = 16,
        seed: int = 7,
        pq_m: int | None = None,
        pq_k: int = 16,
        pq_id_cols: tuple | None = None,
    ) -> "TransactionalIVFIndex":
        """Train (same recipe as `build_ivf_index`) and publish the
        initial corpus/codes as version-0 of the manifest.

        Refuses a path that already has committed versions: building
        over a live manifest would OVERWRITE the frozen centroids and
        codebooks while the old corpus batches stay live — every
        document would appear twice and the old codes would no longer
        match the new codebooks. The rebuild-under-drift flow is
        build into a FRESH path, then swap (and the old index keeps
        serving until the swap)."""
        probe = cls(docs.sparkSession, index_path)
        if probe.exists():
            raise ValueError(
                f"{index_path} already has committed index versions; "
                "rebuild into a fresh path and swap, or use append()"
            )
        if cluster_col is not None:
            centroids = mean_centroids(
                docs, cluster_col=cluster_col, vec_col=vec_col
            )
            assigned = docs.withColumn(CLUSTER_COL, F.col(cluster_col))
        else:
            centroids, assigned = kmeans_centroids(
                docs, vec_col=vec_col, num_clusters=num_clusters, seed=seed
            )
        centroids.coalesce(1).write.mode("overwrite").parquet(
            f"{index_path}/{CENTROIDS_SUBDIR}"
        )
        index = cls(docs.sparkSession, index_path)
        models = None
        # Materialize the assigned corpus before the iterative PQ fits:
        # each of the m k-means fits would otherwise re-execute the
        # upstream lineage (cluster transform + whatever produced the
        # docs — possibly a Python-UDF embed chain) per iteration.
        # (_append_assigned is told skip_persist — this is the one
        # materialization boundary for the whole build.)
        assigned = assigned.persist()
        try:
            if pq_m is not None:
                from converttovectordb_spark.plans.pq_index import (
                    codebooks_df,
                    train_pq,
                )

                models = train_pq(
                    assigned, vec_col=vec_col, m=pq_m, k=pq_k, seed=seed
                )
                codebooks_df(docs.sparkSession, models).coalesce(
                    1
                ).write.mode("overwrite").parquet(
                    f"{index_path}/{PQ_CODEBOOKS_SUBDIR}"
                )
            index._append_assigned(
                assigned,
                vec_col=vec_col,
                pq_id_cols=pq_id_cols,
                models=models,
                skip_persist=True,
            )
        finally:
            assigned.unpersist()
        return index

    def _append_assigned(
        self,
        assigned: DataFrame,
        *,
        vec_col: str,
        pq_id_cols: tuple | None = None,
        models=None,
        txn_id: str | None = None,
        skip_persist: bool = False,
    ) -> int:
        """Stage corpus (and codes) batch dirs, then one commit.

        ``assigned`` is materialized for the duration: the corpus and
        codes writes are separate actions (plus schema probes), and an
        un-persisted upstream lineage — a streaming epoch's chunk+embed
        chain, or k-means transforms at build time — would re-execute
        once per action. Batch-sized by contract, so the persist is
        bounded."""
        import os
        import uuid

        from pyspark.sql import Observation

        we_persisted = not skip_persist
        if we_persisted:
            assigned = assigned.persist()
        try:
            obs = Observation()
            staged = assigned.observe(obs, F.count(F.lit(1)).alias("rows"))
            corpus_dir = os.path.join(
                self.path, self.CORPUS_BATCHES, uuid.uuid4().hex
            )
            staged.write.mode("overwrite").partitionBy(CLUSTER_COL).parquet(
                corpus_dir
            )
            rows = int(obs.get["rows"])
            commit = {
                "corpus_dir": corpus_dir,
                "rows": rows,
                # write-time histogram: `assigned` is materialized here,
                # so this is one cheap action over cached rows; live
                # stats are the SUM over live commits (cluster_stats),
                # giving query-time consumers zero-job salt sizing
                "cluster_sizes": _batch_histogram(assigned),
                "cluster_key_type": _cluster_key_type(assigned),
            }
            if txn_id is not None:
                commit["txn_id"] = txn_id
            if models is not None or self.has_pq():
                from converttovectordb_spark.plans.pq_index import (
                    pq_encode,
                    pq_encode_frozen,
                )

                if models is not None:
                    coded = pq_encode(assigned, models, vec_col=vec_col)
                else:
                    coded = pq_encode_frozen(
                        assigned, self.pq_codebooks(), vec_col=vec_col
                    )
                coded = coded.drop(vec_col)
                if pq_id_cols is not None:
                    coded = coded.select(*pq_id_cols, CLUSTER_COL, "codes")
                elif self.exists():
                    coded = coded.select(*self.pq_codes().columns)
                codes_dir = os.path.join(
                    self.path, self.CODES_BATCHES, uuid.uuid4().hex
                )
                coded.write.mode("overwrite").partitionBy(
                    CLUSTER_COL
                ).parquet(codes_dir)
                commit["codes_dir"] = codes_dir
            if self._commit(commit) == -1:
                return 0  # txn raced a concurrent identical commit
            return rows
        finally:
            if we_persisted:
                assigned.unpersist()

    def append(
        self,
        new_docs: DataFrame,
        *,
        vec_col: str = "embedding",
        cluster_col: str | None = None,
        txn_id: str | None = None,
        materialized: bool = False,
    ) -> int:
        """Manifest-committed incremental append; returns rows written
        (0 for a deduped ``txn_id`` replay). Same frozen-centroid /
        frozen-codebook routing as the plain index's append (shared
        `_route_batch`); the batch is materialized before any probe so
        the committed corpus/codes cannot diverge from what the caller
        stored (see the plain append's persist rationale)."""
        if txn_id is not None and txn_id in self.committed_txn_ids():
            return 0
        # one materialization boundary, placed BEFORE the dim probe so
        # the rows validated are the rows committed (the routed/selected
        # frames below are cheap projections over this cache)
        we_persisted = not materialized
        if we_persisted:
            new_docs = new_docs.persist()
        try:
            assigned = self._route_batch(
                new_docs, vec_col=vec_col, cluster_col=cluster_col
            )
            if assigned is None:
                return 0
            assigned = assigned.select(*self.corpus().columns)
            written = self._append_assigned(
                assigned,
                vec_col=vec_col,
                txn_id=txn_id,
                skip_persist=True,
            )
        finally:
            if we_persisted:
                new_docs.unpersist()
        # write-door compaction policy (see __init__): after the commit,
        # so the epoch is durable regardless of the rewrite's fate — a
        # rewrite failure is a warning, not the append's failure (the
        # epoch already landed; surfacing it would make the streaming
        # sink replay a committed epoch against its txn dedup for
        # nothing, or a non-txn caller double-write). TWO-LEVEL like
        # the store's policy: the L0 step folds only the plain epochs
        # SINCE the last live compaction product (prior blobs are never
        # re-read), and a blob-saturated live list folds everything —
        # the index has no tombstones, so any live subset is sound.
        k = getattr(self, "auto_compact_after", None)
        if k is not None:
            ms = self._manifests()
            live = self._live_of(ms)
            if len(live) >= k:
                blobs = [v for v in live if ms[v].get("replaces")]
                cut = live.index(blobs[-1]) + 1 if blobs else 1
                fresh = live[cut:]
                try:
                    if len(blobs) < k and len(fresh) >= 2:
                        self.compact(versions=fresh)
                    else:
                        self.compact()
                except Exception as exc:  # noqa: BLE001
                    import warnings

                    warnings.warn(
                        f"auto-compaction of {self.path} failed (append "
                        f"already committed; next append retries): {exc}",
                        RuntimeWarning,
                        stacklevel=2,
                    )
        return written

    CURRENT_POINTER = "CURRENT"

    @staticmethod
    def publish_current(base_dir: str, index_path: str) -> None:
        """Atomically point ``base_dir``'s CURRENT at ``index_path`` —
        the rebuild-and-swap publication step. Kept on the class so the
        whole commit protocol (manifest commits, replaces lists, this
        pointer) lives in one module; writers that re-implemented the
        recipe could diverge (non-atomic write, different name)."""
        import os
        import uuid

        os.makedirs(base_dir, exist_ok=True)
        # per-publisher temp name: a FIXED name would let two racing
        # publishers interleave writes on one file and rename a
        # truncated pointer into CURRENT
        tmp = os.path.join(base_dir, f"CURRENT.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            fh.write(index_path)
        os.replace(
            tmp, os.path.join(base_dir, TransactionalIVFIndex.CURRENT_POINTER)
        )

    @classmethod
    def open_current(
        cls,
        spark: SparkSession,
        base_dir: str,
        *,
        auto_compact_after: int | None = None,
    ) -> "TransactionalIVFIndex":
        """Attach to whatever CURRENT points at (raises FileNotFoundError
        when nothing was published). ``auto_compact_after`` arms the
        write-door compaction policy on the attached handle — an
        attach-time choice, not index state, so each maintainer decides
        its own cadence."""
        import os

        with open(os.path.join(base_dir, cls.CURRENT_POINTER)) as fh:
            return cls(
                spark,
                fh.read().strip(),
                auto_compact_after=auto_compact_after,
            )

    def compact(self, versions: list[int] | None = None) -> int:
        """Rewrite the committed snapshot as ONE batch pair and publish
        a commit superseding the versions that went INTO it — the
        small-files answer for a streaming-maintained index. Old dirs
        stay on disk (cheap, and a reader holding an old plan keeps
        working). ``versions`` restricts the rewrite to that SUBSET of
        the live set (the tiered/tail policy — the index has no
        tombstones, so any live subset is sound: readers union live
        batch dirs order-independently); default is everything live.

        Concurrency contract: the manifest set is captured ONCE at
        entry; the snapshot is built from exactly those dirs and the
        ``replaces`` list covers exactly those versions. An epoch
        committed by the streaming maintainer WHILE the rewrite runs is
        therefore neither in the snapshot nor superseded — it stays
        live beside the compacted commit, and nothing is lost. (The
        naive ``replaces=all versions at commit time`` would silently
        drop such an epoch: superseded but not rewritten, and its
        txn-id dedup would eat the replay too.)"""
        ms = self._manifests()
        live = self._live_of(ms)
        if versions is not None:
            missing = [v for v in versions if v not in live]
            if missing:
                raise ValueError(
                    f"compact(versions=...) must name live versions; "
                    f"{missing} are not live"
                )
            live = sorted(versions)
        if not live:
            return 0
        corpus_dirs = [ms[v]["corpus_dir"] for v in live if "corpus_dir" in ms[v]]
        codes_dirs = [ms[v]["codes_dir"] for v in live if "codes_dir" in ms[v]]
        if not corpus_dirs:
            return 0  # only data-less carried-txn commits in range
        snapshot = self._union_dirs(corpus_dirs)
        import os
        import uuid

        from pyspark.sql import Observation

        obs = Observation()
        corpus_dir = os.path.join(
            self.path, self.CORPUS_BATCHES, uuid.uuid4().hex
        )
        snapshot.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).partitionBy(CLUSTER_COL).parquet(corpus_dir)
        rows = int(obs.get["rows"])
        in_hists = [
            ms[v].get("cluster_sizes") for v in live if "corpus_dir" in ms[v]
        ]
        key_type = None
        for v in live:
            key_type = ms[v].get("cluster_key_type", key_type)
        if all(h is not None for h in in_hists):
            # pure manifest arithmetic — compaction moves rows, it
            # doesn't change per-cluster membership
            sizes = _merge_histograms(in_hists)
        else:
            # a pre-stats commit is being folded in: recompute from the
            # just-written snapshot (partition-column-only read — file
            # footers, not data pages) so compaction HEALS missing stats
            healed = self.spark.read.parquet(corpus_dir)
            sizes = _batch_histogram(healed)
            key_type = _cluster_key_type(healed)
        commit = {
            "corpus_dir": corpus_dir,
            "rows": rows,
            "cluster_sizes": sizes,
            # exactly the rewritten set: a full compact also sweeps
            # already-superseded manifests (harmless, idempotent), a
            # subset compact must supersede ONLY what it rewrote
            "replaces": sorted(ms) if versions is None else live,
        }
        if key_type is not None:
            commit["cluster_key_type"] = key_type
        if codes_dirs:
            codes_dir = os.path.join(
                self.path, self.CODES_BATCHES, uuid.uuid4().hex
            )
            self._union_dirs(codes_dirs).write.mode("overwrite").partitionBy(
                CLUSTER_COL
            ).parquet(codes_dir)
            commit["codes_dir"] = codes_dir
        self._commit(commit)
        return rows

    def vacuum(self) -> int:
        """Delete corpus/codes batch dirs only reachable through
        superseded versions — the disk-reclaim step after `compact()`,
        mirroring the store's vacuum. The manifests themselves are
        KEPT: superseded commits still carry txn ids the replay dedup
        must keep honoring (a vacuumed epoch replayed by a recovering
        stream must stay a no-op). Returns directories removed."""
        import os
        import shutil

        ms = self._manifests()
        live = set(self._live_of(ms))
        removed = 0
        for v, m in ms.items():
            if v in live:
                continue
            for d in (m.get("corpus_dir"), m.get("codes_dir")):
                if d and os.path.isdir(d):
                    shutil.rmtree(d)
                    removed += 1
        return removed


RECALL_CURVE_FILE = "_recall_curve.json"


def measure_recall_curve(
    index: "IVFIndex",
    *,
    top_k: int = 5,
    nprobes: list[int] | None = None,
    sample: int = 16,
    vec_col: str = "embedding",
    doc_id_col: str = "vec_id",
) -> dict:
    """Measure recall@``top_k`` vs nprobe on a held-out probe sample
    and persist the curve next to the index — the build-time step that
    turns nprobe from a magic knob into a stated contract
    (`IVFIndex.nprobe_for_recall(0.9)` → the measured minimal nprobe;
    `VectorEngine.search_indexed(target_recall=...)` consumes it).

    Probes are a deterministic hash-ordered sample of the index's OWN
    corpus (xxhash64 order — no RNG state, same sample every run);
    ground truth is `index.search` itself at nprobe = the centroid
    count — an exact scan under the SAME scoring expression as every
    measured point. Using a different exact scorer (knn_join
    normalizes then dots; search divides by both norms) would let a
    mathematical tie between scaled-copy vectors rank differently by
    one ulp across the two formulas, breaking the endpoint-1.0 and
    monotonicity guarantees the tests pin; with one formula the
    endpoint is 1.0 LITERALLY by construction. Recall is monotone
    non-decreasing in nprobe (probing more clusters only ADDS
    candidates, and a true top-k member in the candidate set always
    survives exact re-scoring). Cost: |nprobes| pruned searches for
    ``sample`` probes — a build-time price, paid where the index build
    already pays a full corpus pass (the full-width ground-truth
    search doubles as the endpoint measurement).

    The curve describes the corpus AT MEASUREMENT TIME under the
    frozen centroids; incremental appends shift it like they shift
    drift. The payload is therefore STAMPED with the corpus state
    (``measured_n_docs``) and the measurement contract (``top_k``,
    ``requested_sample``, ``doc_id_col``, ``vec_col``) so that
    (a) `nprobe_for_recall` can compare against the live corpus and
    warn/refuse past a drift budget, and (b) a rebuild-and-swap
    retrain (`VectorEngine.maybe_retrain`, the streaming
    `retrain_index_if_drifted`) can RE-MEASURE the fresh index under
    the exact same contract — the target-recall knob survives the
    retrain cadence it was built for instead of dying at the first
    swap.

    ``nprobes`` defaults to powers of two up to the centroid count
    (plus the count itself — the exact-scan endpoint, recall 1.0 by
    construction, so every target is resolvable)."""
    import json
    import os
    import uuid

    corpus = index.corpus().select(
        F.col(doc_id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    n_clusters = index.centroids().count()
    if nprobes is None:
        nprobes, p = [], 1
        while p < n_clusters:
            nprobes.append(p)
            p *= 2
        nprobes.append(int(n_clusters))
    nprobes = sorted({int(p) for p in nprobes})
    probes = (
        corpus.withColumn("_h", F.xxhash64(F.col(doc_id_col)))
        .orderBy("_h", F.col(doc_id_col).asc())
        .limit(int(sample))
        .select(
            F.col(doc_id_col).alias("query_id"),
            F.col(vec_col).alias("query_vec"),
        )
        .persist()
    )
    try:
        # ground truth: the index's OWN scorer at full probe width —
        # an exact scan under the same expression as every measured
        # point (see the docstring's one-formula argument); it doubles
        # as the endpoint measurement, recall 1.0 by set identity
        exact = {}
        for r in index.search(
            probes,
            top_k=top_k,
            nprobe=int(n_clusters),
            doc_id_col=doc_id_col,
            vec_col=vec_col,
        ).collect():
            exact.setdefault(r["query_id"], set()).add(r[doc_id_col])
        n_probes = len(exact)
        curve = []
        for p in nprobes:
            if int(p) == int(n_clusters):
                curve.append(
                    {"nprobe": int(p),
                     "recall": 1.0 if n_probes else 0.0}
                )
                continue
            approx = {}
            for r in index.search(
                probes,
                top_k=top_k,
                nprobe=p,
                doc_id_col=doc_id_col,
                vec_col=vec_col,
            ).collect():
                approx.setdefault(r["query_id"], set()).add(r[doc_id_col])
            recall = (
                sum(
                    len(exact[q] & approx.get(q, set())) / len(exact[q])
                    for q in exact
                )
                / n_probes
                if n_probes
                else 0.0
            )
            curve.append({"nprobe": int(p), "recall": round(recall, 6)})
    finally:
        probes.unpersist()
    # corpus-state stamp: the manifest histogram when present (zero
    # jobs), else one count over the corpus the measurement already
    # scanned — `nprobe_for_recall` compares this against the live
    # corpus to surface append-driven staleness
    stats = index.cluster_stats()
    measured_n = (
        int(stats["n_docs"]) if stats is not None else int(corpus.count())
    )
    payload = {
        "top_k": int(top_k),
        "sample": n_probes,
        "requested_sample": int(sample),
        "measured_n_docs": measured_n,
        "doc_id_col": doc_id_col,
        "vec_col": vec_col,
        "curve": curve,
    }
    tmp = os.path.join(index.path, f".recall.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, os.path.join(index.path, RECALL_CURVE_FILE))
    return payload


ADC_CURVE_FILE = "_adc_curve.json"


def measure_adc_curve(
    index: "IVFIndex",
    *,
    top_k: int = 5,
    nprobe: int = 2,
    shortlists: list[int] | None = None,
    sample: int = 16,
    vec_col: str = "embedding",
    doc_id_col: str = "vec_id",
) -> dict:
    """Measure recall@``top_k`` vs ``adc_shortlist`` on a held-out
    probe sample and persist the curve beside the codebooks — the
    nprobe treatment (`measure_recall_curve`) applied to the index's
    SECOND magic knob. `IVFIndex.adc_shortlist_for_recall(0.95)` then
    resolves the measured minimal shortlist;
    `VectorEngine.search_indexed(target_adc_recall=...)` consumes it.

    Ground truth is the EXACT-rerank IVF search at the same ``nprobe``
    (not the brute full-corpus KNN): the shortlist knob only controls
    how much ADC-ranked candidate mass survives into the full-vector
    rerank WITHIN the probed clusters, so measuring against the exact
    path at the same probe isolates exactly the loss this knob buys
    back. Recall is monotone non-decreasing in the shortlist by
    construction — the ADC ordering is deterministic ((_adc desc, id
    asc)), so a larger shortlist is a strict prefix-superset and a
    true top-k member in the candidate set always survives exact
    re-scoring; the tests pin it.

    ``shortlists`` defaults to ``top_k`` doublings up to the corpus
    size, plus the corpus size itself — at that endpoint every probed
    row is shortlisted, the plan degenerates to the exact path, and
    recall is 1.0 by construction, so every target is resolvable.

    The payload carries the same corpus-state/contract stamps as the
    recall curve (``measured_n_docs``, ``requested_sample``, column
    names, plus the measurement ``nprobe``) so staleness budgets and
    rebuild-and-swap re-measurement (`remeasure_adc_curve_like`) work
    identically."""
    import json
    import os
    import uuid

    if not index.has_pq():
        raise ValueError(
            "measure_adc_curve requires a PQ-enabled index; rebuild "
            "with build_ivf_index(..., pq_m=...)"
        )
    corpus = index.corpus().select(
        F.col(doc_id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    stats = index.cluster_stats()
    n_docs = (
        int(stats["n_docs"]) if stats is not None else int(corpus.count())
    )
    if shortlists is None:
        shortlists, s = [], int(top_k)
        while s < n_docs:
            shortlists.append(s)
            s *= 2
        shortlists.append(int(n_docs))
    shortlists = sorted({int(s) for s in shortlists})
    probes = (
        corpus.withColumn("_h", F.xxhash64(F.col(doc_id_col)))
        .orderBy("_h", F.col(doc_id_col).asc())
        .limit(int(sample))
        .select(
            F.col(doc_id_col).alias("query_id"),
            F.col(vec_col).alias("query_vec"),
        )
        .persist()
    )
    try:

        def _hits(adc_shortlist):
            out: dict = {}
            for r in index.search(
                probes,
                top_k=top_k,
                nprobe=nprobe,
                doc_id_col=doc_id_col,
                vec_col=vec_col,
                adc_shortlist=adc_shortlist,
            ).collect():
                out.setdefault(r["query_id"], set()).add(r[doc_id_col])
            return out

        exact = _hits(None)  # exact rerank at the same nprobe
        n_probes = len(exact)
        curve = []
        for s in shortlists:
            approx = _hits(s)
            recall = (
                sum(
                    len(exact[q] & approx.get(q, set())) / len(exact[q])
                    for q in exact
                )
                / n_probes
                if n_probes
                else 0.0
            )
            curve.append({"shortlist": int(s), "recall": round(recall, 6)})
    finally:
        probes.unpersist()
    payload = {
        "top_k": int(top_k),
        "nprobe": int(nprobe),
        "sample": n_probes,
        "requested_sample": int(sample),
        "measured_n_docs": n_docs,
        "doc_id_col": doc_id_col,
        "vec_col": vec_col,
        "curve": curve,
    }
    tmp = os.path.join(index.path, f".adc.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, os.path.join(index.path, ADC_CURVE_FILE))
    return payload


def remeasure_adc_curve_like(
    old_payload: dict | None,
    new_index: "IVFIndex",
    *,
    default_doc_id_col: str = "vec_id",
    default_vec_col: str = "embedding",
) -> dict | None:
    """ADC twin of `remeasure_recall_curve_like`: carry the shortlist
    curve's CONTRACT across a rebuild-and-swap by re-measuring the
    fresh index under the old stamps. No-op when the replaced index
    never measured one, or when the rebuild dropped PQ (family changes
    are loud elsewhere; a curve for a codec that no longer exists
    would be a lie)."""
    if old_payload is None or not new_index.has_pq():
        return None
    return measure_adc_curve(
        new_index,
        top_k=int(old_payload.get("top_k", 5)),
        nprobe=int(old_payload.get("nprobe", 2)),
        sample=int(
            old_payload.get(
                "requested_sample", old_payload.get("sample", 16)
            )
        ),
        doc_id_col=old_payload.get("doc_id_col", default_doc_id_col),
        vec_col=old_payload.get("vec_col", default_vec_col),
    )


MRL_CURVE_FILE = "_mrl_curve.json"


def measure_mrl_curve(
    index: "IVFIndex",
    *,
    top_k: int = 5,
    nprobe: int = 2,
    dims: list[int] | None = None,
    shortlist: int | None = None,
    sample: int = 16,
    vec_col: str = "embedding",
    doc_id_col: str = "vec_id",
) -> dict:
    """Measure recall@``top_k`` vs Matryoshka prefix dimension on a
    held-out probe sample and persist the curve beside the index — the
    nprobe treatment (`measure_recall_curve`) applied to the index's
    THIRD magic knob. `IVFIndex.mrl_dim_for_recall(0.95)` then resolves
    the measured minimal dimension;
    `VectorEngine.search_indexed(target_mrl_recall=...)` consumes it.

    Ground truth is the EXACT-rerank IVF search at the same ``nprobe``
    (the `measure_adc_curve` rule): the dimension knob only controls
    how faithfully the prefix ORDERS candidates into the shortlist
    WITHIN the probed clusters, so measuring against the exact path at
    the same probe isolates exactly the loss this knob buys back. The
    measurement ``shortlist`` (default 4×top_k — `IVFIndex.search`'s
    serving default) is part of the stamped contract: a resolution is
    only honest at the shortlist it was measured with.

    Unlike nprobe and the ADC shortlist, recall is NOT mathematically
    monotone in the prefix dimension — prefixes of an embedding that
    was not trained with Matryoshka losses can rank worse at d'=32
    than d'=16. The full-dimension endpoint IS 1.0 by construction
    (the prefix is the whole vector, the shortlist is a superset of
    the exact top-k, and the rerank uses the same fold), so every
    target resolves.

    ``dims`` defaults to powers of two from 4 up to the stored
    dimension, plus the dimension itself (the exact endpoint).

    The payload carries the same corpus-state/contract stamps as the
    other curves (``measured_n_docs``, ``requested_sample``, column
    names, plus the measurement ``nprobe`` and ``shortlist``) so
    staleness budgets and rebuild-and-swap re-measurement
    (`remeasure_mrl_curve_like`) work identically."""
    import json
    import os
    import uuid

    corpus = index.corpus().select(
        F.col(doc_id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    cent_first = index.centroids().select(
        F.size(F.col("centroid")).alias("d")
    ).first()
    full_dim = int(cent_first["d"])
    if shortlist is None:
        shortlist = 4 * int(top_k)
    if int(shortlist) < int(top_k):
        raise ValueError(
            f"shortlist ({shortlist}) must be >= top_k ({top_k})"
        )
    if dims is None:
        dims, d = [], 4
        while d < full_dim:
            dims.append(d)
            d *= 2
        dims.append(full_dim)
    dims = sorted({int(d) for d in dims})
    if dims[0] < 1:
        raise ValueError(f"dims must be >= 1, got {dims[0]}")
    probes = (
        corpus.withColumn("_h", F.xxhash64(F.col(doc_id_col)))
        .orderBy("_h", F.col(doc_id_col).asc())
        .limit(int(sample))
        .select(
            F.col(doc_id_col).alias("query_id"),
            F.col(vec_col).alias("query_vec"),
        )
        .persist()
    )
    try:

        def _hits(mrl_dim):
            out: dict = {}
            for r in index.search(
                probes,
                top_k=top_k,
                nprobe=nprobe,
                doc_id_col=doc_id_col,
                vec_col=vec_col,
                mrl_dim=mrl_dim,
                mrl_shortlist=None if mrl_dim is None else int(shortlist),
            ).collect():
                out.setdefault(r["query_id"], set()).add(r[doc_id_col])
            return out

        exact = _hits(None)  # exact rerank at the same nprobe
        n_probes = len(exact)
        curve = []
        for d in dims:
            if int(d) >= full_dim:
                # the prefix is the whole vector: same ordering, same
                # fold — recall 1.0 by set identity, no search needed
                curve.append(
                    {"dim": int(d), "recall": 1.0 if n_probes else 0.0}
                )
                continue
            approx = _hits(int(d))
            recall = (
                sum(
                    len(exact[q] & approx.get(q, set())) / len(exact[q])
                    for q in exact
                )
                / n_probes
                if n_probes
                else 0.0
            )
            curve.append({"dim": int(d), "recall": round(recall, 6)})
    finally:
        probes.unpersist()
    stats = index.cluster_stats()
    measured_n = (
        int(stats["n_docs"]) if stats is not None else int(corpus.count())
    )
    payload = {
        "top_k": int(top_k),
        "nprobe": int(nprobe),
        "shortlist": int(shortlist),
        "full_dim": full_dim,
        "sample": n_probes,
        "requested_sample": int(sample),
        "measured_n_docs": measured_n,
        "doc_id_col": doc_id_col,
        "vec_col": vec_col,
        "curve": curve,
    }
    tmp = os.path.join(index.path, f".mrl.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, os.path.join(index.path, MRL_CURVE_FILE))
    return payload


def remeasure_mrl_curve_like(
    old_payload: dict | None,
    new_index: "IVFIndex",
    *,
    default_doc_id_col: str = "vec_id",
    default_vec_col: str = "embedding",
) -> dict | None:
    """MRL twin of `remeasure_recall_curve_like`: carry the truncation
    curve's CONTRACT (top_k, nprobe, shortlist, sample, columns)
    across a rebuild-and-swap by re-measuring the fresh index under
    the old stamps. The dims panel re-derives from the NEW index's
    stored dimension — a re-embedded corpus has a different dimension,
    and carrying stale dims would measure prefixes that don't exist.
    No-op when the replaced index never measured one."""
    if old_payload is None:
        return None
    return measure_mrl_curve(
        new_index,
        top_k=int(old_payload.get("top_k", 5)),
        nprobe=int(old_payload.get("nprobe", 2)),
        shortlist=(
            int(old_payload["shortlist"])
            if old_payload.get("shortlist") is not None
            else None
        ),
        sample=int(
            old_payload.get(
                "requested_sample", old_payload.get("sample", 16)
            )
        ),
        doc_id_col=old_payload.get("doc_id_col", default_doc_id_col),
        vec_col=old_payload.get("vec_col", default_vec_col),
    )


def remeasure_recall_curve_like(
    old_payload: dict | None,
    new_index: "IVFIndex",
    *,
    default_doc_id_col: str = "vec_id",
    default_vec_col: str = "embedding",
) -> dict | None:
    """Carry the recall-curve CONTRACT (not the stale numbers) across
    a rebuild-and-swap: re-measure the fresh index under the old
    curve's stamped parameters (top_k, requested sample size, id and
    vector columns). The retrain already pays a full corpus pass for
    training, so the exact-KNN measurement pass is the same order of
    cost — and without it, `search_indexed(target_recall=...)` starts
    raising after the very retrain cadence the curve exists to
    survive (r11 verdict finding #1). No-op (returns None) when the
    replaced index never measured a curve — a knob nobody turned stays
    unturned. Pre-stamp (r11) payloads fall back to the caller's
    default columns."""
    if old_payload is None:
        return None
    return measure_recall_curve(
        new_index,
        top_k=int(old_payload.get("top_k", 5)),
        sample=int(
            old_payload.get(
                "requested_sample", old_payload.get("sample", 16)
            )
        ),
        doc_id_col=old_payload.get("doc_id_col", default_doc_id_col),
        vec_col=old_payload.get("vec_col", default_vec_col),
    )


def index_drift_report(
    index: IVFIndex,
    docs: DataFrame,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Maintenance diagnostic: how far has the corpus drifted from the
    index's FROZEN geometry — the number that tells a curator when the
    periodic retrain is due (incremental `append` keeps correctness
    under drift, but recall decays as clusters stop matching the data).

    Per frozen centroid: the CURRENT corpus rows that would route to it
    (`assign_clusters`, the same rule append uses) and the L2 distance
    between the frozen centroid and those rows' actual mean. Shifts
    near 0 → the index still fits; large shifts or starved/bloated
    clusters (`n_rows` skew) → rebuild-and-swap.

    Cost: ONE pass over the corpus — the assignment projection feeds a
    single posexplode aggregation that carries both the per-position
    means and the row count (count per (cluster, pos) equals the
    cluster's row count, so no second corpus scan for counts) — plus a
    d×C-row shuffle; linear, safe to run on a schedule against 100 TB.
    """
    assigned = index.assign_clusters(docs, vec_col=vec_col)
    pos = assigned.select(
        F.col(CLUSTER_COL),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "pos", "val"
        ),
    )
    cur = (
        pos.groupBy(CLUSTER_COL, "pos")
        .agg(
            F.avg("val").alias("cval"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .groupBy(CLUSTER_COL)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("cval")))
                ),
                lambda s: s.getField("cval"),
            ).alias("current_mean"),
            F.max("cnt").alias("n_rows"),
        )
    )
    frozen = index.centroids().withColumnRenamed(
        "centroid", "frozen_centroid"
    )
    # NULL current_mean (a starved cluster) propagates to a NULL shift
    # through the fold on its own — no explicit branch needed
    shift = F.sqrt(
        l2_sq_distance(F.col("frozen_centroid"), F.col("current_mean"))
    )
    return (
        frozen.join(cur, on=CLUSTER_COL, how="left")
        .withColumn("n_rows", F.coalesce(F.col("n_rows"), F.lit(0)))
        .withColumn("centroid_shift", shift)
        .select(CLUSTER_COL, "n_rows", "centroid_shift")
        .orderBy(CLUSTER_COL)
    )
