"""Driver-resident serving tier for the warm KNN door.

The reference serves /query from an in-process NumPy matrix
(mock_vector_db_api.py:37-52,308: documents kept in server memory,
cosine via dot/argsort — its logged 0.11 s at N=13,515/d=384 is that
in-memory scan). A distributed Spark job cannot match that at small N:
the job floor (scheduling + task launch + collect) is ~0.15 s on
local[32] regardless of how cheap the scan is.

So serving is TIERED, exactly like Spark's own join strategy choice:

- corpus fits the driver budget → materialize ONCE (Arrow collect at
  cache fill) into a float64 matrix and serve each query as a BLAS
  matrix-vector product + top-k — the same plan the reference runs,
  minus its per-query norm recomputation (norms are cached at fill);
- bigger → the distributed prenormed scan (``knn_topk`` over a cached
  DataFrame carrying ``_emb_norm`` — see ``with_query_norms``);
- bigger still / latency-bound → the IVF index (``plans/ivf_index.py``),
  which prunes to nprobe clusters (SCALING.md measures the crossover).

Spark remains the system of record and the builder at every tier; the
matrix is just a cache of the store's ``load()`` view, invalidated with
it. Semantics match ``knn_topk`` bit-for-bit where it matters:
zero-norm→0.0 (Q1), deterministic ascending-id tie-break (Q3),
threshold AFTER limit (Q4), and the Q5 dimension-mismatch message.
"""

from __future__ import annotations

import math
import os
import threading
import uuid
from contextlib import contextmanager

import numpy as np

from pyspark.sql import DataFrame

#: Default driver-memory budget for the matrix tier, in float64 cells
#: (rows × dim). 200M cells = 1.6 GB — a broadcast-table-sized cache.
#: Above this the server falls back to the distributed scan tier.
DEFAULT_MAX_CELLS = 200_000_000

#: Default driver-memory budget for the NON-embedding payload the
#: matrix tier materializes alongside the matrix (content strings,
#: paths, binary media columns). The cell budget alone is not a safe
#: admission gate: a 100k-doc corpus at d=384 is only 38M cells, but
#: with ~1 MB contents it is ~100 GB of driver payload. Measured as
#: serialized variable-width bytes (octet_length of string/binary
#: columns) plus a small fixed per-row term; Python dict/str overhead
#: inflates that by a few ×, so 256 MB raw keeps the resident payload
#: around a GB. The reference's matched condition (13.5k docs × ~1 KB,
#: vector_db_api.log:736-738) is ~14 MB — comfortably matrix-tier.
DEFAULT_MAX_PAYLOAD_BYTES = 256 * 1024 * 1024

#: Estimated serialized bytes per row for the fixed-width payload
#: columns (ints, doubles, timestamps) — generous so the estimate errs
#: toward the distributed tier.
_FIXED_WIDTH_ROW_BYTES = 16

def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 words (numpy in this
    container predates np.bitwise_count). Chosen over a 256-entry byte
    LUT after measuring: the LUT's fancy-indexed gather over (n, d/8)
    bytes cost MORE than the full-dimension GEMV it was meant to
    undercut (2.4 ms vs 0.5 ms at N=13.5k, d=384); six arithmetic ops
    on (n, d/64) words run at memory speed."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _pack_bits64(bits_2d: np.ndarray) -> np.ndarray:
    """(n, d) boolean sign bits → (n, ⌈d/64⌉) uint64 words — the
    binary_quant_recall query's documented production layout (one
    BIGINT word per 64 dims, Hamming = popcount(xor))."""
    packed = np.packbits(bits_2d, axis=1)  # (n, ceil(d/8)) uint8
    pad = (-packed.shape[1]) % 8
    if pad:
        packed = np.pad(packed, ((0, 0), (0, pad)))
    return np.ascontiguousarray(packed).view(np.uint64)

#: Admission multiple of the bits tier over the float matrix tier:
#: one packed sign bit per dimension vs one float64 cell — the SAME
#: byte budget admits 64× the cells (the r13 measurement that the
#: packed layout's value is BYTES, not FLOPs: SCALING.md r13 "The
#: consumed dials"). A corpus past ``max_cells`` float64 cells but
#: within ``64 × max_cells`` sign bits serves Hamming-prefiltered
#: queries from driver memory, reranking survivors via a bounded
#: sidecar fetch (:class:`BitsMatrixIndex`).
BITS_ADMISSION_MULTIPLE = 64

#: Separate (smaller) budget for the hybrid lexical cache: per-doc
#: token Counters cost far more per row than embedding cells, so the
#: BM25 arm only materializes up to this many docs; past it the server
#: serves /hybrid from the Spark path even while /query stays matrix.
DEFAULT_HYBRID_MAX_DOCS = 100_000


#: Target rows per task for the distributed serving scan. ~1k rows of
#: dot-product work (≈0.4M fused multiply-adds at d=384) costs a few ms
#: per task — comfortably above the ~1 ms task-launch overhead, so the
#: scan stays parallel without paying 32 task launches to score 13k
#: rows. Large corpora never hit this path's repartition: the helper
#: caps at the core count and file-based partitioning takes over.
SERVING_SCAN_TARGET_ROWS = 1_000


def serving_scan_partitions(n_rows: int, cpus: int) -> int | None:
    """Partition count for a cached distributed-tier serving corpus,
    or ``None`` when the corpus should keep its source partitioning.

    Serving-latency partition sizing is COMPUTE-based, not byte-based:
    ``spark.sql.files.maxPartitionBytes`` would put a 13.5k×384 corpus
    (≈40 MB as float64) in a single partition, serializing the scan,
    while a blanket ``repartition(cpus)`` schedules 32 tasks of ~400
    rows whose launch overhead exceeds their compute (measured: 16
    partitions beats 32 by ~10 ms/query and 1 by ~300 ms at N=13,515,
    d=384 on local[32]). Aim for :data:`SERVING_SCAN_TARGET_ROWS` rows
    per task, clamped to [1, cpus].

    The sizing only applies in the SMALL-corpus regime (fewer than
    cpus × target rows, where task launch dominates compute): past it,
    returns ``None`` — collapsing a multi-GB corpus into ≤cpus cached
    partitions would build giant blocks for no latency gain, and the
    source (file-based) partitioning is already the right shape."""
    if n_rows > int(cpus) * SERVING_SCAN_TARGET_ROWS:
        return None
    return max(1, min(int(cpus), round(n_rows / SERVING_SCAN_TARGET_ROWS)))


#: Guards the session-global AQE flag across overlapping point queries
#: (the REST server is threaded): per SESSION, the first entrant saves
#: the outside value and the last exiter restores it. A naive per-entry
#: save/restore would interleave under concurrency and could restore
#: "false" permanently; a process-global counter would cross-corrupt
#: two SparkSessions sharing the process. State: {session: [depth,
#: saved_prev]}, entries removed at depth 0 so nothing leaks.
_POINT_QUERY_LOCK = threading.Lock()
_point_query_state: dict = {}


def fill_serving_cache(df: DataFrame, cpus: int):
    """The distributed serving tier's cache fill, in one place (REST
    door and probes share it so benchmarks cannot desynchronize from
    production): cache → materializing count (which doubles as the
    sizing count — no separate scan) → compute-sized re-cache in the
    small regime, where the re-read comes from the just-filled cache,
    not the store. Returns ``(cached_df, n_rows)``; the caller owns
    unpersisting."""
    cached = df.cache()
    n_rows = cached.count()
    parts = serving_scan_partitions(n_rows, cpus)
    if parts is not None and cached.rdd.getNumPartitions() != parts:
        resized = cached.repartition(parts).cache()
        resized.count()
        cached.unpersist()
        cached = resized
    return cached, n_rows


@contextmanager
def point_query_mode(spark):
    """Run shuffle-free point-serving queries with AQE disabled.

    A single-probe serving plan is scan → project(score) →
    TakeOrderedAndProject: no exchange, nothing for adaptive execution
    to re-plan. AQE still wraps it in an AdaptiveSparkPlan whose query-
    stage materialization adds a measured ~10–40 ms per query — pure
    overhead at serving latency (the reference's matched condition is
    0.11 s total). Analytics and ingest jobs keep AQE; only the serving
    door's point queries run inside this context.

    The flag is session-global: concurrent point queries on the SAME
    session share one save/restore via a per-session depth counter
    (threaded REST server), and an analytics job that PLANS while a
    point query executes skips AQE for that one run — a transient
    optimization loss, never a correctness issue. The value from
    OUTSIDE the outermost entry is always restored; a failure while
    entering (e.g. a stopped session) mutates no state, so the
    mechanism never wedges."""
    conf = spark.conf
    entered = False
    try:
        with _POINT_QUERY_LOCK:
            st = _point_query_state.get(spark)
            if st is None:
                # get/set may raise (stopped session) — nothing is
                # recorded until both succeed, so depth never skews
                prev = conf.get("spark.sql.adaptive.enabled", "true")
                conf.set("spark.sql.adaptive.enabled", "false")
                st = _point_query_state[spark] = [0, prev]
            st[0] += 1
            entered = True
        yield
    finally:
        if entered:
            with _POINT_QUERY_LOCK:
                st = _point_query_state[spark]
                st[0] -= 1
                if st[0] == 0:
                    del _point_query_state[spark]
                    conf.set(
                        "spark.sql.adaptive.enabled", st[1] or "true"
                    )


def _size_probe(df: DataFrame, embedding_col: str):
    """(n_rows, first_dim, payload_bytes) for the MATRIX tier's
    admission (the bits tier keeps no payload resident — r15 — and
    probes with its own single aggregate, `BitsMatrixIndex._probe`).
    One combined count+bytes aggregate plus one first-row dim
    probe, BEFORE any collect (the transfer itself is the OOM a
    post-hoc check would arrive too late for). ``first_dim`` is 0 when
    the corpus is empty."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    var_cols = [
        f.name
        for f in df.schema.fields
        if f.name != embedding_col
        and isinstance(f.dataType, (T.StringType, T.BinaryType))
    ]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in var_cols:
        aggs.append(
            F.sum(F.coalesce(F.octet_length(F.col(c)), F.lit(0))).alias(
                f"_b_{c}"
            )
        )
    sizes = df.agg(*aggs).first()
    n = sizes["n"]
    if n == 0:
        return 0, 0, 0
    first_dim = len(df.select(embedding_col).first()[0])
    payload_bytes = n * _FIXED_WIDTH_ROW_BYTES + sum(
        int(sizes[f"_b_{c}"] or 0) for c in var_cols
    )
    return n, first_dim, payload_bytes


def _as_query_matrix(query_vectors) -> np.ndarray:
    """(Q, d) float64 matrix from a batch of query vectors, with the
    batch doors' shared validation: ragged input raises the intended
    equal-length message (a bare ``np.asarray`` would surface numpy's
    inhomogeneous-shape text through the server's 400), non-finite
    values raise the single-door message."""
    rows = [[float(x) for x in v] for v in query_vectors]
    if rows and len({len(r) for r in rows}) != 1:
        raise ValueError(
            "query embeddings must be equal-length numeric vectors"
        )
    Q = np.asarray(rows, dtype=np.float64)
    if Q.ndim != 2:
        raise ValueError(
            "query embeddings must be equal-length numeric vectors"
        )
    if not np.all(np.isfinite(Q)):
        raise ValueError(
            "query embedding contains non-finite values (NaN/Infinity)"
        )
    return Q


def select_among(
    payload: list[dict],
    idx: "np.ndarray | None",
    scores: np.ndarray,
    top_k: int,
    score_threshold: float,
    id_cols: list[str] | None,
) -> list[dict]:
    """The ONE per-query selection rule every driver tier shares
    (matrix and bits tiers MUST not drift): top-k with the
    deterministic tie-break — ALL rows tied with the k-th score stay
    candidates, then ascending ``id_cols`` break ties (Q3) — and the
    score threshold applied AFTER the limit (Q4). ``scores[j]`` scores
    ``payload[idx[j]]`` (``idx=None`` → ``payload[j]``)."""
    m = len(scores)
    k = min(int(top_k), m)
    if k == 0:
        return []
    if k < m:
        part = np.argpartition(-scores, k - 1)[:k]
        kth = scores[part].min()
        cand = np.nonzero(scores >= kth)[0]
    else:
        cand = np.arange(m)

    def _row(j: int) -> dict:
        return payload[int(idx[j]) if idx is not None else j]

    ids = id_cols or []
    ordered = sorted(
        cand.tolist(),
        key=lambda j: (-scores[j], *[_row(j)[c] for c in ids]),
    )[:k]
    out = []
    for j in ordered:
        if scores[j] < score_threshold:  # threshold AFTER limit (Q4)
            continue
        row = dict(_row(j))
        row["score"] = float(scores[j])
        out.append(row)
    return out


class DriverMatrixIndex:
    """An immutable, query-many snapshot of a corpus DataFrame.

    Build with :meth:`from_dataframe` (returns ``None`` when the corpus
    exceeds the cell budget OR the payload-bytes budget — callers then
    use the distributed tier).
    """

    def __init__(
        self,
        matrix: np.ndarray,
        norms: np.ndarray,
        payload: list[dict],
        dim: int,
    ):
        self.matrix = matrix  # (n, dim) float64
        self.norms = norms  # (n,) float64, 0.0 for zero vectors
        self.payload = payload  # row dicts WITHOUT the embedding column
        self.dim = dim
        self._lex = None  # lazy BM25 cache: (postings, dl, avgdl)
        self._rids = None  # lazy rid cache: (id_cols, rids, order)
        self._newest = None  # lazy display cache: (id_cols, rid -> idx)
        self._mrl_norms: dict[int, np.ndarray] = {}  # d' -> prefix norms
        self._bits = None  # lazy sign-bit cache: (n, ceil(dim/8)) uint8
        # guards the lazy caches above: the REST server is threaded,
        # and an unlocked check-then-rebuild lets a concurrent caller
        # with DIFFERENT id_cols publish its cache between another
        # caller's key check and read — the reader would consume the
        # wrong key's rids. Builders compute into locals and re-check
        # under the lock; readers return the local, never re-read the
        # attribute after publish.
        self._cache_lock = threading.Lock()

    @property
    def n(self) -> int:
        return self.matrix.shape[0]

    @classmethod
    def from_dataframe(
        cls,
        df: DataFrame,
        *,
        embedding_col: str = "embedding",
        max_cells: int = DEFAULT_MAX_CELLS,
        max_payload_bytes: int = DEFAULT_MAX_PAYLOAD_BYTES,
    ) -> "DriverMatrixIndex | None":
        """Materialize ``df`` if it fits BOTH budgets, else ``None``.

        Admission is two-termed: embedding cells (``n × dim``) AND
        payload bytes (everything else the tier keeps driver-side).
        The payload term is estimated with a Spark aggregate BEFORE any
        collect (`_size_probe` — shared with the bits tier) — the
        Arrow transfer itself is the OOM, so a post-hoc ``tbl.nbytes``
        check would arrive too late. One combined count+bytes
        aggregate + one Arrow collect — both at cache-fill time, never
        on the query path. Rows whose embedding length disagrees with
        the first row's are a corrupt store; they raise here (the
        distributed path raises the same Q5-shaped error lazily).
        """
        n, first_dim, payload_bytes = _size_probe(df, embedding_col)
        if n == 0:
            return cls(np.zeros((0, 0)), np.zeros(0), [], 0)
        if n * first_dim > max_cells:
            return None
        if payload_bytes > max_payload_bytes:
            return None
        try:
            # Arrow path: one batched transfer, vectors land as a flat
            # float buffer — ~10× faster fill than Row collection.
            tbl = df.toArrow()
            emb_arr = tbl.column(embedding_col).combine_chunks()
            lens = np.diff(emb_arr.offsets.to_numpy())
            if not np.all(lens == first_dim):
                raise ValueError(
                    f"stored embeddings have inconsistent dimensions "
                    f"({first_dim} vs {int(lens[lens != first_dim][0])})"
                )
            flat = emb_arr.flatten().to_numpy(zero_copy_only=False)
            vecs = np.ascontiguousarray(
                flat.reshape(n, first_dim), dtype=np.float64
            )
            payload = tbl.drop_columns([embedding_col]).to_pylist()
        except ValueError:
            raise
        except Exception:
            # Arrow unavailable for this schema — Row fallback.
            rows = df.collect()
            payload = []
            vecs = np.empty((n, first_dim), dtype=np.float64)
            for i, r in enumerate(rows):
                d = r.asDict(recursive=True)
                emb = d.pop(embedding_col)
                if len(emb) != first_dim:
                    raise ValueError(
                        f"stored embeddings have inconsistent dimensions "
                        f"({first_dim} vs {len(emb)})"
                    )
                vecs[i] = emb
                payload.append(d)
        norms = np.sqrt(np.einsum("ij,ij->i", vecs, vecs))
        return cls(vecs, norms, payload, first_dim)

    def query(
        self,
        query_vector: list[float],
        top_k: int,
        *,
        score_threshold: float = 0.1,
        id_cols: list[str] | None = None,
        mrl_dim: int | None = None,
        mrl_shortlist: int | None = None,
        hamming_shortlist: int | None = None,
    ) -> list[dict]:
        """Top-k rows as dicts with a ``score`` key — the same contract
        (and the same reference semantics Q1/Q3/Q4/Q5) as
        ``knn_topk(...).collect()`` on this corpus.

        ``mrl_dim=d'`` turns the Matryoshka truncation dial
        (`IVFIndex.search`'s prefix-score-then-rerank, matrix edition):
        candidates are scored on the FIRST d' dimensions (one
        O(n·d') matvec against cached prefix norms), the top
        ``mrl_shortlist`` (default 4×top_k) survive, and only the
        survivors are re-scored at full dimension. ``hamming_shortlist
        =N`` is the sign-bit edition: vectors quantize to 1 bit/dim
        (packed uint8 words, cached), candidates rank by Hamming
        distance (xor + popcount — ~d/8 bytes touched per row instead
        of d float64s), and the N nearest rerank exactly. Latency
        note, measured (SCALING.md r13/r14): at matrix-tier N the
        Hamming prefilter is SLOWER than the straight BLAS matvec —
        the dial exists here for cross-tier semantic parity; the
        regime where it pays is the corpus the matrix tier cannot
        admit, served by :class:`BitsMatrixIndex`. Both
        prefilters keep ALL rows tied at the shortlist boundary (the
        `knn_join_blas` tie rule), so results are deterministic and a
        d'=dim / N≥n setting reproduces the exact path by
        construction. Recall for both dials is a measured contract
        (`mrl_recall_curve` / `binary_quant_recall` grade them;
        `measure_mrl_curve` persists the resolvable curve). Mutually
        exclusive — stacked prefilters compound unmeasured loss."""
        q = np.asarray([float(x) for x in query_vector], dtype=np.float64)
        if not np.all(np.isfinite(q)):
            raise ValueError(
                "query embedding contains non-finite values (NaN/Infinity)"
            )
        if self.n == 0:
            return []
        if q.shape[0] != self.dim:
            raise ValueError(
                f"query dimension {q.shape[0]} != stored dimension {self.dim}"
            )
        cand = self._prefilter_candidates(
            q,
            top_k=top_k,
            mrl_dim=mrl_dim,
            mrl_shortlist=mrl_shortlist,
            hamming_shortlist=hamming_shortlist,
        )
        qn = math.sqrt(float(np.dot(q, q)))
        if cand is None:
            if qn == 0.0:
                scores = np.zeros(self.n)
            else:
                denom = self.norms * qn
                with np.errstate(divide="ignore", invalid="ignore"):
                    scores = np.where(
                        self.norms == 0.0, 0.0, (self.matrix @ q) / denom
                    )
            return self._select_topk(scores, top_k, score_threshold, id_cols)
        # exact rerank over the shortlist only — the full-width matvec
        # runs for |cand| rows, never the corpus
        sub = self._exact_scores_among(cand, q, qn)
        return self._select_among(cand, sub, top_k, score_threshold, id_cols)

    def _exact_scores_among(
        self, idx: np.ndarray, q: np.ndarray, qn: float
    ) -> np.ndarray:
        """Full-dimension cosine for the given row indices only."""
        if qn == 0.0:
            return np.zeros(len(idx))
        norms = self.norms[idx]
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(
                norms == 0.0, 0.0, (self.matrix[idx] @ q) / (norms * qn)
            )

    def _prefilter_candidates(
        self,
        q: np.ndarray,
        *,
        top_k: int,
        mrl_dim: int | None,
        mrl_shortlist: int | None,
        hamming_shortlist: int | None,
    ) -> np.ndarray | None:
        """Candidate row indices from the requested prefilter dial, or
        None when no dial is turned (callers then run the exact path).
        Shared validation + boundary-tie rule for single and batched
        doors (they MUST not drift)."""
        if mrl_dim is None and hamming_shortlist is None:
            if mrl_shortlist is not None:
                raise ValueError("mrl_shortlist requires mrl_dim")
            return None
        if mrl_dim is not None and hamming_shortlist is not None:
            raise ValueError(
                "mrl_dim and hamming_shortlist are mutually exclusive — "
                "each is a separately measured prefilter; pick the dial "
                "whose curve you measured"
            )
        k = max(int(top_k), 1)
        if mrl_dim is not None:
            if int(mrl_dim) < 1:
                raise ValueError(f"mrl_dim must be >= 1, got {mrl_dim}")
            n_short = (
                int(mrl_shortlist) if mrl_shortlist is not None else 4 * k
            )
            if n_short < k:
                raise ValueError(
                    f"mrl_shortlist ({n_short}) must be >= top_k ({k})"
                )
            d = min(int(mrl_dim), self.dim)
            pnorms = self._prefix_norms(d)
            qp = q[:d]
            qpn = math.sqrt(float(np.dot(qp, qp)))
            if qpn == 0.0:
                pre = np.zeros(self.n)
            else:
                with np.errstate(divide="ignore", invalid="ignore"):
                    pre = np.where(
                        pnorms == 0.0,
                        0.0,
                        (self.matrix[:, :d] @ qp) / (pnorms * qpn),
                    )
            if n_short >= self.n:
                return np.arange(self.n)
            part = np.argpartition(-pre, n_short - 1)[:n_short]
            kth = pre[part].min()
            return np.nonzero(pre >= kth)[0]
        n_short = int(hamming_shortlist)
        if n_short < k:
            raise ValueError(
                f"hamming_shortlist ({n_short}) must be >= top_k ({k})"
            )
        bits = self._sign_bits()
        qbits = _pack_bits64((q > 0).reshape(1, -1))
        ham = _popcount64(np.bitwise_xor(bits, qbits)).sum(
            axis=1, dtype=np.int64
        )
        if n_short >= self.n:
            return np.arange(self.n)
        part = np.argpartition(ham, n_short - 1)[:n_short]
        kth = ham[part].max()
        return np.nonzero(ham <= kth)[0]

    def _prefix_norms(self, d: int) -> np.ndarray:
        """Cached ‖row[:d]‖ per corpus row (one O(n·d') pass per
        distinct d', then free). Same locked build-into-local pattern
        as the other lazy caches — the REST server is threaded."""
        got = self._mrl_norms.get(d)
        if got is not None:
            return got
        sub = self.matrix[:, :d]
        norms = np.sqrt(np.einsum("ij,ij->i", sub, sub))
        with self._cache_lock:
            return self._mrl_norms.setdefault(d, norms)

    def _sign_bits(self) -> np.ndarray:
        """Cached 1-bit/dim sign quantization, packed 64 dims per
        uint64 word — the binary_quant_recall query's documented
        production layout (Hamming = popcount(xor), SWAR; see
        `_popcount64` for why not a byte LUT)."""
        got = self._bits
        if got is not None:
            return got
        bits = _pack_bits64(self.matrix > 0)
        with self._cache_lock:
            if self._bits is None:
                self._bits = bits
            return self._bits

    def _select_topk(
        self,
        scores: np.ndarray,
        top_k: int,
        score_threshold: float,
        id_cols: list[str] | None,
    ) -> list[dict]:
        """Shared per-query selection (single and batched doors MUST
        not drift): top-k with the deterministic tie-break — ALL rows
        tied with the k-th score stay candidates, then ascending
        id_cols break ties — and the threshold applied AFTER the limit
        (Q4)."""
        return self._select_among(
            None, scores, top_k, score_threshold, id_cols
        )

    def _select_among(
        self,
        idx: np.ndarray | None,
        scores: np.ndarray,
        top_k: int,
        score_threshold: float,
        id_cols: list[str] | None,
    ) -> list[dict]:
        """`_select_topk` over a candidate SUBSET: ``scores[j]`` scores
        corpus row ``idx[j]`` (``idx=None`` → the full corpus, the
        historical path). Delegates to the module-level
        :func:`select_among` — ONE selection implementation shared
        with the bits tier so no driver tier can drift on tie-breaks
        or the threshold-after-limit rule."""
        return select_among(
            self.payload, idx, scores, top_k, score_threshold, id_cols
        )

    def query_batch(
        self,
        query_vectors: list[list[float]],
        top_k: int,
        *,
        score_threshold: float = 0.1,
        id_cols: list[str] | None = None,
        mrl_dim: int | None = None,
        mrl_shortlist: int | None = None,
        hamming_shortlist: int | None = None,
    ) -> list[list[dict]]:
        """Batched twin of :meth:`query`: ONE GEMM scores all Q queries
        against the corpus (``matrix @ Q.T``), then the per-query
        selection reuses the single-query path exactly. Per-query cost
        amortizes the matrix traversal — BLAS reuses each corpus row
        across all Q columns while it is in cache, which a Q-times
        loop of matrix-vector products cannot.

        With a prefilter dial turned (``mrl_dim`` /
        ``hamming_shortlist`` — :meth:`query`'s contract, validated by
        the same shared code), the full-corpus GEMM is SKIPPED: each
        query runs the prefix/Hamming prefilter (O(n·d') or O(n·d/8)
        per query) and full-width arithmetic touches only its
        shortlist rows — the per-query loop here is bounded by the
        cheap prefilter, not the d-wide corpus pass."""
        Q = _as_query_matrix(query_vectors)
        if self.n == 0:
            return [[] for _ in range(Q.shape[0])]
        if Q.shape[1] != self.dim:
            raise ValueError(
                f"query dimension {Q.shape[1]} != stored dimension {self.dim}"
            )
        if mrl_dim is not None or hamming_shortlist is not None:
            out = []
            for j in range(Q.shape[0]):
                q = np.ascontiguousarray(Q[j])
                cand = self._prefilter_candidates(
                    q,
                    top_k=top_k,
                    mrl_dim=mrl_dim,
                    mrl_shortlist=mrl_shortlist,
                    hamming_shortlist=hamming_shortlist,
                )
                # math.sqrt(dot), not the einsum norm: bit-identical to
                # the single door (the batch/single parity tests pin it)
                qn_j = math.sqrt(float(np.dot(q, q)))
                sub = self._exact_scores_among(cand, q, qn_j)
                out.append(
                    self._select_among(
                        cand, sub, top_k, score_threshold, id_cols
                    )
                )
            return out
        if mrl_shortlist is not None:
            raise ValueError("mrl_shortlist requires mrl_dim")
        qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))  # (q,)
        dots = self.matrix @ Q.T  # (n, q) — the one GEMM
        denom = np.outer(self.norms, qn)
        with np.errstate(divide="ignore", invalid="ignore"):
            scores = np.where(denom == 0.0, 0.0, dots / denom)
        return [
            self._select_topk(
                np.ascontiguousarray(scores[:, j]),
                top_k,
                score_threshold,
                id_cols,
            )
            for j in range(Q.shape[0])
        ]

    def _scores(self, query_vector: list[float]) -> np.ndarray:
        q = np.asarray([float(x) for x in query_vector], dtype=np.float64)
        if q.shape[0] != self.dim:
            raise ValueError(
                f"query dimension {q.shape[0]} != stored dimension {self.dim}"
            )
        qn = math.sqrt(float(np.dot(q, q)))
        if qn == 0.0:
            return np.zeros(self.n)
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(
                self.norms == 0.0, 0.0, (self.matrix @ q) / (self.norms * qn)
            )

    def _lex_cache(self, content_col: str):
        """Inverted-index BM25 cache: term → (doc-index array, tf
        array) postings, plus doc lengths and avgdl — built once, on
        the first hybrid query (same lazy-fill contract as the matrix
        itself). Tokenization mirrors functions/text.py's ASCII_WS
        split exactly. Postings replace the r11 per-doc Counter list:
        a hybrid query then touches only ITS terms' postings (document
        frequency is len(idx), O(1)) instead of scanning every doc's
        Counter per term — the loop shape the /hybrid_batch door would
        otherwise pay Q times per POST. Note: keyed implicitly on the
        FIRST content_col used (the REST door always passes 'content');
        guarded by the shared cache lock like the rid caches."""
        import re
        from collections import Counter

        with self._cache_lock:
            if self._lex is None:
                ws = re.compile(r"[ \t\n\x0b\f\r]+")
                raw: dict = {}
                dl = np.zeros(self.n, dtype=np.float64)
                for i, row in enumerate(self.payload):
                    toks = [
                        t
                        for t in ws.split(
                            (row.get(content_col) or "").lower()
                        )
                        if t
                    ]
                    dl[i] = len(toks)
                    for t, tf in Counter(toks).items():
                        raw.setdefault(t, []).append((i, tf))
                postings = {
                    t: (
                        np.fromiter(
                            (i for i, _ in pl),
                            dtype=np.int64,
                            count=len(pl),
                        ),
                        np.fromiter(
                            (tf for _, tf in pl),
                            dtype=np.float64,
                            count=len(pl),
                        ),
                    )
                    for t, pl in raw.items()
                }
                avgdl = float(dl.sum() / self.n) if self.n else 0.0
                self._lex = (postings, dl, avgdl)
            cached = self._lex
        return cached

    def _rid_cache(self, id_cols: list[str]):
        """'#'-joined rid per row plus its ascending-order rank array
        (for C-speed lexsort tie-breaks) — cached per id_cols tuple;
        the rid join used to be rebuilt O(n) per hybrid query."""
        key = tuple(id_cols)
        with self._cache_lock:
            if self._rids is None or self._rids[0] != key:
                rids = [
                    "#".join(str(self.payload[i][c]) for c in id_cols)
                    for i in range(self.n)
                ]
                order = np.empty(self.n, dtype=np.int64)
                order[
                    np.argsort(np.array(rids, dtype=object), kind="stable")
                ] = np.arange(self.n)
                self._rids = (key, rids, order)
            cached = self._rids
        return cached[1], cached[2]

    def _newest_cache(
        self,
        id_cols: list[str],
        timestamp_col: str,
        content_col: str = "content",
    ):
        """rid → payload index of the NEWEST copy — the matrix-tier
        twin of the engine's bounded post-join dedupe window in
        `search_diverse` (a plain store can hold repeated
        (path, chunk_index) rows after a blind re-ingest). The rule is
        the SAME on both tiers so cross-tier parity survives duplicate
        stores: max timestamp, then MIN content among equal stamps
        (the engine window orders ``timestamp desc, content asc`` — a
        bare timestamp would crown an arbitrary copy per run), then
        first-seen. Built once per id_cols, O(n)."""
        key = (tuple(id_cols), timestamp_col, content_col)
        rids, _ = self._rid_cache(id_cols)  # outside the lock: reentry
        with self._cache_lock:
            if self._newest is None or self._newest[0] != key:
                newest: dict = {}
                for i, row in enumerate(self.payload):
                    ts = row.get(timestamp_col)
                    ct = row.get(content_col)
                    prev = newest.get(rids[i])
                    if prev is None or self._fresher(
                        ts, ct, prev[0], prev[1]
                    ):
                        newest[rids[i]] = (ts, ct, i)
                self._newest = (
                    key,
                    {r: i for r, (_, _, i) in newest.items()},
                )
            cached = self._newest
        return cached[1]

    @staticmethod
    def _fresher(ts, ct, pts, pct) -> bool:
        """True when (ts, ct) beats the incumbent under the engine's
        display-dedupe ordering: timestamp DESC (None = oldest),
        content ASC (None = smallest, mirroring Spark's nulls-first on
        asc), first-seen keeps ties."""
        if ts is None and pts is not None:
            return False
        if pts is None and ts is not None:
            return True
        if ts is not None and pts is not None and ts != pts:
            return ts > pts
        # equal timestamps: min content wins; None sorts first
        if ct is None:
            return pct is not None
        if pct is None:
            return False
        return ct < pct

    def diverse_query(
        self,
        query_vector: list[float],
        top_k: int,
        *,
        fetch_k: int = 50,
        lambda_: float = 0.5,
        id_cols: list[str],
        score_threshold: float = 0.1,
        timestamp_col: str = "timestamp",
    ) -> list[dict]:
        """MMR-diversified search over the cached corpus — the same
        two-stage semantics as ``VectorEngine.search_diverse`` (top-
        ``fetch_k`` relevance candidates tie-broken rid-ascending,
        greedy MMR via the SHARED `operators.search.mmr_greedy`
        kernel, relevance threshold applied AFTER selection, newest
        copy per rid in the display), without a Spark job. Duplicate-
        rid candidate rows collapse to one candidate per rid keeping
        the BEST score — the same deterministic rule the engine door
        applies before its rerank.

        The relevance scores come from the BLAS matvec, so they sit
        within the established ~1e-9 tier contract of the other
        matrix-tier doors; the MMR loop itself is the bit-identical
        shared kernel."""
        from converttovectordb_spark.operators.search import validate_top_k

        if not 0.0 <= lambda_ <= 1.0:
            raise ValueError(f"lambda_ must be in [0, 1], got {lambda_}")
        k = validate_top_k(top_k)
        if self.n == 0:
            return []
        q = np.asarray([float(x) for x in query_vector], dtype=np.float64)
        if not np.all(np.isfinite(q)):
            # same guard (and message) as query()/query_batch: NaN
            # scores would otherwise corrupt every greedy comparison
            # AND survive the threshold (NaN < t is False), shipping
            # RFC-invalid JSON
            raise ValueError(
                "query embedding contains non-finite values (NaN/Infinity)"
            )
        scores = self._scores(query_vector)  # Q5 dim guard lives here
        return self._diverse_from_scores(
            scores,
            k,
            fetch_k=fetch_k,
            lambda_=lambda_,
            id_cols=id_cols,
            score_threshold=score_threshold,
            timestamp_col=timestamp_col,
        )

    def diverse_query_batch(
        self,
        query_vectors: list[list[float]],
        top_k: int,
        *,
        fetch_k: int = 50,
        lambda_: float = 0.5,
        id_cols: list[str],
        score_threshold: float = 0.1,
        timestamp_col: str = "timestamp",
    ) -> list[list[dict]]:
        """Batched twin of :meth:`diverse_query`: ONE GEMM scores all
        Q queries (``matrix @ Q.T`` — the `query_batch` shape, where a
        Q-times loop of matvecs re-traverses the corpus per query),
        then each query's candidate cutoff + greedy MMR reuses the
        single-query path exactly."""
        from converttovectordb_spark.operators.search import validate_top_k

        if not 0.0 <= lambda_ <= 1.0:
            raise ValueError(f"lambda_ must be in [0, 1], got {lambda_}")
        k = validate_top_k(top_k)
        Q = _as_query_matrix(query_vectors)
        if self.n == 0:
            return [[] for _ in range(Q.shape[0])]
        if Q.shape[1] != self.dim:
            raise ValueError(
                f"query dimension {Q.shape[1]} != stored dimension {self.dim}"
            )
        qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))  # (q,)
        dots = self.matrix @ Q.T  # (n, q) — the one GEMM
        denom = np.outer(self.norms, qn)
        with np.errstate(divide="ignore", invalid="ignore"):
            scores = np.where(denom == 0.0, 0.0, dots / denom)
        return [
            self._diverse_from_scores(
                np.ascontiguousarray(scores[:, j]),
                k,
                fetch_k=fetch_k,
                lambda_=lambda_,
                id_cols=id_cols,
                score_threshold=score_threshold,
                timestamp_col=timestamp_col,
            )
            for j in range(Q.shape[0])
        ]

    def _diverse_from_scores(
        self,
        scores: np.ndarray,
        k: int,
        *,
        fetch_k: int,
        lambda_: float,
        id_cols: list[str],
        score_threshold: float,
        timestamp_col: str,
    ) -> list[dict]:
        """Shared per-query tail of the diverse doors (single and
        batched MUST not drift): fetch_k row-level cutoff by (score
        desc, rid asc), best-score-per-rid collapse, the shared
        `mmr_greedy` kernel, relevance threshold AFTER selection,
        newest-copy display rows."""
        from converttovectordb_spark.operators.search import mmr_greedy

        rids, rid_order = self._rid_cache(id_cols)
        # candidate stage: first fetch_k ROWS by (score desc, rid asc)
        # — row-level like the engine's orderBy+limit, so a duplicated
        # rid consumes candidate slots identically on both tiers —
        # then collapse to distinct rids for the kernel (first in this
        # ordering = best score per rid, the engine's collapse rule)
        limit = min(max(int(fetch_k), k), self.n)
        order = np.lexsort((rid_order, -scores))[:limit]
        cand: dict = {}
        for i in order:
            rid = rids[int(i)]
            if rid not in cand:
                cand[rid] = (
                    float(scores[i]),
                    [float(x) for x in self.matrix[int(i)]],
                )
        newest = self._newest_cache(id_cols, timestamp_col)
        out = []
        for rid, rel, mmr, rank in mmr_greedy(cand, k, float(lambda_)):
            if rel < score_threshold:  # threshold AFTER selection
                continue
            row = dict(self.payload[newest[rid]])
            row["score"] = rel
            row["mmr"] = mmr
            row["mmr_rank"] = rank
            out.append(row)
        return out

    def hybrid_query(
        self,
        query_vector: list[float],
        terms: list[str],
        top_k: int,
        *,
        candidates: int = 50,
        k_rrf: int = 60,
        id_cols: list[str],
        content_col: str = "content",
        k1: float = 1.2,
        b: float = 0.75,
    ) -> list[dict]:
        """Reciprocal-rank fusion of the cosine arm and a BM25 arm over
        the cached corpus — the same semantics (ranking, tie-breaks,
        RRF constant, join-back columns) as ``VectorEngine.
        search_hybrid``, without a Spark job. Both arms reduce to
        ``candidates`` ranks before fusing; ids fuse on the same
        '#'-joined rid the engine builds."""
        if self.n == 0:
            return []
        rids, rid_order = self._rid_cache(id_cols)
        # semantic arm: rank by (score desc, rid asc), top `candidates`
        # — lexsort keys are reversed (last is primary), rid rank
        # breaks exact score ties ascending, C-speed instead of a
        # Python-key sort of the whole corpus per query
        scores = self._scores(query_vector)
        sem_order = np.lexsort((rid_order, -scores))[
            : max(int(candidates), 1)
        ]
        sem_rank = {int(i): r + 1 for r, i in enumerate(sem_order)}
        # lexical arm: BM25 accumulated over the QUERY terms' postings
        # only (inverted index — df is len(postings), never a corpus
        # scan per term)
        postings, dl, avgdl = self._lex_cache(content_col)
        n_docs = self.n
        qterms = sorted({t.lower() for t in terms})
        bm25 = np.zeros(self.n, dtype=np.float64)
        touched = np.zeros(self.n, dtype=bool)
        for t in qterms:
            pl = postings.get(t)
            if pl is None:
                continue
            idx, tf = pl
            idf = math.log((n_docs - len(idx) + 0.5) / (len(idx) + 0.5) + 1.0)
            denom = tf + k1 * (1 - b + b * dl[idx] / avgdl)
            bm25[idx] += idf * (tf * (k1 + 1)) / denom
            touched[idx] = True
        nz = np.flatnonzero(touched)
        lex_order = nz[np.lexsort((rid_order[nz], -bm25[nz]))][
            : max(int(candidates), 1)
        ]
        lex_rank = {int(i): r + 1 for r, i in enumerate(lex_order)}
        # fuse: rrf over the union, top_k by (rrf desc, rid asc)
        fused = {}
        for i, r in sem_rank.items():
            fused[i] = fused.get(i, 0.0) + 1.0 / (k_rrf + r)
        for i, r in lex_rank.items():
            fused[i] = fused.get(i, 0.0) + 1.0 / (k_rrf + r)
        picked = sorted(fused, key=lambda i: (-fused[i], rids[i]))[
            : max(int(top_k), 1)
        ]
        out = []
        for i in picked:
            row = dict(self.payload[i])
            row["sem_rank"] = sem_rank.get(i)
            row["lex_rank"] = lex_rank.get(i)
            row["rrf"] = float(fused[i])
            out.append(row)
        return out


#: Sidecar column carrying each corpus row's fill-time position — the
#: join key between the driver-resident packed bits + row ids and the
#: on-disk full-precision embeddings + display payloads the rerank
#: fetches.
BITS_ROW_COL = "_bits_row"

#: Row-block size for the bits tier's Hamming scan. The SWAR popcount
#: allocates ~3 full-size temporaries of its input; an unblocked scan
#: over a ceiling-admitted corpus (packed words = the WHOLE driver
#: byte budget) would transiently triple it — the admission gate would
#: be a lie on the first dialed query. 1M rows × 6 words (d=384) is a
#: 48 MB working set per temporary, amortizing numpy dispatch while
#: bounding the transient regardless of corpus size.
BITS_SCAN_BLOCK_ROWS = 1_048_576

#: Upper bound on rows a single bits-tier rerank fetch may collect.
#: The tier's whole premise is that full-precision vectors do NOT fit
#: driver memory — a shortlist approaching the corpus size would turn
#: the "bounded fetch" into exactly the Arrow-collect OOM the tier
#: exists to avoid (and build a corpus-sized IN plan on the way).
#: 100k rows at d=384 float64 is ~300 MB transient — safely under the
#: budgets — while every sane shortlist (a few × top_k) sits orders of
#: magnitude below it.
BITS_FETCH_MAX_ROWS = 100_000


class BitsTierInvalidated(RuntimeError):
    """The bits tier was closed (cache invalidation) while a request
    was arriving — the request raced a write; retrying resolves
    against the refilled cache. Servers map this to a retryable
    status, never a client error."""


class BitsFillRace(RuntimeError):
    """The corpus changed between the bits-tier fill's admission probe
    and its collect (row count / word-buffer shape no longer match the
    probe). Transient by construction — the store moved under the fill
    — so servers route this to the same retry/503 path as a
    token-moved invalidation, NEVER to a negative-cached client error
    (ADVICE r14: only genuine corpus corruption, the inconsistent-
    dimension ValueError, deserves the 400 + negative cache)."""


def bits_resident_cells(n_rows: int, dim: int) -> int:
    """Driver-resident footprint of a bits-tier corpus, priced in BIT
    cells against ``max_cells × BITS_ADMISSION_MULTIPLE`` (the same
    byte budget as ``max_cells`` float64 cells). Per row: the packed
    sign words (word-padded — padding is real memory), the int64
    sidecar row id, and the per-query int64 Hamming-distance scratch
    array, each 64-bit item priced as 64 bit-cells. Nothing else is
    resident — display payloads ride the SAME bounded sidecar fetch
    that reranks the shortlist (r14 verdict #1: the r14 design kept
    `to_pylist()` payload dicts driver-side, and their ~256-400 B/row
    gated admission ~5× below what the bit layout could hold)."""
    n_words = (int(dim) + 63) // 64
    return int(n_rows) * (n_words + 2) * 64


#: Artifact-layout names for the persisted bits tier (r14 verdict #1):
#: ``<root>/CURRENT`` names the live version dir (atomic pointer swap,
#: the `TransactionalIVFIndex.publish_current` recipe);
#: ``<root>/v-<hex>/`` holds {sidecar parquet, packed words, row ids,
#: meta}. The packed words and row ids are deterministic functions of
#: the store, so they persist under the same store-token staleness +
#: fsck lifecycle as the IVF/lex artifacts — a server restart loads
#: them (zero corpus jobs) instead of re-paying the measured 54-100 s
#: fill at 0.6-2.4M rows.
BITS_CURRENT_FILE = "CURRENT"
BITS_META_FILE = "_meta.json"
BITS_SIDECAR_DIR = "sidecar"
BITS_WORDS_FILE = "words.npy"
BITS_ROWIDS_FILE = "row_ids.npy"
BITS_FORMAT = 1

#: Per-PROCESS refcount of live index objects per artifact version dir,
#: plus the set of dirs some owner has doomed (asked removed). Two
#: in-process objects can share one dir — e.g. a deferred-close index
#: still draining readers while `_bits_handle` re-loads the same
#: CURRENT and finds it stale — and an unguarded `close()` on either
#: would rmtree the files under the other's in-flight sidecar fetch.
#: Rule: every owner retires exactly once (unref; doom if it wanted
#: removal); the LAST retiree performs the rmtree iff the dir is
#: doomed. `build_current`'s orphan sweep also skips dirs with live
#: refs. Cross-PROCESS coordination is out of scope — the artifact
#: follows the same single-writer/maintainer convention as the
#: IVF/lex/sigstore artifacts (see `build_current`).
_BITS_DIR_REFS: dict[str, int] = {}
_BITS_DIR_DOOMED: set[str] = set()
_BITS_DIR_LOCK = threading.Lock()


def _bits_dir_ref(path: str) -> None:
    with _BITS_DIR_LOCK:
        _BITS_DIR_REFS[path] = _BITS_DIR_REFS.get(path, 0) + 1


def _bits_dir_unref(path: str, doom: bool) -> bool:
    """Drop one owner; returns True when the caller (the last owner
    out) must remove the doomed dir."""
    with _BITS_DIR_LOCK:
        if doom:
            _BITS_DIR_DOOMED.add(path)
        left = _BITS_DIR_REFS.get(path, 1) - 1
        if left > 0:
            _BITS_DIR_REFS[path] = left
            return False
        _BITS_DIR_REFS.pop(path, None)
        if path in _BITS_DIR_DOOMED:
            _BITS_DIR_DOOMED.discard(path)
            return True
        return False


def _bits_dirs_live() -> set:
    with _BITS_DIR_LOCK:
        return set(_BITS_DIR_REFS)


class BitsMatrixIndex:
    """Bits-resident serving tier: packed sign bits + sidecar row ids
    in driver memory; full-precision embeddings AND display payloads
    in an on-disk parquet sidecar.

    The r13 measurement (SCALING.md "The consumed dials") showed the
    sign-bit layout's value is BYTES, not FLOPs: integer multi-pass
    Hamming loses to one BLAS GEMV at every N the float matrix tier
    admits, but the packed layout is 64× smaller — the SAME driver
    byte budget admits 64× the rows (:data:`BITS_ADMISSION_MULTIPLE`).
    This tier serves exactly that regime: a corpus past the float
    matrix's admission budget answers ``hamming_shortlist`` queries
    from a memory-speed popcount scan (n × d/8 bytes touched), then
    reranks ONLY the shortlist at full precision via a bounded sidecar
    fetch (a row-id ``IN`` filter over parquet whose monotone row ids
    give row-group pruning — the job reads ~shortlist rows, never the
    corpus). That ONE fetch also returns the display columns, so the
    resident set is packed words + row ids alone
    (:func:`bits_resident_cells` — ~56 B/row at d=384; the r14 design
    kept per-row payload dicts resident and its own 256 B/row pricing
    gated admission ~5× below the bit layout's capacity, r14 verdict
    #1). Admission is therefore genuinely bits-bound.

    Semantics are pinned to
    ``DriverMatrixIndex.query(hamming_shortlist=...)`` — same packed
    layout (`_pack_bits64`), same SWAR popcount, same keep-boundary-
    ties shortlist rule, same exact-cosine rerank (Q1 zero-norm → 0.0)
    and the SHARED :func:`select_among` (Q3 tie-break, Q4 threshold
    after limit) — so the graded ``hamming_prefilter_knn`` composition
    describes both tiers. The reference analog is the memory ceiling
    its in-RAM store hits (mock_vector_db_api.py:29-30): it has no
    answer past that ceiling; this tier is ours.

    Two lifecycles share one implementation:

    * :meth:`from_dataframe` — EPHEMERAL (tests/probes): a uuid
      version dir under the caller's temp root, removed by
      :meth:`close` / GC.
    * :meth:`build_current` / :meth:`load_current` — PERSISTED (the
      serving door): versioned dirs under a stable root with an
      atomic ``CURRENT`` pointer and a store-token-stamped meta, so a
      restart against an unchanged store loads the packed words +
      row ids from disk with ZERO corpus jobs (the fill is 54-100 s
      at 0.6-2.4M rows — ~5 min at the documented ~7M-docs/replica
      envelope). Staleness/heal/fsck follow the IVF/lex artifact
      rules (`fsck._fsck_bits`).
    """

    def __init__(
        self,
        words: np.ndarray,
        row_ids: np.ndarray,
        dim: int,
        *,
        spark=None,
        artifact_path: str | None = None,
        embedding_col: str = "embedding",
        store_token: str | None = None,
        ephemeral: bool = True,
    ):
        self.words = words  # (n, ceil(dim/64)) uint64 sign bits
        self.row_ids = row_ids  # (n,) int64 sidecar row ids
        self.dim = dim
        self._spark = spark
        self.artifact_path = artifact_path  # version dir (sidecar+npy+meta)
        self.store_token = store_token  # token digest the fill saw
        self._ephemeral = ephemeral
        self._embedding_col = embedding_col
        self._side = None  # lazy sidecar DataFrame handle
        self._removed = False
        self._lock = threading.Lock()
        # close() is DEFERRED while queries are in flight: invalidation
        # must not rmtree the sidecar out from under a live fetch (the
        # reader would 500 on a request that was valid when it
        # started). Queries refcount _active; close() marks pending
        # and the last finisher removes the artifact.
        self._active = 0
        self._close_pending = False
        self._keep_artifact = False  # release() vs close() intent
        self._retired = False  # this owner's single unref happened
        if artifact_path is not None:
            _bits_dir_ref(artifact_path)
        if artifact_path is not None and ephemeral:
            import shutil
            import weakref

            # GC / interpreter-exit backstop for the EPHEMERAL
            # lifecycle only: a probe that never closes its tier must
            # not leak a full-precision corpus copy in the temp dir.
            # Persisted artifacts are the opposite contract — they
            # must SURVIVE process exit so the next server loads them.
            self._finalizer = weakref.finalize(
                self, shutil.rmtree, artifact_path, True
            )

    @property
    def n(self) -> int:
        return self.words.shape[0]

    @property
    def sidecar_path(self) -> str | None:
        if self.artifact_path is None or self._removed:
            return None
        return os.path.join(self.artifact_path, BITS_SIDECAR_DIR)

    # -- build / load ---------------------------------------------------

    @staticmethod
    def _probe(df: DataFrame, embedding_col: str) -> tuple[int, int]:
        """(n_rows, dim) in ONE aggregate that doubles as the
        dim-consistency check — a corrupt store must raise BEFORE the
        sidecar write pays (then discards) a full corpus pass,
        especially since a failed fill is retried by callers."""
        from pyspark.sql import functions as F

        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.size(F.col(embedding_col))).alias("lo"),
            F.max(F.size(F.col(embedding_col))).alias("hi"),
        ).first()
        n = int(agg["n"])
        if n == 0:
            return 0, 0
        lo, hi = int(agg["lo"]), int(agg["hi"])
        if lo != hi:
            raise ValueError(
                f"stored embeddings have inconsistent dimensions "
                f"({hi} vs {lo})"
            )
        return n, hi

    @classmethod
    def _build_at(
        cls,
        df: DataFrame,
        version_dir: str,
        *,
        store_token: str | None,
        embedding_col: str,
        max_cells: int,
        ephemeral: bool,
    ) -> "BitsMatrixIndex | None":
        import json
        import shutil

        from pyspark.sql import functions as F

        n, dim = cls._probe(df, embedding_col)
        if n == 0:
            return cls(
                np.zeros((0, 0), dtype=np.uint64),
                np.zeros(0, dtype=np.int64),
                0,
                embedding_col=embedding_col,
                store_token=store_token,
                ephemeral=ephemeral,
            )
        if bits_resident_cells(n, dim) > max_cells * BITS_ADMISSION_MULTIPLE:
            return None
        spark = df.sparkSession
        os.makedirs(version_dir, exist_ok=True)
        try:
            sidecar = os.path.join(version_dir, BITS_SIDECAR_DIR)
            # the write IS the lineage cut: monotonically_increasing_id
            # is only stable within one job, so the ids are assigned
            # once, persisted, and every later read (fill collect +
            # every rerank fetch) sees the same mapping.
            # default (128 MiB) row groups, measured: shrinking them to
            # 4 MiB to cut per-candidate decode ballooned the fetch 4×
            # (450 row groups' footers/stats beat the decode saving) —
            # the bounded fetch is footer-bound, not decode-bound
            df.withColumn(
                BITS_ROW_COL, F.monotonically_increasing_id()
            ).write.parquet(sidecar, mode="overwrite")
            side = spark.read.parquet(sidecar)

            from pyspark.sql.functions import pandas_udf

            @pandas_udf("array<long>")
            def _pack(col):
                import pandas as pd

                if len(col) == 0:
                    return pd.Series([], dtype=object)
                arr = np.vstack(
                    [np.asarray(v, dtype=np.float64) for v in col]
                )
                words = _pack_bits64(arr > 0).view(np.int64)
                return pd.Series(list(words))

            # the transfer ships n × (8 + d/8) bytes — row ids plus
            # packed words, never payload strings or n×d×8 floats
            tbl = side.select(
                BITS_ROW_COL,
                _pack(F.col(embedding_col)).alias("_words"),
            ).toArrow()
            n_words = (dim + 63) // 64
            try:
                row_ids = (
                    tbl.column(BITS_ROW_COL).to_numpy().astype(np.int64)
                )
                wcol = tbl.column("_words").combine_chunks()
                flat = wcol.flatten().to_numpy(zero_copy_only=False)
                if len(row_ids) != n or flat.shape[0] != n * n_words:
                    raise BitsFillRace(
                        f"bits-tier fill collected {len(row_ids)} rows "
                        f"where the admission probe counted {n} — the "
                        "store changed during the fill; retry"
                    )
                words = (
                    np.ascontiguousarray(flat.reshape(n, n_words))
                    .astype(np.int64)
                    .view(np.uint64)
                )
            except BitsFillRace:
                raise
            except ValueError as e:
                # numpy shape errors here mean the collect no longer
                # matches the probe — a racing write, not corruption
                raise BitsFillRace(
                    f"store changed during the bits-tier fill ({e}); "
                    "retry"
                ) from e
            order = np.argsort(row_ids, kind="stable")
            words = np.ascontiguousarray(words[order])
            row_ids = np.ascontiguousarray(row_ids[order])
            np.save(os.path.join(version_dir, BITS_WORDS_FILE), words)
            np.save(os.path.join(version_dir, BITS_ROWIDS_FILE), row_ids)
            with open(
                os.path.join(version_dir, BITS_META_FILE), "w"
            ) as fh:
                json.dump(
                    {
                        "format": BITS_FORMAT,
                        "n": n,
                        "dim": dim,
                        "n_words": n_words,
                        "embedding_col": embedding_col,
                        "built_from": store_token,
                    },
                    fh,
                )
            return cls(
                words,
                row_ids,
                dim,
                spark=spark,
                artifact_path=version_dir,
                embedding_col=embedding_col,
                store_token=store_token,
                ephemeral=ephemeral,
            )
        except Exception:
            shutil.rmtree(version_dir, ignore_errors=True)
            raise

    @classmethod
    def from_dataframe(
        cls,
        df: DataFrame,
        sidecar_dir: str,
        *,
        embedding_col: str = "embedding",
        max_cells: int = DEFAULT_MAX_CELLS,
    ) -> "BitsMatrixIndex | None":
        """EPHEMERAL build (tests/probes): materialize the bits tier
        under a uuid dir in ``sidecar_dir`` if the corpus fits the
        bits budget, else ``None``. Removed by :meth:`close` / GC."""
        version_dir = os.path.join(
            sidecar_dir, f"bits-{uuid.uuid4().hex}"
        )
        return cls._build_at(
            df,
            version_dir,
            store_token=None,
            embedding_col=embedding_col,
            max_cells=max_cells,
            ephemeral=True,
        )

    @staticmethod
    def _read_current(root: str) -> str | None:
        try:
            with open(os.path.join(root, BITS_CURRENT_FILE)) as fh:
                name = fh.read().strip()
            return name or None
        except OSError:
            return None

    @classmethod
    def build_current(
        cls,
        df: DataFrame,
        root: str,
        *,
        store_token: str | None,
        embedding_col: str = "embedding",
        max_cells: int = DEFAULT_MAX_CELLS,
    ) -> "BitsMatrixIndex | None":
        """PERSISTED build: sweep crash orphans, build a fresh version
        dir, atomically repoint ``CURRENT``. Returns ``None`` past the
        bits budget (the root is left as-is — fsck reports any stale
        survivor). The previous CURRENT version is NOT swept here: its
        owner removes it via the deferred :meth:`close`, or the next
        build / ``fsck --heal`` sweeps it once unreferenced. The sweep
        also skips any version dir a live in-process index still owns
        (`_BITS_DIR_REFS`) — a deferred-close index draining readers
        must not lose its files to a concurrent refill. Cross-PROCESS:
        same single-writer/maintainer convention as the other persisted
        artifacts — do not run two builders (or a builder beside
        another process's serving fill) against one store root."""
        import shutil

        os.makedirs(root, exist_ok=True)
        cur = cls._read_current(root)
        live = _bits_dirs_live()
        for name in os.listdir(root):
            full = os.path.join(root, name)
            if name.startswith("v-") and name != cur and full not in live:
                shutil.rmtree(full, ignore_errors=True)
            elif name.startswith(".current."):
                try:
                    os.remove(os.path.join(root, name))
                except OSError:
                    pass
        version = f"v-{uuid.uuid4().hex}"
        idx = cls._build_at(
            df,
            os.path.join(root, version),
            store_token=store_token,
            embedding_col=embedding_col,
            max_cells=max_cells,
            ephemeral=False,
        )
        if idx is None or idx.n == 0:
            # over budget, or empty corpus (nothing worth persisting —
            # the empty index needs no files and re-probing is one
            # cheap aggregate)
            return idx
        tmp = os.path.join(root, f".current.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(version)
        os.replace(tmp, os.path.join(root, BITS_CURRENT_FILE))
        return idx

    @classmethod
    def load_current(
        cls,
        spark,
        root: str,
        *,
        embedding_col: str = "embedding",
        max_cells: int | None = None,
    ) -> "BitsMatrixIndex | None":
        """Open the persisted bits artifact with ZERO Spark jobs: read
        ``CURRENT`` → meta → mmap the packed words + row ids. Returns
        ``None`` when absent, dangling, or unreadable — the artifact
        is a derivable cache, so every load failure resolves to
        'rebuild' (fsck reports the corruption separately); staleness
        is the CALLER's check (compare :attr:`store_token` against the
        live store's digest). ``max_cells`` re-applies the CALLER's
        admission budget from the meta alone, BEFORE any array touch:
        a prebuilt artifact (e.g. `build-bits` under the default
        budget) must not bypass a smaller serving process's driver
        gate — the row-id array and per-query distance scratch load
        eagerly, so admitting by 'it exists on disk' would reintroduce
        the OOM the budget exists to prevent."""
        import json

        cur = cls._read_current(root)
        if cur is None:
            return None
        vdir = os.path.join(root, cur)
        try:
            with open(os.path.join(vdir, BITS_META_FILE)) as fh:
                meta = json.load(fh)
            if meta.get("format") != BITS_FORMAT:
                return None
            if max_cells is not None and bits_resident_cells(
                int(meta["n"]), int(meta["dim"])
            ) > int(max_cells) * BITS_ADMISSION_MULTIPLE:
                return None
            # mmap: instant open, lazy page-in — the restart-cheap
            # contract. The blocked Hamming scan reads it like any
            # ndarray; removal under live readers is safe on POSIX
            # (the inode outlives the unlink).
            words = np.load(
                os.path.join(vdir, BITS_WORDS_FILE), mmap_mode="r"
            )
            row_ids = np.load(os.path.join(vdir, BITS_ROWIDS_FILE))
            n, dim, n_words = (
                int(meta["n"]),
                int(meta["dim"]),
                int(meta["n_words"]),
            )
            if (
                words.shape != (n, n_words)
                or words.dtype != np.uint64
                or row_ids.shape != (n,)
                or meta.get("embedding_col") != embedding_col
                or not os.path.isdir(
                    os.path.join(vdir, BITS_SIDECAR_DIR)
                )
            ):
                return None
        except Exception:
            return None
        return cls(
            words,
            row_ids,
            dim,
            spark=spark,
            artifact_path=vdir,
            embedding_col=embedding_col,
            store_token=meta.get("built_from"),
            ephemeral=False,
        )

    # -- lifecycle ------------------------------------------------------

    def close(self) -> None:
        """Remove the artifact (sidecar + packed words; the driver
        arrays die with the object). Idempotent. Deferred twice over:
        while THIS object's queries are in flight (the mark blocks NEW
        entries — retryable `BitsTierInvalidated` — and the last
        in-flight query retires), and while ANY other in-process index
        object still owns the same version dir (the per-process dir
        refcount: the LAST owner out performs the rmtree, so a live
        fetch never has its files deleted underneath it — not even a
        fetch running on a different object over the same dir). For a
        PERSISTED index this is the staleness path (the store moved;
        the artifact is dead weight) — shutdown with a fresh store
        uses :meth:`release` instead, which keeps the files."""
        with self._lock:
            self._close_pending = True
            self._keep_artifact = False
            if self._active == 0:
                self._retire_locked()

    def release(self) -> None:
        """Detach without removing: block new queries (retryable
        `BitsTierInvalidated`), keep every on-disk file — even if a
        query is in flight RIGHT NOW (the retire path honors the keep
        intent; before r15's review pass an in-flight query at
        release time would run the close-style removal and delete the
        artifact the release promised to keep). The shutdown path for
        PERSISTED indexes — the artifact's whole point is that the
        next server start loads it instead of re-paying the fill."""
        with self._lock:
            self._close_pending = True
            self._keep_artifact = True
            if self._active == 0:
                self._retire_locked()

    def _retire_locked(self) -> None:
        """This owner's single exit from the dir refcount (idempotent);
        the last owner out removes the dir iff any owner doomed it."""
        import shutil

        if self._retired:
            return
        self._retired = True
        fin = getattr(self, "_finalizer", None)
        if fin is not None:
            fin.detach()
        if self.artifact_path is None:
            return
        self._side = None
        if _bits_dir_unref(
            self.artifact_path, doom=not self._keep_artifact
        ):
            shutil.rmtree(self.artifact_path, ignore_errors=True)
            self._removed = True

    def _enter_serving(self) -> None:
        with self._lock:
            if self._close_pending:
                raise BitsTierInvalidated(
                    "bits tier cache was invalidated by a concurrent "
                    "write; retry the request"
                )
            self._active += 1

    def _exit_serving(self) -> None:
        with self._lock:
            self._active -= 1
            if self._close_pending and self._active == 0:
                self._retire_locked()

    def _sidecar(self):
        if self._side is None:
            path = self.sidecar_path
            if self._spark is None or path is None:
                raise RuntimeError(
                    "bits tier has no sidecar (closed or empty-built); "
                    "rebuild with from_dataframe/build_current"
                )
            with self._lock:
                if self._side is None:
                    self._side = self._spark.read.parquet(path)
        return self._side

    # -- serving --------------------------------------------------------

    def _shortlist(
        self, q: np.ndarray, top_k: int, hamming_shortlist: int | None
    ) -> np.ndarray:
        """Candidate row indices by Hamming distance on the packed sign
        bits — the matrix tier's `_prefilter_candidates` hamming branch
        verbatim (keep ALL rows tied at the boundary), with the same
        validation messages. ``hamming_shortlist=None`` defaults to
        4×top_k (the prefilter IS this tier's serving plan, not an
        opt-in)."""
        k = max(int(top_k), 1)
        n_short = (
            int(hamming_shortlist)
            if hamming_shortlist is not None
            else 4 * k
        )
        if n_short < k:
            raise ValueError(
                f"hamming_shortlist ({n_short}) must be >= top_k ({k})"
            )
        if n_short >= self.n:
            return np.arange(self.n)
        qbits = _pack_bits64((q > 0).reshape(1, -1))
        # blocked scan: bounds the popcount temporaries to the block's
        # working set (see BITS_SCAN_BLOCK_ROWS) — the distance array
        # itself is n × 8 bytes, priced in bits_resident_cells
        ham = np.empty(self.n, dtype=np.int64)
        for lo in range(0, self.n, BITS_SCAN_BLOCK_ROWS):
            hi = min(lo + BITS_SCAN_BLOCK_ROWS, self.n)
            ham[lo:hi] = _popcount64(
                np.bitwise_xor(self.words[lo:hi], qbits)
            ).sum(axis=1, dtype=np.int64)
        part = np.argpartition(ham, n_short - 1)[:n_short]
        kth = ham[part].max()
        cand = np.nonzero(ham <= kth)[0]
        if len(cand) > BITS_FETCH_MAX_ROWS:
            raise ValueError(
                f"hamming_shortlist={n_short} keeps {len(cand)} "
                f"candidate rows after the boundary-tie rule — a "
                f"degenerate sign-pattern cluster (e.g. many zero or "
                f"constant-sign embeddings) is tied at the k-th "
                f"Hamming distance, past the bits tier's bounded-"
                f"fetch budget ({BITS_FETCH_MAX_ROWS}); this corpus "
                "slice needs the distributed exact door"
            )
        return cand

    def _validate_query(self, query_vector: list[float]) -> np.ndarray:
        q = np.asarray(
            [float(x) for x in query_vector], dtype=np.float64
        )
        if not np.all(np.isfinite(q)):
            raise ValueError(
                "query embedding contains non-finite values (NaN/Infinity)"
            )
        if self.n and q.shape[0] != self.dim:
            raise ValueError(
                f"query dimension {q.shape[0]} != stored dimension {self.dim}"
            )
        return q

    def _fetch_rows(
        self, cand: np.ndarray
    ) -> tuple[np.ndarray, list[dict]]:
        """Full-precision embeddings AND display payloads for the
        candidate rows — ONE bounded Spark job: a row-id ``IN`` filter
        over the sidecar (pushed to parquet; the monotone ids give
        row-group pruning). Reads ~|cand| rows; the corpus is never
        scanned at full width, and nothing row-shaped is resident
        outside this call (the r14 verdict-#1 change: the payload used
        to live driver-side and gated admission)."""
        from pyspark.sql import functions as F

        if len(cand) > BITS_FETCH_MAX_ROWS:
            raise ValueError(
                f"hamming_shortlist resolves to {len(cand)} candidate "
                f"rows, past the bits tier's bounded-fetch budget "
                f"({BITS_FETCH_MAX_ROWS}); a corpus-sized rerank fetch "
                "would collect the full-precision vectors this tier "
                "exists to keep on disk — lower the shortlist, or use "
                "the distributed exact door"
            )
        ids = [int(self.row_ids[int(j)]) for j in cand]
        tbl = (
            self._sidecar()
            .filter(F.col(BITS_ROW_COL).isin(ids))
            .toArrow()
        )
        rows = tbl.to_pylist()
        by_id = {int(r[BITS_ROW_COL]): r for r in rows}
        if len(by_id) != len(ids):
            raise RuntimeError(
                f"bits-tier sidecar fetch returned {len(by_id)} of "
                f"{len(ids)} rows — the sidecar no longer matches the "
                "fill (it is immutable by contract; rebuild the cache)"
            )
        vecs = np.asarray(
            [by_id[i][self._embedding_col] for i in ids],
            dtype=np.float64,
        )
        payload = [
            {
                k: v
                for k, v in by_id[i].items()
                if k not in (self._embedding_col, BITS_ROW_COL)
            }
            for i in ids
        ]
        return vecs, payload

    def _rerank(
        self,
        q: np.ndarray,
        vecs: np.ndarray,
        payload: list[dict],
        top_k: int,
        score_threshold: float,
        id_cols: list[str] | None,
    ) -> list[dict]:
        qn = math.sqrt(float(np.dot(q, q)))
        if qn == 0.0:
            scores = np.zeros(len(payload))
        else:
            norms = np.sqrt(np.einsum("ij,ij->i", vecs, vecs))
            with np.errstate(divide="ignore", invalid="ignore"):
                scores = np.where(
                    norms == 0.0, 0.0, (vecs @ q) / (norms * qn)
                )
        return select_among(
            payload, None, scores, top_k, score_threshold, id_cols
        )

    def query(
        self,
        query_vector: list[float],
        top_k: int,
        *,
        score_threshold: float = 0.1,
        id_cols: list[str] | None = None,
        hamming_shortlist: int | None = None,
    ) -> list[dict]:
        """Top-k rows as dicts with a ``score`` key — the
        ``DriverMatrixIndex.query(hamming_shortlist=...)`` contract
        served from the bits-resident layout: memory-speed Hamming
        shortlist, ONE bounded sidecar fetch (vectors + payload),
        exact rerank, shared selection."""
        q = self._validate_query(query_vector)
        if self.n == 0:
            return []
        self._enter_serving()
        try:
            cand = self._shortlist(q, top_k, hamming_shortlist)
            vecs, payload = self._fetch_rows(cand)
            return self._rerank(
                q, vecs, payload, top_k, score_threshold, id_cols
            )
        finally:
            self._exit_serving()

    def query_batch(
        self,
        query_vectors: list[list[float]],
        top_k: int,
        *,
        score_threshold: float = 0.1,
        id_cols: list[str] | None = None,
        hamming_shortlist: int | None = None,
    ) -> list[list[dict]]:
        """Batched twin of :meth:`query`: per-query Hamming shortlists
        (the popcount scan is the cheap part), then ONE sidecar fetch
        for the UNION of all candidates — the batch pays one Spark job,
        not Q — then each query's exact rerank + shared selection.
        ``results[i]`` answers ``query_vectors[i]`` and equals the
        single door's answer exactly (same arithmetic, same rules)."""
        Q = _as_query_matrix(query_vectors)
        if self.n == 0:
            return [[] for _ in range(Q.shape[0])]
        if Q.shape[1] != self.dim:
            raise ValueError(
                f"query dimension {Q.shape[1]} != stored dimension {self.dim}"
            )
        self._enter_serving()
        try:
            cands = [
                self._shortlist(
                    np.ascontiguousarray(Q[j]), top_k, hamming_shortlist
                )
                for j in range(Q.shape[0])
            ]
            union = np.unique(np.concatenate(cands))
            uvecs, upayload = self._fetch_rows(union)
            pos = {int(c): i for i, c in enumerate(union)}
            out = []
            for j, cand in enumerate(cands):
                sel = [pos[int(c)] for c in cand]
                out.append(
                    self._rerank(
                        np.ascontiguousarray(Q[j]),
                        uvecs[sel],
                        [upayload[i] for i in sel],
                        top_k,
                        score_threshold,
                        id_cols,
                    )
                )
            return out
        finally:
            self._exit_serving()
