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

import numpy as np

from pyspark.sql import DataFrame

#: Default driver-memory budget for the matrix tier, in float64 cells
#: (rows × dim). 200M cells = 1.6 GB — a broadcast-table-sized cache.
#: Above this the server falls back to the distributed scan tier.
DEFAULT_MAX_CELLS = 200_000_000


class DriverMatrixIndex:
    """An immutable, query-many snapshot of a corpus DataFrame.

    Build with :meth:`from_dataframe` (returns ``None`` when the corpus
    exceeds the cell budget — callers then use the distributed tier).
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
    ) -> "DriverMatrixIndex | None":
        """Materialize ``df`` if it fits the budget, else ``None``.

        One count + one Arrow collect — both at cache-fill time, never
        on the query path. Rows whose embedding length disagrees with
        the first row's are a corrupt store; they raise here (the
        distributed path raises the same Q5-shaped error lazily).
        """
        n = df.count()
        if n == 0:
            return cls(np.zeros((0, 0)), np.zeros(0), [], 0)
        first_dim = len(
            df.select(embedding_col).first()[0]
        )
        if n * first_dim > max_cells:
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
    ) -> list[dict]:
        """Top-k rows as dicts with a ``score`` key — the same contract
        (and the same reference semantics Q1/Q3/Q4/Q5) as
        ``knn_topk(...).collect()`` on this corpus."""
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
        qn = math.sqrt(float(np.dot(q, q)))
        if qn == 0.0:
            scores = np.zeros(self.n)
        else:
            denom = self.norms * qn
            with np.errstate(divide="ignore", invalid="ignore"):
                scores = np.where(
                    self.norms == 0.0, 0.0, (self.matrix @ q) / denom
                )
        # Top-k with the deterministic tie-break: ALL rows tied with the
        # k-th score stay candidates, then ascending id_cols break ties.
        k = min(int(top_k), self.n)
        if k < self.n:
            part = np.argpartition(-scores, k - 1)[:k]
            kth = scores[part].min()
            cand = np.nonzero(scores >= kth)[0]
        else:
            cand = np.arange(self.n)
        ids = id_cols or []
        ordered = sorted(
            cand.tolist(),
            key=lambda i: (-scores[i], *[self.payload[i][c] for c in ids]),
        )[:k]
        out = []
        for i in ordered:
            if scores[i] < score_threshold:  # threshold AFTER limit (Q4)
                continue
            row = dict(self.payload[i])
            row["score"] = float(scores[i])
            out.append(row)
        return out
