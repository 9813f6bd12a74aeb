"""Persisted MinHash signature artifact for lexical dedup-on-arrival.

The scale lesson the semantic ingest dedup already learned applies
verbatim to the lexical one: comparing an arriving batch against the
committed corpus must not re-derive corpus-side state per batch.
For MinHash that state is the banded signature table — `bands` rows
per committed chunk, each carrying (rid, sig, band_id, band_key,
chash): the (band_id, band_key) pair drives the candidate equi-join,
the full `sig` component array lets the consumer score the ESTIMATED
Jaccard without re-reading the source text, and `chash` (xxhash64 of
the chunk content) keys the freshness heal — a rid-only delta cannot
see a content CHANGE under an existing path#chunk_index, and the
stale signature it would leave behind could wrongly drop a future
non-duplicate arrival. The rid is the engine-wide `_row_id`
(path#chunk_index). This artifact persists the table next to the
document store and keeps it fresh the same way the IVF index does: a
state-token file earned only after the signatures provably cover the
committed store, healed by (rid, chash) delta when stale, compacted
(superseded rows dropped in the same atomic swap that lands the
recomputed ones) when the store dropped or rewrote rows.

Layout::

    <store>_minhash_sigs/
        data/<uuid>/          one parquet dir per append (atomic: the
                              writer stages to tmp-<uuid> and renames)
        _TOKEN                json {digest, params}; written LAST via
                              tmp+rename — the commit marker

Crash windows are safe by construction: data without a refreshed
_TOKEN just means "stale" → the next flagged ingest heals by delta
(an id anti-join makes the replayed rows a no-op) and rewrites the
token. A params change (hash count, bands, shingle width) invalidates
the artifact wholesale — the loader reports it as absent and the
caller rebuilds.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

#: signature recipe — part of the token file; changing any component
#: (or the row schema) must bump the trailing version so stale
#: artifacts self-invalidate. v2: rows carry `chash` (xxhash64 of the
#: content) so heals detect content changes under an existing rid.
SIG_PARAMS = "nh=32|bands=8|sw=3|v2"


def token_digest(token) -> str | None:
    """Stable cross-process digest of a store state token. The plain
    store's token embeds a frozenset whose repr order is hash-salted,
    so it is canonicalized (sorted) before hashing — same rule as the
    index heal txn id (engine.py append_to_index)."""
    if token is None:
        return None
    basis = token
    if (
        isinstance(token, tuple)
        and len(token) == 2
        and isinstance(token[1], frozenset)
    ):
        basis = (token[0], tuple(sorted(token[1])))
    return hashlib.sha256(repr(basis).encode()).hexdigest()


#: default write-door compaction cadence: fold the per-append parquet
#: dirs once DEFAULT_AUTO_COMPACT_AFTER of them accumulate. The
#: artifact is internal (the engine builds and maintains it), so the
#: policy is ON by default — a push/stream cadence with lexical dedup
#: was the last unbounded small-file producer on the steady-state
#: ingest path (the store and IVF index got the same policy in r10;
#: the reference's own O(N²) per-request rewrite,
#: mock_vector_db_api.py:215, is the cautionary tale).
DEFAULT_AUTO_COMPACT_AFTER = 16


class MinHashSignatureStore:
    """Parquet-backed (rid, sig, band_id, band_key, chash) table with
    a token-file freshness contract. All methods are driver-cheap
    except the actual signature computation, which the CALLER provides
    as a DataFrame — this class only stages, commits, and loads."""

    TOKEN_FILE = "_TOKEN"
    DATA_DIR = "data"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        auto_compact_after: int | None = DEFAULT_AUTO_COMPACT_AFTER,
    ):
        """``auto_compact_after=K``: after an append commit, when the
        data dir holds >= K batch dirs, fold them into one (post-commit
        and warn-don't-fail, same policy as the store and the IVF
        index — the token is already durable, so a failed fold costs
        nothing but the deferred rewrite). ``None`` disarms."""
        if auto_compact_after is not None and auto_compact_after < 2:
            raise ValueError(
                f"auto_compact_after must be >= 2 (every-append rewrites "
                f"are the reference's O(N²) bug), got {auto_compact_after}"
            )
        self.spark = spark
        self.path = path
        self.auto_compact_after = auto_compact_after

    # -- state ---------------------------------------------------------
    def exists(self) -> bool:
        """Present = the data dir holds at least one committed batch
        dir. A bare (empty) data dir — the compact/rebuild crash window
        between renames used to leave one — must read ABSENT: its
        token is untouched (compaction is content-neutral) and would
        otherwise bless an unloadable artifact forever."""
        return bool(self._batch_dirs())

    def token(self) -> str | None:
        """The committed store-token digest, or None when the artifact
        is absent, unreadable, or was built under different params.
        A token WITHOUT a data dir (the rebuild/compact swap's
        rename-away crash window) also reads as absent — callers must
        rebuild, not trust a digest whose rows are gone."""
        if not self.exists():
            return None
        try:
            with open(os.path.join(self.path, self.TOKEN_FILE)) as fh:
                meta = json.load(fh)
        except (OSError, ValueError):
            return None
        if meta.get("params") != SIG_PARAMS:
            return None
        return meta.get("digest")

    # -- io --------------------------------------------------------------
    def load(self) -> DataFrame:
        """All committed signature rows: (rid, sig, band_id, band_key,
        chash) — `sig` is the full LEX_NUM_HASHES-component MinHash
        array the dedup decision scores against (the band columns only
        nominate candidates), `chash` the content hash the heal keys
        on. One parquet dataset per append — recursive lookup, no
        partition inference (the subdirs are commit batches, not
        partitions)."""
        return (
            self.spark.read.option("recursiveFileLookup", "true")
            .parquet(self._data_path())
        )

    def append(self, sigs: DataFrame, digest: str) -> None:
        """Stage one parquet dir atomically, then commit the token.
        Post-commit, the armed compaction policy folds accumulated
        batch dirs — warn-don't-fail: the token is already written, so
        a fold failure defers the rewrite to the next append rather
        than failing a committed heal/ingest."""
        self._write_batch(sigs)
        self._write_token(digest)
        k = self.auto_compact_after
        if k is not None and len(self._batch_dirs()) >= k:
            try:
                self.compact()
            except Exception as exc:  # noqa: BLE001
                import warnings

                warnings.warn(
                    f"auto-compaction of {self.path} failed (append "
                    f"already committed; next append retries): {exc}",
                    RuntimeWarning,
                    stacklevel=2,
                )

    def compact(self) -> int:
        """Fold all committed batch dirs into ONE — content-neutral, so
        the token file is NOT touched (the digest still covers exactly
        the same rows; a stale artifact compacts to a stale artifact).
        Returns the number of dirs folded (0 when there is nothing to
        fold).

        Swap ordering mirrors `rebuild` (stage fully, rename old away,
        rename staged in, then delete): every crash window leaves
        either the old dirs intact (possibly with a parked ``.old.``
        copy the next maintenance RESTORES) or the data dir absent/
        empty, which reads as "artifact missing" (`exists()` /
        `token()`-then-`load()` callers rebuild) — never silently
        duplicated or half-folded rows."""
        self._recover_swap_debris()
        self._sweep_debris()
        dirs = self._batch_dirs()
        if len(dirs) < 2:
            return 0
        # stage from the CURRENT dirs (the staging write is an action —
        # the old files are fully read before any swap step), then
        # assemble the COMPLETE replacement data dir under a tmp name
        # so the swap is two renames with no present-but-empty window
        staged = self._stage(self.load())
        data = self._data_path()
        newdata = data + ".new." + uuid.uuid4().hex
        os.makedirs(newdata)
        os.rename(staged, os.path.join(newdata, os.path.basename(staged)[4:]))
        old = data + ".old." + uuid.uuid4().hex
        os.rename(data, old)
        os.rename(newdata, data)
        shutil.rmtree(old, ignore_errors=True)
        return len(dirs)

    def _batch_dirs(self) -> list[str]:
        data = self._data_path()
        try:
            names = os.listdir(data)
        except FileNotFoundError:
            return []
        return sorted(
            os.path.join(data, n)
            for n in names
            if os.path.isdir(os.path.join(data, n))
        )

    def rebuild(self, sigs: DataFrame, digest: str) -> None:
        """Replace the artifact wholesale (store dropped rows, params
        change, first build). The old data dir is removed only after
        the replacement is fully staged."""
        self._recover_swap_debris()
        self._sweep_debris()
        staged = self._stage(sigs)
        data = self._data_path()
        newdata = data + ".new." + uuid.uuid4().hex
        os.makedirs(newdata)
        os.rename(staged, os.path.join(newdata, os.path.basename(staged)[4:]))
        old = None
        if os.path.exists(data):
            old = data + ".old." + uuid.uuid4().hex
            os.rename(data, old)
        os.rename(newdata, data)
        if old is not None:
            shutil.rmtree(old, ignore_errors=True)
        self._write_token(digest)

    # -- internals -----------------------------------------------------
    def _data_path(self) -> str:
        return os.path.join(self.path, self.DATA_DIR)

    def _recover_swap_debris(self) -> None:
        """Finish a crashed swap BEFORE the sweep can destroy the only
        copy: when no committed batch dirs survive but exactly one
        parked ``data.old.<hex>`` does, restore it (both swaps park the
        complete pre-swap data; compaction is content-neutral and a
        crashed REBUILD never wrote its token, so the restored copy is
        exactly what the token still describes). With zero or several
        parked copies there is nothing safe to restore — the artifact
        reads absent and the caller rebuilds from the store."""
        if self._batch_dirs():
            return  # live data present: .old/tmp entries are debris
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return
        olds = sorted(
            n for n in names if n.startswith(f"{self.DATA_DIR}.old.")
        )
        if len(olds) != 1:
            return
        data = self._data_path()
        if os.path.isdir(data):
            shutil.rmtree(data, ignore_errors=True)  # the empty shell
        os.rename(os.path.join(self.path, olds[0]), data)

    def _sweep_debris(self) -> int:
        """Remove crash leftovers under the artifact root: staged
        ``tmp-<hex>``/assembled ``data.new.<hex>`` dirs whose rename
        never ran, ``data.old.<hex>`` dirs whose post-swap rmtree was
        interrupted, and orphaned ``.token.<hex>`` files. Run at the
        head of `compact`/`rebuild` AFTER `_recover_swap_debris`
        (single-maintainer contract — nothing else can be mid-stage),
        so crash debris from a killed swap is bounded to one window
        instead of accumulating forever. Returns entries removed."""
        removed = 0
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return 0
        for n in names:
            full = os.path.join(self.path, n)
            if (
                n.startswith("tmp-")
                or n.startswith(f"{self.DATA_DIR}.old.")
                or n.startswith(f"{self.DATA_DIR}.new.")
            ):
                shutil.rmtree(full, ignore_errors=True)
                removed += 1
            elif n.startswith(".token."):
                try:
                    os.remove(full)
                    removed += 1
                except OSError:
                    pass
        return removed

    def _stage(self, sigs: DataFrame) -> str:
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, "tmp-" + uuid.uuid4().hex)
        sigs.write.mode("overwrite").parquet(staged)
        return staged

    def _write_batch(self, sigs: DataFrame) -> None:
        staged = self._stage(sigs)
        data = self._data_path()
        os.makedirs(data, exist_ok=True)
        os.rename(staged, os.path.join(data, os.path.basename(staged)[4:]))

    def _write_token(self, digest: str) -> None:
        tmp = os.path.join(self.path, f".token.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump({"digest": digest, "params": SIG_PARAMS}, fh)
        os.replace(tmp, os.path.join(self.path, self.TOKEN_FILE))
