"""One integrity door over every write-side artifact (r12 verdict #3).

The engine persists FIVE crash-recoverable artifacts, each with its own
module-private integrity/recovery protocol grown over five review
passes: the transactional store's O_EXCL commit log
(`sources/store.py`), the IVF index's derivable stats manifest + three
measured-dial curves (`plans/ivf_index.py`), the lexical index's
doclens-vs-manifest torn-append check and two-rename swap recovery
(`plans/lex_index.py`), the minhash signature store's parked-copy
recovery and debris sweeps (`sources/sigstore.py`), and the bits tier's
CURRENT-pointered packed-words + sidecar artifact
(`operators/serving.py`). The operator of a 100 TB store needs ONE verb
that runs all of them and reports a typed findings list — not five
module-private protocols to know about.

``fsck(engine)`` is detect-only by default; ``heal=True`` additionally
applies every repair the modules already define as safe (histogram
recompute, swap-debris recovery, debris sweeps, orphan tmp removal).
Repairs that cost a corpus pass (curve re-measures) or lose data
(orphan batch dirs that might be a mid-flight append) are NEVER
auto-applied — they are reported with the recommended verb. fsck is an
OFFLINE maintenance verb under the artifacts' single-maintainer
contract: do not run it concurrently with writers.

Each finding::

    {"artifact": "store|ivf_index|lex_index|sigstore|bits",
     "path": str, "check": str, "severity": "error|warn|info",
     "detail": str, "healed": bool}

`error` = the artifact (or part of it) is unreadable/unsafe to trust;
`warn` = degraded or carrying crash debris; `info` = hygiene/debt.
A clean tree returns ``[]``.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from converttovectordb_spark.engine import VectorEngine


def _finding(artifact, path, check, severity, detail, healed=False) -> dict:
    return {
        "artifact": artifact,
        "path": path,
        "check": check,
        "severity": severity,
        "detail": detail,
        "healed": bool(healed),
    }


# -- store ------------------------------------------------------------


def _fsck_store(engine: "VectorEngine", heal: bool) -> list[dict]:
    from converttovectordb_spark.sources.store import (
        TransactionalDocumentStore,
    )

    store = engine.store
    out: list[dict] = []
    if not isinstance(store, TransactionalDocumentStore):
        return out  # plain stores have no commit log to check
    mdir = store._manifest_path()
    if not os.path.isdir(mdir):
        return out  # never committed — nothing to verify
    # 1. torn manifests: every N.json must parse (the O_EXCL link
    # protocol makes this impossible for post-r12 writers, so a hit
    # means pre-fix debris or external corruption — report, never
    # guess at content)
    manifests: dict[int, dict] = {}
    for v in store._versions():
        try:
            manifests[v] = store._read_manifest(v)
        except (OSError, ValueError) as exc:
            out.append(_finding(
                "store", store.path, "torn_manifest", "error",
                f"manifest {v}.json is unreadable ({exc}); restore it "
                "from backup or remove it AND its batch dir, then "
                "compact()",
            ))
    live = store._live_of(manifests)
    # 2. live manifests must point at existing data
    for v in live:
        m = manifests[v]
        for key in ("batch_dir", "tombstone_keys"):
            d = m.get(key)
            if d and not os.path.isdir(d):
                out.append(_finding(
                    "store", store.path, "missing_batch_dir", "error",
                    f"live manifest {v} references missing {key} {d!r} "
                    "— the store lost committed rows; restore the "
                    "directory or rebuild from source",
                ))
    # 3. orphan batch dirs: on disk, referenced by NO manifest. Could
    # be a crashed append (data landed, commit didn't) — removing one
    # from under a mid-flight append would lose its rows, so healing
    # is reported-only even under heal=True.
    referenced = set()
    for m in manifests.values():
        for key in ("batch_dir", "tombstone_keys"):
            if m.get(key):
                referenced.add(os.path.normpath(m[key]))
    data_root = os.path.join(store.path, store.DATA_DIR)
    if os.path.isdir(data_root):
        for n in sorted(os.listdir(data_root)):
            d = os.path.normpath(os.path.join(data_root, n))
            if os.path.isdir(d) and d not in referenced:
                out.append(_finding(
                    "store", store.path, "orphan_batch_dir", "warn",
                    f"batch dir {d!r} is referenced by no manifest — a "
                    "crashed (uncommitted) append or pre-fsck debris; "
                    "verify no append is mid-flight, then delete it",
                ))
    # 4. crashed-commit tmp files: safe to remove (the protocol
    # unlinks them in a finally; survivors are from a killed process)
    for n in sorted(os.listdir(mdir)):
        if n.startswith(".commit.") and n.endswith(".tmp"):
            full = os.path.join(mdir, n)
            healed = False
            if heal:
                try:
                    os.remove(full)
                    healed = True
                except OSError:
                    pass
            out.append(_finding(
                "store", store.path, "commit_tmp_debris", "warn",
                f"crashed-commit tmp file {n!r}", healed,
            ))
    # 5. vacuum debt: superseded batch dirs still on disk (time travel
    # keeps working; this is hygiene, healed only by an explicit
    # vacuum() — fsck never decides history retention for the caller)
    superseded = [v for v in manifests if v not in live]
    debt = 0
    for v in superseded:
        d = manifests[v].get("batch_dir")
        if d and os.path.isdir(d):
            debt += 1
    if debt:
        out.append(_finding(
            "store", store.path, "vacuum_debt", "info",
            f"{debt} superseded batch dir(s) held for time travel; "
            "run vacuum() to reclaim",
        ))
    return out


# -- IVF index --------------------------------------------------------


def _fsck_ivf(engine: "VectorEngine", heal: bool) -> list[dict]:
    from converttovectordb_spark.plans.ivf_index import (
        CENTROIDS_SUBDIR,
        CORPUS_SUBDIR,
        IVFIndex,
        TransactionalIVFIndex,
    )

    out: list[dict] = []
    spark = engine.spark
    # BOTH layouts are checked when both exist (an engine that built
    # plain then switched to transactional leaves two artifacts on
    # disk, and the door's contract is "every artifact")
    indexes: list = []
    base = f"{engine.store.path}_tivf"
    if os.path.isdir(base):
        pointer = os.path.join(base, TransactionalIVFIndex.CURRENT_POINTER)
        if not os.path.exists(pointer):
            out.append(_finding(
                "ivf_index", base, "dangling_current", "error",
                "transactional index base exists but has no CURRENT "
                "pointer — no build ever published; rebuild with "
                "build_index(transactional=True)",
            ))
        else:
            try:
                indexes.append(
                    TransactionalIVFIndex.open_current(spark, base)
                )
            except (OSError, ValueError) as exc:
                out.append(_finding(
                    "ivf_index", base, "dangling_current", "error",
                    f"CURRENT pointer does not resolve ({exc}); "
                    "rebuild with build_index(transactional=True)",
                ))
    plain_path = f"{engine.store.path}_ivf"
    if os.path.isdir(plain_path):
        indexes.append(IVFIndex(spark, plain_path))
    for index in indexes:
        out.extend(_fsck_one_ivf(engine, index, heal))
    return out


def _fsck_one_ivf(engine: "VectorEngine", index, heal: bool) -> list[dict]:
    from converttovectordb_spark.plans.ivf_index import (
        CENTROIDS_SUBDIR,
        CORPUS_SUBDIR,
        TransactionalIVFIndex,
    )

    out: list[dict] = []
    # layout: centroids always; the plain corpus/ dir only for the
    # plain index (the transactional layout reads corpus_batches/
    # through its own manifest, whose integrity open_current already
    # vouched for above)
    subs = [CENTROIDS_SUBDIR]
    if not isinstance(index, TransactionalIVFIndex):
        subs.append(CORPUS_SUBDIR)
    for sub in subs:
        if not os.path.isdir(os.path.join(index.path, sub)):
            out.append(_finding(
                "ivf_index", index.path, "missing_layout", "error",
                f"index dir lacks {sub}/ — a crashed build; rebuild "
                "with build_index()",
            ))
            return out  # nothing below is meaningful
    # one ACTUAL corpus count serves both checks below — fsck must
    # never trust the stats manifest it is itself auditing (the
    # serving-path staleness helpers do, correctly: they are zero-job
    # by design and the stats have their own heal)
    actual = int(index.corpus().count())
    # stats histogram vs written corpus (the plain append's crash
    # window; fully derivable, so heal recomputes it)
    stats = index.cluster_stats()
    if stats is not None and int(stats["n_docs"]) != actual:
        healed = bool(index.verify_stats()) if heal else False
        out.append(_finding(
            "ivf_index", index.path, "stats_histogram_mismatch",
            "error",
            f"stats manifest says {stats['n_docs']} rows, corpus "
            f"holds {actual} — a crashed plain append; "
            + ("recomputed from partition footers"
               if healed else "run verify_stats() to recompute"),
            healed,
        ))
    # measured-dial curves past their drift budget (re-measuring is a
    # corpus pass — never auto-applied)
    for name, payload in (
        ("recall_curve", index.recall_curve()),
        ("adc_curve", index.adc_curve()),
        ("mrl_curve", index.mrl_curve()),
    ):
        if payload is None or payload.get("measured_n_docs") is None:
            continue
        measured = int(payload["measured_n_docs"])
        growth = abs(actual - measured) / max(measured, 1)
        if growth > index.RECALL_CURVE_MAX_GROWTH:
            out.append(_finding(
                "ivf_index", index.path, f"stale_{name}", "warn",
                f"{name} measured at {measured} rows, corpus now "
                f"{actual} ({growth:.0%} > "
                f"{index.RECALL_CURVE_MAX_GROWTH:.0%} budget) — "
                "re-measure or retrain",
            ))
    # stage debris: a crash between stage_batch's write and cleanup
    # leaves a tmp-stage-<hex> dir — readers never scan it (they read
    # the named subdirs), so removal is always safe
    stage_debris = [
        n for n in os.listdir(index.path) if n.startswith("tmp-stage-")
    ]
    if stage_debris:
        healed = False
        if heal:
            import shutil

            for n in stage_debris:
                shutil.rmtree(
                    os.path.join(index.path, n), ignore_errors=True
                )
            healed = True
        out.append(_finding(
            "ivf_index", index.path, "stage_debris", "warn",
            f"{len(stage_debris)} crashed-staging dir(s)", healed,
        ))
    # orphaned rids: index rows whose identity the store has dropped
    # (a clear/out-of-band delete after the build). The serving token
    # catches ANY store change coarsely; this names the finer, truly
    # unsafe state — results would surface rows that no longer exist.
    # One linear anti-join; the repair is a rebuild, never automatic.
    n = _orphan_rids(engine, index.corpus(), "_row_id")
    if n:
        out.append(_finding(
            "ivf_index", index.path, "orphan_rids", "error",
            f"{n} indexed row(s) no longer exist in the store — "
            "searches over this index can return dropped documents; "
            "rebuild with build_index()",
        ))
    return out


def _orphan_rids(engine: "VectorEngine", indexed, id_col: str) -> int:
    """Rows of ``indexed`` whose ``id_col`` the store no longer has
    (0 when the store is absent or the artifact doesn't key on the
    engine row identity). One left-anti join — linear, offline."""
    if id_col != "_row_id" or id_col not in indexed.columns:
        return 0
    if not engine.store.exists():
        return 0
    from converttovectordb_spark.engine import _row_id

    store_ids = engine._dedup_row_ids(
        engine.store.load(require_embedding=False).withColumn(
            "_row_id", _row_id()
        )
    ).select("_row_id")
    return int(
        indexed.select("_row_id")
        .join(store_ids, on="_row_id", how="left_anti")
        .count()
    )


# -- lexical index ----------------------------------------------------


def _fsck_lex(engine: "VectorEngine", heal: bool) -> list[dict]:
    from converttovectordb_spark.plans.lex_index import (
        DOCLENS_SUBDIR,
        META_FILE,
        POSTINGS_SUBDIR,
        LexicalIndex,
    )

    path = f"{engine.store.path}_lexidx"
    out: list[dict] = []
    if not os.path.isdir(path):
        return out
    idx = LexicalIndex(engine.spark, path)
    # 1. crashed compact swap: a data dir absent with its parked
    # pre-swap copy. Recovery is a rename (content-neutral) — applied
    # under heal; detect-only otherwise.
    swap_crash = False
    for sub in (POSTINGS_SUBDIR, DOCLENS_SUBDIR):
        target = os.path.join(path, sub)
        if os.path.isdir(target):
            continue
        olds = [n for n in os.listdir(path) if n.startswith(f"{sub}.old.")]
        swap_crash = True
        if len(olds) == 1 and heal:
            idx._recover_swap_debris()
            out.append(_finding(
                "lex_index", path, "crashed_swap", "warn",
                f"{sub}/ was missing; restored the parked pre-swap "
                f"copy {olds[0]!r}", True,
            ))
        elif len(olds) == 1:
            out.append(_finding(
                "lex_index", path, "crashed_swap", "error",
                f"{sub}/ is missing with parked copy {olds[0]!r} — "
                "recoverable; run fsck(heal=True) or "
                "build_lex_index()",
            ))
        else:
            out.append(_finding(
                "lex_index", path, "crashed_swap", "error",
                f"{sub}/ is missing with {len(olds)} parked copies — "
                "ambiguous; rebuild with build_lex_index()",
            ))
    if swap_crash and not heal:
        return out  # torn-append check below would read missing dirs
    # 2. torn append: doclens ahead of the manifest's exact stats.
    # A torn META itself (unparseable JSON) must be a finding, not an
    # fsck crash — the one door has to outlive every corruption class
    # it reports on.
    meta_ok = False
    if os.path.exists(os.path.join(path, META_FILE)):
        try:
            idx.meta()
            meta_ok = True
        except (OSError, ValueError) as exc:
            out.append(_finding(
                "lex_index", path, "torn_meta", "error",
                f"meta manifest is unreadable ({exc}); rebuild with "
                "build_lex_index()",
            ))
    if meta_ok:
        try:
            idx.verify_integrity()
        except RuntimeError as exc:
            out.append(_finding(
                "lex_index", path, "torn_append", "error", str(exc),
            ))
    # 3. debris beside LIVE data dirs (safe sweep — the recover step
    # above already ran under heal, so every .old./tmp entry here is
    # a completed swap's leftover)
    debris = [
        n for n in os.listdir(path)
        if ".old." in n or n.startswith("tmp-")
        or n.startswith(".token.") or n.startswith(".meta.")
    ]
    if debris:
        healed = False
        if heal:
            idx._sweep_debris()
            healed = True
        out.append(_finding(
            "lex_index", path, "swap_debris", "warn",
            f"{len(debris)} crash-leftover entries "
            f"({', '.join(sorted(debris)[:4])}{'…' if len(debris) > 4 else ''})",
            healed,
        ))
    # 4. unpublished rebuild: data present but no _TOKEN — reads as
    # absent by contract (info, the rebuild republishes)
    if not os.path.exists(os.path.join(path, "_TOKEN")) and os.path.isdir(
        os.path.join(path, POSTINGS_SUBDIR)
    ):
        out.append(_finding(
            "lex_index", path, "unpublished_token", "info",
            "postings present but no _TOKEN — a crashed rebuild; the "
            "index reads as absent until build_lex_index() completes",
        ))
    # 5. orphaned rids (same contract as the IVF check): indexed docs
    # the store dropped — BM25 over this index scores ghost rows
    if meta_ok and not swap_crash:
        id_col = idx.meta().get("id_col", "doc_id")
        n = _orphan_rids(engine, idx.doclens(), id_col)
        if n:
            out.append(_finding(
                "lex_index", path, "orphan_rids", "error",
                f"{n} indexed row(s) no longer exist in the store — "
                "keyword probes can return dropped documents; rebuild "
                "with build_lex_index()",
            ))
    return out


# -- signature store --------------------------------------------------


def _fsck_sigstore(engine: "VectorEngine", heal: bool) -> list[dict]:
    sig = engine._sig_store()
    out: list[dict] = []
    if not os.path.isdir(sig.path):
        return out
    # 1. crashed swap: no committed batch dirs but exactly one parked
    # full copy — restorable rename
    if not sig._batch_dirs():
        olds = [
            n for n in os.listdir(sig.path)
            if n.startswith(f"{sig.DATA_DIR}.old.")
        ]
        if len(olds) == 1:
            healed = False
            if heal:
                sig._recover_swap_debris()
                healed = True
            out.append(_finding(
                "sigstore", sig.path, "crashed_swap",
                "warn" if healed else "error",
                f"data/ empty with parked copy {olds[0]!r} — "
                + ("restored" if healed
                   else "recoverable; run fsck(heal=True)"),
                healed,
            ))
        elif olds:
            out.append(_finding(
                "sigstore", sig.path, "crashed_swap", "error",
                f"data/ empty with {len(olds)} parked copies — "
                "ambiguous; the artifact reads absent and the next "
                "ingest rebuilds it",
            ))
    # 2. debris sweep
    debris = [
        n for n in os.listdir(sig.path)
        if n.startswith("tmp-") or n.startswith(f"{sig.DATA_DIR}.old.")
        or n.startswith(f"{sig.DATA_DIR}.new.") or n.startswith(".token.")
    ]
    if debris and sig._batch_dirs():
        healed = False
        if heal:
            sig._sweep_debris()
            healed = True
        out.append(_finding(
            "sigstore", sig.path, "swap_debris", "warn",
            f"{len(debris)} crash-leftover entries", healed,
        ))
    return out


# -- bits-tier artifact -----------------------------------------------


def _fsck_bits(engine: "VectorEngine", heal: bool) -> list[dict]:
    """The persisted bits-tier artifact (r15): ``<root>/CURRENT`` →
    ``v-<hex>/{sidecar, words.npy, row_ids.npy, _meta.json}``. Every
    repair here is safe to auto-apply — the artifact is a DERIVABLE
    cache of the store (the next dialed request refills it), so heal
    always reduces to 'remove the broken/stale piece'."""
    import json
    import shutil

    from converttovectordb_spark.operators.serving import (
        BITS_CURRENT_FILE,
        BITS_META_FILE,
        BITS_ROWIDS_FILE,
        BITS_SIDECAR_DIR,
        BITS_WORDS_FILE,
        BitsMatrixIndex,
    )
    from converttovectordb_spark.sources.sigstore import token_digest

    root = engine.bits_artifact_path
    out: list[dict] = []
    if not os.path.isdir(root):
        return out
    cur = BitsMatrixIndex._read_current(root)
    # 1. crash debris: tmp pointer files and version dirs CURRENT does
    # not reference (a crashed build, or a deferred close that never
    # ran because the process died)
    debris = [
        n for n in os.listdir(root)
        if n.startswith(".current.")
        or (n.startswith("v-") and n != cur)
    ]
    if debris:
        healed = False
        if heal:
            for n in debris:
                p = os.path.join(root, n)
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    try:
                        os.remove(p)
                    except OSError:
                        pass
            healed = True
        out.append(_finding(
            "bits", root, "orphan_versions", "warn",
            f"{len(debris)} unreferenced version dir(s)/tmp pointer(s) "
            "— crash leftovers; each holds a full-precision corpus "
            "copy", healed,
        ))

    def _drop_artifact():
        for n in (cur, BITS_CURRENT_FILE):
            p = os.path.join(root, n) if n else None
            if p and os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            elif p and os.path.isfile(p):
                try:
                    os.remove(p)
                except OSError:
                    pass

    if cur is None:
        return out
    vdir = os.path.join(root, cur)
    # 2. dangling pointer / unreadable version
    ok = True
    detail = None
    meta = None
    if not os.path.isdir(vdir):
        ok, detail = False, f"CURRENT names missing dir {cur!r}"
    else:
        try:
            with open(os.path.join(vdir, BITS_META_FILE)) as fh:
                meta = json.load(fh)
            import numpy as np

            words = np.load(
                os.path.join(vdir, BITS_WORDS_FILE), mmap_mode="r"
            )
            rids = np.load(
                os.path.join(vdir, BITS_ROWIDS_FILE), mmap_mode="r"
            )
            n, n_words = int(meta["n"]), int(meta["n_words"])
            if words.shape != (n, n_words) or rids.shape != (n,):
                ok, detail = False, (
                    f"packed arrays {words.shape}/{rids.shape} disagree "
                    f"with meta (n={n}, n_words={n_words})"
                )
            elif not os.path.isdir(os.path.join(vdir, BITS_SIDECAR_DIR)):
                ok, detail = False, "sidecar parquet missing"
        except Exception as e:
            ok, detail = False, f"unreadable ({e})"
    if not ok:
        healed = False
        if heal:
            _drop_artifact()
            healed = True
        out.append(_finding(
            "bits", root, "corrupt_artifact",
            "warn" if healed else "error",
            f"{detail} — dialed queries would re-pay the fill; "
            + ("removed (refills on demand)" if healed
               else "run fsck(heal=True) to remove"),
            healed,
        ))
        return out
    # 3. sidecar row count must match the packed arrays (one bounded
    # count job — fsck is the offline verb that may scan)
    side_n = engine.spark.read.parquet(
        os.path.join(vdir, BITS_SIDECAR_DIR)
    ).count()
    if side_n != int(meta["n"]):
        healed = False
        if heal:
            _drop_artifact()
            healed = True
        out.append(_finding(
            "bits", root, "sidecar_mismatch",
            "warn" if healed else "error",
            f"sidecar holds {side_n} rows, meta says {meta['n']} — "
            "the rerank fetch would miss candidates; "
            + ("removed" if healed else "run fsck(heal=True)"),
            healed,
        ))
        return out
    # 4. staleness vs the live store
    digest = token_digest(engine.store.state_token())
    if meta.get("built_from") != digest:
        healed = False
        if heal:
            _drop_artifact()
            healed = True
        out.append(_finding(
            "bits", root, "stale", "info",
            "artifact was built from a different store state — the "
            "serving door ignores it and refills on the next dialed "
            "request"
            + ("; removed" if healed else ""),
            healed,
        ))
    return out


def fsck(engine: "VectorEngine", *, heal: bool = False) -> list[dict]:
    """Run every artifact's integrity/recovery pass; see module doc.
    Severity-ordered (errors first) for direct display."""
    findings: list[dict] = []
    findings += _fsck_store(engine, heal)
    findings += _fsck_ivf(engine, heal)
    findings += _fsck_lex(engine, heal)
    findings += _fsck_sigstore(engine, heal)
    findings += _fsck_bits(engine, heal)
    rank = {"error": 0, "warn": 1, "info": 2}
    findings.sort(key=lambda f: (rank[f["severity"]], f["artifact"], f["check"]))
    return findings
