"""Lineage-cut batch staging for multi-write artifact appends.

The failure class this exists for (found r13, two live instances): an
append batch whose lineage READS an artifact path — the engine's heal
deltas are exactly that, a store-vs-artifact anti-join — is handed to
an append that performs MULTIPLE write actions into that same path.
Spark's cache manager invalidates every cached plan referencing a
written path (`recacheByPath`), so `.persist()` does NOT protect the
batch: the first in-place write drops the cache, the next action
RE-EXECUTES the anti-join against the just-appended artifact, the
delta evaluates EMPTY, and the remaining writes silently write
nothing. Concretely:

  * `LexicalIndex.append`: doclens landed, postings didn't — BM25
    never saw appended docs, and `verify_integrity` could not tell
    (doclens and the meta scalars were consistently updated);
  * plain `IVFIndex.append` with PQ: corpus landed, codes didn't
    (and, pre-r13-fix, the stats histogram merged an empty batch).

`stage_batch` cuts the lineage the honest way: write the batch ONCE to
a throwaway parquet dir under the artifact root and re-read it — the
staged frame's only upstream is the stage dir, which nothing else
writes. Cost: one extra write+read of the batch (O(new rows), the
append contract's size class). The transactional index append does NOT
need this: it stages every batch into fresh uuid dirs by design, so
in-flight lineages never overlap a written path — a load-bearing
property, noted there.

The stage dir uses the ``tmp-`` prefix the artifact debris sweepers
(`lex_index._sweep_debris`, `sigstore._sweep_debris`, fsck) already
remove, so a crash between stage and cleanup leaves bounded,
collectable debris, never a correctness hazard (readers only ever scan
the artifact's named data subdirs).
"""

from __future__ import annotations

import os
import shutil
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def stage_batch(df: DataFrame, artifact_root: str):
    """Yield a lineage-free materialization of ``df`` (parquet
    round-trip through ``<artifact_root>/tmp-stage-<hex>``); removes
    the stage dir on exit."""
    os.makedirs(artifact_root, exist_ok=True)
    stage_dir = os.path.join(artifact_root, f"tmp-stage-{uuid.uuid4().hex}")
    df.write.parquet(stage_dir)
    try:
        # explicit schema: an all-empty batch writes only _SUCCESS (no
        # part files), and schema INFERENCE over that dir would raise —
        # an empty heal delta (idempotent replay) must stage to an
        # empty frame, not an error
        yield df.sparkSession.read.schema(df.schema).parquet(stage_dir)
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)
