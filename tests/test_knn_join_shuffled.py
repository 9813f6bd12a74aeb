"""ivf_knn_join_shuffled: the corpus-scale (non-broadcast-probe) IVF
KNN join. Correctness is pinned against the broadcast variant (shared
oracle semantics) and the plan shape against the 100 TB design:
shuffled equi-join on (cluster, salt), zero-shuffle HOF centroid probe,
partial top-k window that reuses the join's output partitioning.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from converttovectordb_spark.operators.search import (
    ivf_knn_join,
    ivf_knn_join_shuffled,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.query_id, r.vec_id, round(r.score, 9), r.rank) for r in df.collect()
    )


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def probes(emb):
    return emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def test_matches_broadcast_variant_and_salt_invariant(emb, probes):
    ref = _rows(ivf_knn_join(probes, emb, top_k=3, nprobe=2))
    assert len(ref) == 3 * emb.count()
    for salt in (1, 3):
        got = _rows(
            ivf_knn_join_shuffled(
                probes, emb, top_k=3, nprobe=2, salt_buckets=salt
            )
        )
        assert got == ref, f"salt_buckets={salt} diverged"


def test_exclude_self(emb, probes):
    out = ivf_knn_join_shuffled(
        probes, emb, top_k=3, nprobe=2, salt_buckets=2, exclude_self=True
    ).collect()
    assert out and all(r.query_id != r.vec_id for r in out)


def test_salt_buckets_validated(emb, probes):
    with pytest.raises(ValueError, match="salt_buckets"):
        ivf_knn_join_shuffled(probes, emb, salt_buckets=0)


def test_empty_query_side(emb, probes):
    out = ivf_knn_join_shuffled(
        probes.filter(F.lit(False)), emb, top_k=3, nprobe=2
    )
    assert out.count() == 0


def test_plan_arrow_cogroup_scorer_default(spark, emb, probes):
    """The default (r16) scorer runs scoring + the partial per-group
    top-k as ONE cogrouped Arrow stage over the (cluster, salt)
    groups — the interpreted aggregate(zip_with) fold is gone from the
    per-pair path; the only per-query exchange is the final pruned
    one, fed by at most nprobe·S·k rows per query."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = ivf_knn_join_shuffled(
            probes, emb, top_k=3, nprobe=2, salt_buckets=2
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapCoGroupsInPandas" in plan
        # the per-pair join + fold is gone (the zip_with that remains
        # is the C-sized centroid probe, which stays a JVM HOF on
        # purpose — its volume is Q×C, not Q×N)
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan
        exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        assert sum(e.startswith("query_id") for e in exchanges) == 1, exchanges
        # map-side top-k pushdown below the final exchange
        assert "WindowGroupLimit" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.enabled")


def test_plan_fold_scorer_shuffled_join_and_free_partial_topk(
    spark, emb, probes
):
    """The fold scorer (kept for deployments without Python workers)
    retains
    the r14 shape: shuffled equi-join on (cluster, salt), partial
    per-(cluster, salt, query) top-k riding the join's partitioning
    (NO exchange of its own), one final per-query exchange."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = ivf_knn_join_shuffled(
            probes, emb, top_k=3, nprobe=2, salt_buckets=2, scorer="fold"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        # the partial window reuses the join partitioning: no exchange
        # keyed by (label, _salt, query_id)
        assert not any(
            "_salt" in e and "query_id" in e for e in exchanges
        ), exchanges
        assert sum(e.startswith("query_id") for e in exchanges) == 1, exchanges
        # map-side top-k pushdown below the final exchange
        assert "WindowGroupLimit" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.enabled")


def test_arrow_scorer_bit_identical_to_fold(spark, emb, probes):
    """The numpy column-loop dot must reproduce the JVM left fold's
    rounding sequence EXACTLY — full-precision float equality, not
    rounded: one multiply-round + one add-round per element, ascending
    index, both paths."""
    kw = dict(top_k=3, nprobe=2, salt_buckets=2, exclude_self=True)
    fold = {
        (r.query_id, r.vec_id): (r.score, r.rank)
        for r in ivf_knn_join_shuffled(
            probes, emb, scorer="fold", **kw
        ).collect()
    }
    arrow = {
        (r.query_id, r.vec_id): (r.score, r.rank)
        for r in ivf_knn_join_shuffled(
            probes, emb, scorer="arrow", **kw
        ).collect()
    }
    assert fold == arrow  # exact float64 equality, no rounding


def test_scorer_validated(emb, probes):
    with pytest.raises(ValueError, match="scorer"):
        ivf_knn_join_shuffled(probes, emb, scorer="blas")


def test_composes_with_materialized_index(spark, emb, probes, tmp_path):
    """The shuffled join over a MATERIALIZED index corpus (cluster-
    partitioned scan + persisted centroids) must equal the inline-label
    run — the production composition: partition-pruned reads feeding
    the shuffle join, no training pass at query time."""
    from converttovectordb_spark.plans.ivf_index import build_ivf_index

    index = build_ivf_index(emb, str(tmp_path / "ivf"), cluster_col="label")
    ref = _rows(ivf_knn_join_shuffled(probes, emb, top_k=3, nprobe=2))
    got = _rows(
        ivf_knn_join_shuffled(
            probes,
            index.corpus(),
            top_k=3,
            nprobe=2,
            cluster_col="cluster_id",
            centroids=index.centroids(),
            salt_buckets=2,
        )
    )
    assert got == ref


def test_query_label_disqualifier(emb, spark):
    """query_label_col drops same-label pairs BEFORE the top-k, so
    every returned neighbor has a different label than its query."""
    labeled = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("query_vec"),
    )
    out = ivf_knn_join_shuffled(
        labeled, emb, top_k=2, nprobe=2, query_label_col="qlabel"
    )
    got = out.join(
        emb.select("vec_id", "label"), on="vec_id"
    ).join(
        emb.select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
        ),
        on="query_id",
    )
    assert got.filter(F.col("label") == F.col("qlabel")).count() == 0
    # implied exclude_self: a row can never be its own negative
    assert out.filter(F.col("query_id") == F.col("vec_id")).count() == 0

    # FULL-k guarantee needs guaranteed reachability, so pin it on a
    # constructed two-cluster corpus: nprobe=2 of 2 probes BOTH
    # clusters for every query and each foreign cluster has >= k rows
    # (the natural-fixture variant would silently depend on sf0.001's
    # label geometry).
    two = spark.createDataFrame(
        [
            (i, i % 2, [1.0 + i, float(i % 2), 0.5 * i])
            for i in range(10)
        ],
        "vec_id long, label int, embedding array<double>",
    )
    q2 = two.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("query_vec"),
    )
    out2 = ivf_knn_join_shuffled(
        q2, two, top_k=2, nprobe=2, query_label_col="qlabel"
    )
    per_q = out2.groupBy("query_id").count()
    assert per_q.count() == 10  # every query returned
    assert per_q.filter(F.col("count") != 2).count() == 0  # full k each


@pytest.mark.parametrize(
    "bad", ["label", "vec_id", "query_id", "_qvec", "_dvec", "_salt", "_nsalt"]
)
def test_query_label_reserved_names_rejected(emb, probes, bad):
    with pytest.raises(ValueError, match="collides"):
        ivf_knn_join_shuffled(
            probes.withColumn(bad, F.lit(0)),
            emb,
            query_label_col=bad,
        )


def test_auto_salt_with_provided_stats_zero_jobs_same_result(
    spark, emb, probes
):
    """cluster_sizes/n_queries from the index manifest make auto salt
    sizing ZERO extra Spark actions (the r10 finding: two plan-time
    jobs per call), and the result is identical to self-derived stats.
    """
    target = 2_000  # small enough that salting actually engages
    ref = _rows(
        ivf_knn_join_shuffled(
            probes,
            emb,
            top_k=3,
            nprobe=2,
            salt_buckets="auto",
            target_pairs_per_task=target,
        )
    )
    stats = {
        r["label"]: r["n"]
        for r in emb.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    nq = probes.count()
    sc = spark.sparkContext
    group = "auto-salt-stats-plan"
    sc.setJobGroup(group, "plan construction with provided stats")
    try:
        df = ivf_knn_join_shuffled(
            probes,
            emb,
            top_k=3,
            nprobe=2,
            salt_buckets="auto",
            target_pairs_per_task=target,
            cluster_sizes=stats,
            n_queries=nq,
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(sc.statusTracker().getJobIdsForGroup(group)) == []
    assert _rows(df) == ref


def test_hard_negatives_corpus_entry_no_extra_plan_time_jobs(spark):
    """The graded `hard_negatives_corpus` entry threads the index
    artifact's persisted histogram into auto salting — constructing its
    plan must launch no MORE jobs than its fixed-salt sibling
    `vector_knn_selfjoin_ivf` (same reads, no stats derivation). The
    r10 finding was +2 jobs here (corpus histogram + query count)."""
    from converttovectordb_spark.queries import (
        q_hard_negatives_corpus,
        q_vector_knn_selfjoin_ivf,
    )

    sf_dir = SF_DIR
    q_hard_negatives_corpus(spark, sf_dir)  # warm the index artifact
    sc = spark.sparkContext

    def plan_jobs(fn, group):
        sc.setJobGroup(group, f"{group} plan construction")
        try:
            fn(spark, sf_dir)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    control = plan_jobs(q_vector_knn_selfjoin_ivf, "selfjoin-plan")
    auto = plan_jobs(q_hard_negatives_corpus, "hnc-plan")
    assert auto <= control, (
        f"auto-salt entry launched {auto} plan-time jobs vs the "
        f"fixed-salt sibling's {control} — stats are being re-derived"
    )


def test_auto_salt_buckets_sizing():
    """Pure arithmetic of the per-cluster salt sizing."""
    from converttovectordb_spark.operators.search import (
        DEFAULT_MAX_SALT_BUCKETS,
        auto_salt_buckets,
    )

    # cold cluster under the pair budget → 1 (no replication)
    assert auto_salt_buckets(100, 10_000, 10_000, 2) == 1
    # self-join hot cluster: q_c ≈ min(Q, Q·nprobe·d/N) pairs > target
    # 900-row cluster of 1000 docs, 1000 queries, nprobe=2:
    # est_q = min(1000, 1800) = 1000 → 900k pairs / 10k target = 90 → cap
    assert (
        auto_salt_buckets(900, 1000, 1000, 2, target_pairs_per_task=10_000)
        == DEFAULT_MAX_SALT_BUCKETS
    )
    assert (
        auto_salt_buckets(900, 1000, 1000, 2, target_pairs_per_task=100_000)
        == 9
    )
    # tiny query side bounds est_q at Q even for a huge cluster
    assert (
        auto_salt_buckets(
            1_000_000, 1_000_000, 10, 2, target_pairs_per_task=10_000_000
        )
        == 1
    )
    # degenerate inputs never salt
    assert auto_salt_buckets(0, 0, 0, 2) == 1


def test_auto_salt_bounds_hot_cluster_and_matches_unsalted(spark):
    """salt_buckets="auto" on a constructed hot-cluster corpus: the hot
    cluster gets >1 buckets sized to the pair budget, the max per-
    (cluster, salt) bucket's pair count is bounded, cold clusters skip
    replication, and results equal the unsalted run (salt invariance).
    """
    import math

    from converttovectordb_spark.operators.search import auto_salt_buckets

    # 3 clusters: one hot (60 rows), two cold (5 rows each); every row
    # is a query. Distinct angles make scores/tie-breaks deterministic.
    rows = []
    vid = 0
    for label, n in ((0, 60), (1, 5), (2, 5)):
        for i in range(n):
            a = 0.1 * i + label * 10.0
            rows.append((vid, label, [math.cos(a), math.sin(a), 1.0 + label]))
            vid += 1
    docs = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    q = docs.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    target = 2_000  # hot: est_q=70·2·60/70→120→min(70,…)=70? see below
    ref = _rows(
        ivf_knn_join_shuffled(q, docs, top_k=3, nprobe=2, salt_buckets=1)
    )
    got = _rows(
        ivf_knn_join_shuffled(
            q,
            docs,
            top_k=3,
            nprobe=2,
            salt_buckets="auto",
            target_pairs_per_task=target,
        )
    )
    assert got == ref

    # the sizing the operator applied, recomputed from the same stats
    n_docs, n_q = 70, 70
    s_hot = auto_salt_buckets(60, n_docs, n_q, 2, target_pairs_per_task=target)
    s_cold = auto_salt_buckets(5, n_docs, n_q, 2, target_pairs_per_task=target)
    assert s_hot > 1 and s_cold == 1
    # bound: worst bucket's pairs ≈ est_q_hot · d_hot / S ≤ target, with
    # 2× slack for the xxhash split's unevenness at this small n
    per_bucket_docs = (
        docs.filter(F.col("label") == 0)
        .withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(s_hot))
        )
        .groupBy("_salt")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    est_q_hot = min(n_q, max(n_q * 2 * 60 / n_docs, min(n_q, 60)))
    assert est_q_hot * per_bucket_docs <= 2 * target


@pytest.mark.parametrize("seed", [3, 17])
def test_arrow_scorer_property_random_ties_and_zeros(spark, seed):
    """Property guard for the bit-exactness claim: random corpora with
    DUPLICATED vectors (forced score ties → tie-break path), zero
    vectors (norm-0 passthrough), and negative components must give
    full-precision-identical (score, rank) sets on both scorers."""
    import random

    rng = random.Random(seed)
    d, n = 7, 60
    rows = []
    for i in range(n):
        if i % 13 == 0:
            v = [0.0] * d  # zero vector: l2_normalize passes through
        elif i % 5 == 0 and i > 5:
            v = rows[i - 1][2]  # duplicate of previous: score ties
        else:
            v = [rng.uniform(-2, 2) for _ in range(d)]
        rows.append((i, i % 3, v))
    docs = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    probes = docs.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    kw = dict(top_k=4, nprobe=2, salt_buckets=3, exclude_self=True)
    fold = {
        (r.query_id, r.vec_id): (r.score, r.rank)
        for r in ivf_knn_join_shuffled(
            probes, docs, scorer="fold", **kw
        ).collect()
    }
    arrow = {
        (r.query_id, r.vec_id): (r.score, r.rank)
        for r in ivf_knn_join_shuffled(
            probes, docs, scorer="arrow", **kw
        ).collect()
    }
    assert fold == arrow
