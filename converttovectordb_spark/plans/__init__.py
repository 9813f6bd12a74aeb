"""Physical-layout helpers: bucketing for co-located (shuffle-free)
joins and plan-inspection utilities."""

from converttovectordb_spark.plans.bucketing import (
    physical_plan,
    write_bucketed,
)
from converttovectordb_spark.plans.ivf_index import (
    IVFIndex,
    build_ivf_index,
    mean_centroids,
)
from converttovectordb_spark.plans.lex_index import (
    LexicalIndex,
    build_lexical_index,
)

__all__ = [
    "IVFIndex",
    "LexicalIndex",
    "build_ivf_index",
    "build_lexical_index",
    "mean_centroids",
    "physical_plan",
    "write_bucketed",
]
