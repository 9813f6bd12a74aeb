"""Physical-layout helpers: bucketing for co-located (shuffle-free)
joins and plan-inspection utilities."""

from converttovectordb_spark.plans.bucketing import (
    physical_plan,
    write_bucketed,
)

__all__ = ["physical_plan", "write_bucketed"]
