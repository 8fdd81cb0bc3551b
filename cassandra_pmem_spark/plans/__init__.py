"""Plan-level helpers: join-strategy hints sized for the 100 TB target."""

from cassandra_pmem_spark.plans.hints import maybe_broadcast, plan_size_bytes

__all__ = ["maybe_broadcast", "plan_size_bytes"]
