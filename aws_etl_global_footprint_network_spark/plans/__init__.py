"""Physical-plan inspection helpers."""

from aws_etl_global_footprint_network_spark.plans.explain import (  # noqa: F401
    executed_plan,
    has_broadcast_join,
    pushed_filters,
    wholestage_codegen_spans,
)
