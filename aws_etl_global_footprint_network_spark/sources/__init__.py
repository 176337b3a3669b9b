"""Sources & sinks: file readers/writers, calendar dimension builder,
and the driver-side REST extraction connector."""

from aws_etl_global_footprint_network_spark.sources.readers import (  # noqa: F401
    read_market_data,
    read_testdata,
    testdata_views,
)
from aws_etl_global_footprint_network_spark.sources.calendar import build_calendar  # noqa: F401
