"""Expression builders. Everything here returns Columns composed of
pyspark.sql.functions built-ins — JVM-side, whole-stage-codegen-able.
No row-at-a-time Python UDFs (reference keeps its hardest expression
builtin-composed too, reference: mkt_returns/sql_test_mkt_returns.ipynb:888-915).
"""

from aws_etl_global_footprint_network_spark.functions.datetime import (  # noqa: F401
    monday0_weekday,
    week_of_year_monday,
    year_week,
)
from aws_etl_global_footprint_network_spark.functions.returns import (  # noqa: F401
    compound_return,
    cumulative_compound_return,
)
