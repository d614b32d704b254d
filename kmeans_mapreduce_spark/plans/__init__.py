from kmeans_mapreduce_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_cartesian,
    has_pushed_filters,
    partition_filters,
    scan_columns,
)
