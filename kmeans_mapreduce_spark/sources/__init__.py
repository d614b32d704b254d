from kmeans_mapreduce_spark.sources.loaders import (  # noqa: F401
    load_table,
    read_points_csv,
    write_centroids,
    write_partitioned,
)
from kmeans_mapreduce_spark.sources.derive import (  # noqa: F401
    points_2d,
    points_2d_sql,
    points_from_events,
    points_nd,
)
