"""kmeans_mapreduce_spark — a PySpark-native analytics/clustering engine.

A brand-new, idiomatic PySpark rebuild of the capabilities of
``lilacroller/kmeans-mapreduce`` (a hand-rolled gRPC MapReduce k-means;
reference snapshot at /root/reference). Nothing here ports that
architecture: every operator is re-expressed as DataFrame/Catalyst
primitives (broadcast joins, codegen'd expressions, partial+final hash
aggregation, driver-side iteration), plus LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing,
structured streaming) designed for 100 TB scale.

See SURVEY.md for the full structural analysis of the reference.
"""

__version__ = "0.1.0"

from kmeans_mapreduce_spark.session import get_spark  # noqa: F401
