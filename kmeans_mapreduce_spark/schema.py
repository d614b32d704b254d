"""Schemas — the engine's explicit version of the reference's implicit model.

The reference hard-codes a 2-column float schema into every text parser
(``/root/reference/master.py:286-288``, ``mapper.py:90-93``); SURVEY §1.2.
Here every abstraction gets an explicit StructType so Catalyst can prune
and push down, and so n-D points are first-class.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Point — reference ``Data/Input/points.txt`` "x,y" lines
# (master.py:286-288). point_id is synthetic: the reference's identity is
# line order; a distributed engine needs a stable key (FIXTURES.md F1).
POINTS_2D = StructType(
    [
        StructField("point_id", LongType(), False),
        StructField("x", DoubleType(), False),
        StructField("y", DoubleType(), False),
    ]
)

# Raw CSV schema for reference-format files (no id column on disk).
POINTS_2D_CSV = StructType(
    [
        StructField("x", DoubleType(), False),
        StructField("y", DoubleType(), False),
    ]
)

# Centroid — reference ``centroids.txt`` + the implicit list index as id
# (master.py:90-95; SURVEY §1.1.2).
CENTROIDS_2D = StructType(
    [
        StructField("cid", IntegerType(), False),
        StructField("cx", DoubleType(), False),
        StructField("cy", DoubleType(), False),
    ]
)

# n-D generalization (FIXTURES.md F6): the reference is fixed 2-D /1-D;
# the rebuild treats dimensionality as data, not code.
POINTS_ND = StructType(
    [
        StructField("point_id", LongType(), False),
        StructField("vec", ArrayType(DoubleType(), False), False),
    ]
)

CENTROIDS_ND = StructType(
    [
        StructField("cid", IntegerType(), False),
        StructField("cvec", ArrayType(DoubleType(), False), False),
    ]
)

# Assignment record — the engine's KV shuffle record analog
# ("k:x,y" lines, mapper.py:68; SURVEY §1.1.3). Never materialized to
# disk here: it exists only inside the groupBy exchange.
ASSIGNMENTS = StructType(
    [
        StructField("point_id", LongType(), False),
        StructField("cid", IntegerType(), False),
        StructField("min_d2", DoubleType(), False),
    ]
)

# Multimodal: opaque payload + typed metadata (north-star extension).
MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
