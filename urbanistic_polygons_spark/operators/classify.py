"""Tag classification: the reference's configurable weight/class tables as
broadcast dimension DataFrames + the wildcard tag-lookup join (F1/F2).

Tables transcribed from reference
Landuse/DefaultMergeFactorCalculator.cs:14-61 (17 barrier rows, 9 barrier
classes, 14 landuse rows); wildcard '*' value semantics from
BarrierInfo.cs:45-73 (exact (key, value) match wins over (key, '*')).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (key, value, resistance) — reference DefaultMergeFactorCalculator.cs:14-32
BARRIERS = [
    ("highway", "living_street", 1),
    ("highway", "residential", 2),
    ("highway", "track", 1),
    ("highway", "unclassified", 2),
    ("highway", "tertiary", 4),
    ("highway", "tertiary_link", 4),
    ("highway", "secondary", 8),
    ("highway", "secondary_link", 8),
    ("highway", "primary", 16),
    ("highway", "primary_link", 16),
    ("highway", "motorway", 30),
    ("highway", "motorway_link", 30),
    ("highway", "trunk", 30),
    ("highway", "trunk_link", 30),
    ("railway", "*", 30),
    ("natural", "water", 10),
    ("waterway", "stream", 5),
]

# (key, value, class) — reference :34-44
BARRIER_CLASSES = [
    ("highway", "service", "residential"),
    ("highway", "pedestrian", "residential"),
    ("highway", "living_street", "residential"),
    ("highway", "residential", "residential"),
    ("highway", "track", "rural"),
    ("highway", "unclassified", "rural"),
    ("railway", "*", "industrial"),
    ("waterway", "*", "water"),
    ("natural", "water", "water"),
]

# (key, value, class) — reference :46-61
LANDUSES = [
    ("landuse", "residential", "residential"),
    ("landuse", "industrial", "industrial"),
    ("amenity", "school", "school"),
    ("amenity", "college", "school"),
    ("amenity", "university", "school"),
    ("amenity", "kindergarten", "school"),
    ("landuse", "meadow", "rural"),
    ("landuse", "farmland", "rural"),
    ("landuse", "forest", "natural"),
    ("landuse", "grass", "natural"),
    ("landuse", "retail", "industrial"),
    ("leisure", "park", "natural"),
    ("natural", "water", "water"),
    ("waterway", "riverbank", "water"),
]


def dim_barriers(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(BARRIERS, "key string, value string, resistance int")


def dim_landuse(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(LANDUSES, "key string, value string, cls string")


def classify_tags(ways: DataFrame, dim: DataFrame,
                  out_col: str, dim_val_col: str) -> DataFrame:
    """Wildcard tag-map lookup as a broadcast join (F1/F2).

    explode(map_entries(tags)) -> join broadcast dim on key AND
    (value match OR dim value '*'); exact matches outrank wildcards
    (reference BarrierInfo.cs:58-67: exact checked first); deterministic
    single result per way via min over (priority, value).
    """
    entries = ways.select(
        "way_id", F.explode(F.map_entries("tags")).alias("kv"))
    joined = (
        entries.join(
            F.broadcast(dim),
            (F.col("kv.key") == dim.key)
            & ((F.col("kv.value") == dim.value) | (dim.value == "*")))
        .withColumn("prio", F.when(F.col("value") == "*", 1).otherwise(0))
    )
    best = (
        joined.groupBy("way_id")
        .agg(F.min(F.struct("prio", dim_val_col)).alias("b"))
        .select("way_id", F.col(f"b.{dim_val_col}").alias(out_col))
    )
    return ways.join(best, "way_id", "left")


def classify_landuse_ways(spark: SparkSession, ways: DataFrame) -> DataFrame:
    """S8 landuse polygon scan: closed classified ways (F2 + F3 + F4).

    Output: (way_id, nodes, cls) for ways that are closed rings with a
    landuse class.
    """
    classified = classify_tags(ways, dim_landuse(spark), "cls", "cls")
    return (
        classified
        .filter(F.col("cls").isNotNull())
        # F3 closed-ring filter (reference CompleteWayExtensions.cs:10-13)
        .filter(F.element_at("nodes", 1) == F.element_at("nodes", -1))
        # F4 way dedup
        .dropDuplicates(["way_id"])
        .select("way_id", "nodes", "cls")
    )


def classify_barrier_ways(spark: SparkSession, ways: DataFrame) -> DataFrame:
    """F1 isBarrier as a broadcast semi-join against the 17-row weight dim,
    keeping the resistance for the (future) merge phase."""
    classified = classify_tags(ways, dim_barriers(spark),
                               "resistance", "resistance")
    return classified.filter(F.col("resistance").isNotNull())
