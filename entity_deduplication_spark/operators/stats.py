"""Metrics + cluster-distribution aggregations (reference utils.py:192-228,
A2/A3/A4 in SURVEY.md §2.6) as single-pass Spark aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_size_histogram(clusters: DataFrame, cluster_col: str = "cluster_id") -> DataFrame:
    """7-bin cluster-size histogram (reference utils.py:217-225)."""
    sizes = clusters.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("sz"))
    bucket = (
        F.when(F.col("sz") == 1, "1")
        .when(F.col("sz") == 2, "2")
        .when(F.col("sz").between(3, 5), "3-5")
        .when(F.col("sz").between(6, 10), "6-10")
        .when(F.col("sz").between(11, 20), "11-20")
        .when(F.col("sz").between(21, 50), "21-50")
        .otherwise("50+")
    )
    return (
        sizes.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("bucket")
    )


def dedup_metrics(clusters: DataFrame, cluster_col: str = "cluster_id") -> DataFrame:
    """One-row metrics frame: totals, dedup rate, cluster-size stats
    (reference utils.py:192-228)."""
    sizes = clusters.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("sz"))
    return sizes.agg(
        F.sum("sz").alias("total_records"),
        F.count(F.lit(1)).alias("unique_entities"),
        (1.0 - F.count(F.lit(1)) / F.sum("sz")).alias("dedup_rate"),
        F.avg("sz").alias("avg_cluster_size"),
        F.expr("percentile_approx(sz, 0.5)").alias("median_cluster_size"),
        F.max("sz").alias("max_cluster_size"),
        F.sum(F.when(F.col("sz") == 1, 1).otherwise(0)).alias("singletons"),
    )


def partition_lineage(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition row counts for the lineage table (north_rule)."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("rows"))
        .select(
            F.lit(stage).alias("stage"),
            F.col("_pid").alias("partition_id"),
            F.col("rows").cast("long").alias("rows"),
        )
    )
