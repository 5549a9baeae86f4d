"""Canonical-record election + cluster metadata.

Reference: utils.py:119-189 — most-complete row wins per cluster, plus
``cluster_size`` and member ``record_ids`` metadata (utils.py:152-153).
Here: one window election (row_number over a deterministic ordering) plus
a groupBy for metadata — no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def completeness(df: DataFrame, cols: list[str]) -> F.Column:
    """Per-row count of non-null/non-empty fields (reference utils.py:143-148)."""
    score = F.lit(0)
    for c in cols:
        col = F.col(c)
        present = col.isNotNull()
        if dict(df.dtypes).get(c) == "string":
            present = present & (F.length(col) > 0)
        score = score + present.cast("int")
    return score


def elect_canonical(
    clustered: DataFrame,
    cluster_col: str = "cluster_id",
    id_col: str = "clip_id",
    completeness_cols: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """One representative row per cluster + cluster_size + record_ids.

    Ordering: completeness desc (or ``order_col`` desc), then id asc —
    deterministic under any parallelism.
    """
    if order_col is not None:
        rank_expr = F.col(order_col)
    else:
        cols = completeness_cols or [
            c for c in clustered.columns if c not in (cluster_col, id_col)
        ]
        rank_expr = completeness(clustered, cols)
    ranked = clustered.withColumn("_completeness", rank_expr)
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc("_completeness"), F.asc(id_col)
    )
    winners = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    meta = clustered.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.sort_array(F.collect_list(F.col(id_col))).alias("record_ids"),
    )
    return winners.join(meta, cluster_col)


def field_modes(
    clustered: DataFrame,
    cols: list[str],
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Per-cluster most-common non-empty value for each of ``cols``.

    (cluster_id, mode_<col>...) — reference utils.py:158-176 fills missing
    canonical name/domain with the cluster's most frequent value. One
    groupBy per field; ties break deterministically on (count desc, value
    asc). NULL/empty values never become a mode.
    """
    out = None
    for c in cols:
        counted = (
            clustered.filter(F.col(c).isNotNull() & (F.length(F.col(c).cast("string")) > 0))
            .groupBy(cluster_col, c)
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        w = Window.partitionBy(cluster_col).orderBy(
            F.desc("_n"), F.asc(c)
        )
        mode = (
            counted.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(cluster_col, F.col(c).alias(f"mode_{c}"))
        )
        out = mode if out is None else out.join(mode, cluster_col, "outer")
    return out


def most_detailed(
    clustered: DataFrame,
    col: str,
    cluster_col: str = "cluster_id",
    detail: Column | None = None,
) -> DataFrame:
    """(cluster_id, detailed_<col>): the cluster's most 'detailed' value —
    default detail metric = comma count then length then value asc
    (reference utils.py:177-185 picks the most-detailed address)."""
    d = detail if detail is not None else (
        F.size(F.split(F.col(col), ",")) * 1000 + F.length(F.col(col))
    )
    w = Window.partitionBy(cluster_col).orderBy(F.desc("_d"), F.asc(col))
    return (
        clustered.filter(F.col(col).isNotNull())
        .withColumn("_d", d)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(cluster_col, F.col(col).alias(f"detailed_{col}"))
    )


def backfill_canonical(
    canonical: DataFrame,
    clustered: DataFrame,
    mode_cols: list[str],
    cluster_col: str = "cluster_id",
    detail_cols: list[str] | None = None,
) -> DataFrame:
    """Fill the elected canonical row's missing/empty fields.

    ``mode_cols``: backfilled with the cluster's most-common value;
    ``detail_cols``: backfilled with the most-detailed value (comma count,
    then length). Matches reference utils.py:158-185 semantics: an elected
    winner keeps its own non-empty values; only gaps are filled.
    """
    out = canonical
    modes = field_modes(clustered, mode_cols, cluster_col)
    if modes is not None:
        out = out.join(modes, cluster_col, "left")
        for c in mode_cols:
            filled = F.when(
                F.col(c).isNull() | (F.length(F.col(c).cast("string")) == 0),
                F.col(f"mode_{c}"),
            ).otherwise(F.col(c))
            out = out.withColumn(c, filled).drop(f"mode_{c}")
    for c in detail_cols or []:
        det = most_detailed(clustered, c, cluster_col)
        out = out.join(det, cluster_col, "left")
        filled = F.when(
            F.col(c).isNull() | (F.length(F.col(c).cast("string")) == 0),
            F.col(f"detailed_{c}"),
        ).otherwise(F.col(c))
        out = out.withColumn(c, filled).drop(f"detailed_{c}")
    return out
