"""Canonical-record election + cluster metadata.

Reference: utils.py:119-189 — most-complete row wins per cluster, plus
``cluster_size`` and member ``record_ids`` metadata (utils.py:152-153).
Here: one window election (row_number over a deterministic ordering) plus
a groupBy for metadata — no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
