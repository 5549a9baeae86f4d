"""Round-6 optimization guards.

Pins the behavior changes that round 6's performance work introduced:
the Column-mode oversize-policy validation (a typo'd policy literal must
raise, not silently drop candidates — ADVICE r5) and the equivalence of
the restructured ngram/pair-confusion plans with their previous outputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException


def _pairs_df(spark):
    return spark.createDataFrame(
        [(f"c{i}", "hot") for i in range(6)] + [("x", "ok"), ("y", "ok")],
        "clip_id string, block_key string",
    )


def test_column_mode_unknown_policy_raises(spark):
    from entity_deduplication_spark.operators.pairs import block_self_join_pairs

    out = block_self_join_pairs(
        _pairs_df(spark),
        ["block_key"],
        block_size_limit=F.lit(4),
        on_oversize=F.lit("truncate"),  # not a Column-mode policy
    )
    with pytest.raises(Exception) as exc:
        out.collect()
    assert "unsupported Column on_oversize policy" in str(exc.value)


def test_column_mode_valid_policies_unchanged(spark):
    from entity_deduplication_spark.operators.pairs import block_self_join_pairs

    keyed = _pairs_df(spark)
    chain = block_self_join_pairs(
        keyed, ["block_key"], block_size_limit=F.lit(4), on_oversize=F.lit("chain")
    ).collect()
    pairs = {(r["id1"], r["id2"]) for r in chain}
    assert pairs == {("x", "y")} | {(f"c{i}", f"c{i + 1}") for i in range(5)}
    skip = block_self_join_pairs(
        keyed, ["block_key"], block_size_limit=F.lit(4), on_oversize=F.lit("skip")
    ).collect()
    assert {(r["id1"], r["id2"]) for r in skip} == {("x", "y")}


def test_pair_confusion_restructured_counts(spark):
    """The two-consumer contingency rewrite must reproduce the exact
    pair-confusion counts (hand-checkable 6-node example)."""
    from entity_deduplication_spark.operators.stats import pair_confusion

    a = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "clip_id long, cluster_id long"
    )  # {0,1,2}, {3,4,5}
    b = spark.createDataFrame(
        [(i, i // 2) for i in range(6)], "clip_id long, cluster_id long"
    )  # {0,1}, {2,3}, {4,5}
    row = pair_confusion(a, b).collect()[0]
    # ss: pairs same in both = (0,1) and (4,5) = 2
    # sa (same in a) = 2*C(3,2) = 6 -> sd = 4; sb = 3*C(2,2)... = 3 -> ds = 1
    # total = C(6,2) = 15 -> dd = 15 - 2 - 4 - 1 = 8
    assert (row["n"], row["ss"], row["sd"], row["ds"], row["dd"]) == (6, 2, 4, 1, 8)


def test_clips_parquet_row_groups_small_and_stale_cache_heals(tmp_path):
    """Row groups are Spark's scan-parallelism quantum: oversized groups
    leave most byte-range splits empty (the 8000-clip bench file had 4
    ~75 MB groups -> 4 working tasks out of 32). ensure_clips_parquet
    must (a) write small row groups and (b) regenerate a cached file
    written with the old oversized layout, byte-identically."""
    import pandas as pd
    import pyarrow.parquet as pq

    from entity_deduplication_spark.datagen import (
        CLIPS_ROW_GROUP_SIZE,
        ensure_clips_parquet,
        generate_clips,
    )

    d = str(tmp_path)
    p, _ = ensure_clips_parquet(300, seed=7, data_dir=d)
    meta = pq.ParquetFile(p).metadata
    assert meta.num_rows == 300
    assert meta.num_rows / meta.num_row_groups <= CLIPS_ROW_GROUP_SIZE
    fresh = pd.read_parquet(p)

    # simulate a stale cache from the old layout (one giant row group)
    clips, _ = generate_clips(300, seed=7)
    clips.to_parquet(p, index=False, row_group_size=2048)
    assert pq.ParquetFile(p).metadata.num_row_groups == 1
    p2, _ = ensure_clips_parquet(300, seed=7, data_dir=d)
    assert p2 == p
    meta2 = pq.ParquetFile(p).metadata
    assert meta2.num_rows / meta2.num_row_groups <= CLIPS_ROW_GROUP_SIZE
    assert pd.read_parquet(p).equals(fresh)
