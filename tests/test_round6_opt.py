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


def test_unified_band_table_one_pass_equals_union_construction(spark):
    """The one-pass (concat+explode) band table must emit exactly the
    rows of the old 4-way-union construction — including NULL/empty
    family arrays (posexplode drops them; a NULL family must not null
    the whole concat) and the SimHash family's emit-even-when-key-NULL
    behavior."""
    from pyspark.sql import functions as F

    from entity_deduplication_spark.config import DedupConfig
    from entity_deduplication_spark.datagen import generate_clips
    from entity_deduplication_spark.functions.hashing import (
        simhash_hamming_band_structs,
    )
    from entity_deduplication_spark.plans.pipeline import (
        build_signatures,
        unified_band_table,
    )

    cfg = DedupConfig()
    clips_pd, _ = generate_clips(80, seed=11)
    sig = build_signatures(spark.createDataFrame(clips_pd), cfg)
    # edge rows: NULL fps / empty bands / NULL simhash
    edge = spark.createDataFrame(
        [
            ("edge_null_fps", [1, 2], [3], 7, None),
            ("edge_empty", [], [], None, []),
            ("edge_only_fps", None, None, 5, [9, 9, 10]),
        ],
        "clip_id string, bands array<bigint>, audio_bands array<bigint>, "
        "simhash bigint, fps array<bigint>",
    )
    sig_cols = sig.select("clip_id", "bands", "audio_bands", "simhash", "fps")
    for table in (sig_cols, edge):
        def _banded(bands_col, src):
            return table.select(
                "clip_id",
                F.posexplode(F.col(bands_col)).alias("band_idx", "band_key"),
            ).select("clip_id", F.lit(src).alias("src"), "band_idx", "band_key")

        sim_structs = simhash_hamming_band_structs(
            F.col("simhash"), cfg.simhash_n_blocks, cfg.simhash_hamming_max
        )
        sim_banded = table.select(
            "clip_id", F.explode(F.array(*sim_structs)).alias("rb")
        ).select(
            "clip_id",
            F.lit(2).alias("src"),
            F.col("rb.band_idx").alias("band_idx"),
            F.col("rb.band_key").alias("band_key"),
        )
        fp_banded = table.select(
            "clip_id", F.explode("fps").alias("band_key")
        ).select(
            "clip_id", F.lit(3).alias("src"), F.lit(0).alias("band_idx"), "band_key"
        )
        old = (
            _banded("bands", 0)
            .unionByName(_banded("audio_bands", 1))
            .unionByName(sim_banded)
            .unionByName(fp_banded)
        )
        new = unified_band_table(table, cfg)
        assert new.columns == old.columns
        assert new.schema == old.schema
        key = lambda r: (r["clip_id"], r["src"], r["band_idx"], r["band_key"])
        assert sorted(new.collect(), key=key) == sorted(old.collect(), key=key)
