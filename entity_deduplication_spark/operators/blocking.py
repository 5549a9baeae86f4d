"""Candidate generation (blocking) operators.

The reference's blocking is a family of dict-of-lists builders
(deterministic_feature.py:341-433); here each strategy is a DataFrame
plan ending in a skew-aware self-equi-join (operators.pairs). Strategies:

* exact-key blocks (B1/B6 analogues: bytes digest, normalized transcript),
* MinHash-LSH band blocks (B14 — generalizes B8 token / B9 trigram blocks),
* SimHash prefix blocks with bit-rotations (Hamming-LSH),
* sorted-neighborhood windows (B16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from entity_deduplication_spark.config import DedupConfig
from entity_deduplication_spark.operators.pairs import block_self_join_pairs


def lsh_band_pairs(
    signatures: DataFrame,
    cfg: DedupConfig,
    bands_col: str = "bands",
    id_col: str = "clip_id",
) -> DataFrame:
    """Candidate pairs from MinHash-LSH band collisions.

    ``signatures`` must carry ``bands_col`` = array<bigint> of b band
    hashes (functions.hashing.band_keys). posexplode → (band_idx, band_key)
    blocks → skew-aware self-join. Two rows collide if ANY band matches —
    the ``dropDuplicates`` inside the self-join plus the cross-band
    ``dropDuplicates`` keep each unordered pair once.
    """
    banded = signatures.select(
        F.col(id_col), F.posexplode(F.col(bands_col)).alias("band_idx", "band_key")
    )
    return block_self_join_pairs(
        banded,
        key_cols=["band_idx", "band_key"],
        id_col=id_col,
        block_size_limit=cfg.block_size_limit,
        salt_buckets=cfg.salt_buckets,
    )


def simhash_block_pairs(
    signatures: DataFrame,
    cfg: DedupConfig,
    simhash_col: str = "simhash",
    id_col: str = "clip_id",
) -> DataFrame:
    """Candidate pairs whose SimHash signatures share a block-subset key.

    Hamming-LSH via block combinations (Manku et al., WWW'07): the 64-bit
    signature splits into ``cfg.simhash_n_blocks`` contiguous blocks and
    every ``(n_blocks - hamming_max)``-subset of blocks forms a band key.
    Any two signatures within the Hamming radius are GUARANTEED to share
    at least one band (pigeonhole on clean blocks) — the rotated-prefix
    scheme this replaces missed radius-3 pairs whose differing bits
    landed in every prefix, and its 16-bit keyspace made random
    collisions (and thus candidate volume) grow ∝ n². Verification
    (exact bit_count) happens in operators.verify.
    """
    from entity_deduplication_spark.functions.hashing import (
        simhash_hamming_band_structs,
    )

    structs = simhash_hamming_band_structs(
        F.col(simhash_col), cfg.simhash_n_blocks, cfg.simhash_hamming_max
    )
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*structs)).alias("rb")
    ).select(id_col, F.col("rb.band_idx").alias("band_idx"), F.col("rb.band_key").alias("band_key"))
    return block_self_join_pairs(
        banded,
        key_cols=["band_idx", "band_key"],
        id_col=id_col,
        block_size_limit=cfg.block_size_limit,
        salt_buckets=cfg.salt_buckets,
    )


def block_stats(
    df: DataFrame,
    key_cols: list,
    stoplist: dict | None = None,
) -> DataFrame:
    """Per-block (key..., n_ids, n_pairs) with optional stop-listed keys.

    The reference's email-domain block drops generic-provider domains
    before blocking (B4, deterministic_feature.py:365-377 stoplist
    pattern); ``stoplist`` maps column name -> excluded values. n_pairs is
    the comparison budget C(n,2) the block would generate — the planning
    metric the reference logs per block (A6).
    """
    out = df
    for col, values in (stoplist or {}).items():
        out = out.filter(~F.col(col).isin(list(values)))
    return out.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_ids"),
        (F.count(F.lit(1)) * (F.count(F.lit(1)) - 1) / 2)
        .cast("long")
        .alias("n_pairs"),
    )


def key_equality_pairs(
    df: DataFrame,
    id_col: str,
    block_key,
    key_name: str = "block_key",
    block_size_limit: int = 10_000,
) -> DataFrame:
    """(id1, id2, <key_name>) pairs sharing an equality block key — the
    thin composite-recipe wrapper (reference B2/B3/B10-B13/B15 are all
    instances: phone suffix, anagram token key, industry+region, ...).
    Skew-aware via block_self_join_pairs; the key is re-attached from the
    id1 side for inspectability."""
    keyed = df.select(F.col(id_col).alias("clip_id"), block_key.alias(key_name))
    pairs = block_self_join_pairs(
        keyed, key_cols=[key_name], block_size_limit=block_size_limit
    )
    side = df.select(F.col(id_col).alias("id1"), block_key.alias(key_name))
    return pairs.join(side, "id1").select("id1", "id2", key_name)


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_col: str,
    partition_cols: list[str] | None = None,
    window: int = 20,
    id_col: str = "clip_id",
    max_len_diff: int | None = None,
    len_col: str | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (reference B16,
    deterministic_feature.py:1149-1171): sort within a partition, pair
    each row with the next ``window`` rows; optional length prefilter.

    Expressed as a rank self-join on row_number *buckets* — the
    reference's only sort-merge-shaped operator. With ``partition_cols``
    the rank window runs per partition key; WITHOUT them the global sort
    is built scale-safely: ``repartitionByRange`` + within-partition ranks
    + broadcast partition offsets (global_rank = offset + local rank), so
    there is never a single-partition window or a cross join. Either way,
    pairing joins on rank buckets of width ``window`` (each row lands in
    its bucket and its successor bucket) — shuffle volume O(n), not O(n^2).
    """
    parts = partition_cols or []
    keep = [F.col(len_col)] if len_col else []
    if parts:
        w = Window.partitionBy(*[F.col(c) for c in parts]).orderBy(
            sort_col, id_col
        )
        ranked = df.select(
            *parts, F.col(id_col), F.col(sort_col), *keep
        ).withColumn("_rn", F.row_number().over(w))
    else:
        ranked = _global_rank(df, sort_col, id_col, keep)

    bucket = F.floor((F.col("_rn") - 1) / window)
    a = ranked.select(
        *parts,
        F.col(id_col).alias("id1"),
        F.col("_rn").alias("_rn1"),
        bucket.alias("_bk"),
        *([F.col(len_col).alias("_len1")] if len_col else []),
    )
    # each right row is probed from its own bucket and the previous one:
    # for 0 < rn2-rn1 <= window the buckets differ by at most 1
    b = ranked.select(
        *parts,
        F.col(id_col).alias("id2"),
        F.col("_rn").alias("_rn2"),
        F.explode(F.array(bucket, bucket - 1)).alias("_bk"),
        *([F.col(len_col).alias("_len2")] if len_col else []),
    )
    cond = (F.col("_rn2") > F.col("_rn1")) & (
        F.col("_rn2") <= F.col("_rn1") + window
    )
    out = a.join(b, on=[*parts, "_bk"]).filter(cond)
    if len_col and max_len_diff is not None:
        out = out.filter(
            F.abs(F.col("_len1") - F.col("_len2")) <= max_len_diff
        )
    return (
        out.select(
            F.least("id1", "id2").alias("id1"),
            F.greatest("id1", "id2").alias("id2"),
        )
        .filter(F.col("id1") != F.col("id2"))
        .dropDuplicates(["id1", "id2"])
    )


def _global_rank(
    df: DataFrame, sort_col: str, id_col: str, keep: list
) -> DataFrame:
    """Scale-safe global row_number by (sort_col, id_col): range-partition,
    rank within each range partition, add broadcast cumulative offsets.
    The only driver-side data is one row-count per partition."""
    src = df.select(F.col(id_col), F.col(sort_col), *keep)
    by_range = src.repartitionByRange(F.col(sort_col), F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # localCheckpoint, NOT persist: persist() is keyed in the CacheManager
    # and lives until an explicit unpersist (which no caller can place —
    # the consumer materializes at an unknown later point), so it would
    # leak a full ranked copy per call for the session lifetime. A
    # checkpointed RDD is released by the ContextCleaner as soon as the
    # DataFrame is garbage collected.
    by_range = by_range.localCheckpoint(eager=True)
    counts = dict(
        by_range.groupBy("_pid").count().collect()
    )  # tiny: one row per partition; partition count is bounded by
    # spark.sql.shuffle.partitions, so this collect is O(hundreds) rows
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.coalesce(
        *[
            F.when(F.col("_pid") == pid, F.lit(off))
            for pid, off in sorted(offsets.items())
        ],
        F.lit(0),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("_pid").orderBy(sort_col, id_col)
    return by_range.withColumn(
        "_rn", F.row_number().over(w) + off_expr
    ).drop("_pid")
