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
    n_rotations: int = 4,
) -> DataFrame:
    """Candidate pairs whose SimHash signatures share a rotated prefix.

    Classic Hamming-LSH: take ``n_rotations`` bit-rotations of the 64-bit
    signature and block on the top ``simhash_block_bits`` of each. Two
    signatures within a small Hamming radius share at least one rotated
    prefix with high probability (their differing bits fall outside the
    prefix in some rotation). Verification (exact bit_count) happens in
    operators.verify.
    """
    bits = 64
    p = cfg.simhash_block_bits
    rot_cols = []
    for r in range(n_rotations):
        shift = (bits // n_rotations) * r
        rotated = F.shiftleft(F.col(simhash_col), shift).bitwiseOR(
            F.shiftrightunsigned(F.col(simhash_col), bits - shift)
        ) if shift else F.col(simhash_col)
        rot_cols.append(
            F.struct(
                F.lit(r).alias("band_idx"),
                F.shiftrightunsigned(rotated, bits - p).alias("band_key"),
            )
        )
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*rot_cols)).alias("rb")
    ).select(id_col, F.col("rb.band_idx").alias("band_idx"), F.col("rb.band_key").alias("band_key"))
    return block_self_join_pairs(
        banded,
        key_cols=["band_idx", "band_key"],
        id_col=id_col,
        block_size_limit=cfg.block_size_limit,
        salt_buckets=cfg.salt_buckets,
    )


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

    Expressed as a rank self-join on row_number bands — the reference's
    only sort-merge-shaped operator, here a window + range self-join.
    """
    parts = partition_cols or []
    w = Window.partitionBy(*[F.col(c) for c in parts]).orderBy(sort_col) \
        if parts else Window.orderBy(sort_col)
    ranked = df.select(
        *(parts or []), F.col(id_col), F.col(sort_col),
        *( [F.col(len_col)] if len_col else [] ),
    ).withColumn("_rn", F.row_number().over(w))
    a = ranked.select(
        *(parts or []),
        F.col(id_col).alias("id1"),
        F.col("_rn").alias("_rn1"),
        *( [F.col(len_col).alias("_len1")] if len_col else [] ),
    )
    b = ranked.select(
        *(parts or []),
        F.col(id_col).alias("id2"),
        F.col("_rn").alias("_rn2"),
        *( [F.col(len_col).alias("_len2")] if len_col else [] ),
    )
    cond = (F.col("_rn2") > F.col("_rn1")) & (
        F.col("_rn2") <= F.col("_rn1") + window
    )
    joined = a.join(b, on=parts) if parts else a.crossJoin(b)
    out = joined.filter(cond)
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
