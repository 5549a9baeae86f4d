"""Approximate-nearest-neighbor search over embedding columns.

* ``brute_force_topk`` — exact cosine top-k per query (broadcast the small
  query side; JVM-side dot products via zip_with/aggregate). The baseline
  and the oracle for the approximate path.
* ``rhp_signatures`` / ``rhp_bucket_pairs`` / ``lsh_topk`` — random-
  hyperplane LSH (Charikar'02): sign-bit signatures from seeded
  hyperplanes (one numpy matmul per Arrow batch), banded into buckets,
  exact cosine re-rank within buckets. The 100-TB scale path: candidates
  come from bucket equi-joins instead of a cross join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from entity_deduplication_spark.functions.similarity import cosine
from entity_deduplication_spark.operators.pairs import block_self_join_pairs


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    Ranking uses the *rounded* similarity with neighbor-id tie-break so the
    result is reproducible across engines and float summation orders.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("qv"), F.col("cv")), round_dp))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rhp_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Add a random-hyperplane sign signature column ``rhp_sig`` (long)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float64)

    @F.pandas_udf(T.LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ planes) > 0  # batch × n_planes
        weights = (1 << np.arange(n_planes, dtype=np.uint64))
        return pd.Series((bits.astype(np.uint64) @ weights).astype(np.int64))

    return df.select(F.col(id_col), F.col(vec_col), _sig(F.col(vec_col)).alias("rhp_sig"))


def _band_array(bands: int, r: int):
    """array<long> of band slices of ``rhp_sig`` (shift amounts must be
    Python ints for shiftrightunsigned, hence the literal loop)."""
    return F.array(
        *[
            F.shiftrightunsigned(F.col("rhp_sig"), i * r).bitwiseAND(
                F.lit((1 << r) - 1)
            )
            for i in range(bands)
        ]
    )


def tune_rhp_bands(
    threshold: float,
    target_miss: float = 1e-9,
    bucket_selectivity: float = 0.35,
    n_rows: int | None = None,
) -> tuple[int, int]:
    """(rows_per_band r, n_bands B) for recall >= 1 - target_miss at
    cos >= threshold.

    Charikar'02: P(sign bits agree) = 1 - acos(cos)/pi =: p. A pair at
    exactly ``threshold`` collides on one r-bit band w.p. p^r; missing all
    B bands has probability (1 - p^r)^B <= target_miss. Both parameters
    are deterministic functions of the inputs, so the same config always
    yields the same plan.

    Without ``n_rows``, r is chosen so a band retains ~``bucket_
    selectivity`` of at-threshold pairs (larger r = exponentially more,
    smaller buckets — the skew lever). With ``n_rows``, r instead
    minimizes the total-cost model for uniformly-bucketed data,

        cost(r) ~ B(r)*n  [banding/shuffle]  +  B(r)*n^2/2^r  [random
        collisions verified],  B(r) = ln(1/miss)/p^r

    whose minimum is at 2^r = n * (ln 2 + ln p) / (-ln p). For large n
    this picks far more, far smaller buckets than the selectivity rule —
    e.g. threshold 0.9 over 10k rows goes from r=6 (64-key bands, ~33M
    random-collision candidates) to r~15 (~0.5M) — which is exactly the
    lever that keeps candidate volume linear-ish as n grows. B then
    follows from the miss budget in both modes.
    """
    import math

    p = 1.0 - math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
    if n_rows is not None and n_rows >= 2 and p > 0.5:
        opt = n_rows * (math.log(2) + math.log(p)) / (-math.log(p))
        r = max(1, min(48, round(math.log2(max(opt, 2.0)))))
    else:
        r = max(1, int(math.log(bucket_selectivity) / math.log(p)))
    pr = p**r
    b = max(1, math.ceil(math.log(target_miss) / math.log(1.0 - pr)))
    return r, b


def rhp_band_keys(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_band: int = 8,
    n_bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """(id, vec, band_keys array<bigint>) — one r-bit key per band.

    Unlike ``rhp_signatures`` (single 64-bit packed signature) this scales
    to r*B > 64 planes: the kernel is one numpy matmul per Arrow batch and
    packs each band's sign bits into its own bigint, salted with the band
    index so keys never collide across bands.
    """
    r, b = rows_per_band, n_bands
    # the plane matrix is a deterministic function of (seed, dim, r, b):
    # build it ONCE per worker per dim (the dim is only known from the
    # first batch) instead of redrawing an r*b x dim Gaussian every
    # Arrow batch — same keys, ~free after the first batch
    planes_by_dim: dict[int, np.ndarray] = {}

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _keys(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        dim = mat.shape[1]
        planes = planes_by_dim.get(dim)
        if planes is None:
            rng = np.random.default_rng(seed)
            planes = rng.standard_normal((dim, r * b))
            planes_by_dim[dim] = planes
        bits = (mat @ planes) > 0  # batch x (r*b)
        w = 1 << np.arange(r, dtype=np.int64)
        keys = bits.reshape(len(mat), b, r).astype(np.int64) @ w  # batch x b
        return pd.Series(list(keys))

    return df.select(
        F.col(id_col), F.col(vec_col), _keys(F.col(vec_col)).alias("band_keys")
    )


def rhp_bucket_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 32,
    bands: int = 4,
    seed: int = 42,
    block_size_limit: int = 10_000,
) -> DataFrame:
    """Candidate pairs whose sign signatures agree on >= one band of bits."""
    assert n_planes % bands == 0
    r = n_planes // bands
    sig = rhp_signatures(df, id_col, vec_col, dim, n_planes, seed)
    banded = sig.select(
        F.col(id_col).alias("clip_id"),
        F.posexplode(_band_array(bands, r)).alias("band_idx", "band_key"),
    )
    return block_self_join_pairs(
        banded, key_cols=["band_idx", "band_key"], block_size_limit=block_size_limit
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_planes: int = 32,
    bands: int = 4,
    seed: int = 42,
    round_dp: int = 4,
) -> DataFrame:
    """Approximate top-k: bucket-join candidates, exact cosine re-rank."""
    assert n_planes % bands == 0
    r = n_planes // bands

    def _banded(df: DataFrame, role: str) -> DataFrame:
        sig = rhp_signatures(df, id_col, vec_col, dim, n_planes, seed)
        band_arr = _band_array(bands, r)
        return sig.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"{role}_vec"),
            F.posexplode(band_arr).alias("band_idx", "band_key"),
        )

    qb = _banded(queries, "query")
    cb = _banded(corpus, "neighbor")
    cand = (
        qb.join(cb, ["band_idx", "band_key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cos_sim", F.round(cosine(F.col("query_vec"), F.col("neighbor_vec")), round_dp)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cos_sim")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
