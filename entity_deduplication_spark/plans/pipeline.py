"""DedupPipeline — the end-to-end near-duplicate detection plan.

Stage graph (the Spark re-expression of the reference's template method
``run_entity_resolution``, base.py:119-147):

    clips ──select/UDF──▶ signatures            [checkpoint]
       signatures ──LSH bands + exact keys──▶ candidate_pairs [checkpoint]
       candidate_pairs ──Jaccard/Hamming verify──▶ edges
       edges ──large-star/small-star CC──▶ clusters          [checkpoint]
       clusters ──window election──▶ canonical
       every stage ──▶ lineage + metrics appends

``bytes`` is projected away after the signature stage — binary audio is
never shuffled. Exact-duplicate floods are captured by chain edges on
exact keys (O(n) not O(n^2)), LSH blocks are skew-salted, and all stages
are resumable via CheckpointManager.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_deduplication_spark.config import DedupConfig
from entity_deduplication_spark.functions.hashing import band_keys
from entity_deduplication_spark.functions.text import normalize_text, word_shingles
from entity_deduplication_spark.operators.canonical import elect_canonical
from entity_deduplication_spark.operators.connected_components import (
    connected_components,
)
from entity_deduplication_spark.operators.pairs import chain_edges_within_block
from entity_deduplication_spark.operators.stats import dedup_metrics
from entity_deduplication_spark.operators.verify import verified_edges
from entity_deduplication_spark.sources.io import CheckpointManager


def build_signatures(clips: DataFrame, cfg: DedupConfig) -> DataFrame:
    """clips -> signature table; the only stage that touches ``bytes``.

    Columns: clip_id, transcript_norm, bytes_md5, shingles, audio_shingles,
    minhash, simhash, bands, audio_bands, n_words.
    """
    from entity_deduplication_spark.audio.decode import audio_signature_udf
    from entity_deduplication_spark.functions.hashing import text_signature_udf

    tsig = text_signature_udf(cfg.minhash_k, cfg.minhash_seed)
    asig = audio_signature_udf(
        cfg.frame_ms,
        cfg.hop_ms,
        cfg.audio_shingle_k,
        cfg.audio_quant_levels,
        cfg.minhash_k,
        cfg.minhash_seed,
    )
    sig = clips.select(
        "clip_id",
        normalize_text(F.col("transcript")).alias("transcript_norm"),
        # empty audio gets a NULL digest: "both clips have zero bytes" is
        # not duplicate evidence (mirrors the empty-transcript treatment
        # and the pandas oracle's empty-key skip), and every downstream
        # consumer (exact chain edges, verify's early-exact-drop,
        # null-safe equality evidence) already treats NULL as no-evidence
        F.when(F.length(F.col("bytes")) > 0, F.md5(F.col("bytes"))).alias(
            "bytes_md5"
        ),
        word_shingles(F.col("transcript"), cfg.shingle_k).alias("shingles"),
        asig(F.col("bytes")).alias("_a"),
    )
    sig = sig.withColumn("_t", tsig(F.col("shingles"))).select(
        "clip_id",
        "transcript_norm",
        "bytes_md5",
        "shingles",
        F.col("_a.audio_shingles").alias("audio_shingles"),
        F.col("_a.audio_minhash").alias("audio_minhash"),
        F.col("_t.minhash").alias("minhash"),
        F.col("_t.simhash").alias("simhash"),
    )
    sig = sig.withColumn(
        "bands",
        F.when(
            F.size("shingles") > 0,
            band_keys(F.col("minhash"), cfg.lsh_bands, cfg.lsh_rows),
        ).otherwise(F.array().cast("array<bigint>")),
    )
    sig = sig.withColumn(
        "audio_bands",
        F.when(
            F.size("audio_shingles") >= cfg.min_audio_shingles,
            band_keys(F.col("audio_minhash"), cfg.lsh_bands, cfg.lsh_rows),
        ).otherwise(F.array().cast("array<bigint>")),
    )
    sig = sig.withColumn("n_words", F.size(F.split(F.col("transcript_norm"), " ")))
    # winnowed substring fingerprints (operators.suffix): a 4th band family
    # in the unified blocking stage; complete for runs >= min_run_chars
    from entity_deduplication_spark.operators.suffix import fingerprints_udf

    sig = sig.withColumn("fps", fingerprints_udf(cfg)(F.col("transcript_norm")))
    return sig


def unified_band_table(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """The unified blocking-key table: (clip_id, src, band_idx, band_key).

    src 0 = text MinHash LSH bands, 1 = audio MinHash LSH bands,
    2 = SimHash Hamming-block keys, 3 = winnowed substring fingerprints.
    Exposed separately from :func:`candidate_pairs` so scale tooling can
    audit per-family bucket-size distributions (pair mass per family)
    without running the self-join.

    All four families are emitted by ONE explode over a per-row concat of
    per-family struct arrays, not a 4-way union of per-family scans: the
    union re-scanned the signature table four times (4x the checkpoint
    traversal, 4x the map tasks, 4x the per-task shuffle-writer setup
    feeding the window exchange) for rows that one pass can produce.
    Per-family element construction mirrors the old per-family plans
    exactly: a NULL family array contributes no rows (posexplode
    semantics, via coalesce-to-empty so one NULL family cannot null the
    whole concat), and the SimHash family emits all its structs whenever
    the row exists (explode of a non-null array literal).
    """
    from entity_deduplication_spark.functions.hashing import (
        simhash_hamming_band_structs,
    )

    def _elem(src: int, band_idx: Column, band_key: Column) -> Column:
        return F.struct(
            F.lit(src).alias("src"),
            band_idx.cast("int").alias("band_idx"),
            band_key.cast("bigint").alias("band_key"),
        )

    def _fam(col: Column, src: int, positional: bool) -> Column:
        # posexplode-equivalent (band_idx, band_key) structs; NULL -> empty
        arr = F.coalesce(col, F.array().cast("array<bigint>"))
        if positional:
            return F.transform(arr, lambda x, i: _elem(src, i, x))
        return F.transform(arr, lambda x: _elem(src, F.lit(0), x))

    # simhash block-combination bands (guaranteed complete for
    # Hamming <= hamming_max; see simhash_hamming_band_structs for why
    # rotated prefixes were replaced)
    sim_structs = simhash_hamming_band_structs(
        F.col("simhash"), cfg.simhash_n_blocks, cfg.simhash_hamming_max
    )
    sim_fam = F.transform(
        F.array(*sim_structs),
        lambda s: _elem(2, s["band_idx"], s["band_key"]),
    )

    combined = F.concat(
        _fam(F.col("bands"), 0, positional=True),
        _fam(F.col("audio_bands"), 1, positional=True),
        sim_fam,
        _fam(F.col("fps"), 3, positional=False),
    )
    return signatures.select(
        "clip_id", F.explode(combined).alias("rb")
    ).select("clip_id", "rb.src", "rb.band_idx", "rb.band_key")


def candidate_pairs(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Candidate pairs from ALL blocking strategies via one unified block
    table -> one skew-aware self-join.

    The reference unions per-strategy pair dicts
    (deterministic_feature.py:212-217,242-247); here the *block keys* are
    unioned first — (strategy, band_idx, band_key, clip_id) — so the
    window-count, self-join, and cross-strategy pair dedup run once
    instead of three times (one shuffle chain instead of three).
    """
    from entity_deduplication_spark.operators.pairs import block_self_join_pairs

    unified = unified_band_table(signatures, cfg)
    # on_oversize="chain": saturated band buckets emit O(n) chain
    # candidates instead of all pairs (see DedupConfig.band_bucket_cap) —
    # full enumeration would emit C(n, 2) pairs per degenerate bucket
    # (super-linear on low-entropy payloads, exactly what a
    # 1000-executor verify shuffle cannot afford), while skipping
    # outright (round 4's policy) silently LOSES any real duplicate
    # group > cap whose members share every band key and have no exact
    # key (e.g. re-encodes of one clip with empty transcripts). Chains
    # keep the pair mass linear AND let connected components recover
    # such groups through verified-chain transitivity.
    # cfg.salt_buckets is deliberately not passed: band_bucket_cap (64)
    # sits below the hot-block threshold (256), so every surviving
    # full-pairs block is cold and the salted join path is unreachable
    # from here.
    #
    # Per-family oversize policy (Column mode): the substring-fingerprint
    # family (src 3) uses a LOWER cap (fp_df_cap) with SKIP — a
    # fingerprint shared by many clips is a stopword-like common phrase
    # whose bucket grows ∝ corpus size (see DedupConfig.fp_df_cap); the
    # minhash/simhash families keep chain-at-cap, which also covers
    # duplicate-flood recovery for the rows a fp-skip drops.
    is_fp = F.col("src") == F.lit(3)
    return block_self_join_pairs(
        unified,
        key_cols=["src", "band_idx", "band_key"],
        id_col="clip_id",
        block_size_limit=F.when(is_fp, F.lit(cfg.fp_df_cap)).otherwise(
            F.lit(cfg.band_bucket_cap)
        ),
        on_oversize=F.when(is_fp, F.lit("skip")).otherwise(F.lit("chain")),
    )


def exact_edges(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Chain edges over exact-equality keys (bytes digest, normalized
    transcript) — verification-free, O(n) per block (B1/B6 analogues)."""
    by_bytes = chain_edges_within_block(
        signatures.select("clip_id", "bytes_md5").filter(
            F.col("bytes_md5").isNotNull()
        ),
        key_cols=["bytes_md5"],
    )
    by_text = chain_edges_within_block(
        signatures.select("clip_id", "transcript_norm").filter(
            F.length("transcript_norm") > 0
        ),
        key_cols=["transcript_norm"],
    )
    return (
        by_bytes.unionByName(by_text)
        .dropDuplicates(["id1", "id2"])
        .withColumn("score", F.lit(1.0))
    )


@dataclass
class DedupResult:
    signatures: DataFrame
    candidates: DataFrame
    edges: DataFrame
    clusters: DataFrame
    canonical: DataFrame
    metrics: DataFrame


class DedupPipeline:
    """Orchestrator with optional checkpoint/resume per stage."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: DedupConfig | None = None,
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.cfg = cfg or DedupConfig()
        self.ckpt = CheckpointManager(spark, checkpoint_dir or self.cfg.checkpoint_dir)

    def run(self, clips: DataFrame, resume: bool = True) -> DedupResult:
        cfg = self.cfg
        # spread the decode/signature UDF work across all cores when the
        # source has too few input splits — but NEVER shuffle the bytes
        # column when the scan already yields enough partitions: a
        # repartition of the raw clips is a full-table disk round trip
        # (write+read of every audio blob) that the UDF stage doesn't need
        from entity_deduplication_spark.sources.io import spread_partitions

        src = spread_partitions(clips, key="clip_id")
        sig = self.ckpt.get_or_compute(
            "signatures",
            lambda: build_signatures(src, cfg),
            resume=resume,
            # scan + UDF projections (+ at most one repartition): no join
            # for AQE to re-plan — a direct localCheckpoint serializes the
            # signatures once instead of cache-write + checkpoint-copy
            narrow=True,
        )
        return self.run_from_signatures(sig, resume=resume)

    def run_from_signatures(
        self, sig: DataFrame, resume: bool = True
    ) -> DedupResult:
        """Block/verify/cluster an already-built signatures table.

        This is the batch re-cluster half of the streaming contract
        (streaming.ingest appends signatures incrementally; global
        re-clustering stays batch) and the resume path for a pipeline
        whose signature stage is checkpointed elsewhere.
        """
        cfg = self.cfg
        # eager=False: the pair plan already reads from the materialized
        # sized-block table (block_self_join_pairs checkpoints it), and
        # verify consumes the candidate set exactly once — an eager
        # persist+count+checkpoint here was two extra jobs and a second
        # full serialization of the pair table for no reuse
        cand = self.ckpt.get_or_compute(
            "candidate_pairs",
            lambda: candidate_pairs(sig, cfg),
            resume=resume,
            eager=False,
        )
        verified = verified_edges(cand.select("id1", "id2"), sig, cfg)
        # eager=False: edges feed exactly one action (the CC initial edge-set
        # signature), which fills the persist cache in the same job
        edges = self.ckpt.get_or_compute(
            "edges",
            lambda: verified.unionByName(exact_edges(sig, cfg))
            .groupBy("id1", "id2")
            .agg(F.max("score").alias("score")),
            resume=resume,
            eager=False,
        )
        def _cluster() -> DataFrame:
            cl = connected_components(
                edges,
                nodes=sig.select("clip_id"),
                max_iterations=cfg.cc_max_iterations,
            )
            if cfg.split_oversized:
                if cfg.split_method == "louvain":
                    from entity_deduplication_spark.operators.louvain import (
                        louvain_split_oversized,
                    )

                    cl = louvain_split_oversized(cl, edges, cfg.max_cluster_size)
                else:
                    from entity_deduplication_spark.operators.split import (
                        split_oversized_clusters,
                    )

                    cl = split_oversized_clusters(cl, edges, cfg.max_cluster_size)
            return cl

        clusters = self.ckpt.get_or_compute(
            "clusters", _cluster, resume=resume, eager=False
        )
        clustered = clusters.join(
            sig.select("clip_id", "transcript_norm", "n_words"), "clip_id"
        )
        canonical = elect_canonical(
            clustered, order_col="n_words"
        )
        metrics = dedup_metrics(clusters)
        self.ckpt.write_metrics("final", metrics)
        return DedupResult(sig, cand, edges, clusters, canonical, metrics)
