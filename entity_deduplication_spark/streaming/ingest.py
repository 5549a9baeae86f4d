"""Structured-Streaming ingestion of new clips (stretch goal per
SURVEY.md §2.9 — the reference is strictly batch; resumability comes from
stage checkpoints, and this module adds incremental signature ingestion
on top).

Pattern: ``readStream`` over a clips directory -> the same signature
expressions as the batch pipeline -> ``foreachBatch`` appends to the
signatures table; a periodic batch job re-runs blocking/CC over the
accumulated signatures (re-clustering is a global operation and stays
batch — LSH blocking is not incrementally maintainable without keeping
per-band state stores, which batch recompute beats at 10^12 scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from entity_deduplication_spark.config import DedupConfig
from entity_deduplication_spark.plans.pipeline import build_signatures

CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
    ]
)


def stream_signatures(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally decode + sign arriving clips parquet files.

    ``available_now=True`` drains the current backlog and stops (used in
    tests); in production leave it False for a continuous micro-batch
    query. Output is an append-only signatures parquet/Iceberg table the
    batch dedup job reads.
    """
    cfg = cfg or DedupConfig()
    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def _per_batch(batch: DataFrame, epoch_id: int) -> None:
        sigs = build_signatures(batch, cfg)
        sigs.write.mode("append").parquet(output_dir)

    writer = stream.writeStream.foreachBatch(_per_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
