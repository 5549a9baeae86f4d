"""entity_deduplication_spark — a from-scratch PySpark-native near-duplicate
detection and clustering engine.

Re-expresses the semantics of the reference implementation
(gryg/entity-deduplication: blocking -> candidate pairs -> pairwise
verification -> connected-component clustering -> canonical entities ->
metrics; see /root/reference, e.g. base.py:119-147 for the stage template)
as idiomatic Spark DataFrame plans over an audio clip + transcript table:

    clip_id STRING, bytes BINARY, sr_hz INT, dur_ms INT,
    codec STRING, transcript STRING

Nothing here is a port: the reference is driver-side pandas + python loops;
this engine is declarative Catalyst plans plus Arrow-vectorized pandas_udf
kernels (audio decode, MinHash/SimHash signatures, suffix-array matching)
with zero per-row Python on the hot path.
"""

from entity_deduplication_spark.config import DedupConfig
from entity_deduplication_spark.session import get_spark

__all__ = ["DedupConfig", "get_spark"]
__version__ = "0.1.0"
