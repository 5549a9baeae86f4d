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
