"""Oversized-cluster splitting (reference utils.py:73-98 analogue)."""

from pyspark.sql import functions as F

from entity_deduplication_spark.operators.connected_components import (
    connected_components,
)
from entity_deduplication_spark.operators.split import split_oversized_clusters


def test_split_oversized_by_score_tier(spark):
    """Two score-0.99 cliques weakly bridged (0.76) form one 20-node
    component; splitting at max_size=15 must cut the weak bridge."""
    nodes = [f"a{i:02d}" for i in range(10)] + [f"b{i:02d}" for i in range(10)]
    edges = []
    for grp in ("a", "b"):
        ids = [n for n in nodes if n.startswith(grp)]
        edges += [(ids[i], ids[i + 1], 0.99) for i in range(len(ids) - 1)]
    edges.append(("a09", "b00", 0.76))  # weak bridge
    e = spark.createDataFrame(edges, ["id1", "id2", "score"])
    n = spark.createDataFrame([(x,) for x in nodes], ["clip_id"])

    cl = connected_components(e.select("id1", "id2"), nodes=n)
    assert cl.select("cluster_id").distinct().count() == 1  # merged

    split = split_oversized_clusters(cl, e, max_size=15)
    got = {r["clip_id"]: r["cluster_id"] for r in split.collect()}
    a_ids = {got[x] for x in nodes if x.startswith("a")}
    b_ids = {got[x] for x in nodes if x.startswith("b")}
    assert len(a_ids) == 1 and len(b_ids) == 1 and a_ids != b_ids


def test_split_keeps_small_clusters_untouched(spark):
    nodes = ["x1", "x2", "y1"]
    e = spark.createDataFrame([("x1", "x2", 0.9)], ["id1", "id2", "score"])
    n = spark.createDataFrame([(x,) for x in nodes], ["clip_id"])
    cl = connected_components(e.select("id1", "id2"), nodes=n)
    split = split_oversized_clusters(cl, e, max_size=50)
    assert {tuple(r) for r in split.collect()} == {tuple(r) for r in cl.collect()}
