"""Pair plumbing: block self-join (incl. salted hot path) vs brute force;
chain edges produce the same connected components as cliques."""

import itertools

from pyspark.sql import functions as F

from entity_deduplication_spark.operators.connected_components import (
    connected_components,
)
from entity_deduplication_spark.operators.pairs import (
    block_self_join_pairs,
    canonicalize_pairs,
    chain_edges_within_block,
)


def _brute_pairs(rows):
    by_key = {}
    for k, i in rows:
        by_key.setdefault(k, []).append(i)
    out = set()
    for members in by_key.values():
        for a, b in itertools.combinations(sorted(members), 2):
            out.add((a, b))
    return out


def test_block_self_join_matches_brute_force(spark):
    rows = [(f"k{i % 7}", f"id{i:03d}") for i in range(60)]
    df = spark.createDataFrame(rows, ["bk", "clip_id"])
    got = {
        (r["id1"], r["id2"])
        for r in block_self_join_pairs(df, ["bk"], block_size_limit=100).collect()
    }
    assert got == _brute_pairs(rows)


def test_block_self_join_salted_hot_path_lossless(spark):
    # one hot key (300 rows > hot_threshold) + cold keys
    rows = [("hot", f"id{i:04d}") for i in range(300)] + [
        (f"c{i % 5}", f"xd{i:03d}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["bk", "clip_id"])
    got = {
        (r["id1"], r["id2"])
        for r in block_self_join_pairs(
            df, ["bk"], block_size_limit=1000, hot_threshold=64, salt_buckets=8
        ).collect()
    }
    assert got == _brute_pairs(rows)


def test_block_size_limit_truncates(spark):
    rows = [("k", f"id{i:03d}") for i in range(30)]
    df = spark.createDataFrame(rows, ["bk", "clip_id"])
    got = block_self_join_pairs(df, ["bk"], block_size_limit=10).collect()
    # only the first 10 ids by sort order participate: C(10,2) pairs
    assert len(got) == 45
    ids = {r["id1"] for r in got} | {r["id2"] for r in got}
    assert ids == {f"id{i:03d}" for i in range(10)}


def test_canonicalize_pairs(spark):
    df = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("c", "c"), ("a", "c")], ["id1", "id2"]
    )
    got = {(r["id1"], r["id2"]) for r in canonicalize_pairs(df).collect()}
    assert got == {("a", "b"), ("a", "c")}


def test_chain_edges_same_components_as_clique(spark):
    rows = [(f"k{i % 4}", f"id{i:03d}") for i in range(40)]
    df = spark.createDataFrame(rows, ["bk", "clip_id"])
    chain = chain_edges_within_block(df, ["bk"])
    clique = block_self_join_pairs(df, ["bk"], block_size_limit=100)
    nodes = df.select("clip_id").distinct()
    cc_chain = {
        (r["clip_id"], r["cluster_id"])
        for r in connected_components(chain, nodes=nodes).collect()
    }
    cc_clique = {
        (r["clip_id"], r["cluster_id"])
        for r in connected_components(clique, nodes=nodes).collect()
    }
    assert cc_chain == cc_clique
    # chain is linear in block size
    assert chain.count() == sum(10 - 1 for _ in range(4))
