"""Louvain oversized-cluster splitting (reference C2 fidelity)."""

from itertools import combinations

from entity_deduplication_spark.operators.louvain import (
    louvain_communities,
    louvain_split_oversized,
)


def _clique(prefix: str, n: int, w: float = 1.0):
    ids = [f"{prefix}{i:02d}" for i in range(n)]
    return ids, [(u, v, w) for u, v in combinations(ids, 2)]


def test_louvain_barbell_split_and_determinism():
    a, ea = _clique("a", 6)
    b, eb = _clique("b", 6)
    edges = ea + eb + [("a00", "b00", 0.1)]
    assign = louvain_communities(edges)
    comms = {}
    for n, c in assign.items():
        comms.setdefault(c, set()).add(n)
    assert set(map(frozenset, comms.values())) == {frozenset(a), frozenset(b)}
    # labels are the community's min member; order-independent
    assert set(comms) == {"a00", "b00"}
    assert assign == louvain_communities(list(reversed(edges)))


def test_louvain_single_community_stays_whole():
    _, edges = _clique("x", 8)
    assign = louvain_communities(edges)
    assert len(set(assign.values())) == 1


def test_louvain_split_oversized_operator(spark):
    # one oversized cluster (two 30-cliques bridged weakly => 60 members)
    # and one small cluster that must pass through untouched
    a, ea = _clique("a", 30)
    b, eb = _clique("b", 30)
    bridge = [("a00", "b00", 0.05)]
    small = [("s1", "s2", 1.0)]
    edges = spark.createDataFrame(
        ea + eb + bridge + small, ["id1", "id2", "score"]
    )
    members = [(n, "a00") for n in a + b] + [("s1", "s1"), ("s2", "s1")]
    clusters = spark.createDataFrame(members, ["clip_id", "cluster_id"])

    out = louvain_split_oversized(clusters, edges, max_size=50)
    got = {r["clip_id"]: r["cluster_id"] for r in out.collect()}
    assert len(got) == 62
    # small cluster unchanged
    assert got["s1"] == got["s2"] == "s1"
    # oversized cluster split into the two cliques, min-member labels
    assert {got[n] for n in a} == {"a00"}
    assert {got[n] for n in b} == {"b00"}


def test_louvain_split_noop_when_all_small(spark):
    clusters = spark.createDataFrame(
        [("x", "x"), ("y", "x"), ("z", "z")], ["clip_id", "cluster_id"]
    )
    edges = spark.createDataFrame([("x", "y", 1.0)], ["id1", "id2", "score"])
    out = louvain_split_oversized(clusters, edges, max_size=50)
    got = {r["clip_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {"x": "x", "y": "x", "z": "z"}
