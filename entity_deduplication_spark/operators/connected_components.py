"""Connected components via alternating large-star / small-star.

Replaces the reference's driver-side ``networkx.connected_components``
(utils.py:43-116, CC at :69) with the distributed union-find-semantics
algorithm of Kiveris et al., "Connected Components in MapReduce and
Beyond" (SOCC'14) — O(log^2 n) rounds on any graph, each round a pair of
groupBy/join plans. Every iteration is ``localCheckpoint``-ed to truncate
lineage (SURVEY.md §7 hard part 1); convergence is detected by an
order-insensitive (count, hash-sum) signature of the edge set.

IDs are compared with their natural ordering (works for string clip_ids
and numeric ids alike); the final cluster_id is the component's minimum
member id — deterministic and stable under any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: m = min(N(u) ∪ {u}); emit (v, m) for v in N(u), v > u."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least(F.col("u"), F.col("_mn")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges (hi, lo); m = min(lo-neighbors ∪ {u}); emit stars to m."""
    oriented = e.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))  # m < u always
    part1 = (
        oriented.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    part2 = mins.select("u", F.col("m").alias("v"))
    return part1.unionByName(part2).distinct()


def _signature(e: DataFrame) -> tuple[int, int]:
    # bit_xor is order-insensitive and overflow-free (ANSI-safe); the edge
    # set is distinct so xor cancellation of repeated rows cannot occur.
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _union_find_labels(e: DataFrame, node_id: str) -> DataFrame:
    """Small-graph fast path: one executor task runs union-find over the
    whole (small) edge set via applyInPandas — same min-member labels as
    the star rounds, ~1 job instead of O(log^2 n) round barriers.

    This is the CC analogue of AQE's broadcast-join demotion: when the
    VERIFIED edge set is small (it usually is — edges above
    match_threshold are sparse even when the input is huge), pushing it
    through shuffle-round machinery wastes more wall on job scheduling
    than the work itself. The caller gates this on the measured edge
    count, so the star rounds still handle genuinely large graphs.
    """
    import pandas as pd

    def _uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for u, v in zip(pdf["u"], pdf["v"]):
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by min: root is the smaller id (deterministic)
                parent[max(ru, rv)] = min(ru, rv)
        items = sorted(parent)
        return pd.DataFrame(
            {"n": items, "c": [find(x) for x in items]}
        )

    id_type = dict(e.dtypes)["u"]
    return (
        e.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(_uf, schema=f"n {id_type}, c {id_type}")
        .select(F.col("n").alias(node_id), F.col("c").alias("cluster_id"))
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    id1: str = "id1",
    id2: str = "id2",
    node_id: str = "clip_id",
    max_iterations: int = 50,
    check_every: int = 2,
    small_graph_edges: int = 2_000_000,
) -> DataFrame:
    """(node, cluster_id) for every node; cluster_id = min member id.

    ``edges``: (id1, id2) undirected; ``nodes``: optional full node table so
    unmatched records become singleton clusters (reference utils.py:106-111).

    ``check_every``: convergence (the order-insensitive edge-set signature)
    is evaluated every N large-star/small-star rounds, not every round —
    each check is a driver-side action barrier, and on typical graphs the
    algorithm converges in 3-5 rounds, so checking per-round spends more
    wall on job scheduling than the occasional extra (cheap, already-star)
    round costs. The rounds between checks chain as lazy localCheckpoints
    inside ONE job.
    """
    from pyspark import StorageLevel

    # Materialize the (possibly very heavy) upstream edge plan through a
    # normal SQL action FIRST, then checkpoint from the cache. The
    # RDD/localCheckpoint path compiles the plan WITHOUT adaptive
    # execution — no runtime broadcast demotion, no coalescing — and on
    # a big verify plan that non-AQE execution wrote tens of GB of
    # shuffle where the AQE plan needs a fraction of it (measured at
    # 300k clips: the same candidate plan counted in 28 s under AQE but
    # ran >12 min and spilled the disk full under .localCheckpoint()).
    base = (
        edges.select(F.col(id1).alias("u"), F.col(id2).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prev = _signature(base)  # AQE execution; fills the cache
    e = base.localCheckpoint(eager=True)  # copies cached rows, no re-plan
    base.unpersist()

    if 0 < prev[0] <= small_graph_edges:
        labels = _union_find_labels(e, node_id)
        if nodes is not None:
            all_nodes = nodes.select(F.col(node_id)).distinct()
            labels = all_nodes.join(labels, node_id, "left").select(
                node_id,
                F.coalesce(F.col("cluster_id"), F.col(node_id)).alias(
                    "cluster_id"
                ),
            )
        return labels

    rounds = 0
    while rounds < max_iterations and prev[0] > 0:
        # lazy checkpoints: the signature aggregation below is the single
        # action that materializes the whole batch of rounds
        for _ in range(min(check_every, max_iterations - rounds)):
            e = _small_star(_large_star(e)).localCheckpoint(eager=False)
            rounds += 1
        sig = _signature(e)
        if sig == prev:
            break
        prev = sig

    # at fixpoint every component is a star to its min; label from symmetric min
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    labels = labels.select(
        F.col("u").alias(node_id),
        F.least(F.col("u"), F.col("_mn")).alias("cluster_id"),
    )
    if nodes is not None:
        all_nodes = nodes.select(F.col(node_id)).distinct()
        labels = (
            all_nodes.join(labels, node_id, "left")
            .select(
                node_id,
                F.coalesce(F.col("cluster_id"), F.col(node_id)).alias("cluster_id"),
            )
        )
    return labels
