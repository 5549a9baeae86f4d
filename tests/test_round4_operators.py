"""Round-4 pins: ADVICE fixes (blend skip semantics, auto-route cost
guard, social-handle empty filter) + kernel vectorization parity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# semantic blend: oversized blocks are SKIPPED, not truncated
# ---------------------------------------------------------------------------


def test_blend_skips_oversized_blocks(spark):
    from entity_deduplication_spark.operators.fuzzy import semantic_blend_pairs

    # block "big" has 5 members (> limit 3) -> skipped entirely, like the
    # reference (semantic_matching.py:214-216); block "small" has 2
    rows = []
    for i in range(5):
        rows.append((i, "alpha beta", [1.0, 0.0], "big"))
    rows.append((10, "gamma delta", [0.0, 1.0], "small"))
    rows.append((11, "gamma delta", [0.0, 1.0], "small"))
    df = spark.createDataFrame(
        rows, "id long, txt string, vec array<double>, src string"
    )
    out = semantic_blend_pairs(
        df,
        "id",
        "txt",
        "vec",
        block_key=F.col("src"),
        threshold=0.1,
        block_size_limit=3,
    ).collect()
    ids = {(r["id1"], r["id2"]) for r in out}
    assert ids == {(10, 11)}  # nothing from the oversized block


def test_block_self_join_skip_mode(spark):
    from entity_deduplication_spark.operators.pairs import block_self_join_pairs

    keyed = spark.createDataFrame(
        [(f"c{i}", "hot") for i in range(6)] + [("x", "ok"), ("y", "ok")],
        "clip_id string, block_key string",
    )
    out = block_self_join_pairs(
        keyed, ["block_key"], block_size_limit=4, on_oversize="skip"
    ).collect()
    assert {(r["id1"], r["id2"]) for r in out} == {("x", "y")}


# ---------------------------------------------------------------------------
# embedding auto-route: decision uses the SAME n-aware tuning as execution
# ---------------------------------------------------------------------------


def test_auto_route_is_consistent_with_execution_tuning():
    from entity_deduplication_spark.operators.ann import tune_rhp_bands

    # the executed-model guard: LSH only when r >= 4 AND b < 2^(r-1)
    # (collision-verify work below exact all-pairs). Low threshold: b
    # blows up past the guard -> exact; near-dup threshold: LSH.
    r_lo, b_lo = tune_rhp_bands(0.3, 1e-9, n_rows=10_000)
    assert not (r_lo >= 4 and b_lo < 2 ** (r_lo - 1))
    r_hi, b_hi = tune_rhp_bands(0.9, 1e-9, n_rows=10_000)
    assert r_hi >= 4 and b_hi < 2 ** (r_hi - 1)


def test_auto_route_high_threshold_takes_lsh_plan(spark):
    from entity_deduplication_spark.operators.dedup import embedding_cosine_pairs

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 8))
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    # force the corpus-size the tuner sees so the route is deterministic
    auto = embedding_cosine_pairs(
        df, "vec_id", "embedding", threshold=0.9, method="auto", n_rows=10_000
    )
    plan = auto._jdf.queryExecution().executedPlan().toString()
    # LSH path: the plan hangs off the checkpointed rhp band-key table
    # (the block-size window itself is materialized eagerly inside
    # block_self_join_pairs since round 6, so it no longer appears in the
    # final plan); the exact grid path has no band_keys column anywhere
    assert "band_keys" in plan
    assert "FlatMapGroupsInPandas" not in plan  # not the exact-grid route


# ---------------------------------------------------------------------------
# token-jaccard vectorization parity with the per-row set oracle
# ---------------------------------------------------------------------------


def test_batch_token_jaccard_matches_set_oracle():
    from entity_deduplication_spark.operators.ml import _batch_token_jaccard

    rng = np.random.default_rng(3)
    words = ["ab", "cd", "ef", "gh", "ij", "kl"]
    t1, t2 = [], []
    for _ in range(200):
        t1.append(" ".join(rng.choice(words, rng.integers(0, 5))))
        t2.append(" ".join(rng.choice(words, rng.integers(0, 5))))
    t1 += ["", "", "ab ab cd"]
    t2 += ["", "ab", "cd ab"]
    got = _batch_token_jaccard(t1, t2)
    for i, (a, b) in enumerate(zip(t1, t2)):
        sa, sb = set(a.split()), set(b.split())
        u = len(sa | sb)
        want = len(sa & sb) / u if u else 1.0
        assert got[i] == pytest.approx(want), (i, a, b)


# ---------------------------------------------------------------------------
# social handle: path-less URL semantics + empty-handle filter in driver
# ---------------------------------------------------------------------------


def test_social_handle_pathless_url_yields_domain(spark):
    from entity_deduplication_spark.functions.text import social_handle

    df = spark.createDataFrame(
        [
            ("https://Example.com", "example.com"),  # scheme '//' -> host
            ("no-slash-at-all", ""),
            (None, ""),
            ("https://social.example/src1/UserX/?ref=feed", "userx"),
        ],
        "url string, want string",
    )
    got = df.select(
        social_handle(F.col("url")).alias("h"), "want"
    ).collect()
    for r in got:
        assert r["h"] == r["want"], r


def test_run_from_signatures_matches_run(spark):
    """The streaming re-cluster entry point (signatures table in, no
    signature stage) yields the identical clusters as the batch run —
    the append-only streaming contract's batch half."""
    from entity_deduplication_spark.config import DedupConfig
    from entity_deduplication_spark.datagen import ensure_clips_parquet
    from entity_deduplication_spark.plans.pipeline import DedupPipeline

    clips_path, _ = ensure_clips_parquet(400)
    clips = spark.read.parquet(clips_path)
    cfg = DedupConfig()
    full = DedupPipeline(spark, cfg).run(clips, resume=False)
    from_sig = DedupPipeline(spark, cfg).run_from_signatures(
        full.signatures, resume=False
    )
    a = {(r["clip_id"], r["cluster_id"]) for r in full.clusters.collect()}
    b = {(r["clip_id"], r["cluster_id"]) for r in from_sig.clusters.collect()}
    assert a == b and len(a) == 400


def test_training_pairs_core_tiers_disjoint_and_labeled(spark):
    import __spark_entry__ as entry_mod

    out = entry_mod.queries()["training_pairs_core"](
        spark, "/root/testdata/sf0.001"
    )
    rows = out.collect()
    tiers = {r["tier"] for r in rows}
    assert tiers <= {"pos_key", "neg"} and len(rows) > 0
    assert all(
        (r["label"] == 1) == (r["tier"] == "pos_key") for r in rows
    )
    assert len({(r["id1"], r["id2"]) for r in rows}) == len(rows)


def test_viz_report_svg_structure(spark, tmp_path):
    """S6 viz sink: bounded-aggregate SVG report — one bar per histogram
    bucket in ordinal order, metrics caption present, valid XML."""
    import xml.etree.ElementTree as ET

    from entity_deduplication_spark.sources.viz import write_cluster_report

    clusters = spark.createDataFrame(
        [(f"c{i}", f"k{i % 7}") for i in range(20)],
        "clip_id string, cluster_id string",
    )
    from entity_deduplication_spark.operators.stats import dedup_metrics

    path = str(tmp_path / "report.svg")
    write_cluster_report(clusters, dedup_metrics(clusters), path)
    root = ET.parse(path).getroot()
    bars = [
        el
        for el in root.iter("{http://www.w3.org/2000/svg}path")
        if el.get("class") == "bar"
    ]
    # 20 members over 7 clusters -> sizes 3,3,3,3,3,3,2 -> bins "2","3-5"
    assert [b.get("data-size") for b in bars] == ["2", "3-5"]
    assert [b.get("data-count") for b in bars] == ["1", "6"]
    text = open(path).read()
    assert "20 records" in text and "7 entities" in text


def test_minhash_lsh_clusters_match_driver_side_oracle(spark):
    """Config-pinned EXACT oracle for the MinHash-LSH dedup composition:
    with (minhash_k, seed, bands, rows, threshold) fixed, the candidate
    set and therefore the clusters are deterministic. The oracle
    recomputes minhash with pure-Python modular arithmetic (independent
    of the numpy scratch-buffer kernel), bands by r-tuple equality,
    verifies with exact set Jaccard, and clusters with union-find —
    cluster assignments must match the Spark operator EXACTLY, not just
    at recall level."""
    from entity_deduplication_spark.config import DedupConfig
    from entity_deduplication_spark.functions.hashing import _hash_params
    from entity_deduplication_spark.functions.text import word_shingles
    from entity_deduplication_spark.operators.dedup import minhash_lsh_dedup

    cfg = DedupConfig()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in minhash_lsh_dedup(docs, "doc_id", "text").collect()
    }

    # shingle arrays come from the same pure-Catalyst expression (they
    # are the operator's INPUT; the oracle covers everything after)
    sh = {
        r["doc_id"]: list(r["s"])
        for r in docs.select(
            "doc_id", word_shingles(F.col("text"), cfg.shingle_k).alias("s")
        ).collect()
    }
    a_par, b_par = _hash_params(cfg.minhash_k, cfg.minhash_seed)
    M61 = (1 << 61) - 1
    M64 = 1 << 64

    def minhash(shingles: list[int]) -> list[int]:
        out = []
        for ai, bi in zip(a_par.tolist(), b_par.tolist()):
            best = None
            for x in shingles:
                t = (ai * (x & (M64 - 1)) + bi) % M64
                u = (t & M61) + (t >> 61)
                v = u - M61 if u >= M61 else u
                best = v if best is None or v < best else best
            out.append(best)
        return out

    mh = {i: minhash(s) for i, s in sh.items()}
    r, b = cfg.lsh_rows, cfg.lsh_bands
    buckets: dict = {}
    for i, m in mh.items():
        for bi in range(b):
            buckets.setdefault(
                (bi, tuple(m[bi * r : (bi + 1) * r])), []
            ).append(i)
    cand = set()
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                p = (min(members[x], members[y]), max(members[x], members[y]))
                cand.add(p)
    parent = {i: i for i in sh}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in cand:
        si, sj = set(sh[i]), set(sh[j])
        jac = len(si & sj) / len(si | sj) if si | sj else 1.0
        if jac >= cfg.jaccard_threshold:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    want = {i: min(m for m in sh if find(m) == find(i)) for i in sh}
    assert got == want
    assert len(set(want.values())) < len(want)  # some real merges happened


def test_driver_social_handle_query_has_no_empty_block(spark):
    import __spark_entry__ as entry_mod

    out = entry_mod.queries()["social_handle_pairs"](
        spark, "/root/testdata/sf0.001"
    )
    assert out.filter(F.col("handle") == "").count() == 0
