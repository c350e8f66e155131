"""Unit tests for dedup + similarity operators on engineered micro-fixtures
with hand-computable expected values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_feature_demo_spark.operators import dedup, similarity

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),       # exact dup of 1
    (3, "the  quick Brown fox jumps over the lazy dog"),      # dup after normalize
    (4, "the quick brown fox jumps over the sleepy dog"),     # near-dup (1 token)
    (5, "completely different text about spark and hive"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_clusters(docs_df):
    clusters = dedup.exact_duplicate_clusters(docs_df, "doc_id", "text").collect()
    assert len(clusters) == 1
    assert clusters[0]["n_copies"] == 3  # 1, 2, and case/space-normalized 3
    assert clusters[0]["keeper_id"] == 1


def test_dedup_exact_survivors(docs_df):
    ids = sorted(r["doc_id"] for r in dedup.dedup_exact(docs_df, "doc_id", "text").collect())
    assert ids == [1, 4, 5]


def test_jaccard_exact_value(docs_df):
    """docs 1 vs 4: 9 tokens -> 7 word-3-gram shingles each; the changed
    token (position 8) appears in the 2 shingles starting at 6 and 7, so 5
    are shared -> J = 5/(7+7-5) = 5/9."""
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(docs_df, "doc_id", "text", threshold=0.3).collect()
    }
    assert pairs[(1, 4)] == pytest.approx(5 / 9)
    assert pairs[(1, 2)] == pytest.approx(1.0)


def test_minhash_lsh_finds_duplicates(docs_df):
    nd = dedup.minhash_near_duplicates(docs_df, "doc_id", "text", threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in nd.collect()}
    # exact duplicates are certain to collide in every band
    assert (1, 2) in got


def test_simhash_properties(docs_df):
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(docs_df, "doc_id", "text").collect()}
    assert all(len(v) == 16 for v in fp.values())
    assert fp[1] == fp[2]  # identical text -> identical fingerprint

    def hamming(a: str, b: str) -> int:
        return sum(bin(int(x, 16) ^ int(y, 16)).count("1") for x, y in zip(a, b))

    assert hamming(fp[1], fp[4]) < hamming(fp[1], fp[5])


VECS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [1.0, 0.0, 0.0]),     # identical to 0
    (2, [0.0, 1.0, 0.0]),     # orthogonal
    (3, [0.6, 0.8, 0.0]),
    (4, [-1.0, 0.0, 0.0]),    # opposite
]


@pytest.fixture(scope="module")
def vecs_df(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(vecs_df):
    res = similarity.cosine_topk(vecs_df, vecs_df.filter(F.col("vec_id") == 0), k=4)
    rows = [(r["neighbor_id"], r["cos_sim"]) for r in res.collect()]
    assert rows[0] == (1, 1.0)
    assert rows[1] == (3, pytest.approx(0.6))
    assert rows[2] == (2, 0.0)
    assert rows[3] == (4, -1.0)


def test_lsh_topk_is_subset_of_bruteforce(vecs_df):
    brute = similarity.cosine_topk(vecs_df, vecs_df, k=4)
    approx = similarity.lsh_bucketed_topk(vecs_df, vecs_df, dim=3, k=4, bits=2)
    b = {(r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in brute.collect()}
    a = {(r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in approx.collect()}
    assert a <= b or all(x[2] is not None for x in a)  # candidates score identically
    # identical vectors always share every bucket -> (0,1) must be found
    assert any(q == 0 and n == 1 for q, n, _ in a)


def test_train_centroids_matches_numpy_lloyd(spark, sf_dir):
    """Distributed deterministic k-means == single-node Lloyd reference
    (same init, same argmin tie-breaks, same rounded means)."""
    import math

    import numpy as np

    from hive_feature_demo_spark.catalog import table
    from hive_feature_demo_spark.operators import similarity

    k, iters, digits = 8, 2, 6
    emb = table(spark, sf_dir, "embeddings")
    got = {
        r["cid"]: list(r["embedding"])
        for r in similarity.train_centroids(emb, k=k, iters=iters).collect()
    }

    rows = sorted(
        (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        for r in emb.collect()
    )
    vecs = np.stack([v for _, v in rows])
    cents = vecs[:k].copy()

    def round_det_py(x):
        return math.floor(x * 10**digits + 0.5) / 10**digits

    for _ in range(iters):
        # same metric as ivf_assign: rounded L2, centroid-id tie-break
        assign = []
        for v in vecs:
            dists = [round_det_py(float(np.sqrt(((v - c) ** 2).sum()))) for c in cents]
            assign.append(int(np.argmin(dists)))  # argmin takes first on ties
        new = []
        for cid in range(k):
            members = vecs[[i for i, a in enumerate(assign) if a == cid]]
            new.append([round_det_py(float(c)) for c in members.mean(axis=0)])
        cents = np.array(new)

    for cid in range(k):
        assert got[cid] == [pytest.approx(x, abs=1e-9) for x in cents[cid]], cid


def test_connected_components_transitive_chain(spark):
    """A~B~C collapses into one cluster even though A!~C; D~E separate."""
    from hive_feature_demo_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    comp = {r["node"]: r["cluster"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_lsh_recall_and_multitable_improvement(spark, sf_dir):
    """LSH recall@5 vs brute-force ground truth is meaningful, and adding
    hash tables can only add candidate pairs (recall is monotone in T)."""
    from hive_feature_demo_spark.catalog import table
    from hive_feature_demo_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)

    def pairs(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    truth = pairs(similarity.cosine_topk(emb, queries, k=5))
    one = pairs(
        similarity.lsh_bucketed_topk(emb, queries, dim=64, k=5, bits=8, seed=42)
    )
    multi = pairs(
        similarity.lsh_multitable_topk(
            emb, queries, dim=64, k=5, bits=8, n_tables=3, seed=42
        )
    )
    recall_one = len(one & truth) / len(truth)
    recall_multi = len(multi & truth) / len(truth)
    assert recall_multi >= recall_one  # more tables never hurt
    # candidate coverage strictly grows with tables (union of buckets);
    # absolute recall on *random* embeddings at tiny SF is inherently low,
    # so the floor is structural, not numeric
    assert len(multi) >= len(one)
