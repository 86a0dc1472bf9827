"""Similarity search over the embeddings table (brute-force + LSH ANN)."""

import pytest
from pyspark.sql import functions as F

from kr_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_ann_topk,
    lsh_bucket_candidates,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_bruteforce_topk_shape(spark, emb):
    queries = emb.limit(3)
    out = cosine_topk_bruteforce(emb, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(x.rank for x in rs)
        assert ranks == [1, 2, 3, 4, 5]
        sims = [x.cosine for x in sorted(rs, key=lambda x: x.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(x.neighbor_id != q for x in rs)


def test_bruteforce_self_similarity_sanity(spark, emb):
    # nearest neighbor of a duplicated vector is its copy with cosine ~1
    one = emb.limit(1)
    dup = one.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label")
    corpus = emb.unionByName(dup)
    out = cosine_topk_bruteforce(corpus, one, k=1).collect()[0]
    assert out.neighbor_id == out.query_id + 1000000
    assert out.cosine == pytest.approx(1.0, abs=1e-5)


def test_lsh_ann_recall_vs_bruteforce(spark, emb):
    queries = emb.limit(5)
    exact = cosine_topk_bruteforce(emb, queries, k=3)
    approx = lsh_ann_topk(emb, queries, k=3, n_planes=4, n_tables=8)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # this corpus is near-random (top cosine ~0.33 => ~70deg angles), the
    # hardest case for sign-LSH; 4 planes x 8 tables targets ~0.7 expected
    assert recall >= 0.4, f"ANN recall {recall} too low"


def test_lsh_ann_exact_on_duplicated_vector(spark, emb):
    # the scale regime: a true near-dup (cosine ~1) must always be found
    from pyspark.sql import functions as F

    one = emb.limit(1)
    dup = one.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label")
    corpus = emb.unionByName(dup)
    out = lsh_ann_topk(corpus, one, k=1, n_planes=8, n_tables=4).collect()
    assert out and out[0].neighbor_id == out[0].query_id + 1000000


def test_lsh_bucket_candidates_deterministic(spark, emb):
    c1 = lsh_bucket_candidates(emb.limit(100))
    c2 = lsh_bucket_candidates(emb.limit(100))
    assert c1.exceptAll(c2).isEmpty() and c2.exceptAll(c1).isEmpty()
