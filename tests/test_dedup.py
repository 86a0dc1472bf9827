"""Dedup operator suite over the driver testdata `documents` table plus
controlled synthetic docs."""

import pytest
from pyspark.sql import functions as F

from kr_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
    simhash_neardup_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def synth_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "The  Quick Brown Fox jumps over the lazy dog"),  # case/ws dup of 1
        (4, "the quick brown fox jumps over the sleepy dog"),  # near-dup of 1
        (5, "completely different text about spark engines and shuffles"),
        (6, "completely different text about spark engines and shuffles ok"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(synth_docs):
    out = {r.doc_id: r.canonical_id for r in exact_duplicates(synth_docs).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == 4
    assert out[5] == 5


def test_minhash_lsh_finds_neardups(synth_docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            synth_docs, num_hashes=16, bands=8, shingle_k=2
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert (1, 4) in pairs  # near-dup shares most 2-gram shingles
    assert (5, 6) in pairs
    assert (1, 5) not in pairs


def test_ngram_jaccard_exact_verification(synth_docs):
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(synth_docs, shingle_k=2, threshold=0.5).collect()
    }
    assert out[(1, 2)] == 1.0
    assert out[(1, 3)] == 1.0
    assert 0.5 <= out[(1, 4)] < 1.0
    assert (1, 5) not in out


def test_jaccard_with_lsh_candidates_matches_direct(synth_docs):
    cand = minhash_lsh_candidates(synth_docs, num_hashes=16, bands=8, shingle_k=2)
    via_lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            synth_docs, shingle_k=2, threshold=0.5, candidates=cand
        ).collect()
    }
    direct = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(synth_docs, shingle_k=2, threshold=0.5).collect()
    }
    assert via_lsh == direct


def test_simhash_scalable_matches_expr_form(synth_docs):
    from kr_spark.operators.dedup import simhash_fingerprints

    expr_form = {r.doc_id: r.fp for r in synth_docs.select(
        "doc_id", simhash64(F.col("text")).alias("fp")
    ).collect()}
    agg_form = {r.doc_id: r.fp for r in simhash_fingerprints(synth_docs).collect()}
    assert expr_form == agg_form


def test_simhash_deterministic_and_close_for_neardups(synth_docs):
    from kr_spark.operators.dedup import simhash_fingerprints

    fp = {r.doc_id: r.fp for r in simhash_fingerprints(synth_docs).collect()}
    assert fp[1] == fp[2] == fp[3]  # same normalized token set
    assert fp[1] != fp[5]
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_neardup_pairs(synth_docs, max_hamming=12).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert (1, 5) not in pairs


def test_dedup_on_real_documents(docs):
    # smoke at sf0.001: exact dedup runs, canonical ids are minimal members
    out = exact_duplicates(docs)
    n_docs = docs.count()
    assert out.count() == n_docs
    assert out.filter(F.col("canonical_id") > F.col("doc_id")).count() == 0


def test_ngram_jaccard_planted_stopword_shingles(spark):
    # Every doc shares the same stop-word opener ("the weather is nice
    # today..."): a naive shared-shingle self-join fans out O(n_docs^2) on
    # those shingles. Prefix filtering must still return the EXACT pair set.
    import itertools

    docs = []
    for i in range(60):
        # common prefix + mostly-unique tail; docs 2i/2i+1 for i<5 share tails
        tail = f"unique tail {i // 2 if i < 10 else i} alpha beta gamma delta"
        docs.append((f"d{i:03d}", f"the weather is nice today and {tail}"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(df, shingle_k=3, threshold=0.5).collect()
    }
    # brute force oracle in Python
    def shingles(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = set()
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        sa, sb = shingles(ta), shingles(tb)
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.5:
            want.add((ia, ib, round(j, 6)))
    assert got == want
    assert len(want) >= 5  # the planted near-dup pairs exist
