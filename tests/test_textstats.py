"""Text analysis ops (language-ID, quality, token counts, fingerprints)."""

import pytest
from pyspark.sql import functions as F

from kr_spark.operators.textstats import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_score,
    token_count,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def samples(spark):
    rows = [
        (1, "the cat and the dog went to the park"),
        (2, "der hund und die katze ist ein tier"),
        (3, "le chat et la souris est une bete"),
        (4, "zzz qqq xxx"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id(samples):
    out = {r.doc_id: r.lang_pred for r in language_id(samples).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "und"
    assert out[5] == "und"


def test_token_count(samples):
    out = {r.doc_id: r.n_tokens for r in token_count(samples).collect()}
    assert out[1] == 9
    assert out[4] == 3
    assert out[5] == 0


def test_bpe_ish_token_count(samples):
    out = {r.doc_id: r.n_subtokens for r in bpe_ish_token_count(samples).collect()}
    assert out[1] >= 9  # at least one piece per word
    assert out[5] == 0


def test_quality_score_ordering(samples):
    out = {r.doc_id: r.quality for r in quality_score(samples).collect()}
    assert out[1] > out[4]  # real English beats consonant noise
    assert all(0.0 <= v <= 1.0 for v in out.values())


def test_fingerprint_normalization(spark):
    rows = [(1, "Hello  World"), (2, "hello world"), (3, "hello  worlds")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.fp for r in fingerprint(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_runs_on_documents_table(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = language_id(quality_score(token_count(docs)))
    row = out.first()
    assert row.n_tokens > 0 and row.quality is not None and row.lang_pred is not None
