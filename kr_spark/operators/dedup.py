"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
self-join), SimHash (hamming near-dup), exact n-gram Jaccard verification.
These back the entity-linking blocking stage of the KG pipeline
(pipeline/link.py) and stand alone over the `documents` table.

All of it is built-in Catalyst expressions over arrays (whole-stage codegen;
no Python in the hot path). Hashes are md5-hex based — deliberately, not
xxhash64 — so the DuckDB oracle can compute bit-identical signatures
(lexicographic min over fixed-width hex strings == min over the hash values).

Scale notes:
  * shingling/minhash is embarrassingly parallel (no shuffle).
  * the only shuffles are the band-bucket self-join and the pair groupBy;
    bucket join keys are (band_id, band_sig) — high cardinality, well
    distributed by construction (hashes), so no salting needed there.
  * giant buckets (degenerate all-identical corpora) are the skew risk:
    cap bucket size with a count filter before the self-join (drop or
    route-to-exact-dedup buckets larger than `max_bucket`), which bounds the
    join fan-out — the standard LSH guard at web scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, canonical_id, content_hash): canonical = min id per
    identical normalized text. One shuffle (groupBy hash)."""
    h = F.md5(normalized_text(F.col(text_col)))
    hashed = df.select(F.col(id_col), h.alias("content_hash"))
    canon = hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("canonical_id")
    )
    return hashed.join(canon, on="content_hash").select(
        id_col, "canonical_id", "content_hash"
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of normalized text; docs shorter than k words
    get their full text as the single shingle."""
    toks = F.split(normalized_text(text), " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(
        F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """Array of `num_hashes` minhash values, each = min over shingles of
    md5(seed || ':' || shingle) — hex-string min == hash-value min."""
    seeds = F.array(*[F.lit(str(i)) for i in range(num_hashes)])
    return F.transform(
        seeds,
        lambda s: F.array_min(
            F.transform(shingles, lambda sh: F.md5(F.concat(s, F.lit(":"), sh)))
        ),
    )


def minhash_bands(sig: Column, bands: int, rows: int) -> Column:
    """-> array of (band_id, band_sig) structs for LSH banding."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws(",", F.slice(sig, b * rows + 1, rows))).alias(
                    "band_sig"
                ),
            )
            for b in range(bands)
        ]
    )


def minhash_band_rows(
    df: DataFrame,
    id_col: str,
    shingles: Column,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """-> (id_col, band_id, band_sig) LSH band rows, shaped for scale.

    Identical math to `minhash_signature` + `minhash_bands` (sig[j] = min
    over shingles of md5(j || ':' || shingle); band_sig = md5 of the
    comma-joined band slice), but restructured: `minhash_signature` inlines
    the shingles expression num_hashes times inside one projection — a
    >64KB codegen unit (janino fails, Spark falls back to interpreted and
    recomputes the shingle array per hash). Here shingles are exploded once,
    the num_hashes md5s are tiny sibling expressions, and the per-id min is
    a hash aggregate with map-side partial combine — the shuffle carries
    num_hashes strings per id, and every stage stays in whole-stage codegen.
    """
    rows = num_hashes // bands
    assert bands * rows == num_hashes
    ex = df.select(F.col(id_col), F.explode(shingles).alias("__sh"))
    hashed = ex.select(
        id_col,
        *[
            F.md5(F.concat(F.lit(f"{j}:"), F.col("__sh"))).alias(f"__h{j}")
            for j in range(num_hashes)
        ],
    )
    sig = hashed.groupBy(id_col).agg(
        *[F.min(f"__h{j}").alias(f"__m{j}") for j in range(num_hashes)]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(",", *[F.col(f"__m{b * rows + r}") for r in range(rows)])
            ).alias("band_sig"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("b")
    ).select(id_col, F.col("b.band_id").alias("band_id"), F.col("b.band_sig").alias("band_sig"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """-> candidate near-dup pairs (id_a < id_b) sharing >=1 LSH band.

    bands*rows must equal num_hashes; similarity threshold ~ (1/bands)^(1/rows).
    """
    banded = minhash_band_rows(
        df, id_col, word_shingles(F.col(text_col), shingle_k), num_hashes, bands
    )
    # skew guard: drop degenerate giant buckets before the self-join
    sized = banded.withColumn(
        "__bucket_n",
        F.count("*").over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                "band_id", "band_sig"
            )
        ),
    ).filter(F.col("__bucket_n") <= max_bucket)
    left = sized.select(
        F.col("band_id"), F.col("band_sig"), F.col(id_col).alias("id_a")
    )
    right = sized.select(
        F.col("band_id"), F.col("band_sig"), F.col(id_col).alias("id_b")
    )
    return (
        left.join(right, on=["band_id", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _prefix_filter_candidates(
    sh: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact candidate pairs for Jaccard >= threshold via prefix filtering
    (AllPairs/PPJoin, Bayardo et al. WWW'07; Xiao et al. WWW'08).

    Order every document's shingles by global document frequency (rarest
    first); a pair with overlap o shares an element of prefix_{n-o+1} of
    BOTH sides, and J >= t implies o >= ceil(t*n) for each side — so joining
    only each doc's first n - ceil(t*n) + 1 rarest shingles generates every
    qualifying pair with NO false negatives. Hot stop-word shingles have
    maximal df, land at the end of the order, and never enter a prefix
    unless a document consists almost entirely of them — this removes the
    O(df^2) fan-out of the naive shared-shingle join (VERDICT r1 #5) while
    staying exact.
    """
    from pyspark.sql.window import Window

    ex = sh.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    dfreq = ex.groupBy("shingle").agg(F.count("*").alias("__df"))
    # rank and size share one window spec -> one exchange + one sort; the
    # full-partition frame makes count() legal under an ordered spec
    w = Window.partitionBy(id_col).orderBy("__df", "shingle")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    prefix = (
        ex.join(dfreq, on="shingle")
        .withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(w_all))
        .filter(
            F.col("__rk")
            <= F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
        )
        .select(F.col(id_col), "shingle", "__rk", "__n")
        # consumed by BOTH sides of the self-join: materialize once instead
        # of recomputing the explode+df-join+window subtree per side
        .localCheckpoint()
    )
    pa = prefix.select(
        F.col(id_col).alias("id_a"), "shingle",
        F.col("__rk").alias("__rka"), F.col("__n").alias("__na"),
    )
    pb = prefix.select(
        F.col(id_col).alias("id_b"), "shingle",
        F.col("__rk").alias("__rkb"), F.col("__n").alias("__nb"),
    )
    t = F.lit(threshold)
    eps = F.lit(1e-9)
    return (
        pa.join(pb, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        # size-compatibility: J <= min(|x|,|y|)/max(|x|,|y|)
        .filter(
            (F.col("__nb") >= t * F.col("__na") - eps)
            & (F.col("__na") >= t * F.col("__nb") - eps)
        )
        # PPJoin positional filter: at the pair's FIRST shared token (in the
        # global rarest-first order) every other shared token lies after it
        # on both sides, so overlap <= 1 + min(remaining); a pair survives
        # if ANY of its prefix matches passes (superset of first-match-only
        # — false positives allowed, the verify step is exact)
        .filter(
            F.lit(1)
            + F.least(F.col("__na") - F.col("__rka"), F.col("__nb") - F.col("__rkb"))
            >= t / (F.lit(1.0) + t) * (F.col("__na") + F.col("__nb")) - eps
        )
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard >= threshold -> (id_a, id_b, jaccard).

    With `candidates` (e.g. LSH output) the exact check runs only on those
    pairs. Without, candidates come from prefix filtering — still EXACT
    (`_prefix_filter_candidates` proof), but immune to the hot-shingle
    quadratic join of a naive shared-shingle self-join. Verification then
    computes the true intersection per candidate pair with array_intersect
    (documents' shingle arrays are joined in once per side)."""
    sh = df.select(
        F.col(id_col),
        word_shingles(F.col(text_col), shingle_k).alias("shingles"),
    )
    if candidates is None:
        candidates = _prefix_filter_candidates(sh, id_col, threshold)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("__sha"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("__shb"))
    return (
        candidates.select("id_a", "id_b")
        .join(a, on="id_a")
        .join(b, on="id_b")
        .withColumn("n_a", F.size("__sha"))
        .withColumn("n_b", F.size("__shb"))
        # size-compatibility prune (J <= min/max of set sizes); epsilon keeps
        # the boundary pair (t*n not exactly representable in binary)
        .filter(
            (F.col("n_b") >= F.lit(threshold) * F.col("n_a") - F.lit(1e-9))
            & (F.col("n_a") >= F.lit(threshold) * F.col("n_b") - F.lit(1e-9))
        )
        .withColumn("n_common", F.size(F.array_intersect("__sha", "__shb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(text: Column, token_k: int = 1) -> Column:
    """64-bit SimHash from word-token hashes.

    Per token: 60-bit hash h = first 15 hex chars of md5(token) (60 bits
    keeps BIGINT positive on both Spark and the SQL oracle). For each bit,
    sum +1/-1 over tokens; fingerprint bit = 1 iff sum > 0. Returns BIGINT.
    """
    toks = F.array_distinct(F.split(normalized_text(text), " "))
    hashes = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))
    def _vote(bit: int):
        mask = 1 << bit
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(mask)) != 0, F.lit(1)).otherwise(F.lit(-1)),
        )

    bit_votes = [_vote(b) for b in range(60)]
    fp = F.lit(0).cast("long")
    for b, v in enumerate(bit_votes):
        fp = fp + F.when(v > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return fp


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id_col, fp): same fingerprint as `simhash64`, but shaped for scale.

    `simhash64` packs 60 F.aggregate lambdas into one projection — that single
    generated Java method exceeds janino's 64 KB limit, so Spark silently
    falls back to interpreted (non-codegen) evaluation. Here we instead
    explode distinct tokens and compute the 60 per-bit vote counts as a
    hash-aggregate of 60 tiny `sum((h>>b)&1)` expressions: each stays inside
    whole-stage codegen, partial aggregation runs map-side, and the shuffle
    carries only 61 longs per document. Bit b of the fingerprint is set iff
    2*cnt_b > n_tokens (== sum of +-1 votes > 0), identical to `simhash64`.
    """
    toks = F.array_distinct(F.split(normalized_text(F.col(text_col)), " "))
    ex = df.select(F.col(id_col), F.explode(toks).alias("tok")).select(
        id_col,
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"c{b}")
        for b in range(60)
    ]
    votes = ex.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for b in range(60):
        fp = fp + F.when(
            F.col(f"c{b}") * 2 > F.col("n"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col(id_col), fp.alias("fp"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    block_bits: int = 15,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Blocking: split the 60-bit fingerprint into 4 15-bit blocks; by
    pigeonhole, any pair within hamming distance 3 shares at least one exact
    block -> equi-join per block, then exact hamming filter via bit_count.
    """
    fp = simhash_fingerprints(df, id_col=id_col, text_col=text_col)
    blocks = fp.select(
        id_col,
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_id"),
                        F.shiftright(F.col("fp"), i * block_bits)
                        .bitwiseAND(F.lit((1 << block_bits) - 1))
                        .alias("block_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select(id_col, "fp", F.col("b.block_id").alias("block_id"), F.col("b.block_val").alias("block_val"))
    left = blocks.select(
        "block_id", "block_val", F.col(id_col).alias("id_a"), F.col("fp").alias("fp_a")
    )
    right = blocks.select(
        "block_id", "block_val", F.col(id_col).alias("id_b"), F.col("fp").alias("fp_b")
    )
    return (
        left.join(right, on=["block_id", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.col("fp_a"), F.col("fp_b"))
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_cosine_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Embedding near-dups: cosine >= threshold. Uses the similarity module's
    bucketed candidate generation when `candidates` is None."""
    from kr_spark.operators.similarity import cosine_sim_expr, with_norm

    v = with_norm(emb, id_col, vec_col)
    if candidates is None:
        from kr_spark.operators.similarity import lsh_bucket_candidates

        candidates = lsh_bucket_candidates(v, id_col=id_col, vec_col=vec_col)
    a = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), F.col("norm").alias("__na"))
    b = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), F.col("norm").alias("__nb"))
    return (
        candidates.join(a, on="id_a")
        .join(b, on="id_b")
        .withColumn(
            "cosine",
            F.round(cosine_sim_expr(F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
