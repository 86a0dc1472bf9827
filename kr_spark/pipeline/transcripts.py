"""Deterministic synthetic transcript generator (FIXTURES.md §A recipe).

Generates the input table of the north-star pipeline — multi-turn
conversation transcripts with columns
(conv_id string, turn_idx int, role string, text string, tool string,
 ts timestamp) — PLUS the exact ground-truth triple set the generator
plants, so extraction/linking/canonicalization P/R is measurable
(BASELINE.json: P/R >= 0.95).

Everything is a pure column expression over spark.range:
  * fully distributed — generating 10^12 turns is a range scan, no driver
    data, no shuffle;
  * deterministic — (conv_id, turn_idx) alone determine the row, so reruns,
    resumes and the DuckDB oracle (same closed-form SQL) agree bit-for-bit.

Content design: a closed entity vocabulary with aliased surface forms (one
entity -> 3 surfaces: "abeson" / "abesson" / "abe son"), relation trigger
phrases ("works at" / "knows" / "emailed"), no-entity chatter turns,
duplicated statements across conversations (dedup test), and one hot entity
+ hot predicate appearing in a large fraction of turns (skew test).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TURNS_PER_CONV = 8
N_PERSONS = 200
N_ORGS = 50
HOT_PERSON = 0  # person 0 appears in every 4th relation turn -> hot entity

ENT_NS = "http://kg.example.org/entity/"
REL_NS = "http://kg.example.org/rel/"

WORKS_AT = REL_NS + "worksAt"
KNOWS = REL_NS + "knows"
EMAILED = REL_NS + "emailed"


def _stem(idx: Column) -> Column:
    """Injective 3-letter stem: base-26 digits of idx -> letters."""
    return F.concat(
        F.char(F.lit(97) + (idx / 676).cast("long") % 26),
        F.char(F.lit(97) + (idx / 26).cast("long") % 26),
        F.char(F.lit(97) + idx % 26),
    )


def person_canonical(idx: Column) -> Column:
    """Canonical person surface (alias form 0), e.g. 'abexabeson'.
    The stem-x-stem shape keeps char-3-gram Jaccard high between alias forms
    of one entity (~0.7) and near-zero across entities."""
    s = _stem(idx)
    return F.concat(s, F.lit("x"), s, F.lit("son"))


def person_surface(idx: Column, alias_idx: Column) -> Column:
    """Aliased surfaces: 0 'abexabeson' (canonical), 1 'abexabeson esq'
    (title suffix), 2 'abex abeson' (split). All normalize back to form 0
    via link.normalize_surface (drop spaces, strip ' esq')."""
    s = _stem(idx)
    canonical = F.concat(s, F.lit("x"), s, F.lit("son"))
    return (
        F.when(alias_idx == 0, canonical)
        .when(alias_idx == 1, F.concat(canonical, F.lit(" esq")))
        .otherwise(F.concat(s, F.lit("x "), s, F.lit("son")))
    )


def org_surface(idx: Column) -> Column:
    """Org surface '<stem>corp' — suffix (not prefix) marker so two orgs
    share at most the {cor, orp} trigrams (J<=0.3, safely under the 0.55
    link threshold; a shared 'org' PREFIX put cross-org Jaccard at 0.6)."""
    return F.concat(_stem(idx), F.lit("corp"))


def _row_indices(df: DataFrame) -> DataFrame:
    conv = (F.col("id") / TURNS_PER_CONV).cast("long")
    turn = (F.col("id") % TURNS_PER_CONV).cast("int")
    # deterministic per-turn entity/alias/relation choices
    p1 = F.when(
        (conv * TURNS_PER_CONV + turn) % 4 == 0, F.lit(HOT_PERSON).cast("long")
    ).otherwise((conv * 7 + turn * 3) % N_PERSONS)
    p2 = (p1 + 1 + turn % 3) % N_PERSONS
    o1 = (conv * 5 + turn * 2) % N_ORGS
    alias1 = (conv + turn) % 3
    alias2 = (conv + turn * 2 + 1) % 3
    ttype = (conv + turn) % 4  # 0 worksAt, 1 knows, 2 emailed, 3 chatter
    return df.select(
        conv.alias("conv"),
        turn.alias("turn"),
        p1.alias("p1"),
        p2.alias("p2"),
        o1.alias("o1"),
        alias1.alias("alias1"),
        alias2.alias("alias2"),
        ttype.alias("ttype"),
    )


def generate_transcripts(spark, n_convs: int = 1000) -> DataFrame:
    """-> transcripts DataFrame in the input_hint schema."""
    return transcripts_from_ids(spark.range(n_convs * TURNS_PER_CONV))


def transcripts_from_ids(ids: DataFrame) -> DataFrame:
    """Transcripts from an arbitrary `id` column (global turn number) —
    lets callers derive the row universe from an existing table so the
    DuckDB oracle sees the identical row set.

    The surface strings are staged as intermediate columns (each referenced
    several times downstream, so CollapseProject keeps them as their own
    projection): inlining them into the text `when`-chain multiplies the
    expression tree past janino's 64KB method limit — Spark then silently
    drops to interpreted evaluation, which is not only slow but
    allocation-bound enough that it ANTI-scales with executor threads."""
    idx = _row_indices(ids)
    staged = idx.select(
        "conv",
        "turn",
        "ttype",
        person_surface(F.col("p1"), F.col("alias1")).alias("__subj"),
        person_surface(F.col("p2"), F.col("alias2")).alias("__objp"),
        org_surface(F.col("o1")).alias("__objo"),
    )
    subj, obj_p, obj_o = F.col("__subj"), F.col("__objp"), F.col("__objo")
    text = (
        F.when(F.col("ttype") == 0, F.concat(subj, F.lit(" works at "), obj_o, F.lit(" .")))
        .when(F.col("ttype") == 1, F.concat(subj, F.lit(" knows "), obj_p, F.lit(" .")))
        .when(F.col("ttype") == 2, F.concat(subj, F.lit(" emailed "), obj_p, F.lit(" .")))
        .otherwise(F.lit("the weather is nice today and nothing else happened ."))
    )
    role = (
        F.when(F.col("turn") % 4 == 3, F.lit("tool"))
        .when(F.col("turn") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    tool = F.when(role == "tool", F.lit("search")).otherwise(F.lit(None).cast("string"))
    ts = F.timestamp_seconds(F.lit(1700000000) + F.col("conv") * 3600 + F.col("turn") * 60)
    return staged.select(
        F.concat(F.lit("c"), F.col("conv")).alias("conv_id"),
        F.col("turn").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def generate_ground_truth(spark, n_convs: int = 1000) -> DataFrame:
    """The exact (s, p, o) triples planted in the transcripts, with canonical
    entity URIs — the P/R oracle (FIXTURES.md §D)."""
    idx = _row_indices(spark.range(n_convs * TURNS_PER_CONV))
    rel = idx.filter(F.col("ttype") != 3)
    s_uri = F.concat(F.lit(ENT_NS), person_canonical(F.col("p1")))
    o_uri = (
        F.when(F.col("ttype") == 0, F.concat(F.lit(ENT_NS), org_surface(F.col("o1"))))
        .otherwise(F.concat(F.lit(ENT_NS), person_canonical(F.col("p2"))))
    )
    p_uri = (
        F.when(F.col("ttype") == 0, F.lit(WORKS_AT))
        .when(F.col("ttype") == 1, F.lit(KNOWS))
        .otherwise(F.lit(EMAILED))
    )
    return rel.select(
        s_uri.alias("s"), p_uri.alias("p"), o_uri.alias("o")
    ).distinct()


def check_turn_ordering_invariant(transcripts: DataFrame) -> int:
    """Stable (conv_id, turn_idx) ordering invariant (input_hint): turn_idx
    must be dense 0..n-1 per conversation under the window ordering.
    Returns the number of violating rows (0 = invariant holds)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.withColumn("__rn", F.row_number().over(w) - 1)
        .filter(F.col("__rn") != F.col("turn_idx"))
        .count()
    )


def check_text_equality_invariant(transcripts: DataFrame, reference: DataFrame) -> int:
    """Per-turn text equality vs the reference generation (input_hint
    invariant). Returns number of mismatching turns."""
    ref = reference.select(
        "conv_id", "turn_idx", F.col("text").alias("__ref_text")
    )
    return (
        transcripts.join(ref, on=["conv_id", "turn_idx"], how="full")
        .filter(
            F.col("text").isNull()
            | F.col("__ref_text").isNull()
            | (F.col("text") != F.col("__ref_text"))
        )
        .count()
    )
