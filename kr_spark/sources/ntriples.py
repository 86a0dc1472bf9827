"""N-Triples load/export (SURVEY §2.1 S2/S4).

Reference: FileManager.readModel / RDFFormat loaders (jena/rdf.clj:343-372,
sesame/rdf.clj:272-302) and the write-only N-Triples writer KB
(sesame/writer_kb.clj:32-136). Here: `spark.read.text` + JVM-side
regexp_extract parsing (distributed — no driver-side parsing), and a
DataFrame->text exporter. Covers the N-Triples subset used by the reference
tests (test_rdf.clj:22-28); full Turtle/TriG is out of scope.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kr_spark.kb import TRIPLE_SCHEMA

# <s> <p> <o> .  |  <s> <p> "lit"(@lang|^^<dt>)? .  |  _:b as s/o
_LINE = re.compile(
    r"^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+"
    r"(<[^>]*>|_:\S+|\"(?:[^\"\\]|\\.)*\"(?:@[\w-]+|\^\^<[^>]*>)?)\s*\.\s*$"
)


def unescape_ntriples(lex):
    """Decode N-Triples string escapes as a pure column expression.

    Sentinel-free (a NUL-byte sentinel corrupted lexical forms genuinely
    containing NUL): split on the literal two-character '\\\\' token first —
    isolating escaped backslashes — then inside each fragment every
    remaining backslash starts a simple escape, so plain literal replaces
    plus \\uXXXX (BMP, UTF-16BE decode) and \\UXXXXXXXX (beyond-BMP,
    decoded via surrogate-pair composition through the same UTF-16BE path —
    Spark has no UTF-32 charset) are exact; re-join with single backslashes.
    """

    def _u4(s):
        # 4 hex digits -> UTF-16BE decode; malformed stays verbatim
        return F.coalesce(
            F.concat(
                F.decode(F.unhex(F.substring(s, 1, 4)), "UTF-16BE"),
                F.substr(s, F.lit(5)),
            ),
            F.concat(F.lit("\\u"), s),
        )

    def _u8(s):
        # 8 hex digits -> code point; > 0xFFFF composes a UTF-16 surrogate
        # pair and rides the same UTF-16BE decode; malformed stays verbatim
        hexs = F.substring(s, 1, 8)
        valid = hexs.rlike("^[0-9A-Fa-f]{8}$")
        cp = F.conv(hexs, 16, 10).cast("long")
        off = cp - F.lit(0x10000)
        sur = F.concat(
            F.lpad(F.hex(F.lit(0xD800) + F.shiftright(off, 10)), 4, "0"),
            F.lpad(F.hex(F.lit(0xDC00) + off.bitwiseAND(F.lit(0x3FF))), 4, "0"),
        )
        u16 = F.when(cp > 0xFFFF, sur).otherwise(F.lpad(F.hex(cp), 4, "0"))
        return F.when(
            valid & (cp <= 0x10FFFF),
            F.concat(F.decode(F.unhex(u16), "UTF-16BE"), F.substr(s, F.lit(9))),
        ).otherwise(F.concat(F.lit("\\U"), s))

    def _split_decode(p, marker_re: str, one):
        segs = F.split(p, marker_re)
        head = F.element_at(segs, 1)
        tail = F.slice(segs, 2, F.greatest(F.size(segs) - 1, F.lit(0)))
        return F.concat(head, F.array_join(F.transform(tail, one), ""))

    def _frag(p):
        p = F.replace(p, F.lit('\\"'), F.lit('"'))
        p = F.replace(p, F.lit("\\n"), F.lit("\n"))
        p = F.replace(p, F.lit("\\r"), F.lit("\r"))
        p = F.replace(p, F.lit("\\t"), F.lit("\t"))
        p = _split_decode(p, r"\\U", _u8)
        return _split_decode(p, r"\\u", _u4)

    parts = F.split(lex, r"\\\\")
    return F.array_join(F.transform(parts, _frag), "\\")


def parse_ntriples_df(spark, lines_df: DataFrame, text_col: str = "value") -> DataFrame:
    """Distributed N-Triples parse: text lines -> TRIPLE_SCHEMA rows."""
    c = F.col(text_col)
    s_raw = F.regexp_extract(c, r"^\s*(<[^>]*>|_:\S+)", 1)
    p_raw = F.regexp_extract(c, r"^\s*(?:<[^>]*>|_:\S+)\s+<([^>]*)>", 1)
    o_raw = F.regexp_extract(
        c,
        r"^\s*(?:<[^>]*>|_:\S+)\s+<[^>]*>\s+(<[^>]*>|_:\S+|\"(?:[^\"\\]|\\.)*\"(?:@[\w-]+|\^\^<[^>]*>)?)\s*\.\s*$",
        1,
    )
    df = (
        lines_df.filter(c.rlike(r"^\s*[^#\s]"))
        .select(s_raw.alias("s_raw"), p_raw.alias("p"), o_raw.alias("o_raw"))
        .filter((F.col("s_raw") != "") & (F.col("p") != "") & (F.col("o_raw") != ""))
    )
    s_kind = F.when(F.col("s_raw").startswith("_:"), "bnode").otherwise("uri")
    s_val = F.when(
        F.col("s_raw").startswith("_:"), F.expr("substring(s_raw, 3)")
    ).otherwise(F.regexp_extract("s_raw", r"^<(.*)>$", 1))
    o_is_uri = F.col("o_raw").startswith("<")
    o_is_bnode = F.col("o_raw").startswith("_:")
    o_kind = F.when(o_is_uri, "uri").when(o_is_bnode, "bnode").otherwise("literal")
    lex = unescape_ntriples(F.regexp_extract("o_raw", r'^"((?:[^"\\]|\\.)*)"', 1))
    o_val = (
        F.when(o_is_uri, F.regexp_extract("o_raw", r"^<(.*)>$", 1))
        .when(o_is_bnode, F.expr("substring(o_raw, 3)"))
        .otherwise(lex)
    )
    o_lang = F.nullif(F.regexp_extract("o_raw", r'"@([\w-]+)$', 1), F.lit(""))
    o_dt = F.nullif(F.regexp_extract("o_raw", r"\^\^<([^>]*)>$", 1), F.lit(""))
    from kr_spark.terms import NUMERIC_DATATYPES

    # try_cast: a malformed numeric lexical form in loaded data must not
    # raise under ANSI mode — it simply carries no numeric value
    num = F.when(o_dt.isin(*sorted(NUMERIC_DATATYPES)), o_val.try_cast("decimal(38,9)"))
    out = df.select(
        s_kind.alias("s_kind"),
        s_val.alias("s"),
        F.col("p"),
        o_kind.alias("o_kind"),
        o_val.alias("o"),
        o_lang.alias("o_lang"),
        o_dt.alias("o_datatype"),
        num.alias("num_val"),
        F.lit(None).cast("string").alias("graph"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.lit(None).cast("string").alias("rule_id"),
    )
    return out


def load_ntriples(kb, path_or_text: str) -> None:
    spark = kb.spark
    if "\n" in path_or_text or path_or_text.strip().startswith("<"):
        lines = spark.createDataFrame(
            [(l,) for l in path_or_text.splitlines()], "value string"
        )
    else:
        lines = spark.read.text(path_or_text)
    kb.add_rows(parse_ntriples_df(spark, lines))


def export_ntriples(df: DataFrame) -> DataFrame:
    """TRIPLE_SCHEMA rows -> one N-Triples line per row (S4 writer-KB role).
    Write with .write.text(path) — distributed, optionally .option("compression","gzip")
    matching the reference's GZIP writer (sesame/writer_kb.clj:87-91)."""
    s = F.when(F.col("s_kind") == "bnode", F.concat(F.lit("_:"), F.col("s"))).otherwise(
        F.concat(F.lit("<"), F.col("s"), F.lit(">"))
    )
    # literal (non-regex) escaping: backslash first, then quote/controls —
    # regexp_replace replacement strings re-interpret backslashes (a '\"'
    # replacement emits a bare quote), which silently produced malformed
    # lines for literals containing quotes
    lex = F.replace(F.col("o"), F.lit("\\"), F.lit("\\\\"))
    lex = F.replace(lex, F.lit('"'), F.lit('\\"'))
    lex = F.replace(lex, F.lit("\n"), F.lit("\\n"))
    lex = F.replace(lex, F.lit("\r"), F.lit("\\r"))
    lex = F.replace(lex, F.lit("\t"), F.lit("\\t"))
    o = (
        F.when(F.col("o_kind") == "uri", F.concat(F.lit("<"), F.col("o"), F.lit(">")))
        .when(F.col("o_kind") == "bnode", F.concat(F.lit("_:"), F.col("o")))
        .otherwise(
            F.concat(
                F.lit('"'),
                lex,
                F.lit('"'),
                F.when(
                    F.col("o_lang").isNotNull(), F.concat(F.lit("@"), F.col("o_lang"))
                )
                .when(
                    F.col("o_datatype").isNotNull(),
                    F.concat(F.lit("^^<"), F.col("o_datatype"), F.lit(">")),
                )
                .otherwise(F.lit("")),
            )
        )
    )
    line = F.concat(s, F.lit(" <"), F.col("p"), F.lit("> "), o, F.lit(" ."))
    return df.select(line.alias("value"))
