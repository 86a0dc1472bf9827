"""Turtle load/export (SURVEY §2.1 S2 — the biggest missing format after
N-Triples; reference format map: rdf.clj:539-547, jena/rdf.clj:343-351,
sesame/rdf.clj:272-302).

Covers the Turtle subset the reference tests use, plus common real-world
syntax: @prefix / PREFIX and @base / BASE directives, CURIEs, `a`,
predicate-object lists (`;`) and object lists (`,`), literals with lang tag
or datatype, numeric/boolean shorthand, single and triple-quoted strings,
labeled and anonymous blank nodes ([] and [ p o ; ... ] property lists),
comments, RDF collections `( ... )` (rdf:first/rdf:rest bnode chains,
object and subject position; round 5).

Execution shape: Turtle is a stateful whole-document grammar (prefixes,
multi-line statements), so unlike N-Triples it cannot be parsed line-wise.
The distributed unit is the FILE: `load_turtle_files` reads with
`spark.read.text(..., wholetext=True)` (one row per file) and parses inside
`mapInPandas` — per-file parallelism across executors, Arrow-batched, no
driver loop. Bulk data belongs in N-Triples/parquet; Turtle files are
schema/ontology-sized, so file granularity is the right distribution unit.
"""

from __future__ import annotations

import re
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kr_spark.kb import TRIPLE_SCHEMA
from kr_spark.plans.sparql_parser import _unescape_string

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"

_PNAME = r"(?:[A-Za-z_][\w-]*)?:(?:[A-Za-z_0-9][\w-]*(?:\.[\w-]+)*)?"
_TOKEN = re.compile(
    r"""
    [ \t\r\n]*(?:
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>]*>)
    | (?P<long2>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<long1>'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<string2>"(?:[^"\\\n]|\\.)*")
    | (?P<string1>'(?:[^'\\\n]|\\.)*')
    | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<dtmark>\^\^)
    | (?P<bnode>_:[A-Za-z_0-9][\w.-]*)
    | (?P<number>[+-]?(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<pname>"""
    + _PNAME
    + r""")
    | (?P<punct>[;,.\[\](){}])
    | (?P<word>@?[A-Za-z][\w-]*)
    )
    """,
    re.VERBOSE,
)

_NUMERIC_DT = {XSD + "integer", XSD + "decimal", XSD + "double"}


def _tokenize(text: str) -> list[str]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN.match(text, i)
        if not m or m.end() == i:
            if text[i:].strip() == "":
                break
            raise ValueError(f"Turtle tokenize error at: {text[i:i+40]!r}")
        i = m.end()
        if m.lastgroup != "comment":
            out.append(m.group().strip())
    return out


class _TurtleParser:
    """Also parses TriG (trig=True): Turtle plus named-graph blocks —
    `<g> { ... }`, `GRAPH <g> { ... }`, and `{ ... }` for the default graph
    (reference loads TRIG via the same Jena/Sesame format map,
    rdf.clj:539-547). Graph membership lands in the `graph` column."""

    def __init__(self, text: str, prefixes: dict[str, str] | None = None, trig: bool = False):
        self.toks = _tokenize(text)
        self.pos = 0
        self.prefixes: dict[str, str] = dict(prefixes or {})
        self.base = ""
        self.rows: list[tuple] = []
        self._anon = 0
        self.trig = trig
        self.cur_graph: str | None = None

    # ---- token helpers ----
    def peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of Turtle document")
        self.pos += 1
        return t

    def eat(self, want: str) -> None:
        t = self.next()
        if t != want:
            raise ValueError(f"expected {want!r}, got {t!r}")

    # ---- document ----
    def parse(self) -> list[tuple]:
        while self.peek() is not None:
            t = self.peek()
            low = t.lower()
            if low in ("@prefix", "prefix"):
                self.next()
                name = self.next()
                if not name.endswith(":"):
                    raise ValueError(f"bad prefix name {name!r}")
                iri = self.next()
                self.prefixes[name[:-1]] = self._resolve_iri(iri)
                if low == "@prefix":
                    self.eat(".")
                elif self.peek() == ".":
                    self.next()
            elif low in ("@base", "base"):
                self.next()
                self.base = self._resolve_iri(self.next())
                if low == "@base":
                    self.eat(".")
                elif self.peek() == ".":
                    self.next()
            elif self.trig and (
                t == "{"
                or low == "graph"
                or (t not in ("[",) and self._peek2() == "{")
            ):
                self._graph_block()
            else:
                self._statement()
        return self.rows

    def _peek2(self) -> str | None:
        return self.toks[self.pos + 1] if self.pos + 1 < len(self.toks) else None

    def _graph_block(self) -> None:
        if self.peek().lower() == "graph":
            self.next()
        if self.peek() != "{":
            self.cur_graph = self._iri_term(self.next())
        else:
            self.cur_graph = None  # default-graph block
        self.eat("{")
        while self.peek() != "}":
            self._statement(in_block=True)
        self.eat("}")
        self.cur_graph = None

    def _statement(self, in_block: bool = False) -> None:
        was_bnode_list = self.peek() == "["
        s_kind, s = self._subject()
        # `[ p o ] .` — a blankNodePropertyList alone is a complete statement
        if not (was_bnode_list and self.peek() in (".", "}")):
            self._predicate_object_list(s_kind, s)
        if in_block and self.peek() == "}":
            return  # trailing '.' is optional before '}'
        self.eat(".")

    def _subject(self) -> tuple[str, str]:
        t = self.peek()
        if t == "[":
            return "bnode", self._bnode_property_list()
        if t == "(":
            return self._collection()
        tok = self.next()
        if tok.startswith("_:"):
            return "bnode", tok[2:]
        return "uri", self._iri_term(tok)

    def _predicate_object_list(self, s_kind: str, s: str) -> None:
        while True:
            p = self._verb()
            while True:
                self._object(s_kind, s, p)
                if self.peek() == ",":
                    self.next()
                    continue
                break
            if self.peek() == ";":
                self.next()
                # trailing ';' before '.' / ']' / '}' is legal Turtle/TriG
                if self.peek() in (".", "]", "}", None):
                    return
                continue
            return

    def _verb(self) -> str:
        tok = self.next()
        if tok == "a":
            return RDF_TYPE
        return self._iri_term(tok)

    def _object(self, s_kind: str, s: str, p: str) -> None:
        kind, v, lang, dt = self._object_term()
        self._emit(s_kind, s, p, kind, v, lang, dt)

    def _object_term(self) -> tuple:
        """Parse one object value -> (kind, value, lang, dt); nested
        structures ([..] property lists, (..) collections) emit their own
        triples and return the node that stands for them."""
        t = self.peek()
        if t == "(":
            kind, node = self._collection()
            return kind, node, None, None
        if t == "[":
            return "bnode", self._bnode_property_list(), None, None
        tok = self.next()
        if tok.startswith("_:"):
            return "bnode", tok[2:], None, None
        if tok.startswith(("'", '"')):
            lex, lang, dt = self._literal_tail(tok)
            return "literal", lex, lang, dt
        if re.fullmatch(r"[+-]?(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?", tok):
            if "e" in tok.lower():
                dt = XSD + "double"
            elif "." in tok:
                dt = XSD + "decimal"
            else:
                dt = XSD + "integer"
            return "literal", tok, None, dt
        if tok in ("true", "false"):
            return "literal", tok, None, XSD + "boolean"
        return "uri", self._iri_term(tok), None, None

    def _collection(self) -> tuple[str, str]:
        """'(' object* ')' (Turtle grammar [15]) -> rdf:first/rdf:rest
        bnode chain; the empty collection is rdf:nil."""
        self.eat("(")
        items = []
        while self.peek() != ")":
            if self.peek() is None:
                raise ValueError("unterminated RDF collection '( ...'")
            items.append(self._object_term())
        self.eat(")")
        if not items:
            return "uri", RDF_NIL
        labels = []
        for _ in items:
            self._anon += 1
            labels.append(f"genid{self._anon}")
        for i, ((kind, v, lang, dt), lab) in enumerate(zip(items, labels)):
            self._emit("bnode", lab, RDF_FIRST, kind, v, lang, dt)
            if i + 1 < len(labels):
                self._emit("bnode", lab, RDF_REST, "bnode", labels[i + 1], None, None)
            else:
                self._emit("bnode", lab, RDF_REST, "uri", RDF_NIL, None, None)
        return "bnode", labels[0]

    def _literal_tail(self, tok: str):
        if tok.startswith(('"""', "'''")):
            lex = _unescape_string(tok[3:-3])
        else:
            lex = _unescape_string(tok[1:-1])
        nxt = self.peek()
        if nxt and nxt.startswith("@") and re.fullmatch(r"@[A-Za-z][A-Za-z0-9-]*", nxt):
            self.next()
            return lex, nxt[1:], None
        if nxt == "^^":
            self.next()
            return lex, None, self._iri_term(self.next())
        return lex, None, None

    def _bnode_property_list(self) -> str:
        """'[' predicateObjectList? ']' -> fresh anonymous bnode label."""
        self.eat("[")
        self._anon += 1
        label = f"genid{self._anon}"
        if self.peek() != "]":
            self._predicate_object_list("bnode", label)
        self.eat("]")
        return label

    def _iri_term(self, tok: str) -> str:
        if tok.startswith("<"):
            return self._resolve_iri(tok)
        if tok == "a":
            return RDF_TYPE
        m = re.fullmatch(_PNAME, tok)
        if m:
            short, local = tok.split(":", 1)
            base = self.prefixes.get(short)
            if base is None:
                raise ValueError(f"unknown prefix {short!r} in {tok!r}")
            return base + local
        raise ValueError(f"cannot parse IRI term {tok!r}")

    def _resolve_iri(self, tok: str) -> str:
        iri = tok[1:-1] if tok.startswith("<") else tok
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            # RFC 3986 reference resolution (dot-segment removal, absolute
            # paths, fragments) — plain concatenation left "dir/../up"
            # unnormalized (round-5 probe)
            from urllib.parse import urljoin

            return urljoin(self.base, iri)
        return iri

    def _emit(self, s_kind, s, p, o_kind, o, o_lang, o_dt) -> None:
        num = Decimal(o) if (o_dt in _NUMERIC_DT) else None
        self.rows.append(
            (s_kind, s, p, o_kind, o, o_lang, o_dt, num, self.cur_graph, None, None, None)
        )


def parse_turtle_rows(
    text: str, prefixes: dict[str, str] | None = None
) -> list[tuple]:
    """Turtle document text -> list of TRIPLE_SCHEMA-shaped tuples."""
    return _TurtleParser(text, prefixes).parse()


def parse_trig_rows(
    text: str, prefixes: dict[str, str] | None = None
) -> list[tuple]:
    """TriG document text (Turtle + named-graph blocks) -> TRIPLE_SCHEMA
    tuples with the `graph` column populated per block."""
    return _TurtleParser(text, prefixes, trig=True).parse()


def parse_n3_rows(
    text: str, prefixes: dict[str, str] | None = None
) -> list[tuple]:
    """N3 documents, restricted to its RDF subset (which is Turtle — the
    reference's loaders treat N3 this way too: Jena maps :n3 to the Turtle
    family, jena/rdf.clj:343-351). Formulae/rules syntax ({ } => { }) is
    out of scope and fails with a parse error."""
    return _TurtleParser(text, prefixes).parse()


def load_trig(kb, path_or_text: str) -> None:
    """Load TriG into the KB (quads land in their named graphs)."""
    spark = kb.spark
    stripped = path_or_text.strip()
    if "\n" in path_or_text or stripped.startswith(("@prefix", "@base", "<", "PREFIX", "BASE", "{", "GRAPH")):
        rows = parse_trig_rows(path_or_text, dict(kb.ns.short_to_long))
        kb.add_rows(spark.createDataFrame(rows, TRIPLE_SCHEMA))
    else:
        docs = spark.read.text(path_or_text, wholetext=True)
        cols = TRIPLE_SCHEMA.fieldNames()

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                rows: list[tuple] = []
                for txt in pdf["value"]:
                    rows.extend(parse_trig_rows(txt))
                yield pd.DataFrame(rows, columns=cols)

        kb.add_rows(docs.select("value").mapInPandas(gen, schema=TRIPLE_SCHEMA))


def parse_turtle_df(spark, docs_df: DataFrame, text_col: str = "value") -> DataFrame:
    """Distributed Turtle parse: one input row per DOCUMENT (e.g. from
    spark.read.text(path, wholetext=True)) -> TRIPLE_SCHEMA rows. The parse
    runs executor-side inside mapInPandas (Arrow-batched, file-granular
    parallelism)."""
    cols = TRIPLE_SCHEMA.fieldNames()

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for txt in pdf[text_col]:
                rows.extend(parse_turtle_rows(txt))
            yield pd.DataFrame(rows, columns=cols)

    return docs_df.select(text_col).mapInPandas(gen, schema=TRIPLE_SCHEMA)


def load_turtle(kb, path_or_text: str) -> None:
    """Load Turtle into the KB: inline text parses on the driver (tiny
    fixtures); a path loads via the distributed per-file path."""
    spark = kb.spark
    stripped = path_or_text.strip()
    if "\n" in path_or_text or stripped.startswith(("@prefix", "@base", "<", "PREFIX", "BASE")):
        rows = parse_turtle_rows(path_or_text, dict(kb.ns.short_to_long))
        kb.add_rows(spark.createDataFrame(rows, TRIPLE_SCHEMA))
    else:
        kb.add_rows(load_turtle_files(spark, path_or_text))


def load_turtle_files(spark, path: str) -> DataFrame:
    """Distributed load of .ttl file(s): one task per file."""
    docs = spark.read.text(path, wholetext=True)
    return parse_turtle_df(spark, docs)


# ---- export (S4 writer-KB role for Turtle) ----


def _curie_expr(col, prefixes: dict[str, str]):
    """CURIE-compress a URI column against the longest matching prefix
    (longest-match rule, rdf.clj:194-221); fall back to <...>."""
    out = F.concat(F.lit("<"), col, F.lit(">"))
    # apply shortest base last so longest base wins
    for short, base in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
        local = F.substr(col, F.lit(len(base) + 1))
        ok = col.startswith(base) & local.rlike(r"^[A-Za-z_0-9][\w.-]*$") & ~local.rlike(r"\.$")
        out = F.when(ok, F.concat(F.lit(short + ":"), local)).otherwise(out)
    return out


def export_turtle(df: DataFrame, prefixes: dict[str, str] | None = None) -> DataFrame:
    """TRIPLE_SCHEMA rows -> one Turtle statement line per row (no header;
    pair with `turtle_header` when prefixes are used). Distributed: write
    with .write.text(path)."""
    prefixes = prefixes or {}
    s = F.when(
        F.col("s_kind") == "bnode", F.concat(F.lit("_:"), F.col("s"))
    ).otherwise(_curie_expr(F.col("s"), prefixes))
    p = F.when(F.col("p") == RDF_TYPE, F.lit("a")).otherwise(
        _curie_expr(F.col("p"), prefixes)
    )
    lex = F.replace(F.col("o"), F.lit("\\"), F.lit("\\\\"))
    lex = F.replace(lex, F.lit('"'), F.lit('\\"'))
    lex = F.replace(lex, F.lit("\n"), F.lit("\\n"))
    lex = F.replace(lex, F.lit("\r"), F.lit("\\r"))
    lex = F.replace(lex, F.lit("\t"), F.lit("\\t"))
    o = (
        F.when(F.col("o_kind") == "uri", _curie_expr(F.col("o"), prefixes))
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
                    F.concat(F.lit("^^"), _curie_expr(F.col("o_datatype"), prefixes)),
                )
                .otherwise(F.lit("")),
            )
        )
    )
    line = F.concat(s, F.lit(" "), p, F.lit(" "), o, F.lit(" ."))
    return df.select(line.alias("value"))


def turtle_header(prefixes: dict[str, str]) -> str:
    return "".join(
        f"@prefix {short}: <{base}> .\n" for short, base in sorted(prefixes.items())
    )


def export_turtle_doc(df: DataFrame, prefixes: dict[str, str] | None = None) -> DataFrame:
    """Whole-document export: ONE row holding a complete Turtle doc (header +
    deterministically sorted statements). For round-trip checks and
    schema-sized graphs; bulk export uses the line-based export_turtle."""
    prefixes = prefixes or {}
    lines = export_turtle(df, prefixes)
    doc = lines.agg(
        F.concat(
            F.lit(turtle_header(prefixes)),
            F.array_join(F.sort_array(F.collect_list("value")), "\n"),
        ).alias("value")
    )
    return doc
