"""KB lifecycle + statement-level API, porting test_kb.clj:91-114 and
test_rdf.clj (adds, bnodes, quads, N-Triples load)."""

from tests.conftest import TEST_TRIPLES, load_fixture


def test_add_and_size(kb):
    load_fixture(kb, TEST_TRIPLES)
    assert kb.size() == 5


def test_checked_add_is_idempotent(kb):
    # checked add: set semantics (rdf.clj:504-507)
    load_fixture(kb, TEST_TRIPLES)
    load_fixture(kb, TEST_TRIPLES)
    kb.add("ex/a", "foaf/name", "Johnny Lee Outlaw")
    assert kb.size() == 5


def test_ask_rdf_wildcards(kb):
    load_fixture(kb, TEST_TRIPLES)
    assert kb.ask_rdf("ex/a", "foaf/name", "Johnny Lee Outlaw")
    assert kb.ask_rdf("ex/a", None, None)
    assert kb.ask_rdf(None, "foaf/mbox", None)
    assert not kb.ask_rdf("ex/zzz", None, None)
    assert not kb.ask_rdf("ex/a", "foaf/name", "Peter Goodguy")


def test_query_rdf(kb):
    load_fixture(kb, TEST_TRIPLES)
    assert kb.query_rdf(None, "foaf/mbox", None).count() == 3
    assert kb.query_rdf("ex/a", None, None).count() == 2


def test_literal_lang_default(kb):
    # plain strings get lang "en" (rdf.clj:28-29,393-396)
    kb.add("ex/a", "foaf/name", "Alice")
    row = kb.df().collect()[0]
    assert row.o_lang == "en"
    assert row.o_datatype is None


def test_typed_literal_integer(kb):
    # bare ints forced to xsd:integer (rdf.clj:382-384)
    kb.add("ex/a", "foaf/age", 40)
    row = kb.df().collect()[0]
    assert row.o == "40"
    assert row.o_datatype.endswith("XMLSchema#integer")
    assert int(row.num_val) == 40


def test_quads_named_graph_visibility(kb):
    # C12: quad visible in default (all-graph) query and under its graph,
    # invisible under a different graph (test_rdf.clj:129-207)
    kb.add("ex/a", "ex/b", "ex/c", graph="ex/x")
    assert kb.ask_rdf("ex/a", "ex/b", "ex/c")
    assert kb.ask_rdf("ex/a", "ex/b", "ex/c", graph="ex/x")
    assert not kb.ask_rdf("ex/a", "ex/b", "ex/c", graph="ex/z")
    # same triple may exist separately in another graph
    kb.add("ex/a", "ex/b", "ex/c", graph="ex/y")
    assert kb.size() == 2


def test_force_add_named_to_default_mirror(kb):
    # *force-add-named-to-default* (jena/rdf.clj:29; VERDICT r2 Missing #4):
    # with the flag on, a named-graph add also lands a default-graph copy
    kb.force_add_named_to_default = True
    kb.add("ex/a", "ex/b", "ex/c", graph="ex/x")
    assert kb.ask_rdf("ex/a", "ex/b", "ex/c", graph="ex/x")
    assert kb.size() == 2  # quad + default-graph mirror
    rows = kb.df().collect()
    assert {r.graph for r in rows} == {"http://www.example.org/x", None}
    # idempotent like any checked add: re-adding creates nothing new
    kb.add("ex/a", "ex/b", "ex/c", graph="ex/x")
    assert kb.size() == 2
    # flag off (the default): no mirror
    kb.force_add_named_to_default = False
    kb.add("ex/d", "ex/b", "ex/c", graph="ex/x")
    assert kb.size() == 3


def test_ntriples_load(kb):
    # C13 (test_rdf.clj:22-28, 59-66)
    nt = (
        "<http://www.example.org/a> <http://www.example.org/p> <http://www.example.org/x> .\n"
        "<http://www.example.org/a> <http://www.example.org/p> <http://www.example.org/y> .\n"
    )
    kb.load_ntriples(nt)
    assert kb.ask_rdf("ex/a", "ex/p", "ex/x")
    assert kb.ask_rdf("ex/a", "ex/p", "ex/y")
    assert not kb.ask_rdf("ex/a", "ex/p", "ex/z")


def test_ntriples_roundtrip(kb):
    from kr_spark.sources.ntriples import export_ntriples, parse_ntriples_df

    load_fixture(kb, TEST_TRIPLES + [("ex/a", "foaf/age", 40)])
    lines = export_ntriples(kb.df())
    reparsed = parse_ntriples_df(kb.spark, lines)
    from kr_spark.kb import KB

    kb2 = KB(kb.spark)
    kb2.add_rows(reparsed)
    assert kb2.size() == kb.size()
    assert kb2.ask_rdf("ex/a", "foaf/age", 40)
    assert kb2.ask_rdf("ex/a", "foaf/name", "Johnny Lee Outlaw")


def test_literal_mode_matrix(kb):
    # *literal-mode* behavior matrix, test_rdf.clj:254-335
    kb.add_statements(
        [
            ("ex/a", "ex/b", ["foo", "ex/custom"]),
            ("ex/c", "ex/d", [4, "xsd/integer"]),
            ("ex/g", "ex/h", ["Bob", "en"]),
            ("ex/i", "ex/j", ["Bob"]),
            ("ex/k", "ex/l", 4),
        ]
    )
    # nil / :clj -> plain native values
    for mode in (None, "clj"):
        assert kb.get_literal("ex/a", "ex/b", mode) == "foo"
        assert kb.get_literal("ex/c", "ex/d", mode) == 4
        assert kb.get_literal("ex/g", "ex/h", mode) == "Bob"
        assert kb.get_literal("ex/i", "ex/j", mode) == "Bob"
        assert kb.get_literal("ex/k", "ex/l", mode) == 4
    # :clj-type -> [value, type-or-lang]
    assert kb.get_literal("ex/a", "ex/b", "clj-type") == ["foo", "ex/custom"]
    assert kb.get_literal("ex/c", "ex/d", "clj-type") == [4, "xsd/integer"]
    assert kb.get_literal("ex/g", "ex/h", "clj-type") == ["Bob", "en"]
    assert kb.get_literal("ex/i", "ex/j", "clj-type") == ["Bob", None]
    assert kb.get_literal("ex/k", "ex/l", "clj-type") == [4, "xsd/integer"]
    # :string -> [lexical, type-or-lang]
    assert kb.get_literal("ex/c", "ex/d", "string") == ["4", "xsd/integer"]
    assert kb.get_literal("ex/k", "ex/l", "string") == ["4", "xsd/integer"]
    assert kb.get_literal("ex/g", "ex/h", "string") == ["Bob", "en"]
    # fn mode: custom datatypes boxed, everything else plain
    fn = lambda lex, tl: "clj-type" if tl == "ex/custom" else None
    assert kb.get_literal("ex/a", "ex/b", fn) == ["foo", "ex/custom"]
    assert kb.get_literal("ex/c", "ex/d", fn) == 4
    assert kb.get_literal("ex/g", "ex/h", fn) == "Bob"
    # fn mode: string type_or_lang (= lang tag) boxed
    fn2 = lambda lex, tl: "clj-type" if tl == "en" else None
    assert kb.get_literal("ex/g", "ex/h", fn2) == ["Bob", "en"]
    assert kb.get_literal("ex/c", "ex/d", fn2) == 4


def test_ntriples_escaping_roundtrip(kb, spark):
    # quotes, backslashes, newlines and tabs must survive export -> parse
    from kr_spark.kb import KB
    from kr_spark.sources.ntriples import export_ntriples, parse_ntriples_df

    hostile = [
        'quote " inside',
        "back \\ slash",
        'both \\" mixed',
        "line\nbreak",
        "tab\there",
    ]
    kb.add_statements([(f"ex/s{i}", "ex/p", [v]) for i, v in enumerate(hostile)])
    lines = export_ntriples(kb.df())
    # every line must still be a single parseable statement
    assert lines.count() == len(hostile)
    back = parse_ntriples_df(spark, lines)
    got = {r.o for r in back.collect()}
    assert got == set(hostile)


def test_ntriples_beyond_bmp_escapes(kb, spark):
    # \UXXXXXXXX decodes via surrogate-pair composition (VERDICT r2 Missing
    # #5); an escaped backslash before it must NOT feed the decoder, and
    # raw UTF-8 beyond-BMP text survives export -> parse
    from kr_spark.sources.ntriples import export_ntriples, parse_ntriples_df

    lines = [
        '<http://e.org/a> <http://e.org/p> "smile \\U0001F600 !" .',
        '<http://e.org/b> <http://e.org/p> "bmp \\U00000041" .',
        '<http://e.org/c> <http://e.org/p> "literal \\\\U0001F600" .',
        '<http://e.org/d> <http://e.org/p> "bad \\UZZZZZZZZ" .',
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    got = {r.s: r.o for r in parse_ntriples_df(spark, df).collect()}
    assert got["http://e.org/a"] == "smile \U0001f600 !"
    assert got["http://e.org/b"] == "bmp A"
    assert got["http://e.org/c"] == "literal \\U0001F600"
    assert got["http://e.org/d"] == "bad \\UZZZZZZZZ"

    kb.add("ex/s", "ex/p", ["emoji \U0001f600 text"])
    back = parse_ntriples_df(spark, export_ntriples(kb.df()))
    assert back.collect()[0].o == "emoji \U0001f600 text"


def test_add_unchecked_then_compact(kb):
    # M2 (rdf.clj:524-535): unchecked append keeps duplicates until
    # compact(), which restores the reference store's set semantics.
    kb.add("ex/a", "ex/p", "ex/b")
    kb.add_unchecked("ex/a", "ex/p", "ex/b")  # duplicate of a checked add
    kb.add_unchecked("ex/c", "ex/p", "ex/d")
    kb.add_unchecked("ex/c", "ex/p", "ex/d")  # duplicate of itself
    assert kb.size() == 4  # duplicates present pre-compaction
    kb.compact()
    assert kb.size() == 2
    assert kb.ask_rdf("ex/c", "ex/p", "ex/d")


def test_show_sym(kb):
    # repl_utils.clj:20-27 show-sym: triples around a symbol by role,
    # limit-capped per role
    kb.add_statements(
        [
            ("ex/a", "ex/p", "ex/b"),
            ("ex/a", "ex/q", "ex/c"),
            ("ex/b", "ex/p", "ex/a"),
            ("ex/x", "ex/a", "ex/y"),
        ]
    )
    out = kb.show("ex/a")
    assert len(out["subject"]) == 2  # a as subject: p->b, q->c
    assert len(out["predicate"]) == 1  # x a y
    assert len(out["object"]) == 1  # b p a
    capped = kb.show("ex/a", limits=(1, 0, 1))
    assert len(capped["subject"]) == 1 and capped["predicate"] == []
