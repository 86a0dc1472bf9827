"""Turtle loader/exporter (S2 format coverage; rdf.clj:539-547 role).
Fixture shapes mirror the reference's stream-load tests (test_rdf.clj:59-66)
plus the Turtle-specific syntax the reference's Jena/Sesame backends accept."""

import pytest

from kr_spark.sources.turtle import (
    export_turtle_doc,
    load_turtle,
    parse_turtle_rows,
)

TTL = """
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@prefix ex: <http://www.example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:a a foaf:Person ;
     foaf:name "Alice"@en ;
     foaf:age 40 ;
     foaf:mbox <mailto:alice@example.com>, <mailto:alice@work.example> .
ex:b foaf:name "Bob" ; foaf:height 1.75 ; foaf:admin true .
ex:c foaf:quote "say \\"hi\\"\\n" ; foaf:note '''multi
line''' ; foaf:score "7"^^xsd:integer .
_:blank foaf:knows ex:a .
# a comment
ex:d foaf:knows [ foaf:name "Anon" ] .
"""


def test_parse_turtle_subset():
    rows = parse_turtle_rows(TTL)
    by_p = {}
    for r in rows:
        by_p.setdefault(r[2].rsplit("/", 1)[-1], []).append(r)
    # `a` shorthand
    assert by_p["22-rdf-syntax-ns#type"][0][4].endswith("Person")
    # lang tag
    name = [r for r in by_p["name"] if r[4] == "Alice"][0]
    assert name[5] == "en"
    # numeric shorthand -> xsd typed with num_val
    age = by_p["age"][0]
    assert age[6].endswith("integer") and int(age[7]) == 40
    height = by_p["height"][0]
    assert height[6].endswith("decimal") and float(height[7]) == 1.75
    # boolean shorthand
    assert by_p["admin"][0][6].endswith("boolean")
    # object list (two mboxes)
    assert len(by_p["mbox"]) == 2
    # escapes + long strings
    assert by_p["quote"][0][4] == 'say "hi"\n'
    assert by_p["note"][0][4] == "multi\nline"
    # explicit datatype
    assert by_p["score"][0][6].endswith("integer")
    # labeled bnode subject
    blank = [r for r in by_p["knows"] if r[0] == "bnode" and r[1] == "blank"]
    assert len(blank) == 1
    # anonymous bnode property list: ex:d knows _:genidN; genidN name "Anon"
    anon = [r for r in by_p["knows"] if r[1].endswith("/d")]
    assert anon[0][3] == "bnode"
    anon_names = [r for r in by_p["name"] if r[0] == "bnode"]
    assert anon_names[0][4] == "Anon"


def test_parse_turtle_base_and_sparql_style_prefix():
    rows = parse_turtle_rows(
        """
        BASE <http://base.example/>
        PREFIX ex: <http://www.example.org/>
        <rel> ex:p <http://abs.example/x> .
        """
    )
    assert rows[0][1] == "http://base.example/rel"
    assert rows[0][4] == "http://abs.example/x"


def test_collections_raise():
    with pytest.raises(ValueError, match="collections"):
        parse_turtle_rows(
            "@prefix ex: <http://e/> . ex:a ex:p ( ex:b ex:c ) ."
        )


def test_load_turtle_into_kb_and_query(kb):
    load_turtle(kb, TTL)
    res = kb.query([("?/p", "foaf/name", ["Alice", "en"])])
    assert len(res) == 1
    # value-space numeric equality on the shorthand literal
    res = kb.query([("?/p", "foaf/age", 40)])
    assert len(res) == 1


def test_turtle_roundtrip_doc(kb, spark):
    from kr_spark.sources.turtle import parse_turtle_df

    load_turtle(kb, TTL)
    original = kb.df()
    prefixes = {
        "foaf": "http://xmlns.com/foaf/0.1/",
        "ex": "http://www.example.org/",
        "xsd": "http://www.w3.org/2001/XMLSchema#",
    }
    doc = export_turtle_doc(original, prefixes)
    back = parse_turtle_df(spark, doc)
    cols = ["s_kind", "s", "p", "o_kind", "o", "o_lang", "o_datatype"]
    a, b = original.select(*cols), back.select(*cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_load_turtle_files_distributed(kb, spark, tmp_path):
    p = tmp_path / "docs"
    p.mkdir()
    for i in range(3):
        (p / f"f{i}.ttl").write_text(
            f"@prefix ex: <http://www.example.org/> .\n"
            f"ex:s{i} ex:p \"v{i}\" .\n"
        )
    load_turtle(kb, str(p))
    assert kb.size() == 3
    assert kb.ask_rdf("ex/s1", "ex/p", ["v1"])
