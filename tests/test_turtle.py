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


def test_collections_parse_to_first_rest_chains():
    # Turtle grammar [15]: ( o1 o2 ) -> rdf:first/rdf:rest bnode chain,
    # () -> rdf:nil; nested and subject-position collections work (r5)
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rows = parse_turtle_rows(
        "@prefix ex: <http://e/> . ex:a ex:p ( ex:b ( ex:c ) ) . "
        "( ex:d ) ex:q ex:e . ex:f ex:r ( ) ."
    )
    firsts = [r for r in rows if r[2] == RDF + "first"]
    rests = [r for r in rows if r[2] == RDF + "rest"]
    # outer 2-list + inner 1-list + subject 1-list = 4 cells
    assert len(firsts) == 4 and len(rests) == 4
    nil_rests = [r for r in rests if r[4] == RDF + "nil"]
    assert len(nil_rests) == 3  # one list terminator per collection
    empty = [r for r in rows if r[2] == "http://e/r"]
    assert empty[0][3] == "uri" and empty[0][4] == RDF + "nil"
    subj = [r for r in rows if r[2] == "http://e/q"]
    assert subj[0][0] == "bnode"


def test_base_relative_resolution_rfc3986():
    # @base resolution removes dot-segments per RFC 3986 (round-5 probe:
    # plain concatenation left "dir/../up" unnormalized)
    rows = parse_turtle_rows(
        "@base <http://b.org/dir/> . <a> <p> <../up> . <a> <p2> </abs> ."
    )
    by_p = {r[2].rsplit("/", 1)[-1]: r for r in rows}
    assert by_p["p"][1] == "http://b.org/dir/a"
    assert by_p["p"][4] == "http://b.org/up"
    assert by_p["p2"][4] == "http://b.org/abs"


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


# ---- TriG (Turtle + named graphs; rdf.clj:539-547 :trig) ----

TRIG = """
@prefix ex: <http://www.example.org/> .
ex:default1 ex:p "d1" .
ex:g1 { ex:a ex:p "in-g1" . ex:b ex:p "also-g1" }
GRAPH ex:g2 { ex:a ex:p "in-g2" . }
{ ex:default2 ex:p "d2" . }
"""


def test_parse_trig_graph_blocks(kb):
    from kr_spark.sources.turtle import parse_trig_rows

    rows = parse_trig_rows(TRIG)
    graphs = {(r[4], r[8]) for r in rows}
    assert ("d1", None) in graphs and ("d2", None) in graphs
    assert ("in-g1", "http://www.example.org/g1") in graphs
    assert ("also-g1", "http://www.example.org/g1") in graphs
    assert ("in-g2", "http://www.example.org/g2") in graphs


def test_load_trig_graph_scoped_query(kb):
    kb.load_rdf(TRIG, fmt="trig")
    # GRAPH-scoped pattern sees only g1 triples
    res = kb.query([("?/s", "ex/p", "?/v", "ex/g1")])
    assert {b["v"].v for b in res} == {"in-g1", "also-g1"}
    # unscoped sees everything (quad-store union visibility)
    assert kb.count([("?/s", "ex/p", "?/v")]) == 5


# ---- RDF/XML (rdf.clj:539-547 :rdfxml) ----

RDFXML = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:foaf="http://xmlns.com/foaf/0.1/"
         xmlns:ex="http://www.example.org/">
  <foaf:Person rdf:about="http://www.example.org/a" ex:nick="Al">
    <foaf:name xml:lang="en">Alice</foaf:name>
    <foaf:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">40</foaf:age>
    <foaf:knows rdf:resource="http://www.example.org/b"/>
    <foaf:based_near rdf:parseType="Resource">
      <ex:lat>52.3</ex:lat>
    </foaf:based_near>
  </foaf:Person>
  <rdf:Description rdf:nodeID="bn1">
    <foaf:name>Shadow</foaf:name>
  </rdf:Description>
  <rdf:Description rdf:about="http://www.example.org/c">
    <foaf:knows>
      <foaf:Person rdf:about="http://www.example.org/a"/>
    </foaf:knows>
  </rdf:Description>
</rdf:RDF>
"""


def test_load_rdfxml(kb):
    kb.load_rdf(RDFXML, fmt="rdfxml")
    # typed node element -> rdf:type
    assert kb.ask_rdf("ex/a", "rdf/type", "foaf/Person")
    # lang literal + typed literal (value-space numeric match)
    assert kb.ask_rdf("ex/a", "foaf/name", ["Alice", "en"])
    assert len(kb.query([("ex/a", "foaf/age", 40)])) == 1
    # resource object + nested node element
    assert kb.ask_rdf("ex/a", "foaf/knows", "ex/b")
    assert kb.ask_rdf("ex/c", "foaf/knows", "ex/a")
    # property attribute
    assert kb.ask_rdf("ex/a", "ex/nick", ["Al"])
    # parseType=Resource -> bnode with nested property
    res = kb.query([("ex/a", "foaf/based_near", "?/n"), ("?/n", "ex/lat", "?/v")])
    assert len(res) == 1 and res[0]["v"].v == "52.3"
    # nodeID bnode subject
    assert kb.ask_rdf(None, "foaf/name", ["Shadow"])


# ---- TriX (rdf.clj:539-547 :trix) ----

TRIX = """<?xml version="1.0"?>
<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/"
      xmlns:xml="http://www.w3.org/XML/1998/namespace">
  <graph>
    <triple>
      <uri>http://www.example.org/a</uri>
      <uri>http://xmlns.com/foaf/0.1/name</uri>
      <plainLiteral xml:lang="en">Alice</plainLiteral>
    </triple>
  </graph>
  <graph>
    <uri>http://www.example.org/g1</uri>
    <triple>
      <uri>http://www.example.org/a</uri>
      <uri>http://www.example.org/p</uri>
      <typedLiteral datatype="http://www.w3.org/2001/XMLSchema#integer">7</typedLiteral>
    </triple>
    <triple>
      <id>bn1</id>
      <uri>http://www.example.org/p</uri>
      <uri>http://www.example.org/b</uri>
    </triple>
  </graph>
</TriX>
"""


def test_load_trix(kb):
    kb.load_rdf(TRIX, fmt="trix")
    assert kb.ask_rdf("ex/a", "foaf/name", ["Alice", "en"])
    res = kb.query([("ex/a", "ex/p", 7, "ex/g1")])
    assert len(res) == 1
    # bnode subject quad in g1
    res = kb.query([("?/s", "ex/p", "ex/b", "ex/g1")])
    assert len(res) == 1


def test_load_rdf_format_dispatch_files(kb, spark, tmp_path):
    (tmp_path / "x.rdf").write_text(RDFXML)
    kb.load_rdf(str(tmp_path / "x.rdf"), fmt="rdf/xml")
    assert kb.ask_rdf("ex/a", "rdf/type", "foaf/Person")
