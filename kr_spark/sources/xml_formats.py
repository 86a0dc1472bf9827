"""RDF/XML and TriX load (SURVEY §2.1 S2 format coverage; reference format
map rdf.clj:539-547 — Jena `"RDF/XML"` / `"TriX"`, jena/rdf.clj:343-351;
Sesame RDFFormat.RDFXML / TRIX, sesame/rdf.clj:272-302).

RDF/XML subset (the style the reference's Jena fixtures use):
  * rdf:RDF root (or a single node element), XML-namespace prefixes
  * node elements: rdf:Description or typed elements (type emits rdf:type)
  * node identification: rdf:about, rdf:ID (resolves against xml:base as
    base#id), rdf:nodeID, or none (fresh blank node)
  * property elements with text content -> literal (xml:lang inherited,
    rdf:datatype honored); rdf:resource / rdf:nodeID attributes -> uri /
    bnode objects; nested node elements -> recursion;
    rdf:parseType="Resource" -> implicit blank node
  * property attributes on node elements -> literal triples
  Not supported (error or ignored): rdf:parseType="Collection"/"Literal",
  rdf:li containers, reification attributes.

TriX (the simple quad XML format): <TriX><graph><uri>g</uri>
<triple><uri|id|plainLiteral|typedLiteral .../></triple>*</graph>*</TriX>.

Distribution: like Turtle, these are whole-document grammars — the
distributed unit is the file (wholetext read + mapInPandas); see
sources/turtle.py for the rationale.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from decimal import Decimal, InvalidOperation

from pyspark.sql import DataFrame

from kr_spark.kb import TRIPLE_SCHEMA

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"
TRIX_NS = "http://www.w3.org/2004/03/trix/trix-1/"
_RDF = "{" + RDF_NS + "}"
_XML = "{" + XML_NS + "}"

from kr_spark.terms import NUMERIC_DATATYPES


def _num(lex: str, dt: str | None):
    if dt in NUMERIC_DATATYPES:
        try:
            return Decimal(lex)
        except InvalidOperation:
            return None
    return None


def _split_tag(tag: str) -> str:
    """'{ns}local' -> full IRI ns+local."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


class _RdfXmlParser:
    def __init__(self):
        self.rows: list[tuple] = []
        self._anon = 0

    def _fresh_bnode(self) -> str:
        self._anon += 1
        return f"genid{self._anon}"

    def parse(self, text: str) -> list[tuple]:
        root = ET.fromstring(text)
        base = root.get(_XML + "base", "")
        if _split_tag(root.tag) == RDF_NS + "RDF":
            for child in root:
                self._node_element(child, base, None)
        else:
            self._node_element(root, base, None)
        return self.rows

    def _emit(self, s_kind, s, p, o_kind, o, o_lang=None, o_dt=None):
        self.rows.append(
            (s_kind, s, p, o_kind, o, o_lang, o_dt, _num(o, o_dt), None, None, None, None)
        )

    def _node_id(self, el, base: str) -> tuple[str, str]:
        about = el.get(_RDF + "about")
        if about is not None:
            return "uri", base + about if about.startswith("#") else about
        rid = el.get(_RDF + "ID")
        if rid is not None:
            return "uri", f"{base}#{rid}"
        nid = el.get(_RDF + "nodeID")
        if nid is not None:
            return "bnode", nid
        return "bnode", self._fresh_bnode()

    def _node_element(self, el, base: str, lang: str | None) -> tuple[str, str]:
        base = el.get(_XML + "base", base)
        lang = el.get(_XML + "lang", lang)
        s_kind, s = self._node_id(el, base)
        tag_iri = _split_tag(el.tag)
        if tag_iri != RDF_NS + "Description":
            self._emit(s_kind, s, RDF_NS + "type", "uri", tag_iri)
        # property ATTRIBUTES -> literal triples
        for k, v in el.attrib.items():
            if k.startswith(_RDF) or k.startswith(_XML) or not k.startswith("{"):
                continue
            self._emit(s_kind, s, _split_tag(k), "literal", v, lang, None)
        for prop in el:
            self._property_element(s_kind, s, prop, base, lang)
        return s_kind, s

    def _property_element(self, s_kind, s, prop, base: str, lang: str | None):
        p = _split_tag(prop.tag)
        plang = prop.get(_XML + "lang", lang)
        parse_type = prop.get(_RDF + "parseType")
        if parse_type == "Resource":
            node = self._fresh_bnode()
            self._emit(s_kind, s, p, "bnode", node)
            for sub in prop:
                self._property_element("bnode", node, sub, base, plang)
            return
        if parse_type is not None:
            raise ValueError(f"rdf:parseType={parse_type!r} not supported")
        res = prop.get(_RDF + "resource")
        if res is not None:
            self._emit(s_kind, s, p, "uri", base + res if res.startswith("#") else res)
            return
        nid = prop.get(_RDF + "nodeID")
        if nid is not None:
            self._emit(s_kind, s, p, "bnode", nid)
            return
        children = list(prop)
        if children:
            o_kind, o = self._node_element(children[0], base, plang)
            self._emit(s_kind, s, p, o_kind, o)
            return
        dt = prop.get(_RDF + "datatype")
        text = prop.text or ""
        self._emit(s_kind, s, p, "literal", text, None if dt else plang, dt)


def parse_rdfxml_rows(text: str) -> list[tuple]:
    return _RdfXmlParser().parse(text)


def parse_trix_rows(text: str) -> list[tuple]:
    """TriX -> TRIPLE_SCHEMA tuples (graph column from each <graph>'s
    leading <uri>, absent -> default graph)."""
    root = ET.fromstring(text)
    if _split_tag(root.tag) not in (TRIX_NS + "TriX", "TriX", "trix"):
        raise ValueError(f"not a TriX document: root {root.tag!r}")
    rows: list[tuple] = []

    def local_name(el) -> str:
        full = _split_tag(el.tag)
        return full[len(TRIX_NS):] if full.startswith(TRIX_NS) else full

    def term(el):
        local = local_name(el)
        text_v = el.text or ""
        if local == "uri":
            return ("uri", text_v, None, None)
        if local == "id":
            return ("bnode", text_v, None, None)
        if local == "plainLiteral":
            return ("literal", text_v, el.get(_XML + "lang"), None)
        if local == "typedLiteral":
            return ("literal", text_v, None, el.get("datatype"))
        raise ValueError(f"unknown TriX term element {el.tag!r}")

    for graph in root:
        children = list(graph)
        gname = None
        start = 0
        if children and local_name(children[0]) == "uri":
            gname = children[0].text
            start = 1
        for triple in children[start:]:
            terms = [term(t) for t in triple]
            if len(terms) != 3:
                raise ValueError("TriX <triple> must have exactly 3 terms")
            (sk, sv, _, _), (pk, pv, _, _), (ok, ov, olang, odt) = terms
            rows.append(
                (sk, sv, pv, ok, ov, olang, odt, _num(ov, odt), gname, None, None, None)
            )
    return rows


def _load_xml(kb, path_or_text: str, parse_fn) -> None:
    spark = kb.spark
    if path_or_text.lstrip().startswith("<"):
        rows = parse_fn(path_or_text)
        kb.add_rows(spark.createDataFrame(rows, TRIPLE_SCHEMA))
        return
    docs = spark.read.text(path_or_text, wholetext=True)
    cols = TRIPLE_SCHEMA.fieldNames()

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for txt in pdf["value"]:
                rows.extend(parse_fn(txt))
            yield pd.DataFrame(rows, columns=cols)

    kb.add_rows(docs.select("value").mapInPandas(gen, schema=TRIPLE_SCHEMA))


def load_rdfxml(kb, path_or_text: str) -> None:
    _load_xml(kb, path_or_text, parse_rdfxml_rows)


def load_trix(kb, path_or_text: str) -> None:
    _load_xml(kb, path_or_text, parse_trix_rows)
