"""Rule indexing: store rules AS reified triples + derive-lookup (K8).

Reference: rule_index.clj — a rule becomes a `rule/Rule` node with
`rdfs/label`, reified head/body statements (`rule/hasHeadTriple` /
`rule/hasBodyTriple`, each a standard rdf:subject/predicate/object
reification, rule_index.clj:66-86), and every rule variable becomes a
`var/Variable` node in the `var/` namespace (rule_index.clj:42-60).
The lookup (`triple-re-derive-query-body`, rule_index.clj:153-177) finds
rules whose HEAD could derive a given triple: per bound slot, the head's
term must be (a) the same term, (b) a rule variable, or — loosening —
(c/d) related by rdf:type / rdfs:subClassOf (subjects/objects) or
rdfs:subPropertyOf (predicates).

Spark shape: the index is an ordinary set of triples in the KB (queryable
with every other operator); the reference emits the lookup as ONE SPARQL
body whose unions contain filter-only branches — our compiler expresses
each union branch as its own tiny BGP plan and set-unions the (driver-side,
rule-count-bounded) results instead. The rules index is metadata, bounded
by rule count, never by corpus size.
"""

from __future__ import annotations

from kr_spark.terms import KIND_BNODE, KIND_VAR

RULE_NS = "http://kr.example.org/rule/"
VAR_NS = "http://kr.example.org/var/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"

RULE_TYPE = RULE_NS + "Rule"
HAS_HEAD = RULE_NS + "hasHeadTriple"
HAS_BODY = RULE_NS + "hasBodyTriple"
VAR_TYPE = VAR_NS + "Variable"


def _var_uri(name: str) -> str:
    return VAR_NS + name


def _slot_term(kb, x):
    """Pattern slot -> indexable term: variables/bnodes become var/ URIs
    (var-to-ns-var, rule_index.clj:42-44), constants resolve normally."""
    t = kb.term(x)
    if t.kind in (KIND_VAR, KIND_BNODE):
        return kb.term("<" + _var_uri(t.v) + ">")
    return t


def index_triples(kb, rule: dict) -> list[tuple]:
    """Rule -> list of (s, p, o) index triples (index-triples,
    rule_index.clj:94-108)."""
    name = rule["name"]
    rule_uri = kb.term("<" + RULE_NS + name + ">")
    out = [
        (rule_uri, "<" + RDF + "type>", "<" + RULE_TYPE + ">"),
        (rule_uri, "<" + RDFS + "label>", name),
    ]
    seen_vars: set[str] = set()

    def reify(kind: str, link: str, triples) -> None:
        for i, (s, p, o) in enumerate(triples):
            stmt = kb.term("<" + RULE_NS + f"{name}-{kind}-{i}" + ">")
            st, pt, ot = (_slot_term(kb, x) for x in (s, p, o))
            for t in (st, pt, ot):
                if t.v.startswith(VAR_NS) and t.v not in seen_vars:
                    seen_vars.add(t.v)
                    out.append(
                        ("<" + t.v + ">", "<" + RDF + "type>", "<" + VAR_TYPE + ">")
                    )
            out.extend(
                [
                    (rule_uri, "<" + link + ">", stmt),
                    (stmt, "<" + RDF + "subject>", st),
                    (stmt, "<" + RDF + "predicate>", pt),
                    (stmt, "<" + RDF + "object>", ot),
                ]
            )

    reify("head", HAS_HEAD, rule.get("head", []))
    reify("body", HAS_BODY, rule.get("body", []))
    return out


def add_to_rule_index(kb, rules: list[dict]) -> None:
    """Index rules into the KB (add-to-rule-index, rule_index.clj:110-115)."""
    for rule in rules:
        kb.add_statements(index_triples(kb, rule))


def _names_for(kb, slot_pred: str, extra_patterns: list) -> set[str]:
    rows = kb.query(
        [
            ("?/rule", "<" + RDF + "type>", "<" + RULE_TYPE + ">"),
            ("?/rule", "<" + RDFS + "label>", "?/name"),
            ("?/rule", "<" + HAS_HEAD + ">", "?/head"),
            ("?/head", "<" + slot_pred + ">", "?/slot"),
        ]
        + extra_patterns,
        select_vars=["?/name"],
    )
    return {b["name"].v for b in rows}


def rules_deriving(kb, s=None, p=None, o=None) -> set[str]:
    """Names of indexed rules whose head could derive a triple matching the
    given constant slots (triple-re-derive-query-body semantics,
    rule_index.clj:153-177): per bound slot the head term is the same term,
    OR a rule variable, OR type/subclass-related (s/o) /
    subproperty-related (p). Unbound (None) slots match anything."""
    axes = []
    if s is not None:
        axes.append((RDF + "subject", s, ("type", "subClassOf")))
    if p is not None:
        axes.append((RDF + "predicate", p, ("subPropertyOf",)))
    if o is not None:
        axes.append((RDF + "object", o, ("type", "subClassOf")))
    if not axes:
        return _names_for(kb, RDF + "predicate", [])

    result: set[str] | None = None
    for slot_pred, const, loosen in axes:
        t = kb.term(const)
        branches = [
            # (a) head slot IS the constant term
            _names_for(kb, slot_pred, [("?/head", "<" + slot_pred + ">", const)]),
            # (b) head slot is a rule variable
            _names_for(
                kb,
                slot_pred,
                [("?/slot", "<" + RDF + "type>", "<" + VAR_TYPE + ">")],
            ),
        ]
        for rel in loosen:
            # (c/d) slot related to the constant via the schema
            branches.append(
                _names_for(
                    kb,
                    slot_pred,
                    [("?/slot", "<" + RDFS + rel + ">" if rel != "type" else "<" + RDF + "type>", const)],
                )
            )
        matched = set().union(*branches)
        result = matched if result is None else (result & matched)
    return result or set()
