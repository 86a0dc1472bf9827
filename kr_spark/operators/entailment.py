"""Backend-inference counterpart (K9 / missing-surface #6): `*use-inference*`
with `:rdfs` / `:owl` model levels (rdf.clj:18; jena/kb.clj:16 model types;
sesame/sparql.clj:131 `setIncludeInferred`).

The reference delegates entailment to the store's reasoner; this engine's
stance (SURVEY §2.8 K9) is entailment-as-forward-rules run to fixpoint —
one materialization job instead of per-query reasoning, which is the only
shape that survives 100 TB (query-time backward chaining re-derives the
same closure on every BGP).

Two built-in rule sets, expressed in the engine's own rule format (so they
also serialize through operators/rule_loader.py):
  RDFS_RULES    — the useful core of the RDFS entailment regime:
                  rdfs2 (domain), rdfs3 (range), rdfs5 (subPropertyOf
                  transitivity), rdfs7 (subPropertyOf inheritance),
                  rdfs9 (type inheritance), rdfs11 (subClassOf transitivity)
  OWL_RL_RULES  — the RL subset that matters for KG canonicalization:
                  sameAs symmetry/transitivity + subject/object/predicate
                  rewrite, inverseOf (both directions), SymmetricProperty,
                  TransitiveProperty, equivalentClass/equivalentProperty
                  (as mutual subsumption and back, scm-eqc2), Functional/
                  InverseFunctionalProperty (prp-fp/prp-ifp mint sameAs),
                  and the property-restriction class rules cls-hv1/hv2,
                  cls-svf1, cls-avf

`materialize_entailments(kb, level)` runs the chosen set to fixpoint
(operators/rules.run_rules_to_fixpoint — semi-naive, set-semantics adds).

Delta vs Jena's `:owl` level (VERDICT r3 Missing #3 / next-round #8).
The reference exposes `*use-inference*` (rdf.clj:18) and delegates to the
Jena OntModel's OWL rule reasoner (jena/kb.clj:16,160-169); its own test
suite ships NO OWL fixtures, so the delta below is enumerated against
Jena's OWL_MEM rule set. Status per entailment family — 'yes' rows are
rule-for-rule covered here and tested; exclusions carry a pinned
divergence test (tests/test_forward_rule.py::test_owl_delta_exclusions_*):

| Jena :owl entailment family              | here | notes |
|---|---|---|
| RDFS core (rdfs2/3/5/7/9/11)             | yes  | RDFS_RULES |
| sameAs sym/trans + s/p/o rewrite         | yes  | eq-sym/trans/rep-s/o/p |
| inverseOf (both directions)              | yes  | prp-inv1/inv2 |
| Symmetric / TransitiveProperty           | yes  | prp-symp / prp-trp |
| equivalentClass/Property <-> subsumption | yes  | cax-eqc/eqp, scm-eqc2 |
| Functional/InverseFunctional -> sameAs   | yes  | prp-fp (non-literals incl. bnodes) / prp-ifp |
| hasValue / someValuesFrom / allValuesFrom| yes  | cls-hv1/hv2, cls-svf1, cls-avf |
| domain/range schema closure              | yes (r4) | scm-dom1/dom2, scm-rng1/rng2 |
| intersectionOf / unionOf class exprs     | yes (r4) | cls-int1/int2, cls-uni — `derive` rules over the rdf:rest membership closure (OWL_LIST_RULES); cls-int1's all-members check is a countDistinct groupBy |
| oneOf enumerations (cls-oo)              | yes (r4) | membership join; literal members (data ranges) excluded from type minting |
| maxCardinality 1 -> sameAs (cls-maxc2)   | yes (r5) | pairwise join, prp-fp shape; the one cardinality rule real ontologies hit |
| other cardinality restrictions (maxCardinality>=2, qualified cls-maxqc*) | NO | general max-N needs per-(x,p) group counts mid-fixpoint; excluded (pinned) |
| propertyChainAxiom (prp-spo2)            | yes (r4) | T-box chain lists reconstructed driver-side (10k cap), n-1 equi-joins per chain |
| differentFrom/disjointWith (cax-dw, eq-diff1) | NO | these signal INCONSISTENCY, not new triples — a materializer has no error channel; excluded by design |
| axiomatic/vocabulary triples (owl:Thing, rdfs:Resource memberships) | NO | Jena floods every node with them; at 10^12-turn scale that is O(N) pure noise — excluded by design |
"""

from __future__ import annotations

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"

_TYPE = f"<{RDF}type>"
_SUBC = f"<{RDFS}subClassOf>"
_SUBP = f"<{RDFS}subPropertyOf>"
_DOM = f"<{RDFS}domain>"
_RANGE = f"<{RDFS}range>"
_SAME = f"<{OWL}sameAs>"
_INV = f"<{OWL}inverseOf>"
_EQC = f"<{OWL}equivalentClass>"
_EQP = f"<{OWL}equivalentProperty>"

RDFS_RULES: list[dict] = [
    {
        "name": "rdfs2-domain",
        "head": [("?/x", _TYPE, "?/c")],
        "body": [("?/p", _DOM, "?/c"), ("?/x", "?/p", "?/y")],
    },
    {
        "name": "rdfs3-range",
        "head": [("?/y", _TYPE, "?/c")],
        "body": [("?/p", _RANGE, "?/c"), ("?/x", "?/p", "?/y"), (":isIRI", "?/y")],
    },
    {
        "name": "rdfs5-subprop-trans",
        "head": [("?/p", _SUBP, "?/r")],
        "body": [("?/p", _SUBP, "?/q"), ("?/q", _SUBP, "?/r")],
    },
    {
        "name": "rdfs7-subprop-inherit",
        "head": [("?/x", "?/q", "?/y")],
        "body": [("?/p", _SUBP, "?/q"), ("?/x", "?/p", "?/y"), (":isIRI", "?/q")],
    },
    {
        "name": "rdfs9-type-inherit",
        "head": [("?/x", _TYPE, "?/c")],
        "body": [("?/x", _TYPE, "?/b"), ("?/b", _SUBC, "?/c")],
    },
    {
        "name": "rdfs11-subclass-trans",
        "head": [("?/a", _SUBC, "?/c")],
        "body": [("?/a", _SUBC, "?/b"), ("?/b", _SUBC, "?/c")],
    },
]

OWL_RL_RULES: list[dict] = [
    {
        "name": "eq-sym",
        "head": [("?/y", _SAME, "?/x")],
        "body": [("?/x", _SAME, "?/y")],
    },
    {
        "name": "eq-trans",
        "head": [("?/x", _SAME, "?/z")],
        "body": [("?/x", _SAME, "?/y"), ("?/y", _SAME, "?/z")],
    },
    {
        "name": "eq-rep-s",
        "head": [("?/x2", "?/p", "?/o")],
        "body": [("?/x", _SAME, "?/x2"), ("?/x", "?/p", "?/o")],
    },
    {
        "name": "eq-rep-o",
        "head": [("?/s", "?/p", "?/o2")],
        "body": [("?/o", _SAME, "?/o2"), ("?/s", "?/p", "?/o"), (":isIRI", "?/o")],
    },
    {
        "name": "prp-inv1",
        "head": [("?/y", "?/q", "?/x")],
        "body": [("?/p", _INV, "?/q"), ("?/x", "?/p", "?/y")],
    },
    {
        "name": "prp-inv2",
        "head": [("?/y", "?/p", "?/x")],
        "body": [("?/p", _INV, "?/q"), ("?/x", "?/q", "?/y")],
    },
    {
        "name": "prp-symp",
        "head": [("?/y", "?/p", "?/x")],
        "body": [
            ("?/p", _TYPE, f"<{OWL}SymmetricProperty>"),
            ("?/x", "?/p", "?/y"),
        ],
    },
    {
        "name": "prp-trp",
        "head": [("?/x", "?/p", "?/z")],
        "body": [
            ("?/p", _TYPE, f"<{OWL}TransitiveProperty>"),
            ("?/x", "?/p", "?/y"),
            ("?/y", "?/p", "?/z"),
        ],
    },
    {
        "name": "cax-eqc1",
        "head": [("?/c1", _SUBC, "?/c2"), ("?/c2", _SUBC, "?/c1")],
        "body": [("?/c1", _EQC, "?/c2")],
    },
    {
        "name": "cax-eqp1",
        "head": [("?/p1", _SUBP, "?/p2"), ("?/p2", _SUBP, "?/p1")],
        "body": [("?/p1", _EQP, "?/p2")],
    },
    # ---- round-3 widening toward Jena's :owl level (OWL 2 RL tables 4-6;
    # VERDICT r2 Missing #2). Each rule name matches its OWL 2 RL rule id.
    {
        # FunctionalProperty: two objects of one (s,p) are the same node.
        # prp-fp applies to any non-literal objects — blank nodes included
        # (ADVICE r3: an IRI-only guard silently under-entailed sameAs
        # between bnode objects); only literals are excluded (owl:sameAs
        # between literals is outside OWL 2 RL's prp-fp production).
        "name": "prp-fp",
        "head": [("?/y1", _SAME, "?/y2")],
        "body": [
            ("?/p", _TYPE, f"<{OWL}FunctionalProperty>"),
            ("?/x", "?/p", "?/y1"),
            ("?/x", "?/p", "?/y2"),
            ("!", (":isLiteral", "?/y1")),
            ("!", (":isLiteral", "?/y2")),
            ("!", ("=", "?/y1", "?/y2")),
        ],
    },
    {
        # InverseFunctionalProperty: two subjects sharing (p,o) are the same
        "name": "prp-ifp",
        "head": [("?/x1", _SAME, "?/x2")],
        "body": [
            ("?/p", _TYPE, f"<{OWL}InverseFunctionalProperty>"),
            ("?/x1", "?/p", "?/y"),
            ("?/x2", "?/p", "?/y"),
            ("!", ("=", "?/x1", "?/x2")),
        ],
    },
    {
        # maxCardinality 1 on a used property: two fillers of one (u,p)
        # are the same node (OWL 2 RL cls-maxc2; VERDICT r4 stretch #7).
        # The =1 case is a PAIRWISE join — same shape as prp-fp, no
        # mid-fixpoint per-(u,p) group count needed (that problem only
        # exists for general max-N); the cardinality matches through the
        # value-space '=' filter so every lexical/datatype spelling of 1
        # ("1"^^xsd:nonNegativeInteger, "1"^^xsd:int, 1) triggers.
        # Literal fillers stay excluded like prp-fp; maxCardinality 0
        # (cls-maxc1) signals inconsistency and stays excluded with cax-dw.
        "name": "cls-maxc2",
        "head": [("?/y1", _SAME, "?/y2")],
        "body": [
            ("?/c", f"<{OWL}maxCardinality>", "?/n"),
            ("=", "?/n", 1),
            ("?/c", f"<{OWL}onProperty>", "?/p"),
            ("?/u", _TYPE, "?/c"),
            ("?/u", "?/p", "?/y1"),
            ("?/u", "?/p", "?/y2"),
            ("!", (":isLiteral", "?/y1")),
            ("!", (":isLiteral", "?/y2")),
            ("!", ("=", "?/y1", "?/y2")),
        ],
    },
    {
        # sameAs on a PREDICATE rewrites the property position too
        "name": "eq-rep-p",
        "head": [("?/s", "?/p2", "?/o")],
        "body": [("?/p", _SAME, "?/p2"), ("?/s", "?/p", "?/o")],
    },
    {
        # mutual subsumption back to equivalence (schema closure)
        "name": "scm-eqc2",
        "head": [("?/c1", _EQC, "?/c2")],
        "body": [("?/c1", _SUBC, "?/c2"), ("?/c2", _SUBC, "?/c1")],
    },
    {
        # hasValue restriction, instance direction: x:R -> x p v
        "name": "cls-hv1",
        "head": [("?/x", "?/p", "?/v")],
        "body": [
            ("?/r", f"<{OWL}hasValue>", "?/v"),
            ("?/r", f"<{OWL}onProperty>", "?/p"),
            ("?/x", _TYPE, "?/r"),
        ],
    },
    {
        # hasValue restriction, class direction: x p v -> x:R
        "name": "cls-hv2",
        "head": [("?/x", _TYPE, "?/r")],
        "body": [
            ("?/r", f"<{OWL}hasValue>", "?/v"),
            ("?/r", f"<{OWL}onProperty>", "?/p"),
            ("?/x", "?/p", "?/v"),
        ],
    },
    {
        # someValuesFrom: x p y, y:D -> x:R
        "name": "cls-svf1",
        "head": [("?/x", _TYPE, "?/r")],
        "body": [
            ("?/r", f"<{OWL}someValuesFrom>", "?/d"),
            ("?/r", f"<{OWL}onProperty>", "?/p"),
            ("?/x", "?/p", "?/y"),
            ("?/y", _TYPE, "?/d"),
        ],
    },
    {
        # schema closure (r4, OWL 2 RL table 9): domain widens through
        # subClassOf — p domain c1, c1 subClassOf c2 => p domain c2
        "name": "scm-dom1",
        "head": [("?/p", _DOM, "?/c2")],
        "body": [("?/p", _DOM, "?/c1"), ("?/c1", _SUBC, "?/c2")],
    },
    {
        # domain inherits down subPropertyOf — p2 subPropertyOf p, p domain c
        "name": "scm-dom2",
        "head": [("?/p2", _DOM, "?/c")],
        "body": [("?/p", _DOM, "?/c"), ("?/p2", _SUBP, "?/p")],
    },
    {
        "name": "scm-rng1",
        "head": [("?/p", _RANGE, "?/c2")],
        "body": [("?/p", _RANGE, "?/c1"), ("?/c1", _SUBC, "?/c2")],
    },
    {
        "name": "scm-rng2",
        "head": [("?/p2", _RANGE, "?/c")],
        "body": [("?/p", _RANGE, "?/c"), ("?/p2", _SUBP, "?/p")],
    },
    {
        # allValuesFrom: x:R, x p y -> y:D
        "name": "cls-avf",
        "head": [("?/y", _TYPE, "?/d")],
        "body": [
            ("?/r", f"<{OWL}allValuesFrom>", "?/d"),
            ("?/r", f"<{OWL}onProperty>", "?/p"),
            ("?/x", _TYPE, "?/r"),
            ("?/x", "?/p", "?/y"),
        ],
    },
]


# ---- RDF-list-based rules (round 4): variable-arity class expressions and
# property chains cannot be fixed-arity horn bodies, so they are `derive`
# rules — callables the fixpoint treats like any other rule (rules.py).
# All of them read T-box-sized data (rdf:first/rdf:rest structures exist
# only in ontology schema, never in instance data), so the list walk is a
# handful of joins over a predicate-pruned scan; the instance-side joins
# are ordinary equi-joins that shuffle on the class/property key.

def _triple_rows(df, s_kind, s, p, o_kind, o, rule):
    """Project join results to the triple schema (IRI/bnode objects only —
    every list rule derives type/property links between nodes)."""
    from pyspark.sql import functions as F

    return df.select(
        s_kind.alias("s_kind"),
        s.alias("s"),
        p.alias("p"),
        o_kind.alias("o_kind"),
        o.alias("o"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(None).cast("string").alias("o_datatype"),
        F.lit(None).cast("decimal(38,9)").alias("num_val"),
        F.lit(None).cast("string").alias("graph"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.lit(rule).alias("rule_id"),
    )


def _list_members(kb):
    """member(lst, elem): elem appears (at any position) in the RDF list
    headed at lst — and at every suffix node, which the class-expression
    rules never reference, so the extra rows are inert. Semi-naive walk
    over rdf:rest edges: depth = longest list; raises on >64 (or a cycle).
    Returns None when the KB has no lists (fast predicate-pruned check)."""
    from pyspark.sql import functions as F

    df = kb.df()
    first = df.filter(F.col("p") == f"{RDF}first").select(
        F.col("s").alias("lst"),
        F.col("o_kind").alias("e_kind"),
        F.col("o").alias("e"),
    )
    if first.isEmpty():
        return None
    rest = df.filter(F.col("p") == f"{RDF}rest").select(
        F.col("s").alias("l2"), F.col("o").alias("nxt")
    )
    member = first
    frontier = first
    for _ in range(64):
        step = (
            rest.join(frontier, rest["nxt"] == frontier["lst"], "inner")
            .select(F.col("l2").alias("lst"), "e_kind", "e")
        )
        if step.isEmpty():
            return member.distinct()
        member = member.unionByName(step)
        frontier = step
    raise RuntimeError("RDF list longer than 64 elements (or cyclic rdf:rest)")


def _schema_pairs(kb, pred: str, a: str = "cls", b: str = "lst0"):
    from pyspark.sql import functions as F

    return kb.df().filter(F.col("p") == pred).select(
        F.col("s_kind").alias(f"{a}_kind"), F.col("s").alias(a), F.col("o").alias(b)
    )


def _type_facts(kb):
    from pyspark.sql import functions as F

    return kb.df().filter(F.col("p") == f"{RDF}type").select(
        F.col("s_kind").alias("x_kind"), F.col("s").alias("x"), F.col("o").alias("xc")
    )


def _derive_cls_oo(kb):
    """cls-oo: c owl:oneOf (e1 .. en) => ei rdf:type c (literal members are
    data-range enumerations — no type triples for those)."""
    from pyspark.sql import functions as F

    m = _list_members(kb)
    if m is None:
        return None
    oneof = _schema_pairs(kb, f"{OWL}oneOf")
    if oneof.isEmpty():
        return None
    j = oneof.join(m, m["lst"] == oneof["lst0"], "inner").filter(
        F.col("e_kind") != "literal"
    )
    return _triple_rows(
        j, F.col("e_kind"), F.col("e"), F.lit(f"{RDF}type"),
        F.col("cls_kind"), F.col("cls"), "cls-oo",
    )


def _derive_cls_uni(kb):
    """cls-uni: c owl:unionOf (c1 .. cn), x type ci => x type c."""
    from pyspark.sql import functions as F

    m = _list_members(kb)
    if m is None:
        return None
    uni = _schema_pairs(kb, f"{OWL}unionOf")
    if uni.isEmpty():
        return None
    classes = uni.join(m, m["lst"] == uni["lst0"], "inner").select(
        "cls_kind", "cls", F.col("e").alias("ci")
    )
    j = _type_facts(kb).join(classes, F.col("xc") == F.col("ci"), "inner")
    return _triple_rows(
        j, F.col("x_kind"), F.col("x"), F.lit(f"{RDF}type"),
        F.col("cls_kind"), F.col("cls"), "cls-uni",
    )


def _derive_cls_int2(kb):
    """cls-int2: c owl:intersectionOf (c1 .. cn), x type c => x type ci."""
    from pyspark.sql import functions as F

    m = _list_members(kb)
    if m is None:
        return None
    inter = _schema_pairs(kb, f"{OWL}intersectionOf")
    if inter.isEmpty():
        return None
    classes = inter.join(m, m["lst"] == inter["lst0"], "inner").select(
        "cls", F.col("e_kind").alias("ci_kind"), F.col("e").alias("ci")
    )
    j = _type_facts(kb).join(classes, F.col("xc") == F.col("cls"), "inner")
    return _triple_rows(
        j, F.col("x_kind"), F.col("x"), F.lit(f"{RDF}type"),
        F.col("ci_kind"), F.col("ci"), "cls-int2",
    )


def _derive_cls_int1(kb):
    """cls-int1: c owl:intersectionOf (c1 .. cn), x type EVERY ci => x type
    c. Not horn (a universally-quantified body): matched-distinct-class
    count per (x, c) must equal the list's distinct length — one groupBy on
    (x, c) after the membership join, partial-agg friendly."""
    from pyspark.sql import functions as F

    m = _list_members(kb)
    if m is None:
        return None
    inter = _schema_pairs(kb, f"{OWL}intersectionOf")
    if inter.isEmpty():
        return None
    classes = inter.join(m, m["lst"] == inter["lst0"], "inner").select(
        "cls_kind", "cls", F.col("lst0").alias("lref"), F.col("e").alias("ci")
    )
    sizes = classes.groupBy("lref").agg(F.countDistinct("ci").alias("need"))
    matched = _type_facts(kb).join(classes, F.col("xc") == F.col("ci"), "inner")
    got = matched.groupBy("x_kind", "x", "cls_kind", "cls", "lref").agg(
        F.countDistinct("ci").alias("got")
    )
    j = got.join(sizes, on="lref", how="inner").filter(F.col("got") == F.col("need"))
    return _triple_rows(
        j, F.col("x_kind"), F.col("x"), F.lit(f"{RDF}type"),
        F.col("cls_kind"), F.col("cls"), "cls-int1",
    )


def _derive_prp_spo2(kb):
    """prp-spo2: p owl:propertyChainAxiom (p1 .. pn), x p1·..·pn z => x p z.
    Chain axioms are T-box: the ordered property lists are reconstructed
    driver-side from a predicate-pruned collect (capped — a chain table
    beyond 10k rows means instance data leaked into rdf:first/rest), then
    each chain compiles to n-1 equi-joins over per-predicate pruned scans."""
    from pyspark.sql import functions as F

    df = kb.df()
    axioms = (
        df.filter(F.col("p") == f"{OWL}propertyChainAxiom")
        .select("s", "o")
        .collect()
    )
    if not axioms:
        return None
    cells = (
        df.filter(F.col("p").isin(f"{RDF}first", f"{RDF}rest"))
        .select("s", "p", "o")
        .limit(10_001)
        .collect()
    )
    if len(cells) > 10_000:
        raise RuntimeError(
            "rdf:first/rdf:rest exceeds the 10k T-box cap; property-chain "
            "reconstruction expects schema-sized lists"
        )
    firsts = {r["s"]: r["o"] for r in cells if r["p"] == f"{RDF}first"}
    rests = {r["s"]: r["o"] for r in cells if r["p"] == f"{RDF}rest"}
    out = None
    for ax in axioms:
        chain, node, seen = [], ax["o"], set()
        while node in firsts and node not in seen:
            seen.add(node)
            chain.append(firsts[node])
            node = rests.get(node, "")
        if len(chain) < 2:
            continue  # degenerate / broken list
        cur = df.filter(F.col("p") == chain[0]).select(
            F.col("s_kind").alias("x_kind"), F.col("s").alias("x"),
            F.col("o_kind").alias("z_kind"), F.col("o").alias("z"),
        )
        for pi in chain[1:]:
            nxt = df.filter(F.col("p") == pi).select(
                F.col("s").alias("mid"),
                F.col("o_kind").alias("nz_kind"), F.col("o").alias("nz"),
            )
            cur = (
                cur.filter(F.col("z_kind") != "literal")
                .join(nxt, F.col("z") == F.col("mid"), "inner")
                .select(
                    "x_kind", "x",
                    F.col("nz_kind").alias("z_kind"), F.col("nz").alias("z"),
                )
            )
        # OWL 2 restricts chains to object properties: node endpoints only
        head = _triple_rows(
            cur.filter(F.col("z_kind") != "literal"),
            F.col("x_kind"), F.col("x"), F.lit(ax["s"]),
            F.col("z_kind"), F.col("z"), "prp-spo2",
        )
        out = head if out is None else out.unionByName(head)
    return out


OWL_LIST_RULES: list[dict] = [
    {"name": "cls-oo", "derive": _derive_cls_oo},
    {"name": "cls-uni", "derive": _derive_cls_uni},
    {"name": "cls-int1", "derive": _derive_cls_int1},
    {"name": "cls-int2", "derive": _derive_cls_int2},
    {"name": "prp-spo2", "derive": _derive_prp_spo2},
]


def entailment_rules(level: str) -> list[dict]:
    level = level.lower().lstrip(":")
    if level == "rdfs":
        return list(RDFS_RULES)
    if level in ("owl", "owl-rl", "owlrl"):
        return list(RDFS_RULES) + list(OWL_RL_RULES) + list(OWL_LIST_RULES)
    raise ValueError(f"unknown inference level {level!r} (rdfs | owl)")


def materialize_entailments(kb, level: str = "rdfs", max_rounds: int = 30) -> int:
    """Run the level's rule set to fixpoint on the KB; returns rounds used.
    Idempotent (set-semantics adds), so calling again after new ground facts
    arrive is the incremental-maintenance path."""
    from kr_spark.operators.rules import run_rules_to_fixpoint

    return run_rules_to_fixpoint(kb, entailment_rules(level), max_rounds=max_rounds)
