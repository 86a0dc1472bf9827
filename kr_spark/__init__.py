"""kr_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Plays the role of drlivingston/kr's RDF triple layer (see SURVEY.md): a triple
data model over one big DataFrame, SPARQL-style basic-graph-pattern queries
re-expressed as DataFrame self-joins, a forward-chaining rule engine with
deterministic skolemization, and a transcript->KG pipeline (extraction,
entity linking, canonicalization, materialization) built Spark-first.

This is NOT a port: the reference (Clojure over Jena/Sesame) compiles
s-expressions to SPARQL strings and delegates execution to a Java store
(kr-core/src/main/clojure/edu/ucdenver/ccp/kr/sparql.clj:398-410). Here the
pattern language compiles directly to Catalyst logical plans.
"""

from kr_spark.terms import Term, uri, bnode, var, literal, typed_literal
from kr_spark.namespaces import NamespaceRegistry, DEFAULT_NAMESPACES
from kr_spark.kb import KB

__all__ = [
    "Term",
    "uri",
    "bnode",
    "var",
    "literal",
    "typed_literal",
    "NamespaceRegistry",
    "DEFAULT_NAMESPACES",
    "KB",
]
