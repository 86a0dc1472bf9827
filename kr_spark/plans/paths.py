"""Property paths (SURVEY §2.6; sparql.clj:130-199) as pair-relation algebra.

A path element compiles to a DataFrame of (src, dst) term-struct pairs:
  "p"                base: scan triples with predicate p
  ["p", '*'/'+'/'?'] zero-or-more / one-or-more / zero-or-one
  ["p", n] / ["p", n, m] / ["p", None, m] / ["p", n, None]   bounded repeats
  ("p1","p2")        sequence p1/p2 (join dst->src)
  (':or',"p1","p2")  alternation (union)
  (':inverse',"p")   ^p (swap src/dst)
(kr encodes these as Clojure vectors/lists — sparql.clj:144-187; Python
lists play the vector role, tuples the list role.)

Zero-length semantics: `p*`/`p?` bind a node to ITSELF for every term in the
graph — (ex/a [knows *] ?x) returns a, b, c INCLUDING a
(test_sparql_property_paths.clj:61-63) — so the zero-step relation is the
identity over all subject/object terms of the (graph-scoped) store.

`+`/`*` run the shared semi-naive fixpoint (plans/fixpoint.py) with
per-iteration localCheckpoint; bounded forms unroll to at most m joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kr_spark.plans.fixpoint import transitive_closure
from kr_spark.terms import KIND_BNODE, KIND_VAR

_STRUCT = "struct<kind:string,v:string,lang:string,dt:string>"


def _scoped(kb, graph_scope):
    df = kb.df()
    if graph_scope is not None:
        df = df.filter(F.col("graph") == kb.term(graph_scope).v)
    return df


def _base_pairs(kb, pred, graph_scope) -> DataFrame:
    t = kb.term(pred)
    df = _scoped(kb, graph_scope).filter(F.col("p") == t.v)
    return df.select(
        F.struct(
            F.col("s_kind").alias("kind"),
            F.col("s").alias("v"),
            F.lit("").alias("lang"),
            F.lit("").alias("dt"),
        ).alias("src"),
        F.struct(
            F.col("o_kind").alias("kind"),
            F.col("o").alias("v"),
            F.coalesce(F.col("o_lang"), F.lit("")).alias("lang"),
            F.coalesce(F.col("o_datatype"), F.lit("")).alias("dt"),
        ).alias("dst"),
    )


def _graph_nodes(kb, graph_scope) -> DataFrame:
    """All terms occurring as subject or object — the zero-length domain."""
    df = _scoped(kb, graph_scope)
    subs = df.select(
        F.struct(
            F.col("s_kind").alias("kind"),
            F.col("s").alias("v"),
            F.lit("").alias("lang"),
            F.lit("").alias("dt"),
        ).alias("node")
    )
    objs = df.select(
        F.struct(
            F.col("o_kind").alias("kind"),
            F.col("o").alias("v"),
            F.coalesce(F.col("o_lang"), F.lit("")).alias("lang"),
            F.coalesce(F.col("o_datatype"), F.lit("")).alias("dt"),
        ).alias("node")
    )
    return subs.union(objs).distinct()


def _identity_pairs(kb, graph_scope) -> DataFrame:
    n = _graph_nodes(kb, graph_scope)
    return n.select(F.col("node").alias("src"), F.col("node").alias("dst"))


def _seq_join(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.alias("l")
        .join(b.alias("r"), F.col("l.dst") == F.col("r.src"))
        .select(F.col("l.src").alias("src"), F.col("r.dst").alias("dst"))
    )


def compile_path_element(kb, spec, graph_scope) -> DataFrame:
    if isinstance(spec, str) or not isinstance(spec, (list, tuple)):
        return _base_pairs(kb, spec, graph_scope)

    if isinstance(spec, list):
        # modifier vector (sparql.clj:144-165)
        inner = compile_path_element(kb, spec[0], graph_scope)
        mods = spec[1:]
        if len(mods) == 1 and mods[0] == "*":
            return transitive_closure(inner).union(
                _identity_pairs(kb, graph_scope)
            ).dropDuplicates(["src", "dst"])
        if len(mods) == 1 and mods[0] == "+":
            return transitive_closure(inner)
        if len(mods) == 1 and mods[0] == "?":
            return inner.union(_identity_pairs(kb, graph_scope)).dropDuplicates(
                ["src", "dst"]
            )
        # numeric bounds [p n] / [p n m] / [p None m] / [p n None]
        # (number-path-element, sparql.clj:148-157)
        if len(mods) == 1:
            n = int(mods[0])
            return _repeat_exact(kb, inner, n, graph_scope)
        n, m = mods[0], mods[1]
        if n is None and m is None:
            return transitive_closure(inner).union(
                _identity_pairs(kb, graph_scope)
            ).dropDuplicates(["src", "dst"])
        if m is None:  # p{n,} = p{n} / p*
            star = transitive_closure(inner).union(
                _identity_pairs(kb, graph_scope)
            ).dropDuplicates(["src", "dst"])
            return _seq_join(_repeat_exact(kb, inner, int(n), graph_scope), star).dropDuplicates(["src", "dst"])
        n = 0 if n is None else int(n)
        outs = [_repeat_exact(kb, inner, k, graph_scope) for k in range(n, int(m) + 1)]
        df = outs[0]
        for o in outs[1:]:
            df = df.union(o)
        return df.dropDuplicates(["src", "dst"])

    # combinator tuple (sparql.clj:167-187)
    head = spec[0]
    if head == ":or":
        outs = [compile_path_element(kb, s, graph_scope) for s in spec[1:]]
        df = outs[0]
        for o in outs[1:]:
            df = df.union(o)
        return df.dropDuplicates(["src", "dst"])
    if head == ":inverse":
        inner = compile_path_element(kb, spec[1], graph_scope)
        return inner.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    # sequence
    outs = [compile_path_element(kb, s, graph_scope) for s in spec]
    df = outs[0]
    for o in outs[1:]:
        df = _seq_join(df, o)
    return df


def _repeat_exact(kb, pairs: DataFrame, n: int, graph_scope) -> DataFrame:
    if n == 0:
        return _identity_pairs(kb, graph_scope)
    df = pairs
    for _ in range(n - 1):
        df = _seq_join(df, pairs)
    return df


def compile_path_pattern(kb, s, spec, o, graph_scope):
    """A triple pattern whose predicate is a path spec -> CompiledPattern."""
    from kr_spark.plans.compiler import CompiledPattern, term_struct_lit

    pairs = compile_path_element(kb, spec, graph_scope)

    all_vars: list[str] = []
    visible: list[str] = []
    sel = []

    st = kb.term(s)
    ot = kb.term(o)
    if st.kind in (KIND_VAR, KIND_BNODE):
        all_vars.append(st.v)
        if st.kind == KIND_VAR:
            visible.append(st.v)
        sel.append(F.col("src").alias(st.v))
    else:
        pairs = pairs.filter(F.col("src") == term_struct_lit(st))
    if ot.kind in (KIND_VAR, KIND_BNODE):
        if ot.v in all_vars:  # (?x path ?x)
            pairs = pairs.filter(F.col("src") == F.col("dst"))
        else:
            all_vars.append(ot.v)
            if ot.kind == KIND_VAR:
                visible.append(ot.v)
            sel.append(F.col("dst").alias(ot.v))
    else:
        pairs = pairs.filter(F.col("dst") == term_struct_lit(ot))

    out = pairs.select(*sel) if sel else pairs.select(F.lit(1).alias("__one"))
    return CompiledPattern(out, all_vars, visible)
