"""Forward-chaining rules — the KG-construction operator (SURVEY §2.8).

Reference lifecycle (forward_rule.clj:242-259): query the body, mint reified
vars per binding in dependency order, substitute into head templates, add!
each triple. Spark lifecycle: ONE job per rule —
  body plan (BGP self-joins) -> withColumn minted ids (topo order, pure
  column exprs) -> m head projections unioned (CONSTRUCT) -> set-semantics
  append (left-anti dedup).
No per-binding loop, no driver round-trips; the whole rule is shuffle-bounded.

Rule spec (kr rule.clj:20-25):
  {"name": str, "head": [templates], "body": [clauses],
   "reify": [reify specs — see operators/reify.py]}
"""

from __future__ import annotations

from graphlib import CycleError, TopologicalSorter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kr_spark.operators.reify import (
    apply_reify,
    normalize_reify_spec,
    reify_arg_deps,
)
from kr_spark.terms import KIND_BNODE, KIND_VAR


class RuleError(ValueError):
    pass


def _vars_in(kb, tree) -> set[str]:
    out: set[str] = set()
    if isinstance(tree, (list, tuple)):
        for x in tree:
            out |= _vars_in(kb, x)
        return out
    if isinstance(tree, str) and tree.startswith("?/"):
        out.add(tree[2:])
    return out


def head_vars(kb, rule) -> set[str]:
    return _vars_in(kb, rule["head"])


def body_vars(kb, rule) -> set[str]:
    return _vars_in(kb, rule["body"])


def reify_vars(rule) -> set[str]:
    out = set()
    for spec in rule.get("reify", []):
        s = normalize_reify_spec(spec)
        v = s["var"]
        out.add(v[2:] if v.startswith("?/") else v)
    return out


# ---- safety checks (K3; rule.clj:80-115, forward_rule.clj:41-80) ----


def forward_safe(kb, rule) -> bool:
    """All head vars appear in the body (rule.clj:80-115)."""
    return head_vars(kb, rule) <= body_vars(kb, rule)


def all_reify_vars_in_head(kb, rule) -> bool:
    return reify_vars(rule) <= head_vars(kb, rule)


def forward_safe_with_reification(kb, rule) -> bool:
    """Head vars covered by body+reify AND reify vars used in head
    (forward_rule.clj:41-80; bad-rule-7 fails both)."""
    hv, bv, rv = head_vars(kb, rule), body_vars(kb, rule), reify_vars(rule)
    return hv <= (bv | rv) and rv <= hv


def connected_rule(kb, rule) -> bool:
    """Body clauses form one variable-connected component — no cartesian
    products (assertion.clj:140-141 via cluster-assertions semantics)."""
    clause_vars = [
        _vars_in(kb, c) for c in rule["body"] if _vars_in(kb, c)
    ]
    if len(clause_vars) <= 1:
        return True
    comp = clause_vars[0]
    rest = clause_vars[1:]
    changed = True
    while changed and rest:
        changed = False
        for cv in list(rest):
            if cv & comp:
                comp |= cv
                rest.remove(cv)
                changed = True
    return not rest


def topo_sorted_reify(rule) -> list[dict]:
    """Reify specs in dependency order; cycle -> exception (K2,
    forward_rule.clj:191-210; cycle test test_forward_rule.clj:425-426)."""
    specs = [normalize_reify_spec(s) for s in rule.get("reify", [])]
    by_var = {}
    for s in specs:
        v = s["var"]
        by_var[v[2:] if v.startswith("?/") else v] = s
    graph = {}
    for name, s in by_var.items():
        graph[name] = [d for d in reify_arg_deps(s) if d in by_var]
    try:
        order = list(TopologicalSorter(graph).static_order())
    except CycleError as e:
        raise RuleError(f"cycle in reification dependencies: {e}") from e
    return [by_var[n] for n in order]


# ---- execution (K1, K4, K7) ----


def rule_head_df(kb, rule) -> DataFrame:
    """Pure version: the instantiated head triples as a DataFrame
    (apply-horn-rule, rule.clj:151-165) — no store mutation."""
    from kr_spark.plans.compiler import compile_construct, compile_pattern

    if not forward_safe_with_reification(kb, rule) and not forward_safe(kb, rule):
        raise RuleError(f"rule {rule.get('name')} is not forward-safe")
    if not connected_rule(kb, rule):
        raise RuleError(f"rule {rule.get('name')} has a disconnected (cartesian) body")

    specs = topo_sorted_reify(rule)
    plan = compile_pattern(kb, rule["body"])
    pv = set(plan.all_vars)
    for spec in specs:
        plan.df, name = apply_reify(kb, plan.df, spec, pv)
        if name not in pv:
            pv.add(name)
            plan.all_vars.append(name)

    df = _construct_from_plan(kb, plan, rule["head"])
    rule_id = rule.get("name")
    if rule_id:
        df = df.withColumn("rule_id", F.lit(rule_id))
    return df


def _construct_from_plan(kb, plan, templates) -> DataFrame:
    from kr_spark.plans.compiler import _project_template

    outs = [_project_template(kb, plan, t) for t in templates]
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o)
    return df


def run_forward_rule(kb, rule, target) -> int:
    """Materialize: derive heads and append to target with set semantics
    (K1, forward_rule.clj:242-259). Returns number of NEW triples."""
    derived = rule_head_df(kb, rule)
    before = target.size()
    target.add_rows(derived)
    return target.size() - before


def ask_forward_rule(kb, rule) -> bool:
    """Would the rule fire? (K7, forward_rule.clj:262-272)"""
    from kr_spark.plans.compiler import compile_pattern

    return not compile_pattern(kb, rule["body"]).df.isEmpty()


def count_forward_rule(kb, rule) -> int:
    from kr_spark.plans.compiler import compile_pattern

    return compile_pattern(kb, rule["body"]).df.count()


def run_rules_to_fixpoint(kb, rules: list[dict], max_rounds: int = 25) -> int:
    """RDFS-style entailment as forward rules run to fixpoint (K9 stance:
    we do NOT embed an OWL reasoner; entailment rules are ordinary forward
    rules iterated until no rule adds a triple — SURVEY §2.8 K9).

    All rules of a round derive against the round-start KB and land as ONE
    batched set-semantics add (3 Spark actions per round instead of 3 per
    rule per round — with entailment-sized rule sets that is the difference
    between seconds and minutes). Same fixpoint as rule-at-a-time: a rule
    seeing a same-round derivation one round later only delays, never
    changes, the monotone closure."""
    total = 0
    for _ in range(max_rounds):
        derived = None
        for r in rules:
            # a rule may carry `derive`: a callable (kb) -> triple-schema
            # DataFrame, for entailments a fixed-arity horn body cannot
            # express (RDF-list class expressions, property chains —
            # entailment.py OWL_LIST_RULES). It must be monotone over the
            # KB like any horn rule; the fixpoint treats it identically.
            if "derive" in r:
                head = r["derive"](kb)
                if head is None:
                    continue
            else:
                head = rule_head_df(kb, r)
            derived = head if derived is None else derived.unionByName(head)
        if derived is None:
            return total
        before = kb.size()
        kb.add_rows(derived)
        added = kb.size() - before
        total += added
        if added == 0:
            return total
    raise RuntimeError(f"rule fixpoint did not converge in {max_rounds} rounds")


def apply_post_processing_rule(kb, rule, fn, schema: str):
    """K5 (rule.clj:168-181): visit body bindings, run an arbitrary transform
    — vectorized via mapInPandas over the body plan (Arrow batches)."""
    from kr_spark.plans.compiler import compile_pattern

    plan = compile_pattern(kb, rule["body"])
    flat = plan.df.select(
        *[F.col(v)["v"].alias(v) for v in plan.visible_vars]
    )
    return flat.mapInPandas(fn, schema=schema)
