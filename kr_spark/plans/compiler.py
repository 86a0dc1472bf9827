"""Pattern compiler: kr-style query s-expressions -> DataFrame plans.

The reference compiles patterns to SPARQL strings and hands them to Jena/
Sesame (kr-core/.../sparql.clj:398-410 dispatch; :220-233 triple; :235-244
union/optional; :394-395 filter). Here each clause compiles directly to a
Catalyst logical plan:

  triple pattern  -> filtered scan of the triple table, variables projected
                     as struct<kind,v,lang,dt> columns
  conjunction     -> inner self-joins on shared variable columns (Q1)
  :optional       -> left outer join (Q10, sparql.clj:241-244)
  :union          -> unionByName(allowMissingColumns) (Q11, sparql.clj:235-239)
  filter clause   -> Column predicate (F1-F9, sparql.clj:298-363)
  property path   -> pairs-DataFrame composition / fixpoint (P1-P8)

Pattern surface syntax (Python):
  clause forms
    (s, p, o) / (s, p, o, g)      triple/quad pattern; p may be a path spec
    (':optional', [clauses...])   OPTIONAL
    (':union', [clauses...], [clauses...], ...)   UNION
    (op, args...)                 FILTER when op is a known operator keyword
    [clauses...]                  nested group (first element is a clause)
  path specs (predicate position) — kr vector=modifier, list=combinator
  (sparql.clj:130-199); here Python list=modifier, tuple=combinator:
    ["p", '*'] / ["p", '+'] / ["p", '?'] / ["p", n] / ["p", n, m]
    ("p1", "p2")                  sequence p1/p2
    (':or', "p1", "p2")           alternation
    (':inverse', "p")             ^p

Scale notes: each triple-pattern scan pushes constant-slot filters into the
parquet scan (PushedFilters); join order uses a boundness heuristic (most
selective first — the reference delegates this to ARQ, SURVEY §4.3.1); small
highly-filtered pattern scans typically go broadcast under AQE. No Python
runs executor-side anywhere in this module — pure Catalyst plans.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kr_spark.terms import KIND_BNODE, KIND_LITERAL, KIND_VAR, Term
from kr_spark.plans.filters import FILTER_OPS, compile_filter_expr, compile_value_expr

_uid = itertools.count()


@dataclass
class CompiledPattern:
    df: DataFrame
    all_vars: list[str] = field(default_factory=list)
    # bnodes in patterns are non-capturing variables (sparql.clj:73-77):
    # they join like variables but are excluded from SELECT results.
    visible_vars: list[str] = field(default_factory=list)
    # vars whose column may be NULL (= unbound in that solution): bound in
    # only some UNION branches, inside an OPTIONAL, a VALUES UNDEF cell, or
    # a subquery projection that is not unconditionally bound. SPARQL's
    # compatibility join (§18.3 'compatible mappings') lets an unbound var
    # match anything, and the merged solution takes the bound side — a
    # strict equi-join is only correct for vars NOT in this set. Tracking
    # the set keeps the common case (definitely-bound vars) on hash-join
    # equi keys; maybe-null vars contribute a null-tolerant residual
    # conjunct instead (Catalyst still extracts the equi keys, so the join
    # stays a hash/sort-merge join whenever at least one strict key exists).
    maybe_null: set[str] = field(default_factory=set)


def _var_struct(kind_col, v_col, lang_col=None, dt_col=None):
    return F.struct(
        kind_col.alias("kind"),
        v_col.alias("v"),
        (lang_col if lang_col is not None else F.lit("")).alias("lang"),
        (dt_col if dt_col is not None else F.lit("")).alias("dt"),
    )


def term_struct_lit(t: Term):
    """A constant term as a struct literal (for filters/templates)."""
    return _var_struct(F.lit(t.kind), F.lit(t.v), F.lit(t.lang), F.lit(t.dt))


def _is_clause_list(x) -> bool:
    return isinstance(x, (list, tuple)) and len(x) > 0 and isinstance(x[0], (list, tuple, str))


def _classify(kb, clause):
    """-> ('filter'|'optional'|'union'|'triple'|'group', payload)"""
    if not isinstance(clause, (list, tuple)) or not clause:
        raise ValueError(f"bad clause {clause!r}")
    head = clause[0]
    if isinstance(head, str):
        if head == ":optional":
            return "optional", clause[1:]
        if head == ":union":
            return "union", clause[1:]
        if head == ":minus":
            return "minus", clause[1:]
        if head == ":exists":
            return "exists", clause[1:]
        if head == ":not-exists":
            return "not-exists", clause[1:]
        if head == ":bind":
            return "bind", clause[1:]  # (expr, var)
        if head == ":values":
            return "values", clause[1:]  # (vars, rows)
        if head == ":subquery":
            return "subquery", clause[1]  # parsed SELECT dict
        if head in FILTER_OPS:
            return "filter", clause
    if isinstance(head, (list, tuple)) and not _looks_like_term_box(head):
        # nested group: first element is itself a clause
        return "group", clause
    if len(clause) in (3, 4):
        return "triple", clause
    raise ValueError(f"unrecognized clause {clause!r}")


def _looks_like_term_box(x) -> bool:
    """A boxed literal like ["Bob","en"] / [40,"xsd/integer"] — these can only
    appear in term position, and their head is not a clause. A 1-2 element
    tuple whose OWN head is an operator keyword is a filter clause, not a
    box (a nested group holding a single short filter, e.g.
    ((':bound','?/w'),), must classify as a group — round-5 fuzzer)."""
    return (
        isinstance(x, (list, tuple))
        and 1 <= len(x) <= 2
        and not any(isinstance(e, (list, tuple)) for e in x)
        and not (x and isinstance(x[0], str) and x[0] in FILTER_OPS)
    )


def compile_pattern(
    kb,
    clauses,
    graph_scope: str | None = None,
    params: CompiledPattern | None = None,
) -> CompiledPattern:
    """Compile a clause list to a plan. graph_scope: None = all graphs
    (quad-store union semantics, matching reference visibility in
    test_rdf.clj:129-153); a URI = only that named graph.

    params: correlated parameter bindings for EXISTS substitution semantics
    (SPARQL 1.1 §8.1.1 / Jena's substitute): distinct outer bindings of vars
    the inner group references only in expressions. Joined in before BIND /
    FILTER apply so those expressions see each outer value (standard
    decorrelation — the same rewrite Catalyst uses for correlated EXISTS
    SQL subqueries it cannot push down)."""
    # Split the group into ORDERED elements (SPARQL §18.2.2.6 Translate):
    # OPTIONAL/MINUS/BIND/VALUES are positional — each applies to the group
    # accumulated SO FAR, so a triple AFTER an OPTIONAL joins the LeftJoin
    # result instead of being hoisted before it (hoisting changes answers
    # when the later triple shares a var the OPTIONAL may leave unbound).
    # Join-type elements (triples / groups / unions / subqueries) commute,
    # so consecutive RUNS of them ("seg") still reorder freely under the
    # selectivity heuristic. FILTER and FILTER [NOT] EXISTS are group-scoped
    # (§18.2.2.2) and apply once at the end, wherever they appear in text.
    elements: list[list] = []
    filters, exists_cls = [], []
    for clause in clauses:
        kind, payload = _classify(kb, clause)
        if kind == "filter":
            filters.append(payload)
        elif kind == "exists":
            exists_cls.append((True, payload))
        elif kind == "not-exists":
            exists_cls.append((False, payload))
        elif kind in ("triple", "group", "union", "subquery"):
            if elements and elements[-1][0] == "seg":
                elements[-1][1].append((kind, payload))
            else:
                elements.append(["seg", [(kind, payload)]])
        elif kind == "bind":
            # consecutive BINDs batch into one withColumns (each withColumn
            # re-analyzes the whole plan — 8 chained BINDs cost ~7 s of
            # driver time over a many-branch union; batched, one analysis)
            if elements and elements[-1][0] == "binds":
                elements[-1][1].append(payload)
            else:
                elements.append(["binds", [payload]])
        else:  # optional / minus / values
            elements.append([kind, payload])

    # Join-order heuristic (SURVEY §4.3.1): most-constant patterns first
    # (smaller intermediates; narrow scans broadcast under AQE), ties broken
    # by predicate frequency when the KB has a computed stats table
    # (kb.predicate_stats() — opt-in so compiles never trigger hidden jobs):
    # a rare-predicate scan is more selective than a hot one at equal
    # boundness, which matters most when a pattern touches rdf:type-scale
    # skew. The reference delegates all of this to ARQ.
    stats = getattr(kb, "_pred_stats", None)
    acc: CompiledPattern | None = None
    # EXISTS substitution params must be columns before any expression that
    # references them compiles (BIND, lifted OPTIONAL filters, end FILTERs).
    # Sub-plans that referenced a param already joined their narrowed copy
    # (_params_for) and equi-join here; a NULL param column (e.g. a UNION
    # branch that never referenced it) is UNDEF-compatible — that solution
    # holds for every param value, so it fans out and coalesces, exactly
    # like a VALUES UNDEF cell.
    params_pending = params is not None

    def _flush_params(a: CompiledPattern | None) -> CompiledPattern | None:
        nonlocal params_pending
        if not params_pending:
            return a
        params_pending = False
        return params if a is None else _join_params(a, params)

    def _unit() -> CompiledPattern:
        # SPARQL §18.5: eval of the empty BGP is { μ0 } — one solution, no
        # bindings. The left operand when a group STARTS with OPTIONAL /
        # MINUS / BIND, and the whole plan for `SELECT (expr AS ?v) WHERE {}`.
        return CompiledPattern(kb.spark.range(1).drop("id"), [], [])

    for element in elements:
        etype, payload = element[0], element[1]
        if etype == "seg":
            plans: list[CompiledPattern] = []
            seg_triples = [p for k, p in payload if k == "triple"]
            for tp in sorted(seg_triples, key=lambda t: _order_key(kb, t, stats)):
                plans.append(_compile_triple(kb, tp, graph_scope))
            for k, p in payload:
                if k == "group":
                    plans.append(
                        compile_pattern(kb, p, graph_scope, params=_params_for(kb, p, params))
                    )
                elif k == "union":
                    plans.append(_compile_union(kb, p, graph_scope, params=params))
                elif k == "subquery":
                    plans.append(_compile_subquery(kb, p))
            rest = plans
            if acc is None:
                acc, rest = plans[0], plans[1:]
            # greedy: always join a plan sharing variables next (avoid
            # cartesian); prefer one sharing a definitely-bound var on both
            # sides — that join runs on hash-join equi keys, while a
            # maybe-null-only share needs a null-tolerant residual condition
            while rest:
                idx = next(
                    (
                        i
                        for i, p in enumerate(rest)
                        if any(
                            v in set(acc.all_vars)
                            and v not in acc.maybe_null
                            and v not in p.maybe_null
                            for v in p.all_vars
                        )
                    ),
                    None,
                )
                if idx is None:
                    idx = next(
                        (i for i, p in enumerate(rest) if set(p.all_vars) & set(acc.all_vars)),
                        0,
                    )
                acc = _join(acc, rest.pop(idx), how="inner")
            continue

        # positional non-join op: param columns must exist before its
        # expressions compile / before LeftJoin-position semantics apply
        acc = _flush_params(acc)

        if etype == "optional":
            # (':optional', clause, ...) — payload is a clause list; the kr
            # form (:optional ((s p o))) arrives as one nested group.
            #
            # SPARQL §8.3.3 LeftJoin(A, B, F): the filter expression F of
            # the optional group evaluates over the MERGED solution, so a
            # filter referencing a var bound only OUTSIDE the group must
            # become part of the left-join condition, not a filter on the
            # standalone sub-plan (where the var is unbound -> error ->
            # false -> the optional row is wrongly dropped even when the
            # outer value would satisfy it; Jena binds it — VERDICT r3
            # 'What's wrong #1'). Filters whose refs are all bound inside
            # the group are equivalent either way and stay inside (tighter
            # pushdown into the optional side's scan).
            opt_clauses = list(payload)
            if acc is None:
                acc = _unit()
            inner_bound, _ = _pattern_var_usage(kb, opt_clauses)
            keep, lifted = [], []
            for cl in opt_clauses:
                ckind, _payload = _classify(kb, cl)
                if ckind == "filter":
                    refs: set = set()
                    _collect_expr_vars(kb, cl, refs)
                    exn: list = []
                    _find_exists_nodes(cl, exn)
                    # exists-bearing filters never lift: they need the arm
                    # split, not a join-condition expression
                    if not exn and not refs <= inner_bound:
                        lifted.append(cl)
                        continue
                keep.append(cl)
            if not any(True for cl in keep
                       if _classify(kb, cl)[0] != "filter"):
                keep, lifted = opt_clauses, []  # filter-only group: unchanged path
            sub = compile_pattern(kb, keep, graph_scope, params=_params_for(kb, keep, params))
            extra = None
            if lifted:
                avail = set(acc.all_vars) | set(sub.all_vars)
                for f in lifted:
                    # vars bound in NEITHER side compile to NULL -> condition
                    # null -> no match -> left row kept (filter-error = false)
                    c = compile_filter_expr(kb, f, None, avail)
                    extra = c if extra is None else (extra & c)
            acc = _join(acc, sub, how="left", extra_cond=extra)

        elif etype == "values":
            # VALUES (SPARQL 1.1 §10.2): inline data joined with
            # UNDEF-compatible semantics. Tiny driver-side data -> broadcast.
            vp = _compile_values(kb, *payload)
            acc = vp if acc is None else _join_values(acc, vp)

        elif etype == "binds":
            # BIND (SPARQL 1.1 §10.1): extend each solution with a computed
            # term; sees only vars bound BEFORE it in the group (positional).
            if acc is None:
                acc = _unit()
            binds = payload
            i = 0
            while i < len(binds):
                batch: dict[str, Column] = {}
                while i < len(binds):
                    expr, var = binds[i]
                    vt = kb.term(var)
                    if vt.v in acc.all_vars or vt.v in batch:
                        raise ValueError(f"BIND would rebind in-scope var ?{vt.v}")
                    if _expr_refs_any(expr, set(batch)):
                        break  # reads a var bound in this batch -> next batch
                    exn: list = []
                    _find_exists_nodes(expr, exn)
                    if exn:
                        # EXISTS inside a BIND value (§17.4.1.4): arm-split
                        # like _apply_filter — flush what's batched, then
                        # bind the residual per truth assignment
                        if batch:
                            break
                        acc = _apply_bind_exists(
                            kb, expr, vt.v, acc, graph_scope
                        )
                        i += 1
                        continue
                    batch[vt.v] = compile_value_expr(kb, expr, set(acc.all_vars))
                    i += 1
                new = list(batch)
                # BIND vars are maybe-null: an erroring expression leaves the
                # var unbound (§10.1), and exprs over maybe-null inputs
                # propagate NULL
                acc = CompiledPattern(
                    acc.df.withColumns(batch),
                    acc.all_vars + new,
                    acc.visible_vars + new,
                    acc.maybe_null | set(new),
                )

        elif etype == "minus":
            # MINUS (SPARQL 1.1 §8.3): anti-join on compatible bindings; a
            # var-disjoint MINUS removes nothing (dom-overlap condition).
            if acc is None:
                acc = _unit()
            sub = compile_pattern(kb, list(payload), graph_scope)
            acc = _apply_minus(acc, sub)

    acc = _flush_params(acc)
    if acc is None:
        acc = _unit()

    # FILTER [NOT] EXISTS (SPARQL 1.1 §8.1): semi/anti join on the shared
    # variables (unbound-left-var = compatible, per substitution semantics).
    # Outer vars the inner group references ONLY in expressions (FILTER/BIND
    # — not bound by any inner triple) need real substitution: distinct
    # outer bindings of those vars are joined into the inner plan as params
    # so its expressions see each value, and the semi/anti join matches them
    # strictly (an outer-unbound correlated var = filter error = false, so
    # EXISTS fails — Jena substitution leaves the var free and the filter
    # errors out the same way).
    for positive, cl in exists_cls:
        sub, strict = _compile_exists_inner(kb, list(cl), acc, graph_scope)
        acc = _apply_exists(acc, sub, positive, strict_vars=strict)

    for f in filters:
        acc = _apply_filter(kb, f, acc, graph_scope)
    return acc


def _compile_exists_inner(
    kb, inner: list, acc: CompiledPattern, graph_scope
) -> tuple[CompiledPattern, frozenset]:
    """Compile a FILTER [NOT] EXISTS group against the outer plan `acc`,
    returning (sub-plan, strict correlation vars).

    Unconditional bindings only (ADVICE r3): a var the inner group binds
    solely inside an OPTIONAL / in one UNION branch still takes the outer
    value by substitution where its branch leaves it unbound, so it
    param-joins like a never-bound var (the param's equi-join coalesces
    with the inner binding where that exists). Remaining known divergence,
    documented: for an outer row where such a var is ITSELF unbound, Jena
    leaves it free (the inner binding applies) while this compile treats
    the row as EXISTS-false (strict param match)."""
    bound, expr_refs = _pattern_var_usage(kb, inner, include_conditional=False)
    corr = [v for v in acc.all_vars if v in expr_refs and v not in bound]
    if corr:
        pdf = acc.df.select(*corr)
        for v in corr:  # NULL params can never match strictly — drop now
            pdf = pdf.filter(F.col(v).isNotNull())
        eparams = CompiledPattern(pdf.distinct(), list(corr), list(corr))
        return compile_pattern(kb, inner, graph_scope, params=eparams), frozenset(corr)
    return compile_pattern(kb, inner, graph_scope), frozenset()


def _find_exists_nodes(expr, out: list) -> None:
    if isinstance(expr, (list, tuple)) and expr:
        if expr[0] == ":exists-expr":
            out.append(expr)
            return
        for x in expr:
            _find_exists_nodes(x, out)


def _peval_bool(expr, env: dict):
    """Partially evaluate a filter s-expression with EXISTS subexpressions
    pinned to booleans (by node identity). SPARQL's three-valued logic
    (§17.2) makes the short-circuits sound: false && error = false,
    true || error = true — so dropping the other operand never changes the
    effective-boolean outcome. EXISTS under a non-boolean operator (IF,
    COALESCE, =) is rejected — those positions would need a materialized
    boolean column, not arm splitting."""
    if isinstance(expr, (list, tuple)) and expr:
        if id(expr) in env:
            return env[id(expr)]
        op = expr[0]
        if op in (":and", ":or"):
            absorb = False if op == ":and" else True
            parts = [_peval_bool(x, env) for x in expr[1:]]
            if any(p is absorb for p in parts):
                return absorb
            parts = [p for p in parts if not isinstance(p, bool)]
            if not parts:
                return not absorb
            if len(parts) == 1:
                return parts[0]
            return (op, *parts)
        if op == ":not" and len(expr) == 2:
            p = _peval_bool(expr[1], env)
            if isinstance(p, bool):
                return not p
            return (":not", p)
        probe: list = []
        _find_exists_nodes(expr, probe)
        if probe:
            raise ValueError(
                "EXISTS subexpressions are supported only under !/&&/|| "
                f"in FILTER, not inside {op!r}"
            )
        return expr
    return expr


def _apply_filter(
    kb, f, acc: CompiledPattern, graph_scope
) -> CompiledPattern:
    """Apply one group FILTER. Plain expressions filter in place; an
    expression embedding [NOT] EXISTS subexpressions (§17.4.1.4-5) compiles
    by TRUTH-ASSIGNMENT ARM SPLITTING: for each assignment of the k EXISTS
    terms, rows with exactly that truth pattern are selected via the same
    semi/anti joins the clause-level form uses, the residual expression is
    partially evaluated under the assignment, and surviving arms union.
    The arms partition the input, so no row ids are needed and every join
    stays a hash semi/anti join; k is capped at 2 (4 arms)."""
    nodes: list = []
    _find_exists_nodes(f, nodes)
    if not nodes:
        acc.df = acc.df.filter(compile_filter_expr(kb, f, acc.df, set(acc.all_vars)))
        return acc
    if len(nodes) > 2:
        raise ValueError("at most 2 EXISTS subexpressions per FILTER expression")
    subs = [
        _compile_exists_inner(kb, list(n[1]), acc, graph_scope) for n in nodes
    ]
    arms = []
    for assign in itertools.product((True, False), repeat=len(nodes)):
        env = {id(n): v for n, v in zip(nodes, assign)}
        try:
            residual = _peval_bool(f, env)
        except ValueError:
            # EXISTS under a non-boolean operator (IF/COALESCE/...):
            # no constant-arm pruning, but plain substitution still
            # partitions correctly — the residual just compiles whole
            residual = _subst_exists(f, env)
        if residual is False:
            continue
        arm = CompiledPattern(
            acc.df, list(acc.all_vars), list(acc.visible_vars), set(acc.maybe_null)
        )
        for (sub, strict), truth in zip(subs, assign):
            arm = _apply_exists(arm, sub, truth, strict_vars=strict)
        if residual is not True:
            arm.df = arm.df.filter(
                compile_filter_expr(kb, residual, arm.df, set(arm.all_vars))
            )
        arms.append(arm.df)
    df = None
    for a in arms:
        df = a if df is None else df.unionByName(a)
    if df is None:  # every assignment's residual is constant false
        df = acc.df.filter(F.lit(False))
    return CompiledPattern(df, acc.all_vars, acc.visible_vars, set(acc.maybe_null))


def _subst_exists(expr, env: dict):
    """Replace each [NOT] EXISTS node (by identity) with its assigned
    Python bool — the residual then compiles as an ordinary value
    expression (True/False box to xsd:boolean terms)."""
    if id(expr) in env:
        return env[id(expr)]
    if isinstance(expr, (list, tuple)) and expr and expr[0] != ":exists-expr":
        return type(expr)(
            [expr[0]] + [_subst_exists(x, env) for x in expr[1:]]
        )
    return expr


def _apply_bind_exists(
    kb, expr, var: str, acc: CompiledPattern, graph_scope
) -> CompiledPattern:
    """BIND whose value expression embeds [NOT] EXISTS subexpressions
    (§17.4.1.4): same truth-assignment arm splitting as _apply_filter —
    the semi/anti joins partition the input by each EXISTS term's truth,
    each arm binds the residual expression with the term replaced by its
    constant, and the arms union back. HAVING remains the one expression
    position without EXISTS support (post-aggregation correlation)."""
    nodes: list = []
    _find_exists_nodes(expr, nodes)
    if len(nodes) > 2:
        raise ValueError("at most 2 EXISTS subexpressions per BIND expression")
    subs = [
        _compile_exists_inner(kb, list(n[1]), acc, graph_scope) for n in nodes
    ]
    arms = []
    for assign in itertools.product((True, False), repeat=len(nodes)):
        residual = _subst_exists(expr, {id(n): v for n, v in zip(nodes, assign)})
        arm = CompiledPattern(
            acc.df, list(acc.all_vars), list(acc.visible_vars), set(acc.maybe_null)
        )
        for (sub, strict), truth in zip(subs, assign):
            arm = _apply_exists(arm, sub, truth, strict_vars=strict)
        arms.append(
            arm.df.withColumn(
                var, compile_value_expr(kb, residual, set(arm.all_vars))
            )
        )
    df = arms[0]
    for a in arms[1:]:
        df = df.unionByName(a)
    return CompiledPattern(
        df,
        acc.all_vars + [var],
        acc.visible_vars + [var],
        acc.maybe_null | {var},
    )


def _expr_refs_any(expr, names: set) -> bool:
    """Does a filter/BIND s-expression reference any of these var names?"""
    if isinstance(expr, str) and expr.startswith("?/"):
        return expr[2:] in names
    if isinstance(expr, Term) and expr.kind == KIND_VAR:
        return expr.v in names
    if isinstance(expr, (list, tuple)):
        return any(_expr_refs_any(x, names) for x in expr)
    return False


def _collect_expr_vars(kb, expr, out: set) -> None:
    """Collect var names referenced by a filter/BIND s-expression."""
    if isinstance(expr, str) and expr.startswith("?/"):
        out.add(expr[2:])
        return
    if isinstance(expr, Term) and expr.kind == KIND_VAR:
        out.add(expr.v)
        return
    if isinstance(expr, (list, tuple)):
        for x in expr:
            _collect_expr_vars(kb, x, out)


def _pattern_var_usage(
    kb, clauses, include_conditional: bool = True, for_nullability: bool = False
) -> tuple[set, set]:
    """-> (vars bound by triple patterns / BIND / VALUES in the group, vars
    referenced in expression position). Used to detect EXISTS correlation:
    a var referenced in expressions and not bound is a substitution
    parameter. MINUS subtrees are skipped — SPARQL §8.3 evaluates MINUS
    without substitution, so outer refs there stay unbound (and the
    existing NULL-struct compile already yields remove-nothing).

    include_conditional=False counts only UNCONDITIONAL bindings: a var
    bound solely inside an OPTIONAL, or in some-but-not-all UNION branches,
    is NOT 'bound' (ADVICE r3: such vars must still participate in EXISTS
    substitution — in the branch where they are unbound, Jena's substitute
    sees the outer value, not NULL).

    for_nullability=True computes the stricter DEFINITELY-NON-NULL set for
    _subquery_maybe_null (ADVICE r4 medium #1): a BIND alias is excluded —
    its expression may read a conditionally-bound var or simply error
    (§18.2.4.4 leaves the var unbound) — a VALUES var counts only when no
    row is UNDEF, and a nested subquery's projections defer to its own
    maybe-null analysis. This mode is NOT for EXISTS-correlation detection:
    there a BIND alias genuinely shadows the outer var and must count as
    bound, or the inner binding would be clobbered by substitution."""
    bound: set = set()
    refs: set = set()
    for clause in clauses:
        kind, payload = _classify(kb, clause)
        if kind == "triple":
            for slot in (payload[0], payload[2]) + (
                (payload[3],) if len(payload) == 4 else ()
            ):
                t = _slot_var(kb, slot)
                if t is not None:
                    bound.add(t.v)
            if not isinstance(payload[1], (list, tuple)):
                t = _slot_var(kb, payload[1])
                if t is not None:
                    bound.add(t.v)
        elif kind == "group":
            b, r = _pattern_var_usage(kb, list(payload), include_conditional,
                                      for_nullability)
            bound |= b
            refs |= r
        elif kind == "optional":
            b, r = _pattern_var_usage(kb, list(payload), include_conditional,
                                      for_nullability)
            if include_conditional:
                bound |= b
            refs |= r
        elif kind == "union":
            branch_bounds = []
            for branch in payload:
                b, r = _pattern_var_usage(kb, list(branch), include_conditional,
                                          for_nullability)
                branch_bounds.append(b)
                refs |= r
            if include_conditional:
                bound |= set().union(*branch_bounds)
            elif branch_bounds:
                # only vars bound in EVERY branch are unconditional
                bound |= set.intersection(*branch_bounds)
        elif kind == "filter":
            _collect_expr_vars(kb, payload, refs)
        elif kind == "bind":
            expr, var = payload
            _collect_expr_vars(kb, expr, refs)
            # nullability mode: a BIND alias is never definitely-non-null —
            # the expression can error, or read an OPTIONAL/UNION var
            # (ADVICE r4: counting it restored the strict-equi wrong answer)
            if not for_nullability:
                bound.add(kb.term(var).v)
        elif kind == "values":
            for i, v in enumerate(payload[0]):
                if for_nullability and any(
                    row[i] is None for row in payload[1]
                ):
                    continue  # an UNDEF cell makes the var maybe-null
                bound.add(kb.term(v).v)
        elif kind in ("exists", "not-exists"):
            b, r = _pattern_var_usage(kb, list(payload), include_conditional)
            refs |= r - b  # inner-bound vars don't escape; free refs do
        elif kind == "subquery":
            q = payload
            if q["type"] == "select" and q["select_vars"]:
                names = {kb.term(v).v for v in q["select_vars"]}
                if for_nullability:
                    names -= _subquery_maybe_null(kb, q, sorted(names))
                bound |= names
            elif q["type"] == "aggregate":
                names = set(
                    q.get("select_order")
                    or [kb.term(g).v for g in q["group_by"]]
                    + [s[2] for s in q["aggs"]]
                )
                if for_nullability:
                    names -= _subquery_maybe_null(kb, q, sorted(names))
                bound |= names
            else:  # SELECT *: projects everything its own pattern binds
                b, _ = _pattern_var_usage(
                    kb, list(q["pattern"]),
                    include_conditional=not for_nullability,
                    for_nullability=for_nullability,
                )
                bound |= b
        # minus: skipped (no substitution into MINUS)
    return bound, refs


def _params_for(kb, clauses, params: CompiledPattern | None) -> CompiledPattern | None:
    """Narrow EXISTS substitution params to the subset a subtree actually
    references in expression position without binding — so only those
    subtrees pay the param join, and the parent then equi-joins on them."""
    if params is None:
        return None
    bound, refs = _pattern_var_usage(kb, clauses, include_conditional=False)
    need = [v for v in params.all_vars if v in refs and v not in bound]
    if not need:
        return None
    if len(need) == len(params.all_vars):
        return params
    return CompiledPattern(params.df.select(*need).distinct(), need, need)


def _boundness_key(tp) -> int:
    score = 0
    for slot in tp:
        if not (isinstance(slot, str) and (slot.startswith("?/") or slot.startswith("_/"))):
            score -= 1  # constant slot -> more selective
    return score


def _order_key(kb, tp, stats: dict | None) -> tuple:
    bound = _boundness_key(tp)
    if stats is None:
        return (bound, 0)
    p = tp[1]
    if isinstance(p, (list, tuple)) or (
        isinstance(p, str) and (p.startswith("?/") or p.startswith("_/"))
    ):
        # path or var predicate: frequency unknown -> order after known preds
        return (bound, float("inf"))
    return (bound, stats.get(kb.term(p).v, 0))


def _slot_var(kb, x) -> Term | None:
    """Return a variable-ish Term (var or bnode-as-var) or None for constants."""
    t = kb.term(x)
    if t.kind == KIND_VAR or t.kind == KIND_BNODE:
        return t
    return None


def _fresh(prefix: str) -> str:
    return f"__{prefix}{next(_uid)}"


def _compile_triple(kb, tp, graph_scope: str | None) -> CompiledPattern:
    s, p, o = tp[0], tp[1], tp[2]
    g = tp[3] if len(tp) == 4 else None

    if isinstance(p, (list, tuple)):
        from kr_spark.plans.paths import compile_path_pattern

        return compile_path_pattern(kb, s, p, o, graph_scope)

    df = kb.df()
    if graph_scope is not None:
        df = df.filter(F.col("graph") == kb.term(graph_scope).v)
    if g is not None:
        gv = _slot_var(kb, g)
        if gv is None:
            df = df.filter(F.col("graph") == kb.term(g).v)
        else:
            df = df.filter(F.col("graph").isNotNull())

    # per-slot structs (var slots project; constant slots filter — the
    # filters push down into the parquet scan)
    slot_structs: dict[str, list] = {}  # var name -> list of struct cols

    sv = _slot_var(kb, s)
    if sv is None:
        t = kb.term(s)
        df = df.filter((F.col("s_kind") == t.kind) & (F.col("s") == t.v))
    else:
        slot_structs.setdefault(sv.v, []).append(
            (_var_struct(F.col("s_kind"), F.col("s")), sv.kind)
        )

    pv = _slot_var(kb, p)
    if pv is None:
        df = df.filter(F.col("p") == kb.term(p).v)
    else:
        slot_structs.setdefault(pv.v, []).append(
            (_var_struct(F.lit("uri"), F.col("p")), pv.kind)
        )

    ov = _slot_var(kb, o)
    if ov is None:
        t = kb.term(o)
        df = df.filter((F.col("o_kind") == t.kind) & (F.col("o") == t.v))
        if t.kind == KIND_LITERAL:
            df = df.filter(
                (F.coalesce(F.col("o_lang"), F.lit("")) == t.lang)
                & (F.coalesce(F.col("o_datatype"), F.lit("")) == t.dt)
            )
    else:
        slot_structs.setdefault(ov.v, []).append(
            (
                _var_struct(
                    F.col("o_kind"),
                    F.col("o"),
                    F.coalesce(F.col("o_lang"), F.lit("")),
                    F.coalesce(F.col("o_datatype"), F.lit("")),
                ),
                ov.kind,
            )
        )

    if g is not None:
        gv = _slot_var(kb, g)
        if gv is not None:
            slot_structs.setdefault(gv.v, []).append(
                (_var_struct(F.lit("uri"), F.col("graph")), gv.kind)
            )

    all_vars: list[str] = []
    visible: list[str] = []
    sel = []
    for name, structs in slot_structs.items():
        # same var in >1 slot of one pattern (e.g. (?x p ?x)) -> equality filter
        first, kind = structs[0]
        for other, _ in structs[1:]:
            df = df.filter(first == other)
        all_vars.append(name)
        if kind == KIND_VAR:
            visible.append(name)
        sel.append(first.alias(name))

    out = df.select(*sel) if sel else df.select(F.lit(1).alias(_fresh("one")))
    return CompiledPattern(out, all_vars, visible)


def _join(
    a: CompiledPattern,
    b: CompiledPattern,
    how: str,
    extra_cond: Column | None = None,
) -> CompiledPattern:
    """extra_cond: additional join condition (LeftJoin filter expression per
    SPARQL §8.3.3 — filters of an OPTIONAL group that reference outer vars).
    Column refs in it resolve by name: shared vars read a's copy (equal on
    matched rows anyway), b-only vars read b's column.

    Shared vars that are maybe-null on either side join with SPARQL
    compatibility semantics (§18.3): unbound is compatible with anything,
    and the merged solution takes whichever side bound the var. Those vars
    become null-tolerant residual conjuncts; definitely-bound shared vars
    stay plain equi conjuncts, which Catalyst extracts as hash-join keys —
    so the common all-strict case compiles to exactly the same plan as
    before, and a mixed case still hash-joins on the strict keys."""
    shared = [v for v in a.all_vars if v in set(b.all_vars)]
    b_only = [v for v in b.all_vars if v not in set(a.all_vars)]
    compat = {v for v in shared if v in a.maybe_null or v in b.maybe_null}
    if not shared:
        if how == "left":
            # SPARQL LeftJoin-on-true semantics (sparql.clj:241-244): a
            # var-disjoint OPTIONAL must KEEP every left row even when the
            # optional side is empty — crossJoin would drop them all.
            df = a.df.join(b.df, extra_cond if extra_cond is not None else F.lit(True), "left")
        else:
            df = a.df.crossJoin(b.df)
            if extra_cond is not None:
                df = df.filter(extra_cond)
    else:
        renames = {v: _fresh("r") for v in shared}
        bdf = b.df
        for v, tmp in renames.items():
            bdf = bdf.withColumnRenamed(v, tmp)
        cond = None
        for v, tmp in renames.items():
            c = F.col(v) == F.col(tmp)
            if v in compat:
                if v in a.maybe_null:
                    c = c | F.col(v).isNull()
                if v in b.maybe_null:
                    c = c | F.col(tmp).isNull()
            cond = c if cond is None else (cond & c)
        if extra_cond is not None:
            cond = cond & extra_cond
        df = a.df.join(bdf, cond, how)
        for v in shared:
            if v in compat:
                # merged solution: the bound side's value (both-null stays
                # null = still unbound; unmatched left rows keep a's value)
                df = df.withColumn(v, F.coalesce(F.col(v), F.col(renames[v])))
        df = df.drop(*renames.values())
    all_vars = a.all_vars + b_only
    visible = a.visible_vars + [v for v in b.visible_vars if v in b_only]
    mn: set = set()
    for v in a.all_vars:
        if v not in a.maybe_null:
            continue
        if v in compat and how != "left" and v not in b.maybe_null:
            continue  # inner-join coalesce with a never-null side -> bound
        mn.add(v)
    if how == "left":
        mn |= set(b_only)  # unmatched left rows leave every b var unbound
    else:
        mn |= set(b_only) & b.maybe_null
    return CompiledPattern(df, all_vars, visible, mn)


_TERM_STRUCT_DDL = "struct<kind:string,v:string,lang:string,dt:string>"


def _compile_subquery(kb, q: dict) -> CompiledPattern:
    """Sub-SELECT (SPARQL 1.1 §12): evaluated independently (bottom-up, no
    correlation per spec — unlike EXISTS) and joined into the outer group
    on shared variables. Aggregate columns arrive term-boxed from
    aggregate_df (long -> xsd:integer, decimal -> trimmed-lexical
    xsd:decimal, string -> plain literal) so they join/filter like any
    other binding.

    Limitation: a sub-SELECT inside GRAPH <g> {...} evaluates against ALL
    graphs (the enclosing scope does not propagate into kb.query_df /
    aggregate_df) — scope the inner pattern's triples with explicit quad
    clauses if graph-restricted subquery semantics are needed."""
    if q["type"] == "select":
        df = kb.query_df(
            q["pattern"],
            select_vars=q["select_vars"],
            distinct=q["distinct"],
            limit=q["limit"],
            order_by=q.get("order_by") or None,
            offset=q.get("offset"),
        )
        names = list(df.columns)
        return CompiledPattern(df, names, names, _subquery_maybe_null(kb, q, names))
    if q["type"] != "aggregate":
        raise ValueError(f"unsupported subquery form {q['type']!r}")

    # aggregate_df boxes every output column as a term struct (one surface
    # at both levels — kb._box_agg_columns), so the result joins/filters
    # like any other binding with no re-boxing here
    df = kb.aggregate_df(
        q["pattern"],
        group_by=q["group_by"],
        aggs=q["aggs"],
        having=q["having"],
        order_by=q.get("order_by") or None,
        limit=q["limit"],
        offset=q.get("offset"),
        select_order=q.get("select_order"),
        proj_exprs=q.get("proj_exprs") or None,
    )
    names = list(df.columns)
    return CompiledPattern(df, names, names, _subquery_maybe_null(kb, q, names))


def _subquery_maybe_null(kb, q: dict, names: list[str]) -> set:
    """Which subquery output columns can be NULL (= unbound)? A var is
    definitely bound iff it is unconditionally bound by the subquery's own
    pattern; an aggregate alias iff it is COUNT (never null over a group)
    or aggregates an unconditionally-bound operand. Everything else —
    OPTIONAL-only vars, single-UNION-branch vars, (expr AS ?v) projections
    (an erroring expression leaves ?v unbound, §18.2.4.4) — is maybe-null.
    Over-marking is semantically safe (the null arm just never fires);
    under-marking would silently restore the strict-equi wrong answer."""
    bound, _ = _pattern_var_usage(
        kb, list(q["pattern"]), include_conditional=False, for_nullability=True
    )
    nonnull = set(bound)
    for spec in q.get("aggs") or []:
        op, operand, alias = spec[0], spec[1], spec[2]
        if op == "count":
            nonnull.add(alias)
        elif isinstance(operand, str) and operand.startswith("?/"):
            if operand[2:] in bound:
                nonnull.add(alias)
        elif isinstance(operand, Term) and operand.kind == KIND_VAR:
            if operand.v in bound:
                nonnull.add(alias)
    return {n for n in names if n not in nonnull}


def _compile_values(kb, vars_, rows) -> CompiledPattern:
    """VALUES inline data block -> a tiny local DataFrame of term structs.
    `vars_` are var refs; `rows` are lists of term-ish values, None = UNDEF."""
    names = [kb.term(v).v for v in vars_]
    data = []
    for row in rows:
        if len(row) != len(names):
            raise ValueError(f"VALUES row arity {len(row)} != {len(names)}")
        out = []
        for cell in row:
            if cell is None:
                out.append(None)
            else:
                t = kb.term(cell)
                out.append((t.kind, t.v, t.lang, t.dt))
        data.append(tuple(out))
    schema = ", ".join(f"{n} {_TERM_STRUCT_DDL}" for n in names)
    df = kb.spark.createDataFrame(data, schema)
    mn = {names[i] for row in rows for i, cell in enumerate(row) if cell is None}
    return CompiledPattern(df, list(names), list(names), mn)


def _join_values(acc: CompiledPattern, vp: CompiledPattern) -> CompiledPattern:
    """Join inline data into a plan: UNDEF cells (NULL structs) are
    compatible with anything; shared-var output keeps the bound side."""
    shared = [v for v in acc.all_vars if v in set(vp.all_vars)]
    v_only = [v for v in vp.all_vars if v not in set(acc.all_vars)]
    if not shared:
        return _join(acc, vp, how="inner")  # cartesian with inline data
    renames = {v: _fresh("val") for v in shared}
    vdf = vp.df
    for v, tmp in renames.items():
        vdf = vdf.withColumnRenamed(v, tmp)
    cond = None
    for v, tmp in renames.items():
        c = F.col(tmp).isNull() | (F.col(v) == F.col(tmp))
        if v in acc.maybe_null:
            # plan side unbound (OPTIONAL/UNION) -> compatible with any cell
            c = c | F.col(v).isNull()
        cond = c if cond is None else (cond & c)
    df = acc.df.join(F.broadcast(vdf), cond, "inner")
    # a shared var bound only on the VALUES side (left was NULL via OPTIONAL)
    for v, tmp in renames.items():
        df = df.withColumn(v, F.coalesce(F.col(v), F.col(tmp)))
    df = df.drop(*renames.values())
    all_vars = acc.all_vars + v_only
    visible = acc.visible_vars + [v for v in vp.visible_vars if v in v_only]
    mn = {v for v in shared if v in acc.maybe_null and v in vp.maybe_null}
    mn |= acc.maybe_null - set(shared)
    mn |= vp.maybe_null & set(v_only)
    return CompiledPattern(df, all_vars, visible, mn)


def _join_params(acc: CompiledPattern, params: CompiledPattern) -> CompiledPattern:
    """Join EXISTS substitution params into an inner plan. Same UNDEF
    semantics as _join_values but with the NULL on the LEFT (a sub-plan row
    that never bound the param var holds under every substitution), and no
    forced broadcast — params are distinct outer bindings of arbitrary
    cardinality, so the join strategy is left to Catalyst/AQE."""
    shared = [v for v in acc.all_vars if v in set(params.all_vars)]
    p_only = [v for v in params.all_vars if v not in set(acc.all_vars)]
    if not shared:
        df = acc.df.crossJoin(params.df)
        return CompiledPattern(
            df,
            acc.all_vars + p_only,
            acc.visible_vars + list(p_only),
            set(acc.maybe_null),
        )
    renames = {v: _fresh("par") for v in shared}
    pdf = params.df
    for v, tmp in renames.items():
        pdf = pdf.withColumnRenamed(v, tmp)
    cond = None
    for v, tmp in renames.items():
        c = F.col(v).isNull() | (F.col(v) == F.col(tmp))
        cond = c if cond is None else (cond & c)
    df = acc.df.join(pdf, cond, "inner")
    for v, tmp in renames.items():
        df = df.withColumn(v, F.coalesce(F.col(v), F.col(tmp)))
    df = df.drop(*renames.values())
    # params are distinct non-null outer bindings, so coalesced shared vars
    # come out bound even where the sub-plan left them null
    mn = acc.maybe_null - set(shared)
    return CompiledPattern(
        df, acc.all_vars + p_only, acc.visible_vars + list(p_only), mn
    )


def _compat_join(acc: CompiledPattern, sub: CompiledPattern, shared: list[str]):
    """(renamed right df projected to shared vars, compatibility condition):
    left-unbound or right-unbound shared vars are compatible."""
    renames = {v: _fresh("c") for v in shared}
    sdf = sub.df.select(*shared)
    for v, tmp in renames.items():
        sdf = sdf.withColumnRenamed(v, tmp)
    cond = None
    for v, tmp in renames.items():
        c = F.col(v).isNull() | F.col(tmp).isNull() | (F.col(v) == F.col(tmp))
        cond = c if cond is None else (cond & c)
    return sdf, renames, cond


def _apply_minus(acc: CompiledPattern, sub: CompiledPattern) -> CompiledPattern:
    shared = [v for v in acc.all_vars if v in set(sub.all_vars)]
    if not shared:
        # disjoint domains: MINUS removes nothing (SPARQL 1.1 §8.3 note)
        return acc
    sdf, renames, compat = _compat_join(acc, sub, shared)
    overlap = None
    for v, tmp in renames.items():
        c = F.col(v).isNotNull() & F.col(tmp).isNotNull()
        overlap = c if overlap is None else (overlap | c)
    df = acc.df.join(sdf, compat & overlap, "left_anti")
    return CompiledPattern(df, acc.all_vars, acc.visible_vars, set(acc.maybe_null))


def _apply_exists(
    acc: CompiledPattern,
    sub: CompiledPattern,
    positive: bool,
    strict_vars: frozenset = frozenset(),
) -> CompiledPattern:
    shared = [v for v in acc.all_vars if v in set(sub.all_vars)]
    how = "left_semi" if positive else "left_anti"
    if not shared:
        df = acc.df.join(sub.df.limit(1), F.lit(True), how)
    else:
        # EXISTS substitution semantics: an unbound var on EITHER side
        # imposes no constraint. A right-side (inner) var is null only when
        # the inner group binds it conditionally (OPTIONAL / one UNION
        # branch) and that branch missed — under Jena substitution the
        # outer value stood in for it there, so the solution is compatible
        # (ADVICE r3). Unconditionally-bound inner vars are never null, so
        # this is exactly the old left-null-only rule for them. Correlated
        # params (strict_vars) are the exception: substituting an unbound
        # var leaves a free var whose filter errors to false, so those match
        # strictly (left-null never matches -> EXISTS false for that row).
        renames = {v: _fresh("e") for v in shared}
        sdf = sub.df.select(*shared)
        cond = None
        for v, tmp in renames.items():
            sdf = sdf.withColumnRenamed(v, tmp)
            if v in strict_vars:
                c = F.col(v).isNotNull() & (F.col(v) == F.col(tmp))
            else:
                c = (
                    F.col(v).isNull()
                    | F.col(tmp).isNull()
                    | (F.col(v) == F.col(tmp))
                )
            cond = c if cond is None else (cond & c)
        df = acc.df.join(sdf, cond, how)
    return CompiledPattern(df, acc.all_vars, acc.visible_vars, set(acc.maybe_null))


def _compile_union(
    kb, branches, graph_scope: str | None, params: CompiledPattern | None = None
) -> CompiledPattern:
    """UNION of sub-patterns; variables need not align (sparql.clj:235-239)."""
    plans = [
        compile_pattern(kb, list(b), graph_scope, params=_params_for(kb, list(b), params))
        for b in branches
    ]
    all_vars: list[str] = []
    visible: list[str] = []
    for p in plans:
        for v in p.all_vars:
            if v not in all_vars:
                all_vars.append(v)
        for v in p.visible_vars:
            if v not in visible:
                visible.append(v)
    dfs = []
    for p in plans:
        df = p.df
        for v in all_vars:
            if v not in p.all_vars:
                df = df.withColumn(v, F.lit(None).cast("struct<kind:string,v:string,lang:string,dt:string>"))
        dfs.append(df.select(*all_vars))
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    # a var missing from any branch (NULL-padded there) — or maybe-null
    # within a branch — is unbound in some solutions (§18.3 compatibility)
    mn = {
        v
        for v in all_vars
        if any(v not in p.all_vars or v in p.maybe_null for p in plans)
    }
    return CompiledPattern(out, all_vars, visible, mn)


# ---- CONSTRUCT (Q7, sparql.clj:447-466) ----


def compile_construct(kb, create_pattern, pattern) -> DataFrame:
    """m head templates per binding -> m projections unioned, duplicates KEPT
    (2 bindings x 2 templates = 4; test_sparql_construct.clj:41-45)."""
    plan = compile_pattern(kb, pattern)
    outs = []
    for tmpl in create_pattern:
        outs.append(_project_template(kb, plan, tmpl))
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o)
    return df


def _slot_cols(kb, plan_vars: set, x, *, as_subject: bool):
    t = kb.term(x)
    if (t.kind in (KIND_VAR, KIND_BNODE)) and t.v in plan_vars:
        c = F.col(t.v)
        return c["kind"], c["v"], c["lang"], c["dt"]
    if t.kind == KIND_BNODE:
        # §16.2: a blank node in the template instantiates FRESH per
        # solution (Jena mints new labels); sharing one constant label
        # across solutions wrongly merges the constructed nodes. The
        # deterministic twin: md5 over the whole solution + the template
        # label — same label across slots WITHIN a solution, distinct
        # across differing solutions (duplicate bag solutions share, the
        # same trade BNODE(expr) documents).
        parts = [F.to_json(F.struct(F.col(v))) for v in sorted(plan_vars)]
        lab = F.md5(F.concat_ws("\x1f", *parts, F.lit(t.v)))
        return F.lit(t.kind), lab, F.lit(t.lang), F.lit(t.dt)
    return F.lit(t.kind), F.lit(t.v), F.lit(t.lang), F.lit(t.dt)


def _project_template(kb, plan: CompiledPattern, tmpl) -> DataFrame:
    from kr_spark.terms import NUMERIC_DATATYPES

    pv = set(plan.all_vars)
    s_k, s_v, _, _ = _slot_cols(kb, pv, tmpl[0], as_subject=True)
    _, p_v, _, _ = _slot_cols(kb, pv, tmpl[1], as_subject=False)
    o_k, o_v, o_lang, o_dt = _slot_cols(kb, pv, tmpl[2], as_subject=False)
    num = F.when(
        o_dt.isin(*sorted(NUMERIC_DATATYPES)), o_v.try_cast("decimal(38,9)")
    ).otherwise(F.lit(None).cast("decimal(38,9)"))
    # §16.2: a template instantiation with ANY unbound variable produces no
    # triple (an OPTIONAL/UNION var can be null here). Constant slots are
    # literals — the predicate is trivially true for them.
    bound = s_v.isNotNull() & p_v.isNotNull() & o_k.isNotNull()
    return plan.df.filter(bound).select(
        s_k.alias("s_kind"),
        s_v.alias("s"),
        p_v.alias("p"),
        o_k.alias("o_kind"),
        o_v.alias("o"),
        F.when(o_lang == "", F.lit(None)).otherwise(o_lang).alias("o_lang"),
        F.when(o_dt == "", F.lit(None)).otherwise(o_dt).alias("o_datatype"),
        num.alias("num_val"),
        F.lit(None).cast("string").alias("graph"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.lit(None).cast("string").alias("rule_id"),
    )


# ---- result templates (Q6, sparql.clj:514-522; subst unify.clj:96-107) ----


def instantiate_template(kb, template, pattern) -> list:
    bindings = kb.query(pattern)
    out = []
    for b in bindings:
        out.append(_subst(kb, template, b))
    return out


def _subst(kb, node, binding: dict):
    if isinstance(node, (list, tuple)):
        return [_subst(kb, x, binding) for x in node]
    t = kb.term(node) if isinstance(node, (str, int, float)) else node
    if isinstance(t, Term) and t.kind == KIND_VAR and t.v in binding:
        return binding[t.v]
    return node
