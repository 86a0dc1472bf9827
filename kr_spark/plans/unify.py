"""PAIP-style unification over term trees (U1; unify.clj:28-60, subst
unify.clj:85-107).

Runtime query answering never calls this — Spark's join planning IS the
unifier at scale (SURVEY §2.10) — but the reference exposes `unify`/
`subst-bindings` as template tooling (rule authoring, tests), so the full
occurs-check unifier lives here for parity.

Values are the engine's pattern trees: nested lists/tuples of term-able
scalars. Variables are `?/name` strings (or Term(kind='var')); bnodes are
NOT variables here (they unify as constants, matching the reference — its
unifier works on symbols, and `_/x` only becomes a wildcard at SPARQL
emission). Scalar equality is sameTerm equality after kb.term coercion.
"""

from __future__ import annotations

from kr_spark.terms import KIND_VAR, Term

FAIL = None
_NO_BINDINGS: dict = {}


def _var_name(kb, x) -> str | None:
    if isinstance(x, str) and x.startswith("?/"):
        return x[2:]
    if isinstance(x, Term) and x.kind == KIND_VAR:
        return x.v
    return None


def _is_seq(x) -> bool:
    from kr_spark.plans.compiler import _looks_like_term_box

    if not isinstance(x, (list, tuple)):
        return False
    if not _looks_like_term_box(x):
        return True
    # a flat 1/2-element seq is a boxed literal UNLESS it contains a
    # variable — ["Bob","en"] is a term, ("?/x","?/x") is a tree
    return any(isinstance(e, str) and e.startswith("?/") for e in x)


def occurs_check(kb, var: str, tree, bindings: dict) -> bool:
    """Does `var` occur anywhere inside tree (after following bindings)?
    (unify.clj:49-57)."""
    v = _var_name(kb, tree)
    if v is not None:
        if v == var:
            return True
        if v in bindings:
            return occurs_check(kb, var, bindings[v], bindings)
        return False
    if _is_seq(tree):
        return any(occurs_check(kb, var, t, bindings) for t in tree)
    return False


def _unify_variable(kb, var: str, x, bindings: dict):
    if var in bindings:
        return unify(kb, bindings[var], x, bindings)
    xv = _var_name(kb, x)
    if xv is not None and xv in bindings:
        return unify(kb, var_ref(var), bindings[xv], bindings)
    if occurs_check(kb, var, x, bindings):
        return FAIL
    out = dict(bindings)
    out[var] = x
    return out


def var_ref(name: str) -> str:
    return "?/" + name


def unify(kb, x, y, bindings: dict | None = None):
    """-> bindings dict (possibly empty) or None on failure
    (unify.clj:28-47: occurs-check PAIP unifier)."""
    if bindings is None:
        bindings = _NO_BINDINGS
    xv, yv = _var_name(kb, x), _var_name(kb, y)
    if xv is not None and xv == yv:
        # (= x y) precedes the variable branch in the reference
        # (unify.clj:34): a var unifies with ITSELF without extending —
        # without this the occurs-check below rejects ?x = ?x
        # (found by hypothesis: unify(t, t) must never fail)
        return bindings if bindings is not _NO_BINDINGS else dict(bindings)
    if xv is not None:
        return _unify_variable(kb, xv, y, bindings)
    if yv is not None:
        return _unify_variable(kb, yv, x, bindings)
    if _is_seq(x) and _is_seq(y):
        if len(x) != len(y):
            return FAIL
        b = bindings
        for xi, yi in zip(x, y):
            b = unify(kb, xi, yi, b)
            if b is FAIL:
                return FAIL
        return b if b is not _NO_BINDINGS else dict(b)
    if _is_seq(x) or _is_seq(y):
        return FAIL
    if kb.term(x) == kb.term(y):
        return bindings if bindings is not _NO_BINDINGS else dict(bindings)
    return FAIL


def subst_bindings(kb, tree, bindings: dict):
    """Recursively substitute bindings into a template, following variable
    chains (subst-bindings, unify.clj:85-107)."""
    v = _var_name(kb, tree)
    if v is not None and v in bindings:
        return subst_bindings(kb, bindings[v], bindings)
    if _is_seq(tree):
        return [subst_bindings(kb, t, bindings) for t in tree]
    return tree


def unifier(kb, x, y):
    """Both trees with the unifying substitution applied, or None
    (PAIP `unifier`)."""
    b = unify(kb, x, y)
    if b is FAIL:
        return None
    return subst_bindings(kb, x, b)
