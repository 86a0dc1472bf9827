"""Reification / deterministic skolemization (SURVEY §2.7).

Mints new URI nodes from query bindings — the entity-canonicalization
primitive of the reference's rule engine:
  :md5       deterministic node = hash of the argument values
             (reify.clj:76-78, utils.clj:28-35)
  :localname node named by joining arg local-names (reify.clj:68-70;
             rule-5 expects ex/aORG from hacker ex/a + suffix ORG,
             test_forward_rule.clj:124-130)
  :regex     regex-replace over concatenated args (reify.clj:85-87)
  :unique    fresh UUID node (rdf.clj:433-437) — nondeterministic; avoid in
             distributed runs that need resume/replay stability
  callable   arbitrary fn of bindings (forward_rule.clj:173-179) — runs as a
             vectorized pandas UDF

Determinism note (SURVEY §4.3.4): minting is a pure column expression —
stable under any partitioning/retry, unlike monotonically_increasing_id.
We hash the full term values joined with a NUL separator (collision-proof
for the constants regression, test_forward_rule.clj:419-422); the reference
hashes concatenated CURIE prints (utils.clj:28-35) — node names are opaque,
only equality/inequality structure is contractual.

Spec form (kr: `[?/var {:ln (:md5 ?/a ?/b) :ns "ex" :prefix "P_"}]`,
forward_rule.clj:104-115):
  {"var": "?/dept", "ln": ("md5", "?/boss", "?/co"),
   "ns": "ex", "prefix": "DEPT_", "suffix": ""}
  "?/org"  (bare var -> unique)
  ln also: ("localname", args...), ("regex", pattern, replacement, args...),
  "unique", or a Python callable(pandas.DataFrame) -> pandas.Series.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kr_spark.terms import KIND_VAR, Term

# reference defaults: *reify-ns*/"G_" prefix (reify.clj:14-17)
DEFAULT_REIFY_PREFIX = "G_"


def normalize_reify_spec(spec) -> dict:
    if isinstance(spec, str):
        spec = {"var": spec, "ln": "unique"}
    out = dict(spec)
    out.setdefault("ln", "unique")
    out.setdefault("ns", "ex")
    out.setdefault("prefix", DEFAULT_REIFY_PREFIX)
    out.setdefault("suffix", "")
    return out


def reify_arg_deps(spec: dict) -> list[str]:
    """Variable names this spec's minting depends on (for topo-sort, K2)."""
    ln = spec.get("ln", "unique")
    if isinstance(ln, (list, tuple)):
        return [a[2:] for a in ln[1:] if isinstance(a, str) and a.startswith("?/")]
    return []


def _arg_value_col(kb, arg, plan_vars: set) -> Column:
    """The string value of a minting argument: a bound var's term value or a
    constant term's value."""
    if isinstance(arg, str) and arg.startswith("?/") and arg[2:] in plan_vars:
        return F.col(arg[2:])["v"]
    t = kb.term(arg)
    return F.lit(t.v)


def _localname(col: Column) -> Column:
    """Local name of an IRI: after the last '/', '#' or ':'."""
    return F.regexp_extract(col, r"([^/#:]+)$", 1)


def minted_name_expr(kb, spec: dict, plan_vars: set) -> Column:
    ln = spec["ln"]
    if callable(ln):
        raise TypeError("callable reify fns go through reify_fn_pandas, not a column expr")
    if ln == "unique" or (isinstance(ln, (list, tuple)) and ln and ln[0] == "unique"):
        # UUID node (rdf.clj:433-437). Nondeterministic by design.
        return F.expr("replace(uuid(), '-', '')")
    kind = ln[0].lstrip(":")
    if kind == "md5":
        # unit-separator join: collision-proof for adjacent args AND
        # representable in every SQL engine (NUL is not)
        args = [_arg_value_col(kb, a, plan_vars) for a in ln[1:]]
        return F.md5(F.concat_ws("\x1f", *args))
    if kind == "localname":
        args = [_localname(_arg_value_col(kb, a, plan_vars)) for a in ln[1:]]
        return F.concat_ws("_", *args)
    if kind == "regex":
        pattern, replacement = ln[1], ln[2]
        args = [_arg_value_col(kb, a, plan_vars) for a in ln[3:]]
        return F.regexp_replace(F.concat_ws("", *args), pattern, replacement)
    raise ValueError(f"unknown reify kind {ln!r}")


def minted_uri_expr(kb, spec: dict, plan_vars: set) -> Column:
    base = kb.ns.short_to_long.get(spec["ns"], spec["ns"])
    name = minted_name_expr(kb, spec, plan_vars)
    return F.concat(F.lit(base), F.lit(spec["prefix"]), name, F.lit(spec["suffix"]))


def apply_reify(kb, df, spec: dict, plan_vars: set):
    """Add (or fill) the minted var column on a binding plan.

    Already-bound vars are kept: reify only fills nulls — the optional-clause
    semantics of forward_rule.clj:232-239 (rule-9-optional)."""
    var = spec["var"]
    name = var[2:] if var.startswith("?/") else var
    ln = spec["ln"]
    if callable(ln):
        df = _apply_fn_reify(kb, df, spec, plan_vars)
        return df, name
    uri_v = minted_uri_expr(kb, spec, plan_vars)
    minted = F.struct(
        F.lit("uri").alias("kind"),
        uri_v.alias("v"),
        F.lit("").alias("lang"),
        F.lit("").alias("dt"),
    )
    if name in plan_vars:
        df = df.withColumn(name, F.coalesce(F.col(name), minted))
    else:
        df = df.withColumn(name, minted)
    return df, name


def _apply_fn_reify(kb, df, spec: dict, plan_vars: set):
    """:fn reify (forward_rule.clj:173-179) — arbitrary Python over bindings,
    vectorized: one Arrow batch in, one string Series of names out."""
    import pandas as pd  # noqa: F401

    fn = spec["ln"]
    base = kb.ns.short_to_long.get(spec["ns"], spec["ns"])
    prefix, suffix = spec["prefix"], spec["suffix"]
    dep_cols = spec.get("args", sorted(plan_vars))

    @F.pandas_udf("string")
    def _mint(*cols):
        import pandas as pd

        pdf = pd.DataFrame({c: s for c, s in zip(dep_cols, cols)})
        names = fn(pdf)
        return base + prefix + names.astype(str) + suffix

    name = spec["var"][2:] if spec["var"].startswith("?/") else spec["var"]
    vcols = [F.col(c)["v"] for c in dep_cols]
    minted = F.struct(
        F.lit("uri").alias("kind"),
        _mint(*vcols).alias("v"),
        F.lit("").alias("lang"),
        F.lit("").alias("dt"),
    )
    if name in plan_vars:
        return df.withColumn(name, F.coalesce(F.col(name), minted))
    return df.withColumn(name, minted)


def reify_statements_df(stmts, ns: str, prefix: str = "STMT_"):
    """R1 at scale: a DataFrame of (s, p, o) URI statements -> 4 standard
    reification triples each (rdf.clj:454-491), with a deterministic
    md5-skolemized statement node (stable across partitioning/retries).
    Pure projections + one union — no shuffle."""
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    # ONE skolem scheme for every reify path (VERDICT r1 #3): md5 over the
    # 5-field list (s, p, o, o_lang, o_dt) joined by the \x1f unit separator.
    # URI objects hash with empty lang/dt, so this DataFrame path and the
    # driver-side reify_statement_triples mint IDENTICAL nodes for the same
    # statement (asserted in tests/test_forward_rule.py).
    node = F.concat(
        F.lit(ns + prefix),
        F.md5(
            F.concat_ws(
                "\x1f", F.col("s"), F.col("p"), F.col("o"), F.lit(""), F.lit("")
            )
        ),
    )
    base = stmts.select(node.alias("n"), "s", "p", "o")
    parts = [
        base.select(
            F.col("n").alias("s"),
            F.lit(rdf + "type").alias("p"),
            F.lit(rdf + "Statement").alias("o"),
        ),
        base.select(
            F.col("n").alias("s"), F.lit(rdf + "subject").alias("p"), F.col("s").alias("o")
        ),
        base.select(
            F.col("n").alias("s"),
            F.lit(rdf + "predicate").alias("p"),
            F.col("p").alias("o"),
        ),
        base.select(
            F.col("n").alias("s"), F.lit(rdf + "object").alias("p"), F.col("o").alias("o")
        ),
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


def reify_statement_triples(kb, s, p, o) -> list[tuple]:
    """Standard RDF reification: 1 statement -> 4 triples (R1,
    rdf.clj:454-491): the minted node gets rdf:Statement type + s/p/o links."""
    import hashlib

    st, pt, ot = kb.term(s), kb.term(p), kb.term(o)
    # same separator + field list as reify_statements_df (one skolem scheme)
    h = hashlib.md5(
        ("\x1f".join([st.v, pt.v, ot.v, ot.lang, ot.dt])).encode()
    ).hexdigest()
    node = Term("uri", kb.ns.short_to_long["ex"] + "STMT_" + h)
    return [
        (node, "rdf/type", "rdf/Statement"),
        (node, "rdf/subject", st),
        (node, "rdf/predicate", pt),
        (node, "rdf/object", ot),
    ]
