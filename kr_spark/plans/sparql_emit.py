"""Pattern s-expression -> SPARQL string emitter (the reference's own core
compile direction: sparql-query-body sparql.clj:398-410, triple emission
:220-233, union/optional :235-244, FILTER :382-395, paths :130-199, full
query assembly :415-444, count :478-496).

The engine executes patterns natively (plans/compiler.py), so this emitter
exists for (a) the remote-SPARQL-endpoint connector (S3) where the string IS
the wire format, and (b) parity/round-trip testing against
plans/sparql_parser.py (everything emitted here parses back to an equivalent
pattern).
"""

from __future__ import annotations

from kr_spark.plans.filters import FILTER_OPS
from kr_spark.terms import KIND_BNODE, KIND_LITERAL, KIND_URI, KIND_VAR, Term

_ESC = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}

_FN_NAMES = {
    ":bound": "bound", ":isIRI": "isIRI", ":isURI": "isURI",
    ":isBlank": "isBlank", ":isLiteral": "isLiteral", ":str": "str",
    ":lang": "lang", ":datatype": "datatype", ":sameTerm": "sameTerm",
    ":langMatches": "langMatches", ":regex": "regex",
    ":strlen": "STRLEN", ":substr": "SUBSTR", ":ucase": "UCASE",
    ":lcase": "LCASE", ":contains": "CONTAINS", ":strstarts": "STRSTARTS",
    ":strends": "STRENDS", ":concat": "CONCAT", ":replace": "REPLACE",
    ":strbefore": "STRBEFORE", ":strafter": "STRAFTER",
    ":encode_for_uri": "ENCODE_FOR_URI", ":abs": "ABS", ":round": "ROUND",
    ":ceil": "CEIL", ":floor": "FLOOR", ":if": "IF",
    ":coalesce": "COALESCE", ":iri": "IRI", ":uri": "URI",
    ":strdt": "STRDT", ":strlang": "STRLANG", ":bnode": "BNODE",
    ":md5": "MD5", ":sha1": "SHA1", ":sha256": "SHA256",
    ":sha384": "SHA384", ":sha512": "SHA512",
    ":isNumeric": "isNumeric", ":now": "NOW", ":year": "YEAR", ":month": "MONTH",
    ":day": "DAY", ":hours": "HOURS", ":minutes": "MINUTES",
    ":seconds": "SECONDS", ":tz": "TZ", ":timezone": "TIMEZONE",
    ":rand": "RAND", ":uuid": "UUID", ":struuid": "STRUUID",
}
_BINARY = {"=", "!=", "<", ">", "<=", ">=", "*", "/", "+", "-"}


def _escape(lex: str) -> str:
    return "".join(_ESC.get(c, c) for c in lex)


def emit_term(kb, x) -> str:
    t = x if isinstance(x, Term) else kb.term(x)
    if t.kind == KIND_VAR:
        return "?" + t.v
    if t.kind == KIND_BNODE:
        return "_:" + t.v
    if t.kind == KIND_URI:
        # chars outside an IRIREF (SPARQL grammar [139]) would break out of
        # the <...> delimiters — a '>' or whitespace in the value is an
        # injection vector on the remote write path, never a legal IRI
        if any(c in t.v for c in "<>\"{}|^`\\ \n\r\t"):
            raise ValueError(f"not a legal IRI for emission: {t.v!r}")
        return f"<{t.v}>"
    out = f'"{_escape(t.v)}"'
    if t.lang:
        out += "@" + t.lang
    elif t.dt:
        out += f"^^<{t.dt}>"
    return out


def emit_path(kb, spec) -> str:
    """Path spec -> SPARQL 1.1 path syntax (sparql.clj:130-199)."""
    if isinstance(spec, str) or isinstance(spec, Term):
        return emit_term(kb, spec)
    if isinstance(spec, list):
        inner = emit_path(kb, spec[0])
        mods = spec[1:]
        if len(mods) == 1 and mods[0] in ("*", "+", "?"):
            return f"({inner}){mods[0]}"
        if len(mods) == 1:
            return f"({inner}){{{int(mods[0])}}}"
        n, m = mods[0], mods[1]
        if n is None and m is None:
            return f"({inner})*"
        if n is None:
            return f"({inner}){{,{int(m)}}}"
        if m is None:
            return f"({inner}){{{int(n)},}}"
        return f"({inner}){{{int(n)},{int(m)}}}"
    head = spec[0]
    if head == ":or":
        return "(" + "|".join(emit_path(kb, s) for s in spec[1:]) + ")"
    if head == ":inverse":
        return "^(" + emit_path(kb, spec[1]) + ")"
    if head == ":not-props":
        members = []
        for m in spec[1:]:
            if isinstance(m, (list, tuple)) and m and m[0] == ":inverse":
                members.append("^" + emit_term(kb, m[1]))
            else:
                members.append(emit_term(kb, m))
        return "!(" + "|".join(members) + ")"
    return "(" + "/".join(emit_path(kb, s) for s in spec) + ")"


def _emit_filter_expr(kb, e) -> str:
    if not isinstance(e, (list, tuple)) or _is_boxed_literal(e):
        return emit_term(kb, e)
    op = e[0]
    if op == ":ebv":
        # implicit EBV wrapper over a bare-term FILTER — emit the term;
        # parsing the emitted string re-wraps it
        return _emit_filter_expr(kb, e[1])
    if op in (":not", "!"):
        return "(!" + _emit_filter_expr(kb, e[1]) + ")"
    if op == ":and":
        return "(" + " && ".join(_emit_filter_expr(kb, a) for a in e[1:]) + ")"
    if op == ":or":
        return "(" + " || ".join(_emit_filter_expr(kb, a) for a in e[1:]) + ")"
    if op == ":exists-expr":
        inner = emit_body(kb, list(e[1]), "  ")
        return "EXISTS {\n" + inner + "\n}"
    if op in (":in", ":not-in"):
        kw = "IN" if op == ":in" else "NOT IN"
        alts = ", ".join(_emit_filter_expr(kb, a) for a in e[2:])
        return f"({_emit_filter_expr(kb, e[1])} {kw} ({alts}))"
    if op == ":xsd-cast":
        # XPath constructor cast (§17.5): emit the full-IRIREF function
        # form so the string is prefix-independent on the remote wire —
        # <http://www.w3.org/2001/XMLSchema#integer>(?x) parses back to the
        # same (":xsd-cast", "integer", ...) s-expr
        return (
            f"<http://www.w3.org/2001/XMLSchema#{e[1]}>"
            + "(" + _emit_filter_expr(kb, e[2]) + ")"
        )
    if op in _BINARY:
        if len(e) == 3:
            return f"({_emit_filter_expr(kb, e[1])} {op} {_emit_filter_expr(kb, e[2])})"
        return "(" + f" {op} ".join(_emit_filter_expr(kb, a) for a in e[1:]) + ")"
    if op in _FN_NAMES:
        return _FN_NAMES[op] + "(" + ", ".join(_emit_filter_expr(kb, a) for a in e[1:]) + ")"
    raise ValueError(f"cannot emit filter op {op!r}")


def _is_boxed_literal(x) -> bool:
    return (
        isinstance(x, (list, tuple))
        and 1 <= len(x) <= 2
        and not any(isinstance(e, (list, tuple)) for e in x)
        and not (isinstance(x[0], str) and x[0] in FILTER_OPS)
    )


def emit_body(kb, clauses, indent: str = "  ") -> str:
    """Clause list -> group-graph-pattern body lines (sparql.clj:398-410)."""
    lines: list[str] = []
    for clause in clauses:
        lines.append(indent + _emit_clause(kb, clause, indent))
    return "\n".join(lines)


def _emit_clause(kb, clause, indent: str) -> str:
    if not isinstance(clause, (list, tuple)) or not clause:
        raise ValueError(f"bad clause {clause!r}")
    head = clause[0]
    if isinstance(head, str):
        if head == ":optional":
            inner = emit_body(kb, list(clause[1:]), indent + "  ")
            return "OPTIONAL {\n" + inner + "\n" + indent + "}"
        if head == ":union":
            parts = [
                "{\n" + emit_body(kb, list(b), indent + "  ") + "\n" + indent + "}"
                for b in clause[1:]
            ]
            return " UNION ".join(parts)
        if head == ":minus":
            inner = emit_body(kb, list(clause[1:]), indent + "  ")
            return "MINUS {\n" + inner + "\n" + indent + "}"
        if head == ":exists":
            inner = emit_body(kb, list(clause[1:]), indent + "  ")
            return "FILTER EXISTS {\n" + inner + "\n" + indent + "}"
        if head == ":not-exists":
            inner = emit_body(kb, list(clause[1:]), indent + "  ")
            return "FILTER NOT EXISTS {\n" + inner + "\n" + indent + "}"
        if head == ":bind":
            expr, var = clause[1], clause[2]
            return (
                "BIND (" + _emit_filter_expr(kb, expr) + " AS "
                + emit_term(kb, var) + ")"
            )
        if head == ":values":
            vars_, rows = clause[1], clause[2]
            vs = " ".join(emit_term(kb, v) for v in vars_)
            cells = []
            for row in rows:
                vals = " ".join(
                    "UNDEF" if c is None else emit_term(kb, c) for c in row
                )
                cells.append("(" + vals + ")")
            return "VALUES (" + vs + ") { " + " ".join(cells) + " }"
        if head == ":subquery":
            raise ValueError(
                "cannot emit a sub-SELECT clause back to SPARQL text; "
                "query the endpoint with the raw string instead"
            )
        if head in FILTER_OPS:
            # always parenthesized, like the reference (sparql.clj:394-395)
            return "FILTER (" + _emit_filter_expr(kb, clause) + ")"
    if isinstance(head, (list, tuple)) and not _is_boxed_literal(head):
        # nested group
        return "{\n" + emit_body(kb, list(clause), indent + "  ") + "\n" + indent + "}"
    s, p, o = clause[0], clause[1], clause[2]
    p_str = emit_path(kb, p) if isinstance(p, (list, tuple)) else emit_term(kb, p)
    tp = f"{emit_term(kb, s)} {p_str} {emit_term(kb, o)} ."
    if len(clause) == 4:
        return "GRAPH " + emit_term(kb, clause[3]) + " { " + tp + " }"
    return tp


def _collect_vars(kb, tree, out: list[str]) -> None:
    if isinstance(tree, (list, tuple)):
        if _is_boxed_literal(tree):
            return
        if tree and tree[0] in (":exists", ":not-exists", ":exists-expr"):
            # vars bound only inside [NOT] EXISTS are scoped to it
            # (§18.2.1) — they must not surface in the SELECT projection
            return
        for x in tree:
            _collect_vars(kb, x, out)
        return
    if isinstance(tree, str) and tree.startswith("?/") and tree[2:] not in out:
        out.append(tree[2:])
    if isinstance(tree, Term) and tree.kind == KIND_VAR and tree.v not in out:
        out.append(tree.v)


def emit_select(
    kb,
    pattern,
    select_vars: list[str] | None = None,
    distinct: bool = False,
    limit: int | None = None,
) -> str:
    """SELECT query string (sparql-select-query, sparql.clj:426-444)."""
    if select_vars is None:
        vs: list[str] = []
        _collect_vars(kb, pattern, vs)
        proj = " ".join("?" + v for v in vs) if vs else "*"
    else:
        proj = " ".join("?" + v.removeprefix("?/") for v in select_vars)
    head = "SELECT " + ("DISTINCT " if distinct else "") + proj
    q = head + " WHERE {\n" + emit_body(kb, pattern) + "\n}"
    if limit is not None:
        q += f"\nLIMIT {int(limit)}"
    return q


def emit_ask(kb, pattern) -> str:
    return "ASK {\n" + emit_body(kb, pattern) + "\n}"


def emit_count(kb, pattern, limit: int | None = None) -> str:
    """SPARQL 1.1 count form (sparql.clj:478-496; unique count var :468-476)."""
    q = "SELECT (COUNT(*) AS ?count0) WHERE {\n" + emit_body(kb, pattern) + "\n}"
    if limit is not None:
        q += f"\nLIMIT {int(limit)}"
    return q


def emit_construct(kb, create_pattern, pattern, limit: int | None = None) -> str:
    tmpl = "\n".join(
        "  " + _emit_clause(kb, tp, "  ") for tp in create_pattern
    )
    q = "CONSTRUCT {\n" + tmpl + "\n} WHERE {\n" + emit_body(kb, pattern) + "\n}"
    if limit is not None:
        q += f"\nLIMIT {int(limit)}"
    return q
