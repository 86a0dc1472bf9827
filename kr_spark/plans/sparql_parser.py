"""Raw-SPARQL-string entry points (Q9; sparql.clj:51-57,560-603).

The reference hands SPARQL strings to Jena/Sesame verbatim; we have no
backend parser, so this is a small recursive-descent parser for the SPARQL
subset the reference's own compiler EMITS (sparql.clj:398-444) — i.e., any
query kr itself generates round-trips through here:

  PREFIX decls;  SELECT [DISTINCT] (?v ... | *) WHERE { ... } [LIMIT n];
  ASK { ... };  CONSTRUCT { triples } WHERE { ... } [LIMIT n];
  SELECT (COUNT(*) AS ?c) WHERE { ... }   (the 1.1 count form);
  groups of triple patterns with OPTIONAL { }, { } UNION { },
  GRAPH <g>/prefixed { }, FILTER (expr) with the §2.5 operator set;
  terms: <uri>, prefix:local, ?var, _:bnode, "lit"[@lang|^^dt], numbers;
  property paths in predicate position — the syntax kr's own compiler emits
  (sparql.clj:130-199): p* p+ p? p{n} p{n,m} p{n,} p{,m}, p1/p2, p1|p2, ^p,
  parenthesized composition.

The output is the engine's native pattern s-expression (plans/compiler.py
input), so the full Catalyst pipeline — join ordering, pushdown, branch
pruning, bound-endpoint path seeding — applies identically to parsed
queries.
"""

from __future__ import annotations

import re

_TOKEN = re.compile(
    r"""
    \s*(?:
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>\s]*>)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<var>[?$][A-Za-z_][\w-]*)
    | (?P<bnode>_:[A-Za-z_][\w-]*)
    | (?P<number>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<langtag>@[A-Za-z][\w-]*)
    | (?P<dtmark>\^\^)
    | (?P<punct>[{}().,;]|\|\||&&|!=|<=|>=|[=<>!*/+?^|-])
    | (?P<word>[A-Za-z_][\w.-]*:?[\w.-]*)
    )
    """,
    re.VERBOSE,
)


_SIMPLE_ESC = {"\\": "\\", '"': '"', "'": "'", "n": "\n", "r": "\r", "t": "\t",
               "b": "\b", "f": "\f"}


def _unescape_string(s: str) -> str:
    """SPARQL string-literal escapes: simple (\\n \\r \\t \\" \\\\ ...) and
    \\uXXXX / \\UXXXXXXXX (left-to-right, so escaped backslashes can't feed
    later escapes — same contract as sources/ntriples.unescape_ntriples)."""

    def sub(m: re.Match) -> str:
        g = m.group(1)
        if g[0] in "uU" and len(g) > 1:
            return chr(int(g[1:], 16))
        return _SIMPLE_ESC.get(g, "\\" + g)

    return re.sub(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)", sub, s)

_KEYWORDS = {
    "prefix", "select", "ask", "construct", "where", "distinct", "reduced",
    "limit", "optional", "union", "filter", "graph", "count", "as",
}


def _tokenize(text: str) -> list[str]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN.match(text, i)
        if not m or m.end() == i:
            if text[i:].strip() == "":
                break
            raise ValueError(f"SPARQL tokenize error at: {text[i:i+30]!r}")
        i = m.end()
        if m.lastgroup != "comment":
            out.append(m.group().strip())
    return out


class _Parser:
    def __init__(self, kb, text: str):
        self.kb = kb
        self.toks = _tokenize(text)
        self.pos = 0
        self.prefixes: dict[str, str] = dict(kb.ns.short_to_long)

    # ---- token helpers ----
    def peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of SPARQL")
        self.pos += 1
        return t

    def eat(self, want: str) -> None:
        t = self.next()
        if t.lower() != want.lower():
            raise ValueError(f"expected {want!r}, got {t!r}")

    def at_kw(self, kw: str) -> bool:
        t = self.peek()
        return t is not None and t.lower() == kw

    # ---- terms ----
    def _term(self, tok: str):
        """SPARQL token -> engine pattern slot."""
        if tok.startswith("<"):
            return tok  # engine accepts <uri> form directly
        if tok[0] in "?$":
            return "?/" + tok[1:]
        if tok.startswith("_:"):
            return "_/" + tok[2:]
        if tok.startswith('"'):
            m = re.match(r'^"((?:[^"\\]|\\.)*)"$', tok)
            lex = _unescape_string(m.group(1))
            nxt = self.peek()
            if nxt and nxt.startswith("@"):
                self.next()
                return [lex, nxt[1:]]
            if nxt == "^^":
                self.next()
                return [lex, self._term(self.next())]
            return [lex]  # explicit quoted literal without tag = bare-boxed
        if re.fullmatch(r"[+-]?\d+", tok):
            return int(tok)
        if re.fullmatch(r"[+-]?\d*\.\d+(?:[eE][+-]?\d+)?|[+-]?\d+[eE][+-]?\d+", tok):
            return float(tok)
        if ":" in tok:
            short, local = tok.split(":", 1)
            if short == "" and local == "":
                raise ValueError("bare ':' prefixed name unsupported")
            base = self.prefixes.get(short)
            if base is None:
                raise ValueError(f"unknown prefix {short!r}")
            return f"<{base}{local}>"
        if tok.lower() == "a":
            return "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
        raise ValueError(f"cannot parse term {tok!r}")

    # ---- group graph pattern ----
    def group(self) -> list:
        """Parse '{ ... }' -> list of engine clauses."""
        self.eat("{")
        clauses: list = []
        while not self.at_kw("}"):
            if self.at_kw("optional"):
                self.next()
                clauses.append((":optional", *self.group()))
            elif self.at_kw("filter"):
                self.next()
                clauses.append(self.filter_expr())
            elif self.at_kw("graph"):
                self.next()
                g = self._term(self.next())
                inner = self.group()
                for tp in inner:
                    clauses.append(tuple(tp) + (g,) if isinstance(tp, tuple) and len(tp) == 3 else tp)
            elif self.peek() == "{":
                branches = [self.group()]
                while self.at_kw("union"):
                    self.next()
                    branches.append(self.group())
                if len(branches) == 1:
                    clauses.extend(branches[0])
                else:
                    clauses.append((":union", *branches))
            else:
                s = self._term(self.next())
                p = self._path()
                o = self._term(self.next())
                clauses.append((s, p, o))
                if self.peek() == ".":
                    self.next()
        self.eat("}")
        return clauses

    # ---- property paths in predicate position (sparql.clj:130-199) ----
    # SPARQL 1.1 path grammar subset kr emits. Engine spec mapping:
    #   modifier  -> list:  ["p","*"] ["p","+"] ["p","?"] ["p",n] ["p",n,m]
    #   sequence  -> tuple: ("p1","p2")   alternation -> (":or", ...)
    #   inverse   -> (":inverse", p)
    def _path(self):
        alts = [self._path_seq()]
        while self.peek() == "|":
            self.next()
            alts.append(self._path_seq())
        return alts[0] if len(alts) == 1 else (":or", *alts)

    def _path_seq(self):
        parts = [self._path_elt()]
        while self.peek() == "/":
            self.next()
            parts.append(self._path_elt())
        return parts[0] if len(parts) == 1 else tuple(parts)

    def _path_elt(self):
        inverse = False
        if self.peek() == "^":
            self.next()
            inverse = True
        if self.peek() == "(":
            self.next()
            prim = self._path()
            self.eat(")")
        else:
            prim = self._term(self.next())
        t = self.peek()
        if t == "*":
            self.next()
            prim = [prim, "*"]
        elif t == "+":
            self.next()
            prim = [prim, "+"]
        elif t == "?":
            self.next()
            prim = [prim, "?"]
        elif t == "{":
            self.next()
            n = int(self.next()) if re.fullmatch(r"\d+", self.peek() or "") else None
            if self.peek() == ",":
                self.next()
                m = int(self.next()) if re.fullmatch(r"\d+", self.peek() or "") else None
                prim = [prim, n, m]
            else:
                prim = [prim, n]  # p{n} exact
            self.eat("}")
        if inverse:
            prim = (":inverse", prim)
        return prim

    # ---- FILTER expressions -> engine filter s-exprs ----
    _CMP = {"=", "!=", "<", ">", "<=", ">="}
    _FN = {
        "bound": ":bound", "isiri": ":isIRI", "isuri": ":isURI",
        "isblank": ":isBlank", "isliteral": ":isLiteral", "str": ":str",
        "lang": ":lang", "datatype": ":datatype", "sameterm": ":sameTerm",
        "langmatches": ":langMatches", "regex": ":regex",
    }

    def filter_expr(self):
        self.eat("(")
        e = self._or_expr()
        self.eat(")")
        return e

    def _or_expr(self):
        parts = [self._and_expr()]
        while self.peek() == "||":
            self.next()
            parts.append(self._and_expr())
        return parts[0] if len(parts) == 1 else (":or", *parts)

    def _and_expr(self):
        parts = [self._unary_expr()]
        while self.peek() == "&&":
            self.next()
            parts.append(self._unary_expr())
        return parts[0] if len(parts) == 1 else (":and", *parts)

    def _unary_expr(self):
        if self.peek() == "!":
            self.next()
            return (":not", self._unary_expr())
        if self.peek() == "(":
            self.next()
            e = self._or_expr()
            self.eat(")")
            return self._maybe_cmp(e)
        return self._maybe_cmp(self._primary())

    def _maybe_cmp(self, left):
        if self.peek() in self._CMP:
            op = self.next()
            right = self._primary()
            return (op, left, right)
        return left

    def _primary(self):
        t = self.next()
        low = t.lower()
        if low in self._FN:
            self.eat("(")
            args = []
            while self.peek() != ")":
                if self.peek() == ",":
                    self.next()
                    continue
                args.append(self._primary())
            self.eat(")")
            if low == "regex":
                # regex(text, "pat" [, "flags"]) — engine wants raw-boxed
                pat = args[1]
                flags = args[2] if len(args) > 2 else None
                pat = pat[0] if isinstance(pat, list) else pat
                out = (":regex", args[0], [pat])
                if flags is not None:
                    out += ([flags[0] if isinstance(flags, list) else flags],)
                return out
            return (self._FN[low], *args)
        return self._term_for_filter(t)

    def _term_for_filter(self, tok: str):
        v = self._term(tok)
        # bare-boxed single strings in filters stay boxed (no lang attach)
        return v

    # ---- query forms ----
    def parse(self) -> dict:
        while self.at_kw("prefix"):
            self.next()
            name = self.next()
            if not name.endswith(":"):
                raise ValueError(f"bad PREFIX name {name!r}")
            iri = self.next()
            self.prefixes[name[:-1]] = iri[1:-1]
        form = self.next().lower()
        if form == "ask":
            if self.at_kw("where"):
                self.next()
            return {"type": "ask", "pattern": self.group()}
        if form == "select":
            distinct = False
            if self.at_kw("distinct") or self.at_kw("reduced"):
                distinct = self.next().lower() == "distinct"
            count_var = None
            select_vars: list[str] | None = None
            if self.peek() == "(":
                self.next()
                self.eat("count")
                self.eat("(")
                self.eat("*")
                self.eat(")")
                self.eat("as")
                count_var = self.next()
                self.eat(")")
            elif self.peek() == "*":
                self.next()
            else:
                select_vars = []
                while self.peek() and self.peek()[0] in "?$":
                    select_vars.append("?/" + self.next()[1:])
            if self.at_kw("where"):
                self.next()
            pattern = self.group()
            limit = self._limit()
            if count_var is not None:
                return {"type": "count", "pattern": pattern, "limit": limit}
            return {
                "type": "select",
                "pattern": pattern,
                "select_vars": select_vars,
                "distinct": distinct,
                "limit": limit,
            }
        if form == "construct":
            template = [tuple(tp) for tp in self.group()]
            self.eat("where")
            pattern = self.group()
            limit = self._limit()
            return {"type": "construct", "template": template, "pattern": pattern, "limit": limit}
        raise ValueError(f"unsupported SPARQL form {form!r}")

    def _limit(self):
        if self.at_kw("limit"):
            self.next()
            return int(self.next())
        return None


def parse_sparql(kb, text: str) -> dict:
    return _Parser(kb, text).parse()


def sparql_query(kb, text: str) -> list[dict]:
    q = parse_sparql(kb, text)
    if q["type"] == "select":
        return kb.query(
            q["pattern"],
            select_vars=q["select_vars"],
            distinct=q["distinct"],
            limit=q["limit"],
        )
    raise ValueError(f"not a SELECT query: {q['type']}")


def sparql_ask(kb, text: str) -> bool:
    q = parse_sparql(kb, text)
    if q["type"] != "ask":
        raise ValueError(f"not an ASK query: {q['type']}")
    return kb.ask(q["pattern"])


def sparql_count(kb, text: str) -> int:
    q = parse_sparql(kb, text)
    if q["type"] not in ("count", "select"):
        raise ValueError(f"not countable: {q['type']}")
    # a SELECT DISTINCT counted as bag semantics over-reports (ADVICE r1)
    return kb.count(
        q["pattern"], distinct=q.get("distinct", False), limit=q.get("limit")
    )


def sparql_construct(kb, text: str):
    q = parse_sparql(kb, text)
    if q["type"] != "construct":
        raise ValueError(f"not a CONSTRUCT query: {q['type']}")
    return kb.construct(q["template"], q["pattern"])
