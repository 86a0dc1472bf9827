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
  parenthesized composition;
  SPARQL 1.1 algebra (the reference runs these through Jena verbatim):
  BIND(expr AS ?v), VALUES (1-var and n-var forms, UNDEF), MINUS { },
  FILTER [NOT] EXISTS { }, aggregates COUNT/SUM/AVG/MIN/MAX/GROUP_CONCAT
  (with DISTINCT and SEPARATOR)/SAMPLE, GROUP BY, HAVING (over aggregate
  aliases), ORDER BY [ASC|DESC](?v)..., OFFSET; expression precedence
  || > && > cmp > +- > */ > unary.

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
    | (?P<number>[+-]?(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<langtag>@[A-Za-z][\w-]*)
    | (?P<dtmark>\^\^)
    | (?P<punct>[{}()\[\].,;]|\|\||&&|!=|<=|>=|[=<>!*/+?^|-])
    | (?P<word>(?:[A-Za-z_][\w.-]*)?:[\w.-]*|[A-Za-z_][\w.-]*)
    )
    """,
    re.VERBOSE,
)


_SIMPLE_ESC = {"\\": "\\", '"': '"', "'": "'", "n": "\n", "r": "\r", "t": "\t",
               "b": "\b", "f": "\f"}

_XSD_NS = "http://www.w3.org/2001/XMLSchema#"


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
    "bind", "values", "minus", "exists", "not", "undef", "group", "by",
    "describe",
    "having", "order", "asc", "desc", "offset", "sum", "avg", "min", "max",
    "group_concat", "sample", "separator",
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
        self.base = ""  # BASE directive (grammar [5])
        self._bnode_n = 0  # fresh-bnode counter for [ ... ] property lists

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
    @staticmethod
    def _is_plain_triple(c) -> bool:
        """True for a bare triple/quad clause — not a keyword form
        (':optional', ':bind', ...) and not a FILTER operator application."""
        from kr_spark.plans.filters import FILTER_OPS

        return (
            isinstance(c, (list, tuple))
            and len(c) in (3, 4)
            and not (
                isinstance(c[0], str)
                and (c[0].startswith(":") or c[0] in FILTER_OPS)
            )
        )

    def _term(self, tok: str):
        """SPARQL token -> engine pattern slot."""
        if tok.startswith("<"):
            iri = tok[1:-1]
            if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
                # BASE-relative IRIREF (grammar [5]) — RFC 3986 resolution
                from urllib.parse import urljoin

                return f"<{urljoin(self.base, iri)}>"
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
        if re.fullmatch(r"[+-]?\d*\.\d+", tok):
            # DECIMAL (grammar [147], no exponent) -> xsd:decimal; only an
            # exponent makes the token a DOUBLE
            return [tok, "<http://www.w3.org/2001/XMLSchema#decimal>"]
        if re.fullmatch(r"[+-]?\d*\.?\d+[eE][+-]?\d+", tok):
            return float(tok)
        if ":" in tok:
            # PNAME (grammar [140-141]) — the empty prefix (PREFIX : <...>)
            # and the bare ':' name (= the namespace IRI itself) are legal
            short, local = tok.split(":", 1)
            base = self.prefixes.get(short)
            if base is None:
                raise ValueError(f"unknown prefix {short!r}")
            return f"<{base}{local}>"
        if tok.lower() == "a":
            return "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
        if tok.lower() in ("true", "false"):
            # BooleanLiteral (grammar [134]; keywords are case-insensitive)
            return [tok.lower(), "<http://www.w3.org/2001/XMLSchema#boolean>"]
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
            elif self.at_kw("minus"):
                self.next()
                clauses.append((":minus", *self.group()))
            elif self.at_kw("bind"):
                self.next()
                self.eat("(")
                e = self._or_expr()
                self.eat("as")
                var = self.next()
                if var[0] not in "?$":
                    raise ValueError(f"BIND target must be a var, got {var!r}")
                self.eat(")")
                clauses.append((":bind", e, "?/" + var[1:]))
            elif self.at_kw("values"):
                self.next()
                clauses.append(self._values())
            elif self.at_kw("filter"):
                self.next()
                if self.at_kw("exists"):
                    self.next()
                    clauses.append((":exists", *self.group()))
                elif self.at_kw("not"):
                    self.next()
                    self.eat("exists")
                    clauses.append((":not-exists", *self.group()))
                else:
                    e = self.filter_expr()
                    # a parenthesized FILTER((NOT) EXISTS {..}) normalizes
                    # to the clause-level semi/anti form (single join, no
                    # arm splitting)
                    if isinstance(e, tuple) and e and e[0] == ":exists-expr":
                        e = (":exists", *e[1])
                    elif (
                        isinstance(e, tuple)
                        and len(e) == 2
                        and e[0] == ":not"
                        and isinstance(e[1], tuple)
                        and e[1]
                        and e[1][0] == ":exists-expr"
                    ):
                        e = (":not-exists", *e[1][1])
                    else:
                        from kr_spark.plans.filters import FILTER_OPS

                        if not (
                            isinstance(e, tuple)
                            and e
                            and isinstance(e[0], str)
                            and e[0] in FILTER_OPS
                        ):
                            # bare-term FILTER (a var, literal, or boolean
                            # constant): the filter value is the term's
                            # EFFECTIVE boolean value (§17.2.2)
                            e = (":ebv", e)
                    clauses.append(e)
            elif self.at_kw("graph"):
                self.next()
                g = self._term(self.next())
                inner = self.group()
                for tp in inner:
                    clauses.append(tuple(tp) + (g,) if isinstance(tp, tuple) and len(tp) == 3 else tp)
            elif (
                self.peek() == "{"
                and self.pos + 1 < len(self.toks)
                and self.toks[self.pos + 1].lower() == "select"
            ):
                # sub-SELECT (SPARQL 1.1 §12): evaluated independently
                # (bottom-up, no correlation per spec), joined on shared vars
                self.next()  # {
                self.next()  # select
                q = self._parse_select(subquery=True)
                self.eat("}")
                if self.at_kw("union"):
                    raise ValueError(
                        "a sub-SELECT as a UNION branch is not supported; "
                        "wrap it in an extra group: { { SELECT ... } } UNION ..."
                    )
                clauses.append((":subquery", q))
            elif self.peek() == "{":
                branches = [self.group()]
                while self.at_kw("union"):
                    self.next()
                    branches.append(self.group())
                if len(branches) == 1:
                    # a lone nested group of PURE triple patterns flattens
                    # into the parent (Join commutes); anything scoped —
                    # BIND (its no-rebind rule is per-group), FILTER (sees
                    # only its group's bindings), OPTIONAL/MINUS/VALUES
                    # (positional) — must stay a group clause so
                    # { VALUES ?y {..} { BIND(e AS ?y) } } stays legal
                    # (round-5 fix; the engine joins groups compatibly)
                    if all(self._is_plain_triple(c) for c in branches[0]):
                        clauses.extend(branches[0])
                    else:
                        clauses.append(list(branches[0]))
                else:
                    clauses.append((":union", *branches))
            else:
                # TriplesSameSubjectPath with Turtle-style abbreviations
                # (Jena accepts these in query strings): `;` predicate-object
                # lists, `,` object lists, and `[ ... ]` blank-node property
                # lists in subject or object position
                was_pl = self.peek() == "["
                s = self._subject_node(clauses)
                # `[ pol ] .` alone is a complete triples block (the
                # property list already emitted its triples)
                if not (was_pl and self.peek() in (".", "}")):
                    self._predicate_object_list(s, clauses)
            # GraphPatternNotTriples '.'? (SPARQL 1.1 grammar [54]): a dot
            # is legal (and common) after ANY clause — `{...} UNION {...} .`,
            # `OPTIONAL {...} .` — not just after a triples block
            if self.peek() == ".":
                self.next()
        self.eat("}")
        return clauses

    def _subject_node(self, clauses: list):
        """Subject position: a term, or `[ pol ]` minting a fresh bnode whose
        property list's triples are appended to `clauses`."""
        if self.peek() == "[":
            return self._bnode_property_list(clauses)
        return self._term(self.next())

    def _object_node(self, clauses: list):
        if self.peek() == "[":
            return self._bnode_property_list(clauses)
        return self._term(self.next())

    def _bnode_property_list(self, clauses: list):
        """`[ p1 o1 ; p2 o2 ]` -> fresh non-capturing bnode (parse-local
        gensym; bnodes in patterns are wildcard vars, sparql.clj:73-77)."""
        self.eat("[")
        self._bnode_n += 1
        node = f"_/__pl{self._bnode_n}"
        if self.peek() != "]":  # `[]` alone is just a fresh node
            self._predicate_object_list(node, clauses)
        self.eat("]")
        return node

    def _predicate_object_list(self, s, clauses: list) -> None:
        """verb objectList (';' (verb objectList)?)* — appends (s, p, o)
        clauses; verbs may be property paths."""
        while True:
            p = self._path()
            while True:
                o = self._object_node(clauses)
                clauses.append((s, p, o))
                if self.peek() == ",":
                    self.next()
                    continue
                break
            if self.peek() == ";":
                self.next()
                # trailing ';' before '.', '}' or ']' is legal
                if self.peek() in (".", "}", "]", ";", None):
                    break
                continue
            break

    def _var_ref(self, where: str) -> str:
        """Consume a token that MUST be a ?var/$var (ADVICE r2: silent
        first-char stripping turned 'AS cnt' into alias 'nt')."""
        t = self.next()
        if not t or t[0] not in "?$" or len(t) < 2:
            raise ValueError(f"{where}: expected a ?variable, got {t!r}")
        return "?/" + t[1:]

    def _values(self) -> tuple:
        """VALUES ?x { v... }  |  VALUES (?x ?y) { (v v) (UNDEF v) ... }"""
        if self.peek() == "(":
            self.next()
            vars_ = []
            while self.peek() != ")":
                vars_.append(self._var_ref("VALUES"))
            self.eat(")")
            rows = []
            self.eat("{")
            while self.peek() == "(":
                self.next()
                row = []
                while self.peek() != ")":
                    row.append(self._values_cell())
                self.eat(")")
                rows.append(row)
            self.eat("}")
        else:
            vars_ = [self._var_ref("VALUES")]
            rows = []
            self.eat("{")
            while not self.at_kw("}"):
                rows.append([self._values_cell()])
            self.eat("}")
        return (":values", vars_, rows)

    def _values_cell(self):
        if self.at_kw("undef"):
            self.next()
            return None
        return self._term(self.next())

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
        if self.peek() == "!":
            # negated property set: !iri | !^iri | !(iri|^iri|...) (§9.1)
            self.next()
            prim = (":not-props", *self._negated_set())
        elif self.peek() == "(":
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

    def _negated_set(self) -> list:
        """Members of a negated property set: iri or ^iri, |-separated when
        parenthesized."""

        def member():
            if self.peek() == "^":
                self.next()
                return (":inverse", self._term(self.next()))
            return self._term(self.next())

        if self.peek() != "(":
            return [member()]
        self.next()
        out = [member()]
        while self.peek() == "|":
            self.next()
            out.append(member())
        self.eat(")")
        return out

    # ---- FILTER expressions -> engine filter s-exprs ----
    _CMP = {"=", "!=", "<", ">", "<=", ">="}
    _FN = {
        "bound": ":bound", "isiri": ":isIRI", "isuri": ":isURI",
        "isblank": ":isBlank", "isliteral": ":isLiteral", "str": ":str",
        "lang": ":lang", "datatype": ":datatype", "sameterm": ":sameTerm",
        "langmatches": ":langMatches", "regex": ":regex",
        # SPARQL 1.1 §17.4 builtins
        "strlen": ":strlen", "substr": ":substr", "ucase": ":ucase",
        "lcase": ":lcase", "contains": ":contains", "strstarts": ":strstarts",
        "strends": ":strends", "concat": ":concat", "replace": ":replace",
        "strbefore": ":strbefore", "strafter": ":strafter",
        "encode_for_uri": ":encode_for_uri", "abs": ":abs", "round": ":round",
        "ceil": ":ceil", "floor": ":floor", "if": ":if",
        "coalesce": ":coalesce", "iri": ":iri", "uri": ":uri",
        "strdt": ":strdt", "strlang": ":strlang", "bnode": ":bnode",
        "md5": ":md5", "sha1": ":sha1", "sha256": ":sha256",
        "sha384": ":sha384", "sha512": ":sha512",
        "isnumeric": ":isNumeric", "now": ":now", "year": ":year", "month": ":month",
        "day": ":day", "hours": ":hours", "minutes": ":minutes",
        "seconds": ":seconds", "tz": ":tz", "timezone": ":timezone",
        "rand": ":rand", "uuid": ":uuid", "struuid": ":struuid",
    }

    def filter_expr(self):
        if self.peek() != "(":
            # Constraint (grammar [68]) is BrackettedExpression OR a bare
            # BuiltInCall / FunctionCall: `FILTER regex(?t, "x")`,
            # `FILTER isIRI(?x)`, `FILTER xsd:integer(?v)` — no parens
            return self._unary_expr()
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
        parts = [self._rel_expr()]
        while self.peek() == "&&":
            self.next()
            parts.append(self._rel_expr())
        return parts[0] if len(parts) == 1 else (":and", *parts)

    # precedence: || > && > cmp > +- > */ > unary (SPARQL 1.1 §19.8 grammar);
    # caveat shared with the real grammar: '?a-3' lexes as var, '10-3' as two
    # number tokens — put spaces around minus.
    def _rel_expr(self):
        left = self._add_expr()
        low = (self.peek() or "").lower()
        if low == "in":
            self.next()
            return (":in", left, *self._in_list())
        if low == "not" and self.pos + 1 < len(self.toks) and self.toks[self.pos + 1].lower() == "in":
            self.next()
            self.next()
            return (":not-in", left, *self._in_list())
        if self.peek() in self._CMP:
            op = self.next()
            return (op, left, self._add_expr())
        return left

    def _in_list(self) -> list:
        """Parenthesized, comma-separated expression list of IN / NOT IN."""
        self.eat("(")
        items = []
        while self.peek() != ")":
            if self.peek() == ",":
                self.next()
                continue
            items.append(self._or_expr())
        self.eat(")")
        return items

    def _add_expr(self):
        e = self._mul_expr()
        while self.peek() in ("+", "-"):
            op = self.next()
            e = (op, e, self._mul_expr())
        return e

    def _mul_expr(self):
        e = self._unary_expr()
        while self.peek() in ("*", "/"):
            op = self.next()
            e = (op, e, self._unary_expr())
        return e

    def _unary_expr(self):
        if self.peek() == "!":
            self.next()
            return (":not", self._unary_expr())
        # ExistsFunc / NotExistsFunc in expression position (§17.4.1.4-5):
        # FILTER(EXISTS { ... } && ?a > 3). Compiled by truth-assignment arm
        # splitting in the pattern compiler (semi/anti join per arm).
        if self.at_kw("exists"):
            self.next()
            return (":exists-expr", tuple(self.group()))
        if (
            self.at_kw("not")
            and self.pos + 1 < len(self.toks)
            and self.toks[self.pos + 1].lower() == "exists"
        ):
            self.next()
            self.next()
            return (":not", (":exists-expr", tuple(self.group())))
        if self.peek() in ("-", "+"):
            # UnaryExpression [118]: '+'/'-' PrimaryExpression. Compiled as
            # 0±e — same XPath promotion (int stays int, decimal stays
            # decimal) and same error-on-non-numeric as the binary ops
            op = self.next()
            return (op, self._term("0"), self._unary_expr())
        if self.peek() == "(":
            self.next()
            e = self._or_expr()
            self.eat(")")
            return e
        return self._primary()

    def _primary(self):
        t = self.next()
        low = t.lower()
        if low in self._AGGS and self.peek() == "(":
            # aggregate call in expression position (HAVING(COUNT(?x) >= 2),
            # ORDER BY DESC(COUNT(?n)), SELECT (COUNT(?x)+1 AS ?c)); resolved
            # to a (possibly hidden) aggregate alias after the SELECT parses
            return self._agg_call(low)
        if low in self._FN:
            self.eat("(")
            args = []
            while self.peek() != ")":
                if self.peek() == ",":
                    self.next()
                    continue
                args.append(self._or_expr())
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
            if (
                low in ("iri", "uri")
                and self.base
                and len(args) == 1
                and isinstance(args[0], list)
                and len(args[0]) == 1
                and isinstance(args[0][0], str)
                and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", args[0][0])
            ):
                # §17.4.2.8: IRI(str) resolves against the query's BASE;
                # constant relative strings resolve at parse time (dynamic
                # args keep the engine's as-is behavior)
                from urllib.parse import urljoin

                args = [[urljoin(self.base, args[0][0])]]
            return (self._FN[low], *args)
        # grammar [128] iriOrFunction: a prefixed name / IRIREF followed by
        # '(' is a function call — the XPath constructor casts (§17.5) are
        # the supported family (xsd:integer(?x), <...XMLSchema#double>(?x));
        # Jena evaluates these for every kr raw string (sparql.clj:560-603)
        if (
            self.peek() == "("
            and t[0] not in "?$\"<" + "0123456789+-."
            and not t.startswith("_:")
            and ":" in t
        ) or (self.peek() == "(" and t.startswith("<")):
            iri = self._term(t)
            if isinstance(iri, str) and iri.startswith("<"):
                full = iri[1:-1]
                if full.startswith(_XSD_NS):
                    local = full[len(_XSD_NS):]
                    from kr_spark.plans.filters import XSD_CAST_TYPES

                    if local in XSD_CAST_TYPES:
                        self.eat("(")
                        arg = self._or_expr()
                        self.eat(")")
                        return (":xsd-cast", local, arg)
                    raise ValueError(
                        f"unsupported XSD constructor xsd:{local} — "
                        "supported: " + ", ".join(sorted(XSD_CAST_TYPES))
                    )
                raise ValueError(
                    f"unsupported function IRI <{full}> — only the XPath "
                    "constructor casts (SPARQL 1.1 §17.5) are supported"
                )
        return self._term_for_filter(t)

    def _term_for_filter(self, tok: str):
        v = self._term(tok)
        # bare-boxed single strings in filters stay boxed (no lang attach)
        return v

    # ---- query forms ----
    def _parse_select(self, subquery: bool = False) -> dict:
        """Body of a SELECT (the 'select' keyword already consumed). With
        subquery=True the bare-COUNT collapse is skipped — a sub-SELECT's
        alias is its projection and must survive (§11.5 count form only
        matters for kr's emitted top-level count strings)."""
        distinct = False
        if self.at_kw("distinct") or self.at_kw("reduced"):
            distinct = self.next().lower() == "distinct"
        select_vars: list[str] | None = None
        aggs: list[tuple] = []
        proj_exprs: list[tuple] = []  # (expr, alias) — §18.2.4.4 Extend
        select_order: list[str] | None = None  # SELECT-list column order
        if self.peek() == "*":
            self.next()
        else:
            select_vars = []
            select_order = []
            while True:
                t = self.peek()
                if t and t[0] in "?$":
                    v = "?/" + self.next()[1:]
                    select_vars.append(v)
                    select_order.append(v[2:])
                elif t == "(":
                    # '(expr AS ?v)' — a bare aggregate call becomes an
                    # aggregate item; anything else (incl. expressions with
                    # nested aggregates) a projection expression
                    self.next()
                    node = self._or_expr()
                    self.eat("as")
                    alias = self._var_ref("AS")[2:]
                    self.eat(")")
                    if isinstance(node, tuple) and node and node[0] == ":agg":
                        aggs.append((node[1], node[2], alias, node[3], node[4]))
                    else:
                        proj_exprs.append((node, alias))
                        select_vars.append("?/" + alias)
                    select_order.append(alias)
                else:
                    break
        if self.at_kw("where"):
            self.next()
        pattern = self.group()
        mods = self._modifiers()

        # ValuesClause (grammar [28]): a trailing VALUES after the solution
        # modifiers joins its data block with the query solutions
        # (§18.2.4.3) — previously it was silently IGNORED. For
        # non-aggregate queries joining into the pattern is equivalent;
        # with grouping the spec joins post-aggregation, which this
        # translation can't express — refuse loudly rather than mis-scope.
        if self.at_kw("values"):
            self.next()
            vals = self._values()
            if aggs or mods["group_by"]:
                raise ValueError(
                    "trailing VALUES combined with GROUP BY/aggregates "
                    "is not supported"
                )
            pattern = list(pattern) + [vals]

        # GROUP BY expression keys become pre-grouping BINDs (§18.2.4: the
        # key expression extends each solution before partitioning); an
        # unnamed key gets a hidden alias the SELECT projection drops
        if any(isinstance(g, tuple) for g in mods["group_by"]):
            gb: list = []
            for i, g in enumerate(mods["group_by"]):
                if isinstance(g, tuple):
                    _, gexpr, galias = g
                    galias = galias or f"__grp{i}"
                    pattern = list(pattern) + [(":bind", gexpr, "?/" + galias)]
                    gb.append("?/" + galias)
                else:
                    gb.append(g)
            mods["group_by"] = gb

        # resolve aggregate calls embedded in expressions (HAVING/ORDER BY/
        # projection): each (':agg', ...) node becomes a reference to an
        # aggregate alias — an existing one when the same call is already in
        # the SELECT list, else a hidden minted alias computed alongside and
        # dropped by the final SELECT-list projection.
        def _resolve(expr):
            if isinstance(expr, tuple) and expr and expr[0] == ":agg":
                fn, operand, distinct, sep = expr[1], expr[2], expr[3], expr[4]
                for spec in aggs:
                    sd = bool(spec[3]) if len(spec) > 3 else False
                    ss = spec[4] if len(spec) > 4 else " "
                    if (spec[0], spec[1], sd, ss) == (fn, operand, distinct, sep):
                        return "?/" + spec[2]
                alias = f"__agg{len(aggs)}"
                aggs.append((fn, operand, alias, distinct, sep))
                return "?/" + alias
            if isinstance(expr, tuple):
                return tuple(_resolve(x) for x in expr)
            return expr

        if mods["having"] is not None:
            mods["having"] = _resolve(mods["having"])
        mods["order_by"] = [
            (_resolve(ref) if isinstance(ref, tuple) else ref, d)
            for ref, d in mods["order_by"]
        ]
        proj_exprs = [(_resolve(e), a) for e, a in proj_exprs]

        if (
            not subquery
            and len(aggs) == 1
            and aggs[0][0] == "count"
            and aggs[0][1] is None
            and not aggs[0][3]
            and not mods["group_by"]
            and mods["having"] is None
            and not proj_exprs
            and select_vars == []
        ):
            # plain SELECT (COUNT(*) AS ?c) — the kr-emitted count form
            return {
                "type": "count",
                "pattern": pattern,
                "limit": mods["limit"],
                "distinct": distinct,
            }
        if aggs or mods["group_by"]:
            return {
                "type": "aggregate",
                "pattern": pattern,
                "select_vars": select_vars,
                "select_order": select_order,
                "group_by": mods["group_by"],
                "aggs": aggs,
                "proj_exprs": proj_exprs,
                "having": mods["having"],
                "order_by": mods["order_by"],
                "limit": mods["limit"],
                "offset": mods["offset"],
            }
        if proj_exprs:
            # non-aggregate SELECT expressions extend each solution after
            # the group evaluates (§18.2.4.4 Extend, before DISTINCT/ORDER):
            # exactly a trailing BIND in the group — compile_pattern applies
            # BINDs after the group's joins, and aliases may reference
            # earlier SELECT-list aliases
            pattern = list(pattern) + [
                (":bind", e, "?/" + a) for e, a in proj_exprs
            ]
        return {
            "type": "select",
            "pattern": pattern,
            "select_vars": select_vars,
            "distinct": distinct,
            "limit": mods["limit"],
            "order_by": mods["order_by"],
            "offset": mods["offset"],
        }

    def parse(self) -> dict:
        out = self._parse_query()
        # trailing tokens after a complete query are a syntax error, not
        # ignorable garbage — silently dropping them once hid a mis-parsed
        # ORDER BY (?x + ?y) (round-5 probe)
        if self.peek() is not None:
            raise ValueError(f"unexpected trailing token {self.peek()!r}")
        return out

    def _parse_query(self) -> dict:
        while self.at_kw("prefix") or self.at_kw("base"):
            if self.at_kw("base"):
                self.next()
                iri = self.next()
                if not iri.startswith("<"):
                    raise ValueError(f"bad BASE IRI {iri!r}")
                self.base = iri[1:-1]
                continue
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
            pattern = self.group()
            if self.at_kw("values"):  # trailing ValuesClause (grammar [28])
                self.next()
                pattern = list(pattern) + [self._values()]
            return {"type": "ask", "pattern": pattern}
        if form == "select":
            return self._parse_select()
        if form == "describe":
            subjects: list = []
            while True:
                t = self.peek()
                if t is None or t.lower() in ("where", "{"):
                    break
                if t and t[0] in "?$":
                    subjects.append("?/" + self.next()[1:])
                else:
                    subjects.append(self._term(self.next()))
                if self.peek() is None:
                    break
            pattern = None
            if self.at_kw("where"):
                self.next()
                pattern = self.group()
            elif self.peek() == "{":
                pattern = self.group()
            if pattern is not None and (
                len(subjects) != 1
                or not (isinstance(subjects[0], str) and subjects[0].startswith("?/"))
            ):
                raise ValueError("DESCRIBE ?v WHERE { } takes exactly one var")
            return {"type": "describe", "subjects": subjects, "pattern": pattern}
        if form == "construct":
            if self.at_kw("where"):
                # CONSTRUCT WHERE { ... } shortform (§10.2.3): the pattern
                # doubles as the template and must be a plain BGP
                self.next()
                pattern = self.group()
                from kr_spark.plans.filters import FILTER_OPS

                for cl in pattern:
                    # triple patterns are 3/4-tuples of terms / '?/v' refs;
                    # anything whose head is a clause keyword (':optional',
                    # ':bind', ...) or a filter op ('=', '!', ...) is not
                    # legal in the shortform's template-as-pattern BGP —
                    # and neither is a property path (a list/tuple in the
                    # predicate slot), since a path can't instantiate a
                    # template triple (§10.2.3 allows only TriplesTemplate)
                    if (
                        isinstance(cl, tuple)
                        and cl
                        and isinstance(cl[0], str)
                        and (cl[0].startswith(":") or cl[0] in FILTER_OPS)
                    ) or not isinstance(cl, tuple):
                        raise ValueError(
                            "CONSTRUCT WHERE shortform allows only triple "
                            f"patterns, got {cl!r}"
                        )
                    if len(cl) >= 2 and isinstance(cl[1], (list, tuple)):
                        # predicates are IRIs/vars only — a list/tuple in
                        # the p slot is always a parsed path
                        raise ValueError(
                            "CONSTRUCT WHERE shortform cannot contain "
                            f"property paths, got {cl[1]!r}"
                        )
                template = [tuple(tp) for tp in pattern]
            else:
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

    _AGGS = {"count", "sum", "avg", "min", "max", "group_concat", "sample"}

    def _agg_call(self, fn: str) -> tuple:
        """Aggregate call body (fn name already consumed):
        AGG([DISTINCT] expr|* [; SEPARATOR = "s"]) ->
        (':agg', op, operand|None, distinct, separator). The operand may be
        any expression (SPARQL 1.1 §18.4 aggregates apply to expressions,
        e.g. SUM(?price * ?qty)) — a bare var parses to its '?/name' ref."""
        self.eat("(")
        distinct = False
        if self.at_kw("distinct"):
            self.next()
            distinct = True
        operand = None
        if self.peek() == "*":
            self.next()
        else:
            operand = self._or_expr()
        sep = " "
        if self.peek() == ";":
            self.next()
            self.eat("separator")
            self.eat("=")
            s = self._term(self.next())
            sep = s[0] if isinstance(s, list) else str(s)
        self.eat(")")
        return (":agg", fn, operand, distinct, sep)


    def _modifiers(self) -> dict:
        """GROUP BY / HAVING / ORDER BY / LIMIT / OFFSET (any LIMIT-OFFSET
        order). HAVING and ORDER BY accept aggregate aliases (HAVING(?cnt >
        5)) and aggregate expressions (HAVING(COUNT(?n) >= 1), ORDER BY
        DESC(COUNT(?n))) — the latter resolve to hidden aliases in
        _parse_select."""
        out = {"group_by": [], "having": None, "order_by": [],
               "limit": None, "offset": None}
        while True:
            if self.at_kw("group"):
                self.next()
                self.eat("by")
                while True:
                    t = self.peek()
                    if t and t[0] in "?$":
                        out["group_by"].append("?/" + self.next()[1:])
                    elif t == "(":
                        # GROUP BY (expr [AS ?v]) — §18.2.4: the key is an
                        # expression, optionally named; compiled as a
                        # pre-grouping BIND in _parse_select
                        self.next()
                        expr = self._or_expr()
                        alias = None
                        if self.at_kw("as"):
                            self.next()
                            alias = self._var_ref("AS")[2:]
                        self.eat(")")
                        out["group_by"].append(("__expr__", expr, alias))
                    elif t and t.lower() in self._FN:
                        # bare expression key: GROUP BY STR(?x)
                        out["group_by"].append(
                            ("__expr__", self._primary(), None)
                        )
                    else:
                        break
            elif self.at_kw("having"):
                self.next()
                out["having"] = self.filter_expr()
            elif self.at_kw("order"):
                self.next()
                self.eat("by")
                while True:
                    if self.at_kw("asc") or self.at_kw("desc"):
                        d = self.next().lower()
                        self.eat("(")
                        e = self._or_expr()  # var or full expression
                        self.eat(")")
                        out["order_by"].append((e, d))
                    elif self.peek() and self.peek()[0] in "?$":
                        out["order_by"].append(("?/" + self.next()[1:], "asc"))
                    elif self.peek() == "(":
                        # grammar [24] OrderCondition: a bare
                        # BrackettedExpression orders ascending —
                        # ORDER BY (?x + ?y)
                        self.next()
                        e = self._or_expr()
                        self.eat(")")
                        out["order_by"].append((e, "asc"))
                    elif self.peek() and (
                        self.peek().lower() in self._FN
                        or self.peek().lower() in self._AGGS
                    ):
                        # bare expression key: ORDER BY STRLEN(?x) / COUNT(?x)
                        out["order_by"].append((self._primary(), "asc"))
                    else:
                        break
            elif self.at_kw("limit"):
                self.next()
                out["limit"] = int(self.next())
            elif self.at_kw("offset"):
                self.next()
                out["offset"] = int(self.next())
            else:
                break
        return out


def parse_sparql(kb, text: str) -> dict:
    return _Parser(kb, text).parse()


def sparql_query_df(kb, text: str):
    """SELECT (plain or aggregate) string -> DataFrame. Every output column
    is a term struct — aggregates included (COUNT -> xsd:integer literal,
    SUM/AVG -> xsd:decimal; kb._box_agg_columns)."""
    q = parse_sparql(kb, text)
    if q["type"] == "select":
        return kb.query_df(
            q["pattern"],
            select_vars=q["select_vars"],
            distinct=q["distinct"],
            limit=q["limit"],
            order_by=q.get("order_by") or None,
            offset=q.get("offset"),
        )
    if q["type"] == "aggregate":
        return kb.aggregate_df(
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
    raise ValueError(f"not a SELECT query: {q['type']}")


def sparql_query(kb, text: str) -> list[dict]:
    q = parse_sparql(kb, text)
    if q["type"] == "select":
        return kb.query(
            q["pattern"],
            select_vars=q["select_vars"],
            distinct=q["distinct"],
            limit=q["limit"],
            order_by=q.get("order_by") or None,
            offset=q.get("offset"),
        )
    if q["type"] == "aggregate":
        from kr_spark.terms import Term

        rows = sparql_query_df(kb, text).collect()
        out = []
        for r in rows:
            d = {}
            for k, val in r.asDict().items():
                if val is None:
                    continue
                d[k] = (
                    Term(val["kind"], val["v"], val["lang"], val["dt"])
                    if hasattr(val, "__fields__")
                    else val
                )
            out.append(d)
        return out
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
