"""RDF term model as plain data, encoded as triple-table *columns*.

Reference semantics re-expressed (all citations into /root/reference):
  * URI resources: namespaced symbols `ex/a` expanded through the registry
    (kr-core/.../rdf.clj:318-321, 255-261); raw URIs accepted (rdf.clj:332-334).
  * Blank nodes: symbols in namespace "_" (rdf.clj:48-51, 285-289); in query
    patterns a bnode is a non-capturing variable (sparql.clj:73-77).
  * Variables: symbols in namespace "?" (kr-core/.../variable.clj:5,13-17).
  * Plain string literals get the default language tag "en" when
    use_default_language is on (rdf.clj:28-29, 393-396).
  * Boxed forms: ["Bob"] = plain string, NO lang (sparql.clj:112-114);
    ["Bob","en"] = lang-tagged (sparql.clj:115-117); [40, "xsd/integer"] =
    typed (sparql.clj:118-120). Bare ints are forced to xsd:integer
    (rdf.clj:382-384).
  * Value-space equality for numerics ("40"^^xsd:integer == 40) per
    test_sparql.clj:207-220 — handled via canonical lexical forms plus a
    derived numeric shadow value used by filter comparisons.

Python surface syntax (mirrors the fixtures in FIXTURES.md §C):
  "ex/a"                         -> URI via CURIE (prefix must be registered)
  "<http://...>" / "<mailto:..>" -> raw URI
  "_/p"                          -> blank node
  "?/name"                       -> query variable
  "Alice"                        -> plain literal, auto-lang "en"
  ["Alice"]                      -> plain literal, NO lang
  ["Bob", "en"]                  -> lang-tagged literal
  [40, "xsd/integer"]            -> typed literal
  40 / 4.5 / True                -> typed literal (xsd:integer/double/boolean)
"""

from __future__ import annotations

from dataclasses import dataclass
from decimal import Decimal

from kr_spark.namespaces import NamespaceRegistry

XSD = "http://www.w3.org/2001/XMLSchema#"

# Datatypes whose literals compare in value space (sesame/rdf.clj:151-168
# maps these back to native values; we derive a numeric shadow instead).
NUMERIC_DATATYPES = frozenset(
    XSD + t
    for t in (
        "integer",
        "int",
        "long",
        "short",
        "byte",
        "decimal",
        "float",
        "double",
        "nonNegativeInteger",
        "nonPositiveInteger",
        "negativeInteger",
        "positiveInteger",
        "unsignedLong",
        "unsignedInt",
        "unsignedShort",
        "unsignedByte",
    )
)

KIND_URI = "uri"
KIND_BNODE = "bnode"
KIND_LITERAL = "literal"
KIND_VAR = "var"


@dataclass(frozen=True)
class Term:
    """A resolved RDF term (or query variable).

    kind: 'uri' | 'bnode' | 'literal' | 'var'
    v:    full IRI / bnode label / canonical lexical form / variable name
    lang: BCP-47 tag or "" (literals only)
    dt:   full datatype IRI or "" (literals only)

    lang/dt use "" (not None) so Spark struct-equality joins on bindings are
    exact without null-safe machinery.
    """

    kind: str
    v: str
    lang: str = ""
    dt: str = ""

    @property
    def is_var(self) -> bool:
        return self.kind == KIND_VAR

    def num_val(self) -> Decimal | None:
        if self.kind == KIND_LITERAL and self.dt in NUMERIC_DATATYPES:
            import decimal

            try:
                d = Decimal(self.v)
            except Exception:
                return None
            # INF/-INF/NaN have no decimal value (they live in the double
            # value space, filters.numeric_dbl) and would not survive the
            # Python->JVM decimal pickle anyway; likewise a value outside
            # decimal(38,9) — the engine's exact value space — carries no
            # decimal value (comparisons fall back to the lexical/double
            # paths). Quantizing to scale 9 keeps the Python-side value
            # bit-identical to the stored column.
            if not d.is_finite():
                return None
            try:
                return d.quantize(
                    Decimal("1E-9"),
                    context=decimal.Context(prec=38),
                )
            except decimal.InvalidOperation:
                return None
        return None

    def __repr__(self) -> str:  # compact, test-friendly
        if self.kind == KIND_URI:
            return f"<{self.v}>"
        if self.kind == KIND_BNODE:
            return f"_:{self.v}"
        if self.kind == KIND_VAR:
            return f"?{self.v}"
        out = f'"{self.v}"'
        if self.lang:
            out += f"@{self.lang}"
        if self.dt:
            out += f"^^<{self.dt}>"
        return out


def uri(iri_or_curie: str, ns: NamespaceRegistry | None = None) -> Term:
    if iri_or_curie.startswith("<") and iri_or_curie.endswith(">"):
        return Term(KIND_URI, iri_or_curie[1:-1])
    if ns is not None and "/" in iri_or_curie:
        short, local = iri_or_curie.split("/", 1)
        full = ns.expand(short, local)
        if full is not None:
            return Term(KIND_URI, full)
    return Term(KIND_URI, iri_or_curie)


def bnode(label: str) -> Term:
    return Term(KIND_BNODE, label)


def var(name: str) -> Term:
    return Term(KIND_VAR, name)


def literal(value: str, lang: str | None = None) -> Term:
    return Term(KIND_LITERAL, value, lang=lang or "")


def typed_literal(lex: object, datatype_iri: str) -> Term:
    return Term(KIND_LITERAL, _canon_lex(lex, datatype_iri), dt=datatype_iri)


def _canon_lex(value: object, dt: str) -> str:
    """Canonical lexical form so "40"^^xsd:integer and 40 are one term
    (value-space equality fixture test_sparql.clj:207-220)."""
    if dt in NUMERIC_DATATYPES:
        try:
            d = Decimal(str(value))
            if d == d.to_integral_value():
                return str(int(d))
            return str(d.normalize())
        except Exception:
            return str(value)
    if dt == XSD + "boolean":
        if isinstance(value, bool):
            return "true" if value else "false"
        return str(value).lower()
    return str(value)


def to_term(
    x: object,
    ns: NamespaceRegistry,
    use_default_language: bool = True,
    default_language: str = "en",
) -> Term:
    """Convert a Python surface value to a Term (the encoding table above)."""
    if isinstance(x, Term):
        return x
    if isinstance(x, bool):  # before int: bool is an int subclass
        return typed_literal(x, XSD + "boolean")
    if isinstance(x, int):
        return typed_literal(x, XSD + "integer")
    if isinstance(x, float):
        return typed_literal(x, XSD + "double")
    if isinstance(x, Decimal):
        return typed_literal(x, XSD + "decimal")
    if isinstance(x, (list, tuple)):
        return _boxed_to_term(list(x), ns)
    if isinstance(x, str):
        return _string_to_term(x, ns, use_default_language, default_language)
    raise TypeError(f"cannot encode {x!r} as an RDF term")


def _boxed_to_term(box: list, ns: NamespaceRegistry) -> Term:
    if len(box) == 1:
        # ["Bob"] — raw-boxed string: no lang, no datatype (sparql.clj:112-114)
        return Term(KIND_LITERAL, _plain_str(box[0]))
    if len(box) == 2:
        val, tag = box
        if isinstance(tag, str):
            tag_term = _maybe_uri(tag, ns)
            if tag_term is not None:
                return typed_literal(val, tag_term.v)
            # not a resolvable URI -> language tag
            return Term(KIND_LITERAL, _plain_str(val), lang=tag)
        raise TypeError(f"bad boxed literal tag {tag!r}")
    raise TypeError(f"bad boxed literal {box!r}")


def _plain_str(v: object) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _canon_lex(v, XSD + "double")
    if isinstance(v, (int, Decimal)):
        return _canon_lex(v, XSD + "integer")
    return str(v)


def _maybe_uri(s: str, ns: NamespaceRegistry) -> Term | None:
    """URI if angle-bracketed, a registered CURIE, or an absolute IRI."""
    if s.startswith("<") and s.endswith(">"):
        return Term(KIND_URI, s[1:-1])
    if "/" in s and " " not in s:
        short, local = s.split("/", 1)
        if short == "_":
            return Term(KIND_BNODE, local)
        if short == "?":
            return Term(KIND_VAR, local)
        full = ns.expand(short, local)
        if full is not None:
            return Term(KIND_URI, full)
    if s.startswith("http://") or s.startswith("https://") or s.startswith("urn:"):
        return Term(KIND_URI, s)
    return None


def _string_to_term(
    s: str, ns: NamespaceRegistry, use_default_language: bool, default_language: str
) -> Term:
    t = _maybe_uri(s, ns)
    if t is not None:
        return t
    lang = default_language if use_default_language else ""
    return Term(KIND_LITERAL, s, lang=lang)


# ---- result boxing / literal modes (clj_ify.clj:72,101-120; behavior
# matrix test_rdf.clj:254-335) ----

_INT_DTS = frozenset(
    XSD + t
    for t in (
        "integer", "int", "long", "short", "byte",
        "nonNegativeInteger", "nonPositiveInteger", "negativeInteger",
        "positiveInteger", "unsignedLong", "unsignedInt", "unsignedShort",
        "unsignedByte",
    )
)
_FLOAT_DTS = frozenset(XSD + t for t in ("float", "double"))


def native_value(term: "Term"):
    """Lexical form -> native Python value for known XSD datatypes
    (sesame/rdf.clj:151-168 role). Unknown datatypes stay strings."""
    if term.kind != KIND_LITERAL:
        return term.v
    if term.dt in _INT_DTS:
        return int(term.v)
    if term.dt in _FLOAT_DTS:
        return float(term.v)
    if term.dt == XSD + "decimal":
        return Decimal(term.v)
    if term.dt == XSD + "boolean":
        return term.v == "true"
    return term.v


def clj_ify(term: "Term", mode=None, ns: NamespaceRegistry | None = None):
    """Format a bound term per the reference's *literal-mode*
    (clj_ify.clj:101-120; matrix test_rdf.clj:254-335):

      None / 'clj'  -> plain native value ("foo", 4, "Bob")
      'clj-type'    -> [native value, type-curie-or-lang-or-None]
      'string'      -> [lexical string, type-curie-or-lang-or-None]
      'native'      -> the Term itself (backend-native objects)
      callable      -> fn(lex, type_or_lang) returning one of the modes
                       above, applied per literal (forward_rule.clj-style
                       dynamic dispatch)

    Non-literals (URIs, bnodes) are returned as the Term unchanged —
    the engine's analog of kr returning symbols.
    """
    if term.kind != KIND_LITERAL:
        return term
    type_or_lang = None
    if term.dt:
        type_or_lang = (ns.compress(term.dt) if ns else None) or term.dt
    elif term.lang:
        type_or_lang = term.lang
    if callable(mode):
        mode = mode(term.v, type_or_lang)
    if mode in (None, "clj"):
        return native_value(term)
    if mode == "clj-type":
        return [native_value(term), type_or_lang]
    if mode == "string":
        return [term.v, type_or_lang]
    if mode == "native":
        return term
    raise ValueError(f"unknown literal mode {mode!r}")
