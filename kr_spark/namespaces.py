"""Bidirectional namespace (CURIE prefix) registry.

Reference semantics: kr keeps short<->long prefix maps on the KB value
(kr-core/.../rdf.clj:115-167) and picks the mapping that yields the shortest
name when compressing (rdf.clj:194-221). Purely presentational: the engine
stores full IRIs in the triple table; CURIEs exist only at the API surface.

At scale this is a tiny driver-side dict (broadcast into UDFs if ever needed
executor-side — it never is for the core engine, expansion happens at
plan-construction time on the driver).
"""

from __future__ import annotations


# Default registry mirrors the reference test harness
# (kr-core/src/test/.../test_kb.clj:16-36).
DEFAULT_NAMESPACES: dict[str, str] = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "ex": "http://www.example.org/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "dc10": "http://purl.org/dc/elements/1.0/",
    "dc11": "http://purl.org/dc/elements/1.1/",
    "kr": "http://kr.example.org/",
}


class NamespaceRegistry:
    """short<->long prefix maps with longest-match reverse lookup."""

    def __init__(self, mappings: dict[str, str] | None = None) -> None:
        self.short_to_long: dict[str, str] = dict(
            mappings if mappings is not None else DEFAULT_NAMESPACES
        )

    def register(self, short: str, long: str) -> None:
        self.short_to_long[short] = long

    def register_all(self, pairs: dict[str, str]) -> None:
        self.short_to_long.update(pairs)

    def expand(self, short: str, local: str) -> str | None:
        base = self.short_to_long.get(short)
        if base is None:
            return None
        return base + local

    def compress(self, iri: str) -> str | None:
        """Long->short giving the shortest name (rdf.clj:194-221 semantics)."""
        best: str | None = None
        for short, long in self.short_to_long.items():
            if iri.startswith(long):
                cand = f"{short}/{iri[len(long):]}"
                if best is None or len(cand) < len(best):
                    best = cand
        return best

    def copy(self) -> "NamespaceRegistry":
        return NamespaceRegistry(dict(self.short_to_long))
