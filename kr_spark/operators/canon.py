"""Canonicalization: alias-merge via connected components (SURVEY §2.9 C1).

Reference: cluster-assertions — union-find by repeated merge over assertions
sharing terms (assertion.clj:114-141), driver-local. At 10^12-turn scale this
becomes iterative min-label propagation over salted self-joins
(plans/fixpoint.connected_components): deterministic (min canonical key per
component), checkpointed per iteration, skew-salted for hub entities.

Also carries the type-inference helpers (C3/C4): candidate types from
rdfs/domain and rdf:type, and most-specific-type reduction via an anti-join
against the subClassOf ancestor closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kr_spark.plans.fixpoint import connected_components, transitive_closure

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def canonical_mapping(
    same_as_edges: DataFrame, salt: int = 0
) -> DataFrame:
    """(a, b) alias edges -> (node, canonical) with canonical = min member.

    Deterministic: canonical id is the lexicographic min of the component, so
    re-runs (and resumed runs) rewrite to identical ids.
    """
    cc = connected_components(same_as_edges, src="a", dst="b", salt=salt)
    return cc.select(F.col("node"), F.col("component").alias("canonical"))


# Above this many mapping rows a broadcast hint risks driver/executor OOM
# (~100 bytes/row of URI strings -> ~400 MB serialized at the limit).
BROADCAST_ROW_LIMIT = 4_000_000


def maybe_broadcast(df: DataFrame, max_rows: int = BROADCAST_ROW_LIMIT) -> DataFrame:
    """Broadcast hint only when `df` is PROVABLY small: probe with an
    early-stopping limit+count; above the cap, return the frame unhinted so
    the planner picks a shuffle join. An unconditional `F.broadcast` on a
    one-row-per-distinct-surface mapping OOMs at 10^12-turn scale where
    distinct surfaces plausibly reach 10^8-9 (VERDICT r1 #6)."""
    probe = df.limit(max_rows + 1).count()
    return F.broadcast(df) if probe <= max_rows else df


def rewrite_triples_canonical(
    triples: DataFrame, mapping: DataFrame, broadcast_max_rows: int = BROADCAST_ROW_LIMIT
) -> DataFrame:
    """Rewrite subject and object URIs to canonical ids.

    Two left joins (s side, o side). The mapping (one row per aliased node,
    bounded by entity count, not triple count) is usually much smaller than
    the triple table -> size-gated broadcast: hint only below
    `broadcast_max_rows`, else sort-merge/shuffle join (AQE may still elect
    broadcast from runtime stats). The mapping is checkpointed first so the
    size probe and the two join sides don't recompute the CC subtree.
    """
    m = maybe_broadcast(mapping.localCheckpoint(), broadcast_max_rows)
    s_map = m.select(
        F.col("node").alias("__sn"), F.col("canonical").alias("__sc")
    )
    o_map = m.select(
        F.col("node").alias("__on"), F.col("canonical").alias("__oc")
    )
    out = (
        triples.join(s_map, triples["s"] == F.col("__sn"), "left")
        .withColumn("s", F.coalesce(F.col("__sc"), F.col("s")))
        .drop("__sn", "__sc")
        .join(o_map, (triples["o_kind"] == "uri") & (F.col("o") == F.col("__on")), "left")
        .withColumn("o", F.coalesce(F.col("__oc"), F.col("o")))
        .drop("__on", "__oc")
    )
    return out


def same_as_edges_from_triples(triples: DataFrame, predicate: str = OWL_SAMEAS) -> DataFrame:
    return triples.filter(F.col("p") == predicate).select(
        F.col("s").alias("a"), F.col("o").alias("b")
    )


# ---- type inference (C3/C4; assertion.clj:27-34, 85-108) ----


def infer_subject_types(triples: DataFrame) -> DataFrame:
    """Candidate types for subjects: explicit rdf:type plus rdfs/domain of
    used predicates (infer-subject-types-from-pred, assertion.clj:85-108)."""
    explicit = triples.filter(F.col("p") == RDF_TYPE).select(
        F.col("s").alias("node"), F.col("o").alias("type")
    )
    domains = triples.filter(F.col("p") == RDFS_DOMAIN).select(
        F.col("s").alias("pred"), F.col("o").alias("type")
    )
    from_domain = (
        triples.filter(F.col("p") != RDF_TYPE)
        .join(F.broadcast(domains), triples["p"] == F.col("pred"))
        .select(F.col("s").alias("node"), F.col("type"))
    )
    return explicit.union(from_domain).distinct()


def most_specific_types(node_types: DataFrame, triples: DataFrame) -> DataFrame:
    """Reduce each node's type set to minimal elements: drop any type that is
    a strict ancestor (subClassOf+) of another held type (spec-of?,
    assertion.clj:27-34,69-79) — anti-join against the ancestor closure."""
    sub = triples.filter(F.col("p") == RDFS_SUBCLASS).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    closure = transitive_closure(sub)  # (sub, ancestor) pairs, 1+ steps
    ancestors_held = (
        node_types.alias("nt")
        .join(closure.alias("c"), F.col("nt.type") == F.col("c.src"))
        .join(
            node_types.alias("nt2"),
            (F.col("nt.node") == F.col("nt2.node"))
            & (F.col("c.dst") == F.col("nt2.type")),
        )
        .select(F.col("nt.node").alias("node"), F.col("c.dst").alias("type"))
        .distinct()
    )
    return node_types.join(ancestors_held, on=["node", "type"], how="left_anti")
