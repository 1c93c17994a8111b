"""Canonicalization by connected components over alias edges (N4).

GraphFrames is the first choice on a real cluster (north_star names it); its
jar is not present in this sandbox, so the engine ships a pure-DataFrame
fallback and picks at runtime (SURVEY.md §7 step 6). The fallback is
iterative minimum-label propagation:

    comp(v) <- min(comp(v), min over neighbors comp(u))

run until fixpoint. Alias graphs are shallow (a component is one concept's
alias star plus a few cross-links — diameter <= ~4 even at UMLS scale), so the
loop converges in O(diameter) rounds; each round is one shuffle on vertex id.
``localCheckpoint`` truncates lineage every round so plans don't snowball.
At 10^12-row scale the same loop holds because the vertex set is the alias
VOCABULARY (millions), not the corpus.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def _graphframes_available(spark) -> bool:
    try:
        spark._jvm.org.graphframes.GraphFrame  # noqa: B018
        import graphframes  # noqa: F401
        return True
    except Exception:
        return False


#: below this edge count the graph is collected and solved with union-find on
#: the driver — one job instead of O(diameter) iterations. Same adaptive idea
#: as Spark's broadcast-join threshold: tiny graphs don't deserve shuffles.
SMALL_GRAPH_EDGES = 100_000


def _union_find(edge_rows: list) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in edge_rows:
        a, b = r["src"], r["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def connected_components(
    edges: "DataFrame",
    max_iter: int = 25,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
    on_nonconverged: str = "raise",
) -> "DataFrame":
    """edges(src string, dst string) -> (vertex string, component string).

    ``component`` is the lexicographic minimum vertex id in the component
    (deterministic canonical representative). Physical strategy is adaptive:
    driver-side union-find below ``small_graph_edges`` (the alias dictionary
    case), GraphFrames when its jar is present, else the distributed
    min-label propagation loop (forced in tests via ``small_graph_edges=0``).

    The propagation loop converges in O(component diameter) rounds; if
    ``max_iter`` is exhausted first the labels are WRONG (some vertices still
    carry a non-minimal component id). ``on_nonconverged`` decides what
    happens then: ``"raise"`` (default — canonicalizing with unconverged
    labels silently corrupts the KG) or ``"warn"`` (log and return, for
    exploratory use).
    """
    spark = edges.sparkSession
    if small_graph_edges > 0:
        sample = edges.limit(small_graph_edges + 1).collect()
        if len(sample) <= small_graph_edges:
            comp = _union_find(sample)
            return spark.createDataFrame(
                [(v, c) for v, c in sorted(comp.items())],
                "vertex string, component string",
            )
    if _graphframes_available(spark):  # pragma: no cover - not in sandbox
        from graphframes import GraphFrame

        vertices = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        g = GraphFrame(vertices, edges)
        cc = g.connectedComponents()
        return cc.select(F.col("id").alias("vertex"), F.col("component").cast("string"))

    # undirected closure
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    labels = (
        und.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    und = und.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)

    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und["dst"] == labels["vertex"], "inner")
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
                (
                    F.coalesce("nbr_component", "component") < F.col("component")
                ).alias("changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = new_labels.where("changed").count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components did not converge within max_iter={max_iter}"
            " rounds (graph diameter exceeds it); labels are non-canonical"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import logging

        logging.getLogger(__name__).warning(msg)
    return labels


def canonicalize_concepts(
    concept_dict: "DataFrame", small_graph_edges: int = SMALL_GRAPH_EDGES
) -> "DataFrame":
    """Alias table -> (concept_id, component) canonical mapping.

    Edges: every alias row links alias<->concept_id, so aliases sharing a
    surface (deliberate cross-links, FIXTURES.md §3) merge their concepts into
    one component. Component representative = min vertex id; since concept ids
    sort before raw surfaces only within their own prefix, we re-canonicalize
    to the min concept_id of the component.
    """
    edges = concept_dict.select(
        F.col("alias").alias("src"), F.col("concept_id").alias("dst")
    ).distinct()
    cc = connected_components(edges, small_graph_edges=small_graph_edges)
    concept_comp = (
        concept_dict.select("concept_id")
        .distinct()
        .join(cc, F.col("concept_id") == F.col("vertex"), "inner")
        .select("concept_id", "component")
    )
    canon = concept_comp.groupBy("component").agg(
        F.min("concept_id").alias("canonical_id")
    )
    return concept_comp.join(canon, "component", "inner").select(
        "concept_id", "canonical_id"
    )
