"""Canonicalization by connected components over alias edges (N4).

GraphFrames is the first choice on a real cluster (north_star names it); its
jar is not present in this sandbox, so the engine ships pure-DataFrame
fallbacks and picks at runtime (SURVEY.md §7 step 6). Physical strategies:

* driver union-find below ``SMALL_GRAPH_EDGES`` — tiny alias dictionaries
  don't deserve shuffles;
* GraphFrames ``connectedComponents`` when the jar is present;
* **alternating large-star / small-star** (Kiveris et al., "Connected
  Components in MapReduce and Beyond") — the distributed default: converges
  in O(log n) rounds regardless of graph diameter, each round two grouped
  aggregations. This is the algorithm that survives adversarial graphs
  (long alias chains) where naive min-label propagation needs
  O(diameter) rounds;
* iterative minimum-label propagation (``algorithm="minlabel"``) — kept as
  the simple cross-check twin; raises by default if ``max_iter`` is
  exhausted unconverged.

Alias graphs are usually shallow (a component is one concept's alias star
plus a few cross-links), but the star algorithm costs the same there and
removes the diameter failure mode. ``localCheckpoint`` truncates lineage
every round so plans don't snowball. At 10^12-row scale all of this holds
because the vertex set is the alias VOCABULARY (millions), not the corpus.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def _graphframes_available(spark) -> bool:
    try:
        import graphframes  # noqa: F401

        # py4j returns a JavaPackage (no raise) for a missing class, so
        # attribute access alone cannot probe the JAR — load the class
        # through reflection, which raises when the jar is absent. Without
        # this, pip-installed graphframes with no spark-packages jar (the
        # common misconfiguration) would take the GraphFrames branch and
        # crash mid-job instead of falling back to star/minlabel.
        # context classloader, not Class.forName: jars added at session
        # start (--packages / spark.jars) live there, not always on the
        # JVM system classpath
        spark._jvm.Thread.currentThread().getContextClassLoader().loadClass(
            "org.graphframes.GraphFrame"
        )
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


def _checksum(df: "DataFrame") -> tuple[int, int]:
    """(row_count, order-insensitive hash) of an edge set — the cheap
    convergence test for the star rounds (one aggregation, no sort/except)."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).first()
    return row["n"], row["h"]


def _star_components(
    edges: "DataFrame", max_iter: int = 50, on_nonconverged: str = "raise"
) -> "DataFrame":
    """Alternating large-star / small-star -> (vertex, component=min vertex).

    Each round:
      large-star: for every vertex u, link every LARGER neighbor v to
        m = min(N(u) ∪ {u}) — over the symmetric edge closure;
      small-star: orient edges large->small, link every smaller neighbor
        (and u itself) to the minimum — over the oriented set.
    The edge set converges to per-component stars rooted at the minimum
    vertex in O(log n) rounds (Kiveris et al.); convergence is detected by
    an order-insensitive checksum of the edge set.
    """
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = None
    converged = False
    for _ in range(max_iter):
        if e.isEmpty():
            converged = True
            break
        # large-star over the symmetric closure
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least("u", F.col("mv")).alias("m")
        )
        e1 = (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over the large->small orientation
        dr = e1.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        m2 = dr.groupBy("u").agg(F.min("v").alias("m"))
        e2 = (
            dr.join(m2, "u")
            .select(F.col("v").alias("node"), "m")
            .union(m2.select(F.col("u").alias("node"), "m"))
            .where(F.col("node") != F.col("m"))
            .select(F.col("node").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _checksum(e2)
        e = e2
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # same contract as the min-label path: an unconverged edge set can
        # hold several (u -> v) edges per vertex, which would emit duplicate
        # conflicting (vertex, component) rows — never return that silently.
        msg = (
            f"star connected_components did not converge within {max_iter}"
            " rounds; components are non-canonical"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import logging

        logging.getLogger(__name__).warning(msg)
        # an unconverged star set can hold several (u -> v) rows per vertex;
        # the caller opted into APPROXIMATE labels, not a shape-invalid
        # result — reduce to one (minimum) label per vertex.
        e = e.groupBy("u").agg(F.min("v").alias("v"))
    # converged: e holds (vertex -> component-min) star edges; roots map to
    # themselves, isolated vertices cannot occur (every vertex came from an
    # edge), so coalesce covers exactly the roots.
    return verts.join(
        e.select(F.col("u").alias("vertex"), F.col("v").alias("c")),
        "vertex",
        "left",
    ).select(
        "vertex", F.coalesce("c", F.col("vertex")).alias("component")
    )


def connected_components(
    edges: "DataFrame",
    max_iter: int = 25,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
    on_nonconverged: str = "raise",
    algorithm: str = "star",
) -> "DataFrame":
    """edges(src string, dst string) -> (vertex string, component string).

    ``component`` is the lexicographic minimum vertex id in the component
    (deterministic canonical representative). Physical strategy is adaptive:
    driver-side union-find below ``small_graph_edges`` (the alias dictionary
    case), GraphFrames when its jar is present, else the distributed
    ``algorithm``: ``"star"`` (default — O(log n) rounds, diameter-proof) or
    ``"minlabel"`` (forced in tests via ``small_graph_edges=0`` +
    ``algorithm=...`` to cross-check the strategies).

    The min-label loop converges in O(component diameter) rounds; if
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
        # GraphFrames emits arbitrary numeric component ids; every other
        # branch (and incremental_components' min-merge argument, which
        # contracts onto labels AS vertices) relies on the documented
        # invariant component == lexicographic-min member vertex, so
        # normalize before returning — one component-cardinality agg+join
        mins = cc.groupBy("component").agg(F.min("id").alias("_minv"))
        return cc.join(mins, "component").select(
            F.col("id").alias("vertex"),
            F.col("_minv").cast("string").alias("component"),
        )

    if algorithm == "star":
        return _star_components(
            edges, max_iter=max_iter * 2, on_nonconverged=on_nonconverged
        )
    if algorithm != "minlabel":
        raise ValueError(f"unknown algorithm: {algorithm!r}")

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


def incremental_components(
    labels: "DataFrame",
    new_edges: "DataFrame",
    max_iter: int = 25,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> "DataFrame":
    """Fold a batch of NEW edges into an existing (vertex, component)
    labeling without recomputing the whole graph — the incremental-KG-
    maintenance primitive for a continuous crawl: each ingest batch adds
    alias/entity edges, and re-running full CC over a 100 TB accumulated
    graph per batch is exactly the non-scalable plan.

    Requires the invariant ``connected_components`` establishes: a
    component's id IS its minimum member vertex. Then incremental = full
    recompute, by this argument: contracting every existing component to
    its id preserves connectivity (components are connected), and the
    minimum of a merged group of component ids equals the minimum over all
    their member vertices (each id is already its component's minimum).

    Plan shape (everything scales with the BATCH, not the corpus):
      1. endpoint lookup: new-edge endpoints -> current component id (one
         equi-join against the label table; vertices the labeling has never
         seen stand for themselves);
      2. contracted delta CC: star-CC over the batch-sized contracted edge
         set (self-loops — edges internal to one existing component — drop
         out first);
      3. relabel: merged roots move only the AFFECTED components' rows —
         the moved-roots map is at most 2x batch size; the join against
         the label table is left un-hinted so AQE broadcasts it when the
         batch is small (the usual ingest shape) and falls back to a
         shuffle join for a giant backfill batch, where a forced
         broadcast would OOM the executors. Untouched rows coalesce
         through unchanged; new vertices append with their merged (or
         own) root.
    """
    lab = labels.select("vertex", "component")
    src_c = lab.select(
        F.col("vertex").alias("src"), F.col("component").alias("src_comp")
    )
    dst_c = lab.select(
        F.col("vertex").alias("dst"), F.col("component").alias("dst_comp")
    )
    ends = (
        new_edges.select("src", "dst")
        .distinct()
        .join(src_c, "src", "left")
        .join(dst_c, "dst", "left")
        .select(
            F.coalesce("src_comp", F.col("src")).alias("u"),
            F.coalesce("dst_comp", F.col("dst")).alias("v"),
        )
    )
    contracted = (
        ends.where(F.col("u") != F.col("v"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .distinct()
    )
    # delta solve on the contracted (batch-sized) graph; reuse the adaptive
    # strategy — union-find for dictionary-sized batches, star-CC above
    delta = connected_components(
        contracted, max_iter=max_iter, small_graph_edges=small_graph_edges
    )
    moved = delta.where(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias("component"), F.col("component").alias("new_comp")
    )
    relabeled = (
        lab.join(moved, "component", "left")
        .select(
            "vertex",
            F.coalesce("new_comp", F.col("component")).alias("component"),
        )
    )
    # vertices first seen in this batch: their contracted node is themselves
    known = lab.select("vertex")
    new_vs = (
        new_edges.select(F.col("src").alias("vertex"))
        .union(new_edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .join(known, "vertex", "left_anti")
    )
    new_rows = (
        new_vs.join(delta, "vertex", "left")
        .select(
            "vertex",
            F.coalesce("component", F.col("vertex")).alias("component"),
        )
    )
    return relabeled.unionByName(new_rows)
