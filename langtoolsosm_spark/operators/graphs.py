"""Graph propagation operators over DataFrames (Pregel-style rounds).

The reference's only graph-shaped behavior is transitive redirect
resolution (lib/wikimedia.py redirect chains, bounded depth); the engine
generalizes it to explicit bounded-round propagation — the same
iterate-join-aggregate shape as ``dedup.connected_components``'
pointer jumping, but carrying weights (min-plus semiring) instead of
labels.

Design for scale: each round is ONE shuffle keyed on node id (the join
with the edge list plus a min-aggregate); the frontier optimization
relaxes only nodes whose distance improved last round, so rounds touch
o(V) once the wave passes. Hop-bounded = deterministic output on any
graph (no convergence detection needed at the gate; pass a generous
``hops`` for full convergence on diameter-bounded graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bounded_shortest_paths(
    edges: DataFrame,
    source: int,
    hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Single-source shortest distances over at most ``hops`` edges —
    Bellman-Ford as ``hops`` DataFrame rounds with a frontier: round h
    relaxes only edges out of nodes improved in round h-1, and
    ``dist_{h+1}(v) = min(dist_h(v), min_{(u,v,w)} dist_h(u) + w)``.
    Integer weights make every round merge-order exact. Returns
    (node, dist) for every node reachable within ``hops`` edges.

    Semantics note: distances are the min over paths of <= hops edges —
    on a graph with diameter <= hops this IS the shortest path; the
    bound is what makes the result a pure function of (graph, source,
    hops) and therefore oracle-checkable.
    """
    if hops < 0:
        raise ValueError(f"hops must be >= 0, got {hops}")
    e = edges.select(
        F.col(src_col).alias("__u"),
        F.col(dst_col).alias("__v"),
        F.col(weight_col).cast("long").alias("__w"),
    )
    spark = edges.sparkSession
    dist = spark.createDataFrame([(source, 0)], "node long, dist long")
    frontier = dist
    for _ in range(hops):
        relaxed = (
            frontier.join(e, frontier["node"] == e["__u"])
            .select(F.col("__v").alias("node"), (F.col("dist") + F.col("__w")).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if relaxed.isEmpty():
            break
        merged = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        # frontier = nodes whose best distance improved this round
        frontier = merged.join(
            dist.withColumnRenamed("dist", "__old"), "node", "left"
        ).filter(
            F.col("__old").isNull() | (F.col("dist") < F.col("__old"))
        ).select("node", "dist")
        if frontier.isEmpty():
            break
        dist = merged
    return dist


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle participation over the UNDIRECTED graph induced
    by the edge list (direction and duplicates are erased first) — the
    clustering-coefficient numerator, the classic cohesion signal for
    spatial-neighbor graphs. Returns (node, n_tri) for every node in at
    least one triangle.

    Plan: canonicalize to a < b (one distinct on the dedup'd pair set),
    enumerate ordered wedges a < b < c by joining the edge list with
    itself on the middle vertex, close each wedge with one more join —
    every triangle is found exactly once — then fan the (a, b, c) rows
    over their three roles and count per node. Join fan-out is bounded
    by max-degree x edges (degree is k on a kNN graph); for power-law
    graphs the standard degree-ordering refinement applies but is
    unnecessary under a degree cap.
    """
    # the canonical pair set feeds three join sides (wedge left, wedge
    # right, closure probe); pruned subtrees defeat exchange reuse, so
    # truncate lineage once — the frame is bounded by distinct pairs
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e_ab = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    wedges = e_ab.join(
        e.select(F.col("a").alias("y"), F.col("b").alias("z")), "y"
    )  # x < y < z by construction
    tri = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("z")), ["x", "z"]
    )
    roles = tri.select(F.col("x").alias("node")).unionAll(
        tri.select(F.col("y").alias("node"))
    ).unionAll(tri.select(F.col("z").alias("node")))
    return roles.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))


def clustering_coefficients(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Local clustering coefficient per node over the undirected induced
    graph: ``c = 2 * triangles / (deg * (deg - 1))`` — how close each
    node's neighborhood is to a clique. Emitted as the exact integer
    pair (tri, deg) plus the one float division, so the statistic is
    engine-exact; degree-1 nodes get coeff 0 by convention. Reuses the
    exactly-once wedge enumeration of ``triangle_counts`` and adds one
    degree aggregate — both bounded by degree x edges."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_counts(e, src_col="a", dst_col="b")
    # coalesce BEFORE the ratio: a node outside every triangle joins
    # NULL, and 2.0 * NULL would leak a NULL coeff past the deg guard
    filled = deg.join(tri, "node", "left").select(
        "node", "deg", F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_tri")
    )
    coeff = F.when(
        F.col("deg") >= 2,
        (F.lit(2.0) * F.col("n_tri").cast("double"))
        / (F.col("deg").cast("double") * (F.col("deg") - F.lit(1)).cast("double")),
    ).otherwise(F.lit(0.0))
    return filled.select("node", "deg", "n_tri", coeff.alias("coeff"))


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    alpha_milli: int = 850,
    scale: int = 1_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Integer-scaled PageRank over the distinct directed edge set —
    ``iters`` power-iteration rounds in EXACT integer arithmetic:

        r_0(v)   = scale
        r_{t+1}(v) = scale*(1000-alpha)/1000
                   + alpha * sum_{(u,v)} (r_t(u) div outdeg(u)) div 1000

    Every division is the truncating integer ``div`` (the same
    determinism device as ivf_train_lloyd's integer means), so the
    result is a pure function of (graph, iters, alpha, scale) and the
    oracle unrolls identical rounds in SQL. Mass flowing into dangling
    nodes is dropped rather than redistributed (the standard
    simplification; documented contract). Returns (node, rank_int).

    Scale shape: each round is one shuffle keyed on node id (edge join +
    sum aggregate); the alpha product runs in DECIMAL(38,0) so V * scale
    never overflows int64 mid-product. localCheckpoint per round keeps
    lineage flat (the frontier Bellman-Ford pattern)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0 <= alpha_milli <= 1000:
        raise ValueError(f"alpha_milli must be in [0, 1000], got {alpha_milli}")
    e = edges.select(
        F.col(src_col).alias("__u"), F.col(dst_col).alias("__v")
    ).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("__u").alias("node"))
        .unionByName(e.select(F.col("__v").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("__u").agg(F.count(F.lit(1)).alias("__deg"))
    base = (scale * (1000 - alpha_milli)) // 1000
    r = nodes.withColumn("rank_int", F.lit(scale).cast("long"))
    for _ in range(iters):
        contrib = (
            r.join(outdeg, r["node"] == outdeg["__u"])
            .select("__u", F.expr("rank_int div __deg").alias("__c"))
        )
        insum = (
            contrib.join(e, "__u")
            .groupBy(F.col("__v").alias("node"))
            .agg(F.sum("__c").alias("__in"))
        )
        r = (
            nodes.join(insum, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"CAST(CAST({alpha_milli} AS decimal(38,0)) "
                        "* coalesce(__in, 0) AS decimal(38,0)) div 1000"
                    ).cast("long")
                ).alias("rank_int"),
            )
            .localCheckpoint(eager=True)
        )
    return r


def kcore(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 4,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Bounded-round k-core peeling of the undirected graph: each round
    removes every node whose current degree is below ``k`` (and its
    incident edges); after ``rounds`` rounds the surviving nodes with
    their degrees are returned — (node, deg). On graphs that converge
    within the bound this IS the k-core (the standard dense-community
    extraction); bounding the rounds makes the result a pure function of
    (graph, k, rounds), the same oracle-checkability device as
    bounded_shortest_paths' hop bound.

    Each round is one degree aggregate + one semi-join pair (shuffles
    keyed on node id, edge set only shrinks); localCheckpoint per round
    keeps lineage flat."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    # normalize to canonical undirected pairs (a < b), dedup
    e = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("__a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("__b"),
        )
        .filter(F.col("__a") != F.col("__b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        deg = (
            e.select(F.col("__a").alias("node"))
            .unionByName(e.select(F.col("__b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        alive = deg.filter(F.col("deg") >= k).select("node")
        e = (
            e.join(alive.withColumnRenamed("node", "__a"), "__a", "left_semi")
            .join(alive.withColumnRenamed("node", "__b"), "__b", "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("__a").alias("node"))
        .unionByName(e.select(F.col("__b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def local_bridges(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Local bridges (Granovetter weak ties) of the undirected graph
    induced by the edge list: edges whose endpoints share NO common
    neighbor — every triangle-free edge has span > 2, so removing it
    lengthens its endpoints' connection. On an OD tile graph these are
    the corridor links whose loss actually disconnects neighborhoods
    (a triangle-supported edge has a 2-hop detour). Returns
    (a, b, deg_a, deg_b) with a < b, one row per local bridge.

    Plan: canonicalize + dedup the pair set, count each edge's common
    neighbors with the same degree-bounded wedge join as
    ``triangle_counts`` (adjacency joined to itself on the shared
    endpoint), then one anti-join to keep support-0 edges and a
    broadcast-friendly degree enrichment — never an all-pairs product.
    """
    # the canonical edge set is referenced five times downstream (two
    # adjacency directions, the wedge probe, the anti-join left side,
    # the degree rollup); pruned subtrees defeat exchange reuse, so
    # without truncating lineage every reference replays the upstream
    # edge derivation (plan-audited: 10 scans -> 1)
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("w")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("w"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    supported = (
        e.join(adj.select(F.col("u").alias("a"), "w"), "a")
        .join(adj.select(F.col("u").alias("b"), "w"), ["b", "w"])
        .select("a", "b")
        .distinct()
    )
    bridges = e.join(supported, ["a", "b"], "left_anti")
    return (
        bridges.join(deg.select(F.col("u").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("u").alias("b"), F.col("deg").alias("deg_b")), "b")
        .select("a", "b", "deg_a", "deg_b")
    )


def degree_assortativity(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Degree assortativity of an undirected graph (Newman 2002) as ONE
    row of exact integer sufficient statistics: with M edges and
    endpoint degrees (j, k) per edge,

        r = r_num / r_den,  r_num = 4*M*sum(jk) - sum(j+k)^2,
                            r_den = 2*M*sum(j^2+k^2) - sum(j+k)^2

    (the edge-symmetric Pearson correlation; r > 0 means hubs attach
    to hubs). Input must be a canonical edge list (a < b, distinct) —
    what co_visitation emits. Degrees and sums are integers end to
    end, so the statistic is aggregation-order independent; the caller
    divides. Returns (n_edges, sum_prod, sum_deg, sum_sq, r_num,
    r_den).

    Plan: the edge list is pinned once (it feeds the degree histogram
    and both joins); two hash joins keyed by node attach endpoint
    degrees; one global map-side-combined rollup — no quadratic work
    beyond what the input already paid."""
    e = edges.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).localCheckpoint(eager=True)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    j = (
        e.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.col("da") * F.col("db")).alias("sum_prod"),
        F.sum(F.col("da") + F.col("db")).alias("sum_deg"),
        F.sum(F.col("da") * F.col("da") + F.col("db") * F.col("db")).alias(
            "sum_sq"
        ),
    )
    return agg.select(
        "n_edges", "sum_prod", "sum_deg", "sum_sq",
        (
            4 * F.col("n_edges") * F.col("sum_prod")
            - F.col("sum_deg") * F.col("sum_deg")
        ).alias("r_num"),
        (
            2 * F.col("n_edges") * F.col("sum_sq")
            - F.col("sum_deg") * F.col("sum_deg")
        ).alias("r_den"),
    )


def degree_spectrum(edges: DataFrame) -> DataFrame:
    """Degree OCTAVE spectrum of an undirected edge list (a, b) — the
    scale-free-ness fingerprint of a contact graph: for every octave k,
    how many vertices have degree in [2^k, 2^(k+1)-1] and how many
    edge-endpoints they carry. A power-law contact graph decays
    geometrically; a bump at high octaves is a hub (stadium, transit
    node) that will dominate any quadratic downstream op — the graph
    sibling of the corpus ``freq_spectrum`` and the early-warning input
    for ``co_visitation``'s occupancy gate. Returns
    (octave, n_vertices, n_endpoints).

    Plan: one union-explode of edge endpoints, one degree rollup, one
    broadcast range join against the same 41-row octave literal
    (FREQ_OCTAVES_SQL) the corpus spectrum uses."""
    from ..operators.textstats import FREQ_OCTAVES_SQL  # noqa: F401 (oracle twin)

    ends = edges.select(F.col("a").alias("v")).unionAll(
        edges.select(F.col("b").alias("v"))
    )
    deg = ends.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    spark = edges.sparkSession
    oct_rows = ", ".join(
        f"struct({k} AS k, {1 << k}L AS lo, {(1 << (k + 1)) - 1}L AS hi)"
        for k in range(41)
    )
    dim = spark.range(1).select(
        F.expr(f"explode(array({oct_rows}))").alias("o")
    ).select(
        F.col("o.k").alias("octave"), F.col("o.lo").alias("lo"),
        F.col("o.hi").alias("hi"),
    )
    return (
        deg.join(
            F.broadcast(dim),
            (F.col("deg") >= F.col("lo")) & (F.col("deg") <= F.col("hi")),
        )
        .groupBy("octave")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum("deg").alias("n_endpoints"),
        )
        .select(F.col("octave").cast("long"), "n_vertices", "n_endpoints")
    )
