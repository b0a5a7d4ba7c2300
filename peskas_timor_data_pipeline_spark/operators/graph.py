"""Graph operators over edge-list DataFrames.

Connected components live in ``llm/cluster.py`` (recursive halving); this
module holds the rank-propagation family. Everything is expressed as
joins + partial-aggregated groupBys per iteration — the classic Spark
graph idiom (GraphX's Pregel is RDD-era; edge-list joins keep Catalyst,
AQE, and whole-stage codegen in play).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANO = 1_000_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str,
    n_iter: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Weighted PageRank in FIXED-POINT integer arithmetic: ranks are
    integers in nano-units (sum ~ 1e9), every per-edge contribution is
    ``(r_u * w_uv) div out_w_u`` and the damping update is
    ``base + (damping_pct * s_v) div 100`` — pure integer div/sum, so the
    result is bit-identical on any engine (an IEEE-float PageRank's
    per-node contribution sum is summation-order dependent, which flips
    discrete rankings between engines). The deliberate truncation loss is
    at most 1 nano-unit per edge per iteration — noise at rank scale 1e9.

    Dangling-node mass is dropped (the standard simplification; totals
    shrink slightly per iteration rather than redistributing).

    Scale shape per iteration: one broadcast-or-shuffle join of the rank
    frame (|V| rows) to the edge list on src, one partial-aggregated
    groupBy(dst), one outer join back to the node set. The weighted edge
    list and node set are MATERIALIZED once and each iteration's rank
    frame cuts its lineage too — without that, iteration k's plan
    re-derives the edge build k times over (the e17 power-iteration
    lesson; measured 16s -> 2s on the 5-node fixture graph). Contract:
    ``r_u * w_uv`` must stay under 2^63 — with nano-unit ranks that allows
    edge weights up to ~9e9. Weights are POSITIVE INTEGERS by contract:
    they are cast to long per edge before any summing, and edges whose
    truncated weight is <= 0 (fractional sub-1 weights, zeros, negatives)
    are dropped up front rather than poisoning out-weight sums.

    Returns (node, rank_nanos, n_iter).
    """
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    src = edges.select(F.col(src_col).alias("node"))
    dst = edges.select(F.col(dst_col).alias("node"))
    nodes = materialize(src.union(dst).distinct())
    # integer-weight-> 0 contract enforced up front: cast BEFORE summing
    # (summing fractional weights then truncating the total would count
    # mass the per-edge truncated __w__ never carries), and drop edges
    # whose truncated weight is <= 0 — out-weight sums are then always
    # positive, so no '__r__ * __w__ div __ow__' can NULL out and silently
    # drop a node's outgoing mass
    typed = edges.select(
        F.col(src_col).alias("__src__"),
        F.col(dst_col).alias("__dst__"),
        F.col(weight_col).cast("long").alias("__w__"),
    ).filter(F.col("__w__") > 0)
    out_w = typed.groupBy("__src__").agg(F.sum("__w__").alias("__ow__"))
    e = materialize(typed.join(out_w, "__src__"))
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty edge list: no nodes, no ranks — return the typed empty frame
        return nodes.select(
            "node",
            F.lit(None).cast("long").alias("rank_nanos"),
            F.lit(n_iter).alias("n_iter"),
        )
    base = (15 if damping_pct == 85 else 100 - damping_pct) * NANO // (100 * n_nodes)
    ranks = nodes.select("node", F.lit(NANO // n_nodes).cast("long").alias("__r__"))
    for _ in range(n_iter):
        ranks = materialize(ranks)
        contrib = (
            e.join(ranks.withColumnRenamed("node", "__src__"), "__src__")
            .select(
                F.col("__dst__").alias("node"),
                F.expr("__r__ * __w__ div __ow__").alias("__c__"),
            )
            .groupBy("node")
            .agg(F.sum("__c__").alias("__s__"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"{damping_pct}L * coalesce(__s__, 0L) div 100L")
            ).cast("long").alias("__r__"),
        )
    return ranks.select(
        "node", F.col("__r__").alias("rank_nanos"), F.lit(n_iter).alias("n_iter")
    )


def triangle_count(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Exact global triangle count via the DEGREE-ORDERED node-iterator
    (Schank & Wagner 2005; the MapReduce form is Suri & Vassilvitskii
    2011) — the only triangle algorithm that survives power-law graphs at
    scale: every undirected edge is oriented from its (degree, id)-smaller
    endpoint to the larger, which provably bounds each node's OUT-degree
    by O(sqrt(m)); the wedge-generating self-join then produces
    O(m^{3/2}) candidate wedges total instead of sum(deg^2) (quadratic in
    the max hub degree). A hub with 10^6 neighbors contributes zero
    wedges as a wedge CENTER unless its ordered out-degree earns it.

    Input is treated as an undirected simple graph: direction, self-loops
    and duplicate edges are normalized away first.

    Shape: one distinct on canonicalized edges, one degree aggregation
    (broadcast-or-shuffle joined back), the wedge self-join on the shared
    center key, and one semi-join of wedges against the directed edge set.
    Returns one row: (n_nodes, n_edges, n_triangles)."""
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    und = materialize(und)
    deg = (
        und.select(F.col("a").alias("n")).unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    directed = materialize(
        und.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    wedges = (
        directed.select(F.col("u").alias("c"), F.col("v").alias("x"))
        .join(
            directed.select(F.col("u").alias("c"), F.col("v").alias("y")),
            "c",
        )
        .filter(F.col("x") < F.col("y"))
    )
    tri = wedges.join(
        directed.select(
            F.col("u").alias("x"), F.col("v").alias("y")
        ).unionAll(
            directed.select(F.col("v").alias("x"), F.col("u").alias("y"))
        ),
        ["x", "y"],
        "left_semi",
    )
    n_nodes = deg.count()
    n_edges = und.count()
    return tri.agg(F.count(F.lit(1)).alias("n_triangles")).select(
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.col("n_triangles").cast("long"),
    )


def k_core(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    k: int,
    n_rounds: int = 4,
) -> DataFrame:
    """k-core peeling (Seidman 1983) over an undirected simple graph:
    repeatedly delete nodes of degree < k; what survives ``n_rounds``
    rounds is (a superset converging to) the k-core — the standard dense
    subgraph primitive for spam-farm / boilerplate-hub detection in link
    graphs and for trimming weakly-connected noise before community
    passes. The round count is PINNED (not run-to-fixpoint) so any two
    engines replay the identical prefix of the peeling sequence; each
    round removes a monotone set, so n_rounds only truncates convergence,
    never changes what the converged core would be.

    Scale shape per round: one partial-aggregated degree groupBy on the
    surviving edge list and two semi-joins (src-alive, dst-alive) — all on
    the same node key, no cartesian anywhere; the surviving edge frame is
    materialized each round to cut the k-deep lineage (the g1 lesson).
    Degree-0 isolation is implicit: a node with no surviving edge simply
    stops appearing.

    Input is normalized to undirected-simple first (direction, self-loops,
    duplicates dropped). Returns the surviving nodes as
    (node, degree, k, n_rounds).
    """
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    e = materialize(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    for _ in range(n_rounds):
        deg = (
            e.select(F.col("a").alias("n"))
            .unionAll(e.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        alive = deg.filter(F.col("d") >= k).select("n")
        e = materialize(
            e.join(alive.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(alive.withColumnRenamed("n", "b"), "b", "left_semi")
        )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.filter(F.col("degree") >= k).select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        F.lit(k).cast("int").alias("k"),
        F.lit(n_rounds).cast("int").alias("n_rounds"),
    )


def label_propagation(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    n_rounds: int = 3,
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al. 2007
    made engine-replayable): labels start as the node id; each round every
    node adopts its neighbors' most frequent label, ties broken by the
    SMALLEST label — the two determinism pins (synchronous update + total
    tie order) that turn LPA's usual run-to-run jitter into a pure
    function of the graph. Round count is PINNED like :func:`k_core`.
    Unlike connected components, LPA can split a component into several
    communities — it is the cheap community primitive for near-dup
    cluster refinement and link-farm grouping.

    Scale shape per round: one edge->label equi-join (labels frame is
    |V| rows), one (node, label) partial-aggregated count, one rank-1
    window per node (bounded by the node's distinct neighbor labels) —
    no cartesian; the label frame is materialized per round to cut the
    k-deep lineage. Nodes exist only as endpoints of non-self-loop
    edges: a node with no such edge (isolated, or self-loops only)
    does not appear in the output at all — singleton communities are
    the caller's complement set, not rows here.

    Returns (node, label, n_rounds).
    """
    from pyspark.sql.window import Window

    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    und = edges.select(
        F.least(F.col(src_col), F.col(dst_col)).alias("a"),
        F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
    ).filter(F.col("a") != F.col("b")).distinct()
    und = materialize(und)
    both = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    nodes = both.select(F.col("u").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(
        F.col("__c__").desc(), F.col("label").asc()
    )
    for _ in range(n_rounds):
        labels = materialize(labels)
        nbr = both.join(
            labels.withColumnRenamed("node", "u"), "u"
        ).select(F.col("v").alias("node"), "label")
        voted = (
            nbr.groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("__c__"))
            .withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .select("node", "label")
        )
        # every non-isolated node has >= 1 neighbor vote, so the vote
        # frame covers all of `nodes`; keep the select explicit anyway
        labels = voted
    return labels.select(
        "node", "label", F.lit(n_rounds).cast("int").alias("n_rounds")
    )


def k_truss(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    k: int,
    n_rounds: int = 3,
) -> DataFrame:
    """k-truss peeling (Cohen 2008) over an undirected simple graph:
    repeatedly delete edges whose SUPPORT (number of triangles through
    the edge) is below k-2; the k-truss is a strictly stronger cohesion
    filter than the k-core (every k-truss edge sits inside k-2 triangle
    witnesses) — the standard community-kernel / spam-clique primitive.
    Round count is PINNED like k_core's: both engines replay the same
    peeling prefix; each round removes a monotone edge set, so truncation
    only delays convergence, never changes the fixpoint.

    Scale shape per round: triangles are enumerated once on the surviving
    a<b edge list via the degree-oriented wedge join idiom (e1.b == e2.a
    plus the closing-edge equi-join — every join is an equi-join on node
    keys, no cartesian), exploded to their three member edges and
    partial-agg counted; the peeled edge list is materialized per round
    to cut the lineage (the g1/g3 lesson). Per-round cost is the triangle
    count's, which the surviving subgraph only shrinks.

    Returns the edges surviving ``n_rounds`` peels as
    (a, b, support, k, n_rounds) — ``support`` is the value that
    justified the final keep (computed on the round-(n-1) survivor set,
    the well-defined pinned-prefix semantics).
    """
    from peskas_timor_data_pipeline_spark.llm.ckpt import materialize

    e = materialize(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sup = None
    for _ in range(n_rounds):
        tri = (
            e.select(F.col("a").alias("x"), F.col("b").alias("y"))
            .join(
                e.select(F.col("a").alias("y"), F.col("b").alias("z")), "y"
            )
            .join(
                e.select(F.col("a").alias("x"), F.col("b").alias("z")),
                ["x", "z"],
                "left_semi",
            )
        )
        member = tri.select(
            F.explode(
                F.array(
                    F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                    F.struct(F.col("y").alias("a"), F.col("z").alias("b")),
                    F.struct(F.col("x").alias("a"), F.col("z").alias("b")),
                )
            ).alias("__e__")
        ).select("__e__.a", "__e__.b")
        counts = member.groupBy("a", "b").agg(
            F.count(F.lit(1)).alias("support")
        )
        scored = e.join(counts, ["a", "b"], "left").select(
            "a", "b", F.coalesce("support", F.lit(0)).alias("support")
        )
        # one materialize per round holds both the next round's edge list
        # and the surviving support values (no re-run of the triangle
        # pass at action time)
        sup = materialize(scored.filter(F.col("support") >= k - 2))
        e = sup.select("a", "b")
    return sup.select(
        "a",
        "b",
        F.col("support").cast("long").alias("support"),
        F.lit(k).cast("int").alias("k"),
        F.lit(n_rounds).cast("int").alias("n_rounds"),
    )
