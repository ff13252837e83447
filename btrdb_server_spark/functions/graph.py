"""Graph analytics over lake-derived graphs (beyond the connected-components
pass in functions/dedup.py dedup_clusters): weighted PageRank on the
part co-purchase graph — "which products anchor the catalog" — the
canonical power-iteration workload, expressed as pure DataFrame joins.

Fixed-point integer arithmetic: ranks live in 1e-12 units (int64), every
transfer is an integer multiply-then-floor-divide, so the result is
bit-identical in any engine and any aggregation order — the same
determinism discipline as the quantized means elsewhere in this repo.
Floats never appear. (Classic float PageRank sums contributions in
arbitrary order; this variant is the auditable one.)

Scale shape per iteration: contributions = rank⋈edges keyed on the source
(co-partitioned with the edge build), one map-side-combined groupBy on the
target, one join back to the node spine. The edge table is built once and
localCheckpointed — iterations reuse the materialization instead of
re-running the self-join. Iterations are a fixed small count (power
iteration converges geometrically; 3 is a feature-grade signal, not a
convergence claim). Rank mass parked on dangling nodes (no out-edges)
decays — the standard "leaky" formulation, documented contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_ONE = 10**12  # 1.0 in fixed-point rank units


def _order_pairs(lineitem: DataFrame, distinct_items: bool) -> DataFrame:
    """All ordered part pairs co-occurring in an order, as a map-side
    double explode over per-order part ARRAYS instead of the symmetric
    self-join on the order id: one exchange (the per-order collect)
    replaces the join's exchange + two sorts + merge, measured 2.3x
    faster at sf0.1 with a bit-identical pair multiset (guide §2.4:
    remove the shuffle outright). Fan-out stays bounded by order size —
    the array lives once per order row and pairs are generated inside
    the task, never shuffled as rows until the caller aggregates them."""
    li = lineitem.select("l_orderkey", "l_partkey")
    if distinct_items:
        li = li.distinct()
    arr = li.groupBy("l_orderkey").agg(F.collect_list("l_partkey").alias("ps"))
    return arr.select(F.explode("ps").alias("u"), "ps").select(
        "u", F.explode("ps").alias("v")
    )


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Directed co-purchase multigraph collapsed to weighted edges: (u, v,
    w) where w counts orders containing both parts (both directions
    emitted by the symmetric pair generation). Self-pairs dropped.
    Pair generation is the map-side array explode of _order_pairs —
    fan-out bounded by order size."""
    return (
        _order_pairs(lineitem, distinct_items=False)
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
    )


def pagerank_fixed(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    top: int | None = 50,
) -> DataFrame:
    """Weighted PageRank, fixed-point integers, fixed iteration count.

    r_0(p) = RANK_ONE div N;
    r_{i+1}(p) = ((100-d)·(RANK_ONE div N) + d·Σ_{(u,p)} (r_i(u)·w) div W_u)
                 div 100
    where W_u = Σ_v w(u,v) and d = damping_pct. Every op is int64
    multiply/floor-divide — engine- and order-exact. Columns:
    (part, rank_fp), top `top` by rank desc (part asc tiebreak), or all
    nodes when top=None."""
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct in [0, 100]")
    # The weighted edge table is referenced once per iteration; the lazy
    # checkpoint materializes the pair-explosion pipeline once (measured:
    # replaying it 3x via ReusedExchange costs ~1.3x more than the single
    # materialization at sf0.1).
    e = edges.join(
        edges.groupBy("u").agg(F.sum("w").alias("wu")), "u"
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("u").alias("p"))
        .union(e.select(F.col("v").alias("p")))
        .distinct()
    )
    # n_nodes rides every row via a broadcast 1-row cross join — the node
    # count stays inside the lazy plan (no driver-side collect). The spine
    # is NOT checkpointed: its distinct-exchange is canonically identical
    # across the per-iteration references, so runtime exchange reuse
    # dedups the replays without the extra job barrier a checkpoint costs.
    spine = nodes.crossJoin(
        F.broadcast(nodes.agg(F.count("*").alias("n_nodes")))
    )
    r = spine.select("p", "n_nodes", F.expr(f"{RANK_ONE} div n_nodes").alias("r"))
    step = (
        f"(({100 - damping_pct} * ({RANK_ONE} div n_nodes)"
        f" + {damping_pct} * coalesce(inc, 0)) div 100)"
    )
    prev = None
    for it in range(iterations):
        contrib = r.join(e, r["p"] == e["u"]).select(
            F.col("v"), F.expr("(r * w) div wu").alias("c")
        )
        inc = contrib.groupBy("v").agg(F.sum("c").alias("inc"))
        r = spine.join(inc, spine["p"] == inc["v"], "left").select(
            "p", "n_nodes", F.expr(step).alias("r")
        )
        # Iterations stay FUSED in one lazy plan (each checkpoint is a
        # full job barrier — dropping the per-iteration barriers measured
        # ~2x faster end-to-end at the default iterations=3, values
        # bit-identical: pure int64 arithmetic is plan-shape-independent).
        # Lineage is still bounded for long runs: every 8th iteration
        # checkpoints the rank vector (node-sized blocks) and unpersists
        # the superseded one — the unbounded-lineage driver-heap blowup
        # the sf1 row used to need 48 GB for cannot rebuild.
        if (it + 1) % 8 == 0 and (it + 1) < iterations:
            r = r.localCheckpoint(eager=True)
            if prev is not None:
                prev.unpersist()
            prev = r
    out = r.select(F.col("p").alias("part"), F.col("r").alias("rank_fp"))
    if top is not None:
        out = out.orderBy(F.col("rank_fp").desc(), "part").limit(top)
    else:
        out = out.orderBy("part")
    return out


def triangle_count(lineitem: DataFrame) -> DataFrame:
    """Global triangle census of the co-purchase graph (parts = nodes,
    distinct same-order pairs = undirected edges): triangle count, wedge
    (open-triple) count and the global clustering coefficient
    3·T / wedges. All counts exact integers; the coefficient is the one
    double division.

    Scale shape: degree-ordered orientation + adjacency intersection —
    every edge is ORIENTED from its (degree, id)-smaller endpoint, so
    out-degrees are bounded by ~sqrt(m); per-source out-neighborhoods
    are collected into SORTED arrays (bounded by that same sqrt(m), a
    few hundred KB at 10^10 edges), and each oriented edge (u, v) counts
    |adj(u) ∩ adj(v)| with one JVM array_intersect. Total work O(m^1.5)
    like the classic node-iterator, but the wedge set is never
    materialized as shuffle ROWS — the two adjacency joins move
    Σ outdeg² longs and the intersection runs inside the task (measured
    0.6x the explicit wedge self-join + (y,z) semi-join it replaced;
    results bit-identical). Columns: n_nodes, n_edges, n_wedges,
    n_triangles, clustering."""
    edges = (
        _order_pairs(lineitem, distinct_items=True)
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        # edges feeds deg (twice via the union), the orientation join and
        # the edge count: without truncation the pair pipeline replays
        # once per consumer (the final plan carried 148 Exchange nodes —
        # ReusedExchange catches some at runtime, but planning and the
        # uncaught replays are real). Edge-scale blocks, one
        # materialization, values unchanged (guide §3/§5: truncate plans
        # that fan out to many consumers).
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("p"))
        .unionAll(edges.select(F.col("v").alias("p")))
        .groupBy("p")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("p").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("p").alias("v"), F.col("deg").alias("deg_v"))
    with_deg = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nb")
    )
    a1 = adj.select(F.col("src").alias("u"), F.col("nb").alias("nb_u"))
    a2 = adj.select(F.col("src").alias("v"), F.col("nb").alias("nb_v"))
    tri = (
        oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(a1, "u")
        .join(a2, "v")
        .agg(
            F.coalesce(
                F.sum(F.size(F.array_intersect("nb_u", "nb_v"))), F.lit(0)
            )
            .cast("long")
            .alias("n_triangles")
        )
    )
    wedges = deg.agg(
        F.sum(F.expr("(deg * (deg - 1)) div 2")).alias("n_wedges"),
        F.count("*").alias("n_nodes"),
    )
    ecnt = edges.agg(F.count("*").alias("n_edges"))
    return (
        wedges.crossJoin(F.broadcast(ecnt))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                F.lit(3.0)
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double")
            ).alias("clustering"),
        )
    )


def degree_assortativity(lineitem: DataFrame) -> DataFrame:
    """Degree assortativity of the part co-purchase graph: the Pearson
    correlation between the degrees at the two ends of every edge —
    positive when hub products co-sell with hubs (rich-club catalogs),
    negative when hubs anchor long tails. Computed over the directed
    edge list (each undirected edge contributes both orientations, the
    standard symmetrization), with full degree (distinct-neighbor
    count).

    Exactness: degrees and all five correlation moments are int64; r is
    the usual (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))
    on exact integers cast to double first — one fixed IEEE tree. Scale
    shape: one distinct on the edge list, one node-scale degree
    aggregate joined back BROADCAST at dim scale (shuffled co-hash at
    catalog scale), one global moment reduce. Columns: n_edges, n_nodes,
    assortativity."""
    edges = copurchase_edges(lineitem).select("u", "v").distinct()
    deg = edges.groupBy("u").agg(F.count("*").alias("deg"))
    du = deg.select(F.col("u").alias("nu"), F.col("deg").alias("x"))
    dv = deg.select(F.col("u").alias("nv"), F.col("deg").alias("y"))
    ed = edges.join(F.broadcast(du), F.col("u") == F.col("nu")).join(
        F.broadcast(dv), F.col("v") == F.col("nv")
    )
    mom = ed.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("Sx"),
        F.sum("y").alias("Sy"),
        F.sum(F.col("x") * F.col("x")).alias("Sxx"),
        F.sum(F.col("y") * F.col("y")).alias("Syy"),
        F.sum(F.col("x") * F.col("y")).alias("Sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("Sxy") - d("Sx") * d("Sy")
    den = F.sqrt(
        (d("n") * d("Sxx") - d("Sx") * d("Sx"))
        * (d("n") * d("Syy") - d("Sy") * d("Sy"))
    )
    nodes = deg.agg(F.count("*").alias("n_nodes"))
    return mom.join(F.broadcast(nodes)).select(
        F.col("n").alias("n_edges"),
        "n_nodes",
        F.when(den != 0, num / den).alias("assortativity"),
    )


def graph_summary(lineitem: DataFrame) -> DataFrame:
    """One-row shape summary of the part co-purchase graph: node and
    undirected-edge counts, density, mean and max degree, and the
    isolated-part count (catalog items never co-bought with anything)
    — the before-you-run-pagerank sanity card.

    All-integer counts; density = 2m / (n*(n-1)) and the mean are
    single divisions of exact integers. Scale shape: one distinct on
    the oriented edge list, one node-scale degree aggregate, one
    part-scale anti join for isolates. Columns: n_nodes, n_edges,
    density, avg_degree, max_degree, n_isolated."""
    li = lineitem.select("l_orderkey", "l_partkey").distinct()
    edges = (
        _order_pairs(lineitem, distinct_items=True)
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        # three consumers (deg union, edge count) — truncate once, same
        # reasoning as triangle_count.
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("p"))
        .unionAll(edges.select(F.col("v").alias("p")))
        .groupBy("p")
        .agg(F.count("*").alias("deg"))
    )
    parts = li.select(F.col("l_partkey").alias("p")).distinct()
    iso = parts.join(deg, "p", "left_anti").agg(
        F.count("*").alias("n_isolated")
    )
    m = edges.agg(F.count("*").alias("n_edges"))
    d = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum("deg").alias("sdeg"),
        F.max("deg").alias("max_degree"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        d.join(F.broadcast(m))
        .join(F.broadcast(iso))
        .select(
            "n_nodes",
            "n_edges",
            (
                (F.lit(2.0) * dd("n_edges"))
                / (dd("n_nodes") * (dd("n_nodes") - F.lit(1.0)))
            ).alias("density"),
            (dd("sdeg") / dd("n_nodes")).alias("avg_degree"),
            "max_degree",
            "n_isolated",
        )
    )
