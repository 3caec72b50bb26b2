"""Graph operators: transition-edge extraction and PageRank.

Training-data curation uses link-analysis scores as quality priors
(host-level PageRank over a web graph is a standard corpus-quality
signal). The fixtures have no hyperlinks, so the parity query builds
the *behavioral* graph — event-type transition edges per user — but
the operators are generic over any (src, dst, weight) edge relation.

Portability: PageRank is iterative float math, and float SUMs are
partition-order dependent. Ranks here are fixed-point MICRO units
(BIGINT). Each edge contribution floors to an integer, per-node
accumulation is exact integer summation (decimal(38) on Spark,
HUGEINT on DuckDB), and the damping update floors back to micro — so
every iteration is bit-identical on any engine and any partitioning.
The oracle unrolls the same iterations in SQL.

Scale shape: each iteration is one shuffle (groupBy dst) plus a
broadcast of the rank vector (nodes << edges in web graphs; for
billion-node graphs swap the broadcast for a shuffle join — the
arithmetic is unchanged). Edge extraction is a per-user window, state
bounded by events-per-user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def transition_edges(
    events: DataFrame,
    user_col: str = "user_id",
    state_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """(src, dst, weight): counts of consecutive state transitions per
    user, ordered deterministically (ties broken by event_id)."""
    w = Window.partitionBy(user_col).orderBy(*[F.asc(c) for c in order_cols])
    steps = events.select(
        F.col(state_col).alias("dst"),
        F.lag(F.col(state_col)).over(w).alias("src"),
    ).where(F.col("src").isNotNull())
    return steps.groupBy("src", "dst").agg(F.count("*").alias("weight"))


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank in micro fixed-point. Returns
    (node, rank_micro) with sum(rank_micro) ~= MICRO.

    Dangling nodes (no out-edges) redistribute their mass evenly —
    the full classic formulation, kept integer-exact.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_df = nodes.agg(F.count("*").alias("n"))
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))

    # init: floor(MICRO / n + 0.5) each
    r = (
        nodes.crossJoin(F.broadcast(n_df))
        .select(
            "node",
            F.floor(F.lit(float(MICRO)) / F.col("n") + F.lit(0.5))
            .cast("long")
            .alias("r"),
        )
    )

    for _ in range(iterations):
        ranked_edges = edges.join(F.broadcast(r), edges["src"] == r["node"]).join(
            F.broadcast(out_w), "src"
        )
        # per-edge integer contribution: floor(r * w / out_w + 0.5)
        contrib = ranked_edges.select(
            F.col("dst").alias("node"),
            F.floor(
                F.col("r") * F.col("weight") / F.col("out_w") + F.lit(0.5)
            )
            .cast("long")
            .alias("c"),
        )
        in_sum = contrib.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(38,0)")).cast("long").alias("in_c")
        )
        # dangling mass: ranks of nodes with no out-edges (exact int sum)
        dangling = (
            r.join(F.broadcast(out_w), r["node"] == out_w["src"], "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.col("r").cast("decimal(38,0)")).cast("long"), F.lit(0)
                ).alias("dang")
            )
        )
        r = (
            nodes.join(F.broadcast(in_sum), "node", "left")
            .crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.floor(
                        F.lit((1.0 - damping) * MICRO) / F.col("n") + F.lit(0.5)
                    )
                    + F.floor(
                        F.lit(damping) * F.coalesce(F.col("in_c"), F.lit(0))
                        + F.lit(0.5)
                    )
                    + F.floor(
                        F.lit(damping) * F.col("dang") / F.col("n") + F.lit(0.5)
                    )
                )
                .cast("long")
                .alias("r"),
            )
        )

    return r.select("node", F.col("r").alias("rank_micro"))


def sql_pagerank(
    edge_query: str, damping: float = 0.85, iterations: int = 3
) -> str:
    """DuckDB oracle: the same micro fixed-point iterations unrolled.
    ``edge_query`` must yield (src, dst, weight)."""
    d = damping
    parts = [
        f"edges AS ({edge_query})",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION SELECT dst FROM edges))",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "outw AS (SELECT src, sum(weight) AS out_w FROM edges GROUP BY 1)",
        f"r0 AS (SELECT node, CAST(floor({float(MICRO)} / n + 0.5) AS BIGINT)"
        " AS r FROM nodes CROSS JOIN nn)",
    ]
    for i in range(iterations):
        p, q = f"r{i}", f"r{i + 1}"
        parts.append(
            f"""c{i} AS (
              SELECT e.dst AS node,
                     CAST(sum(CAST(floor({p}.r * e.weight * 1.0 / o.out_w + 0.5)
                                   AS BIGINT)) AS BIGINT) AS in_c
              FROM edges e
              JOIN {p} ON {p}.node = e.src
              JOIN outw o ON o.src = e.src
              GROUP BY 1
            )"""
        )
        parts.append(
            f"""d{i} AS (
              SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dang
              FROM {p} WHERE node NOT IN (SELECT src FROM outw)
            )"""
        )
        parts.append(
            f"""{q} AS (
              SELECT nodes.node,
                     CAST(floor({(1.0 - d) * MICRO} / nn.n + 0.5) AS BIGINT)
                     + CAST(floor({d} * coalesce(c{i}.in_c, 0) + 0.5) AS BIGINT)
                     + CAST(floor({d} * d{i}.dang / nn.n + 0.5) AS BIGINT) AS r
              FROM nodes
              LEFT JOIN c{i} ON c{i}.node = nodes.node
              CROSS JOIN nn CROSS JOIN d{i}
            )"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, r AS rank_micro FROM r{iterations}"
    )


def triangles_per_node(
    edges: DataFrame, orient_by_degree: bool = False
) -> DataFrame:
    """(v, n_triangles) over an undirected edge set given as (s1, s2)
    with s1 < s2 (each edge once).

    ``orient_by_degree=False`` is the id-oriented textbook plan
    (q_triangle_count's oracle twin): wedges join on the middle
    vertex, the closing edge is an equi-join.

    ``orient_by_degree=True`` re-orients every edge from its
    lower-degree endpoint to its higher-degree endpoint (ties on id)
    before the wedge join — the standard skew mitigation: a celebrity
    node's wedge count is bounded by O(sqrt(m)^2) instead of
    O(degree^2), because high-degree nodes only ever RECEIVE oriented
    edges. Identical per-node triangle counts (pinned by test); the
    only change is which join side fans out.
    """
    if orient_by_degree:
        deg = (
            edges.select(F.col("s1").alias("v"))
            .unionAll(edges.select(F.col("s2").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        )
        e = (
            edges.join(deg.withColumnRenamed("v", "s1"), "s1")
            .withColumnRenamed("d", "d1")
            .join(
                deg.withColumnRenamed("v", "s2").withColumnRenamed("d", "d2"),
                "s2",
            )
        )
        # orient low -> high degree (ties: lower id first) — a total
        # order, so every edge keeps exactly one direction
        oriented = e.select(
            F.when(
                (F.col("d1") < F.col("d2"))
                | ((F.col("d1") == F.col("d2")) & (F.col("s1") < F.col("s2"))),
                F.struct(F.col("s1").alias("a"), F.col("s2").alias("b")),
            )
            .otherwise(
                F.struct(F.col("s2").alias("a"), F.col("s1").alias("b"))
            )
            .alias("e")
        ).select("e.a", "e.b")
    else:
        oriented = edges.select(
            F.col("s1").alias("a"), F.col("s2").alias("b")
        )
    t = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e2.a") == F.col("e1.b"))
        .join(
            oriented.alias("e3"),
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    # one row per (triangle, corner) via an in-row array explode: the
    # unionAll-of-three-projections form re-derived the whole wedge
    # join once per branch (r13 measured the plan at 3x the join
    # subtree — runtime exchange reuse dedupes the exchanges but the
    # join/fan-out work itself still ran per branch); the exploded
    # multiset is identical, so counts are unchanged
    verts = t.select(
        F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("v")
    )
    return verts.groupBy("v").agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def kcore(edges: DataFrame, k: int = 5, iterations: int = 6) -> DataFrame:
    """Bounded-iteration k-core peel over an undirected edge set
    (s1, s2) with s1 < s2: each round drops every node whose current
    degree is below ``k``, then keeps only edges with both endpoints
    alive. Returns (v, core_deg) for the surviving subgraph — the
    exact k-core once the peel converges (each round is a monotone
    shrink, so a fixed iteration count is deterministic on any engine
    and partitioning, the PageRank/k-means integer-iteration
    discipline; the gate query's iteration count is chosen past the
    measured convergence point and the oracle unrolls the identical
    rounds).

    Scale shape: one groupBy (degree) + two semi-join-shaped equi
    joins per round, all shuffling on the vertex key — no wedge
    blowup, cost O(iterations * |E|). The lineage is cut every other
    round (localCheckpoint): each round references its predecessor 3x
    (degree, both keep-joins), so an uncut 6-round plan re-analyzes
    the base relation 3^6 times — same re-inlining hazard the DuckDB
    oracle avoids with MATERIALIZED CTEs."""
    und = edges.select(F.col("s1").alias("v"), F.col("s2").alias("w")).unionAll(
        edges.select(F.col("s2").alias("v"), F.col("s1").alias("w"))
    )
    cur = und
    for i in range(iterations):
        deg = cur.groupBy("v").agg(F.count("*").alias("__d"))
        keep = deg.where(F.col("__d") >= k).select("v")
        cur = (
            cur.join(keep, "v")
            .join(keep.withColumnRenamed("v", "w"), "w")
            .select("v", "w")
        )
        if (i + 1) % 2 == 0:
            cur = cur.localCheckpoint()
    return cur.groupBy("v").agg(
        F.count("*").cast("long").alias("core_deg")
    )


def bfs_layers(edges: DataFrame, seeds: DataFrame, hops: int = 4) -> DataFrame:
    """Multi-source breadth-first search over an undirected edge set
    (s1, s2), s1 < s2, from a seed vertex relation (column ``v``):
    returns (v, hop) with each reachable vertex labeled by its MINIMUM
    hop distance from the seed set, bounded to ``hops`` rounds.
    Frontier expansion is set-semantics BFS — every vertex enters the
    result exactly once, at its first (= minimum) hop — so a fixed
    round count is deterministic on any engine and partitioning.

    Scale shape: each round is one equi-join of the CURRENT FRONTIER
    (not the visited set) against the edge relation plus an anti-join
    against the visited set — cost O(edges incident to the frontier)
    per round, the standard Pregel/GraphX BFS step expressed as
    dataflow. The visited set is localCheckpoint'd every round: both
    the frontier join and the anti-join reference it, and BFS lineage
    otherwise deepens linearly with hop count. For billion-edge
    graphs the frontier stays a fraction of |V| and the anti-join
    shuffles on the vertex key only."""
    # cut the edge relation's lineage ONCE: every round joins against
    # und, and an un-cut lineage re-executes the caller's edge
    # derivation (often an expensive self-join) once per round —
    # measured 6.2 -> 2.9 s at sf0.1 on the co-supply graph
    und = (
        edges.select(F.col("s1").alias("src"), F.col("s2").alias("dst"))
        .unionAll(edges.select(F.col("s2").alias("src"), F.col("s1").alias("dst")))
        .localCheckpoint()
    )
    visited = seeds.select("v", F.lit(0).alias("hop")).localCheckpoint()
    frontier = visited.select("v")
    for i in range(1, hops + 1):
        nxt = (
            und.join(frontier.withColumnRenamed("v", "src"), "src")
            .select(F.col("dst").alias("v"))
            .distinct()
            .join(visited.select("v"), "v", "left_anti")
            .select("v", F.lit(i).alias("hop"))
        )
        visited = visited.unionAll(nxt).localCheckpoint()
        frontier = nxt.select("v")
    return visited


def sql_bfs(edges_cte: str, seeds_sql: str, hops: int = 4) -> str:
    """DuckDB oracle twin of :func:`bfs_layers`: unrolled frontier
    rounds as MATERIALIZED CTEs (visited is referenced twice per
    round — the same re-inlining hazard kcore/pagerank avoid)."""
    parts = [
        f"""e AS MATERIALIZED ({edges_cte}),
    und AS MATERIALIZED (
      SELECT s1 AS src, s2 AS dst FROM e UNION ALL SELECT s2, s1 FROM e
    ), f0 AS MATERIALIZED ({seeds_sql}),
    vis0 AS MATERIALIZED (SELECT v, 0 AS hop FROM f0)"""
    ]
    for i in range(1, hops + 1):
        parts.append(
            f"""f{i} AS MATERIALIZED (
      SELECT DISTINCT u.dst AS v
      FROM und u JOIN f{i - 1} s ON u.src = s.v
      WHERE u.dst NOT IN (SELECT v FROM vis{i - 1})
    ), vis{i} AS MATERIALIZED (
      SELECT v, hop FROM vis{i - 1} UNION ALL SELECT v, {i} FROM f{i}
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT CAST(v AS BIGINT) AS suppkey, CAST(hop AS INT) AS hop
    FROM vis{hops}"""
    )


def label_propagation(edges: DataFrame, iterations: int = 4) -> DataFrame:
    """Synchronous label-propagation community detection over an
    undirected edge set (s1, s2), s1 < s2: labels start as the node
    id; each round every node adopts the MOST FREQUENT label among
    its neighbors, ties broken toward the smallest label — fully
    deterministic, so a fixed round count is engine- and
    partitioning-independent (the pagerank/kcore integer-iteration
    discipline; sync LPA can oscillate, which bounded rounds make a
    non-issue for parity). Returns (v, label) after ``iterations``.

    REQUIRES numeric (negatable) node ids: the per-round top-1 is a
    ``max(struct(count, -label))`` aggregate, whose tie-break relies
    on ``-label`` being a total-order flip — sound for the integer
    ids this graph family uses (ADVICE r13 #1; a non-numeric id
    column fails loudly at analysis time on the negation).

    Scale shape: per round one (node, neighbor-label) count shuffle
    plus a per-node top-1 max aggregate (map-side combined; the
    former row_number window paid a per-round repartition + sort) —
    O(|E|) per round, no wedge blowup; lineage cut every other
    round."""
    und = edges.select(F.col("s1").alias("src"), F.col("s2").alias("dst")).unionAll(
        edges.select(F.col("s2").alias("src"), F.col("s1").alias("dst"))
    )
    labels = und.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("label")
    )
    for i in range(iterations):
        votes = (
            und.join(labels.withColumnRenamed("v", "dst"), "dst")
            .groupBy(F.col("src").alias("v"), "label")
            .agg(F.count("*").alias("__c"))
        )
        # top-1 as a MAX over (count, -label): identical pick to the
        # former row_number() OVER (ORDER BY __c DESC, label ASC)
        # window — max count, ties toward the smallest label (labels
        # are node ids >= 0, so the negation is a total order) — but
        # as a plain aggregate it partial-combines map-side and skips
        # the window's per-round repartition-by-v sort (r13).
        labels = (
            votes.groupBy("v")
            .agg(
                F.max(
                    F.struct(
                        F.col("__c"),
                        (-F.col("label")).alias("__nl"),
                    )
                ).alias("__m")
            )
            .select("v", (-F.col("__m.__nl")).alias("label"))
        )
        if (i + 1) % 2 == 0:
            labels = labels.localCheckpoint()
    return labels


def sql_label_propagation(edges_cte: str, iterations: int = 4) -> str:
    """DuckDB oracle twin of :func:`label_propagation`: unrolled
    rounds as MATERIALIZED CTEs."""
    parts = [
        f"""e AS MATERIALIZED ({edges_cte}),
    und AS MATERIALIZED (
      SELECT s1 AS src, s2 AS dst FROM e UNION ALL SELECT s2, s1 FROM e
    ), l0 AS MATERIALIZED (
      SELECT DISTINCT src AS v, src AS label FROM und
    )"""
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f"""l{t} AS MATERIALIZED (
      SELECT v, label FROM (
        SELECT u.src AS v, l.label,
               row_number() OVER (
                 PARTITION BY u.src
                 ORDER BY count(*) DESC, l.label ASC) AS rn
        FROM und u JOIN l{t - 1} l ON l.v = u.dst
        GROUP BY u.src, l.label
      ) WHERE rn = 1
    )"""
        )
    return "WITH " + ",\n    ".join(parts), f"l{iterations}"
