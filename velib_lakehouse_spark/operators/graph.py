"""Graph analytics over a derived co-activity graph.

The events table induces a graph: two users (stations, in the
reference's reading) are connected when they are active in the same
hour.  ``pagerank_user_graph`` runs a fixed number of PageRank
iterations over it — the iterative-algorithm showcase alongside
``dedup_clusters``'s label propagation, but with a FULL arithmetic
oracle: the DuckDB mirror unrolls the same iterations CTE by CTE (the
``ann_ivf_topk`` Lloyd-unroll technique).

Scale design:

* Edge generation is the quadratic hazard: co-occurrence within a
  group is O(k²) pairs.  Hours with more than EDGE_GROUP_CAP active
  users contribute a deterministic TOP-K PANEL (the K users with the
  smallest per-(node, hour) hash mix) instead of being dropped
  (r5 VERDICT #4: the drop-group rule left the graph EMPTY at bench
  SFs, where every hour is busy — all scale evidence measured scans
  of nothing).  The panel keeps per-group fan-out bounded at
  C(cap, 2) whatever the corpus size, while the hash mix varies the
  panel per hour so panels overlap across hours and the derived
  graph keeps real structure at any SF.  The selection is one
  hour-partitioned row_number; a huge hour makes a slow sort task,
  not a memory hazard (the dedup-module DF-cap precedent).
* Each PageRank iteration is one contribution shuffle keyed by the
  destination node (map-side partial sums) plus a broadcast of the
  node-count scalar — the textbook Pregel shape expressed in
  DataFrame ops, ITERS times.  State between iterations is one row
  per node.
* All rank mass lives on an integer nano-grid: contributions divide
  by out-degree with integer division, the damping multiply stays in
  int64 (85 * rank < 2^63), and sums are exact in any partitioning —
  so the driver-loop Spark plan and the unrolled SQL agree bit for
  bit, and AQE re-partitioning between iterations cannot change the
  result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from velib_lakehouse_spark.catalog import load_table
from velib_lakehouse_spark.functions.lineage import free_local_checkpoint

HOUR_MS = 3600 * 1000
EDGE_GROUP_CAP = 20  # per-hour panel size: busier hours keep top-K only
PR_ITERS = 3
PR_SCALE = 1_000_000_000  # nano-grid total rank mass
PR_DAMP_NUM = 85  # damping 0.85 as an integer ratio
PR_DAMP_DEN = 100

# Deterministic per-(node, hour) mix for the panel selection.  Pure
# int64 arithmetic so Spark and DuckDB agree bit-for-bit: both operands
# are reduced below 1e6 first, so the product stays < 1e12 (no overflow
# under ANSI) and `%` on non-negative values equals pmod in both
# engines.  The hour term is MULTIPLICATIVE — an additive hour offset
# would order nodes identically in every hour and degenerate the graph
# to one static clique of EDGE_GROUP_CAP nodes.
MIX_P = 1_000_003
MIX_Q = 999_983


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed co-activity edges (a -> b and b -> a): within each
    hour, the <= EDGE_GROUP_CAP panel members (all active users when
    the hour is small, the smallest-mix K when it is busy) are fully
    connected."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("node"),
        F.expr(f"unix_millis(ts) div {HOUR_MS}").alias("hour"),
    )
    active = ev.distinct()
    mix = F.expr(
        f"pmod(pmod(node, {MIX_P}) * (pmod(hour, {MIX_Q}) + 7), {MIX_P})"
    )
    sel = (
        active.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("hour").orderBy(mix.asc(), F.col("node").asc())
            ),
        )
        .filter(F.col("rk") <= EDGE_GROUP_CAP)
        .select("hour", "node")
    )
    a = sel.select("hour", F.col("node").alias("a"))
    b = sel.select("hour", F.col("node").alias("b"))
    return (
        a.join(b, "hour")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )


def _sql_edges(suffix: str = "") -> str:
    """The DuckDB mirror of ``_edges`` as CTE text (names suffixed so a
    caller can embed two independent copies).  Every graph oracle
    embeds THIS snippet, so the Spark helper and all six SQL mirrors
    change in lockstep."""
    s = suffix
    return f"""
        ev{s} AS (
          SELECT DISTINCT user_id AS node,
                 CAST(epoch_ms(ts) // {HOUR_MS} AS BIGINT) AS hour
          FROM events
        ),
        sel{s} AS (
          SELECT node, hour FROM (
            SELECT node, hour,
                   row_number() OVER (
                     PARTITION BY hour
                     ORDER BY ((node % {MIX_P}) * ((hour % {MIX_Q}) + 7))
                              % {MIX_P}, node
                   ) AS rk
            FROM ev{s}
          ) WHERE rk <= {EDGE_GROUP_CAP}
        ),
        edges{s} AS (
          SELECT DISTINCT x.node AS a, y.node AS b
          FROM sel{s} x JOIN sel{s} y
            ON x.hour = y.hour AND x.node <> y.node
        )"""


def pagerank_user_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR_ITERS PageRank iterations over the co-activity graph; returns
    one row per node with its final nano-grid rank and out-degree."""
    edges = _edges(spark, sf_dir)
    # localCheckpoint: the edge derivation would otherwise be replayed
    # once per iteration through the growing plan.
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("out_deg"))
    nodes = deg.select(F.col("a").alias("node"), "out_deg")
    n = nodes.count()  # driver scalar: node count is iteration-constant
    if n == 0:
        return nodes.select(
            "node", "out_deg", F.lit(0).cast("bigint").alias("rank_nano")
        )
    base = (15 * PR_SCALE) // (100 * n)
    rank = nodes.select(
        "node", F.lit(PR_SCALE // n).cast("bigint").alias("rank_nano")
    )
    for _ in range(PR_ITERS):
        contribs = (
            edges.join(rank, edges.a == rank.node)
            .join(deg, "a")
            .select(
                F.col("b").alias("node"),
                F.expr("rank_nano div out_deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        rank = (
            nodes.select("node")
            .join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(s, 0))"
                        f" div {PR_DAMP_DEN}"
                    )
                ).cast("bigint").alias("rank_nano"),
            )
        )
    return (
        rank.join(nodes, "node")
        .select("node", "out_deg", "rank_nano")
    )


def _sql_pagerank() -> str:
    parts = [f"""
        WITH {_sql_edges()},
        deg AS (
          SELECT a, CAST(count(*) AS BIGINT) AS out_deg
          FROM edges GROUP BY a
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
        r0 AS (
          SELECT a AS node, CAST({PR_SCALE} // n_nodes AS BIGINT)
                   AS rank_nano
          FROM deg CROSS JOIN n
        )"""]
    for it in range(1, PR_ITERS + 1):
        parts.append(f"""
        , c{it} AS (
          SELECT e.b AS node,
                 CAST(SUM(r.rank_nano // d.out_deg) AS BIGINT) AS s
          FROM edges e
          JOIN r{it - 1} r ON e.a = r.node
          JOIN deg d ON e.a = d.a
          GROUP BY e.b
        ),
        r{it} AS (
          SELECT deg.a AS node,
                 CAST((15::BIGINT * {PR_SCALE}) // (100 * n_nodes)
                      + ({PR_DAMP_NUM}::BIGINT * COALESCE(c{it}.s, 0))
                        // {PR_DAMP_DEN} AS BIGINT) AS rank_nano
          FROM deg CROSS JOIN n
          LEFT JOIN c{it} ON deg.a = c{it}.node
        )""")
    parts.append(f"""
        SELECT r.node, deg.out_deg, r.rank_nano
        FROM r{PR_ITERS} r JOIN deg ON r.node = deg.a
    """)
    return "".join(parts)


ORACLE: dict[str, str | None] = {
    "pagerank_user_graph": _sql_pagerank(),
}

QUERIES = {
    "pagerank_user_graph": pagerank_user_graph,
}


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global + per-node triangle counts over the co-activity graph —
    the clustering-coefficient building block (community density,
    anomaly detection on interaction graphs).

    Algorithm: degree ORIENTATION (Schank & Wagner 2005) — point every
    undirected edge from its lower-(degree, node) endpoint to the
    higher one, turning the graph into a DAG where each triangle
    contains exactly one length-2 path through its middle vertex; a
    wedge self-join plus one closing-edge join counts each triangle
    once, and every join fans out by MIN degree, bounding worst-case
    work at O(m^1.5).  The orientation itself is two node-keyed joins
    of the degree frame onto the edge list — fully distributed, no
    global ordering or relabeling anywhere.

    Determinism: pure integer counts over canonical id triples.
    """
    und = (
        _edges(spark, sf_dir)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = und.join(
        deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("t"),
    ).localCheckpoint(eager=True)
    e1 = oriented.select(F.col("s").alias("x"), F.col("t").alias("y"))
    e2 = oriented.select(F.col("s").alias("y"), F.col("t").alias("z"))
    wedges = e1.join(e2, "y")
    closing = oriented.select(F.col("s").alias("x"), F.col("t").alias("z"))
    tri = wedges.join(closing, ["x", "z"])
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias(
                "n_triangles"
            ),
        )
    )


def _sql_triangles() -> str:
    return f"""
        WITH {_sql_edges()},
        und AS (
          SELECT a, b FROM edges WHERE a < b
        ),
        deg AS (
          SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
          ) GROUP BY node
        ),
        oriented AS (
          SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND und.a < und.b)
                      THEN und.a ELSE und.b END AS s,
                 CASE WHEN da.d < db.d OR (da.d = db.d AND und.a < und.b)
                      THEN und.b ELSE und.a END AS t
          FROM und
          JOIN deg da ON und.a = da.node
          JOIN deg db ON und.b = db.node
        ),
        tri AS (
          SELECT e1.s AS x, e1.t AS y, e2.t AS z
          FROM oriented e1
          JOIN oriented e2 ON e1.t = e2.s
          JOIN oriented e3 ON e3.s = e1.s AND e3.t = e2.t
        ),
        per_node AS (
          SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y AS node FROM tri
            UNION ALL SELECT z AS node FROM tri
          ) GROUP BY node
        )
        SELECT deg.node, COALESCE(per_node.n_triangles, 0) AS n_triangles
        FROM deg LEFT JOIN per_node ON deg.node = per_node.node
    """


ORACLE["triangle_count"] = _sql_triangles()
QUERIES["triangle_count"] = triangle_count


def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node: 2T / (d(d-1)) from the
    triangle counts and degrees — the community-density summary on top
    of ``triangle_count`` (same physical work plus one map-side ratio).

    Determinism: the coefficient is an integer micro-ratio
    ((2T * 1e6) div (d(d-1))); nodes with degree < 2 have no defined
    coefficient and report 0 over 0 possible wedges.
    """
    und = (
        _edges(spark, sf_dir)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_count(spark, sf_dir)
    return (
        tri.join(deg, "node")
        .select(
            "node",
            "degree",
            "n_triangles",
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "(2 * n_triangles * 1000000)"
                    " div (degree * (degree - 1))"
                )
                / F.lit(1_000_000.0),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coef"),
        )
    )


ORACLE["clustering_coefficient"] = f"""
    WITH tri AS ({ORACLE["triangle_count"]}),
    {_sql_edges("2")},
    und2 AS (
      SELECT a, b FROM edges2 WHERE a < b
    ),
    deg2 AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT a AS node FROM und2 UNION ALL SELECT b AS node FROM und2
      ) GROUP BY node
    )
    SELECT tri.node, deg2.degree, tri.n_triangles,
           CASE WHEN deg2.degree >= 2
                THEN ((2 * tri.n_triangles * 1000000)
                      // (deg2.degree * (deg2.degree - 1))) / 1000000.0
                ELSE 0.0 END AS clustering_coef
    FROM tri JOIN deg2 ON tri.node = deg2.node
"""
QUERIES["clustering_coefficient"] = clustering_coefficient


# ---- label-propagation communities -----------------------------------------

LPA_ITERS = 3


def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over the co-activity graph, LPA_ITERS rounds.

    Each node starts with its own id as label; every round it adopts
    the label that is most frequent among its neighbors, ties broken
    toward the SMALLEST label — the deterministic variant (classic LPA
    breaks ties randomly, which would be oracle-hostile and
    partitioning-dependent).  Three rounds converge the bulk of an
    assortative graph; the point here is the distributed shape, not
    asymptotic convergence.

    Scale shape: one round = one message shuffle (edges joined to the
    label frame on the source endpoint, the textbook Pregel
    scatter) + one (node, label) count aggregation with map-side
    partial aggregation + an argmax per node folded into the SAME
    aggregation via ``max(struct(cnt, -label))`` — no window, so the
    per-round cost is two key-balanced shuffles over edge count.
    Labels between rounds are one row per node.  The edge list is
    localCheckpoint'ed once (same reuse rationale as PageRank above).
    """
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("a").alias("node")).distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(LPA_ITERS):
        counts = (
            edges.join(labels, edges.a == labels.node)
            .groupBy(F.col("b").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = counts.groupBy("node").agg(
            (-F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl")))["nl"])
            .cast("bigint")
            .alias("label")
        )
    # community sizes as a count window over the final labels: the
    # former groupBy + self-join consumed the unrolled 3-round label
    # chain TWICE (once per join side — the whole chain re-derived for
    # `sizes` since nothing is cached between rounds); the window is
    # one label-keyed exchange over one derivation of the same rows.
    return labels.select(
        "node",
        F.col("label").alias("community"),
        F.count(F.lit(1))
        .over(Window.partitionBy("label"))
        .alias("community_size"),
    )


def _sql_lpa() -> str:
    parts = [f"""
        WITH {_sql_edges()},
        l0 AS (
          SELECT DISTINCT a AS node, a AS label FROM edges
        )"""]
    for it in range(1, LPA_ITERS + 1):
        parts.append(f"""
        , l{it} AS (
          SELECT node, label FROM (
            SELECT m.node, m.label,
                   row_number() OVER (PARTITION BY m.node
                                      ORDER BY m.cnt DESC, m.label ASC) AS rn
            FROM (
              SELECT e.b AS node, l.label, CAST(count(*) AS BIGINT) AS cnt
              FROM edges e JOIN l{it - 1} l ON e.a = l.node
              GROUP BY e.b, l.label
            ) m
          ) WHERE rn = 1
        )""")
    parts.append(f"""
        SELECT l.node, l.label AS community,
               CAST(s.community_size AS BIGINT) AS community_size
        FROM l{LPA_ITERS} l
        JOIN (
          SELECT label, count(*) AS community_size
          FROM l{LPA_ITERS} GROUP BY label
        ) s USING (label)
    """)
    return "".join(parts)


ORACLE["label_propagation_communities"] = _sql_lpa()
QUERIES["label_propagation_communities"] = label_propagation_communities


# ---- k-core peeling (fixed unrolled rounds) ----

KCORE_K = 3
KCORE_ITERS = 3


def kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete
    nodes of degree < k; survivors of the fixpoint form the k-core
    (Seidman 1983).  Like the module's PageRank/LPA, the judged
    contract is a FIXED number of unrolled peel rounds (so the DuckDB
    oracle mirrors them as CTEs); the fixpoint variant is the same
    loop run to quiescence driver-side, exactly `dedup_clusters`'
    shape.  Emits every original node with its degree in the
    thrice-peeled subgraph and the k-core membership verdict.

    Scale shape: each round is one degree aggregation (map-side
    partial count on the node key) and two semi-joins filtering the
    edge list — all on the same key; each round's edge frame is
    persisted and the previous released, so lineage stays one round
    deep.  Degrees, not neighbor sets, carry state: hot nodes cost
    O(1) aggregation state.
    """
    edges = _edges(spark, sf_dir).persist()
    sub = edges
    for _ in range(KCORE_ITERS):
        keep = (
            sub.groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("a")
        )
        # eager localCheckpoint, not persist+count: same one
        # materializing action per round, but it also TRUNCATES the
        # lineage.  With persist, each round's logical plan embeds the
        # previous round's full tree once per consumer (three here), so
        # the plan string grew ~3x per round — the round-3 plan carried
        # >2000 nested Exchange nodes and the optimizer re-walked that
        # tree every round (the dedup_clusters lineage convention).
        nxt = (
            sub.join(keep, "a", "left_semi")
            .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        if sub is not edges:
            # release the superseded round's blocks for REAL:
            # DataFrame.unpersist() is a no-op on a localCheckpoint-
            # backed frame (r10 ADVICE), so the old call here leaked
            # every round's edge list until ContextCleaner GC.  `nxt`
            # is eager — already materialized — so `sub` is dead.
            free_local_checkpoint(sub)
        sub = nxt
    nodes = edges.select(F.col("a").alias("node")).distinct()
    deg_final = sub.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("final_degree")
    )
    return (
        nodes.join(deg_final, "node", "left")
        .select(
            "node",
            F.coalesce("final_degree", F.lit(0)).alias("final_degree"),
            (F.coalesce("final_degree", F.lit(0)) >= KCORE_K).alias(
                "in_kcore"
            ),
        )
    )


def _sql_kcore() -> str:
    text = f"e0 AS (SELECT a, b FROM edges)"
    for i in range(KCORE_ITERS):
        text += f""",
        k{i} AS (
          SELECT a FROM e{i} GROUP BY a HAVING count(*) >= {KCORE_K}
        ),
        e{i + 1} AS (
          SELECT e.a, e.b FROM e{i} e
          WHERE e.a IN (SELECT a FROM k{i})
            AND e.b IN (SELECT a FROM k{i})
        )"""
    return text


ORACLE["kcore_peeling"] = f"""
    WITH {_sql_edges()},
    {_sql_kcore()},
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    degf AS (
      SELECT a AS node, CAST(count(*) AS BIGINT) AS final_degree
      FROM e{KCORE_ITERS} GROUP BY a
    )
    SELECT n.node,
           COALESCE(d.final_degree, 0) AS final_degree,
           COALESCE(d.final_degree, 0) >= {KCORE_K} AS in_kcore
    FROM nodes n LEFT JOIN degf d ON n.node = d.node
"""
QUERIES["kcore_peeling"] = kcore_peeling


# ---- Common-neighbors link prediction ----

LINKPRED_MIN_CN = 2


def link_prediction_common_neighbors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link prediction by common-neighbor counting (Liben-Nowell &
    Kleinberg 2003): score every NON-edge pair reachable in two hops
    by its common-neighbor count and neighborhood Jaccard — the
    classical baselines for "who should be connected".

    Scale shape: candidate generation is the 2-hop path join
    e(a,x) ⋈ e(x,b) — bounded because the underlying co-activity
    graph caps group fan-out (`EDGE_GROUP_CAP`), so per-node degree
    is bounded and paths per node are O(deg²); existing edges are
    removed with one anti-join; degrees broadcast (one row per node).
    Scores are integer ppm (bit-exact).  Pairs below
    ``LINKPRED_MIN_CN`` common neighbors are dropped — the score has
    no signal there and the cut bounds output.
    """
    edges = _edges(spark, sf_dir).persist()
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    hop = (
        edges.select(F.col("a").alias("x"), F.col("b").alias("p"))
        .join(edges.select(F.col("a").alias("x"), F.col("b").alias("q")), "x")
        .filter(F.col("p") < F.col("q"))
        .groupBy("p", "q")
        .agg(F.count(F.lit(1)).alias("cn"))
        .filter(F.col("cn") >= LINKPRED_MIN_CN)
    )
    non_edges = hop.join(
        edges.select(F.col("a").alias("p"), F.col("b").alias("q")),
        ["p", "q"],
        "left_anti",
    )
    return (
        non_edges.join(
            F.broadcast(deg.select(F.col("a").alias("p"),
                                   F.col("deg").alias("deg_p"))),
            "p",
        )
        .join(
            F.broadcast(deg.select(F.col("a").alias("q"),
                                   F.col("deg").alias("deg_q"))),
            "q",
        )
        .select(
            F.col("p").alias("node_a"),
            F.col("q").alias("node_b"),
            "cn",
            "deg_p",
            "deg_q",
            F.expr("cn * 1000000 div (deg_p + deg_q - cn)").alias(
                "jaccard_ppm"
            ),
        )
    )


ORACLE["link_prediction_common_neighbors"] = f"""
    WITH {_sql_edges()},
    deg AS (SELECT a, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY a),
    hop AS (
      SELECT e1.b AS p, e2.b AS q, CAST(count(*) AS BIGINT) AS cn
      FROM edges e1 JOIN edges e2 ON e1.a = e2.a AND e1.b < e2.b
      GROUP BY 1, 2 HAVING count(*) >= {LINKPRED_MIN_CN}
    ),
    non_edges AS (
      SELECT h.* FROM hop h
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.a = h.p AND e.b = h.q
      )
    )
    SELECT n.p AS node_a, n.q AS node_b, n.cn,
           dp.deg AS deg_p, dq.deg AS deg_q,
           n.cn * 1000000 // (dp.deg + dq.deg - n.cn) AS jaccard_ppm
    FROM non_edges n
    JOIN deg dp ON dp.a = n.p
    JOIN deg dq ON dq.a = n.q
"""
QUERIES["link_prediction_common_neighbors"] = link_prediction_common_neighbors


# ---- Multi-source BFS hop levels ----

BFS_SEED_MOD = 7  # seeds: nodes with node % 7 == 0 (landmark set)
BFS_MAX_HOPS = 3  # bounded-hop contract, like REC_DEPTH in dedup


def bfs_hop_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: hop distance from a landmark seed set to every
    node of the co-activity graph, bounded at ``BFS_MAX_HOPS`` — the
    traversal primitive the graph family was missing (pagerank walks
    mass, k-core peels, label-prop gossips; nothing measured DISTANCE).
    Multi-source is the shape production graph systems actually run
    (landmark distance labeling for reachability/closeness features):
    one frontier expansion serves every seed at once.

    Algorithm: textbook frontier BFS as a driver loop of DataFrame ops
    (the ``pagerank_user_graph`` Pregel precedent).  Level 0 is the
    seed set (``node % BFS_SEED_MOD == 0``); each hop joins the
    CURRENT FRONTIER (not the visited set) to the edge list, anti-joins
    the visited set, and the survivors become the next frontier.
    Unreached nodes report level -1 (explicit, not NULL — the driver's
    hash canonicalization treats them identically in both engines).

    Scale shape:

    * each hop is ONE join shuffle keyed by the edge source plus one
      anti-join against visited; the join input is the FRONTIER
      (shrinks as the wavefront passes), never the full visited set —
      the classic BFS-on-Pregel cost model, O(edges touched per hop);
    * the visited set is one row per reached node; both it and the
      frontier are ``localCheckpoint``-ed per hop so the plan does not
      re-derive the edge generation per iteration (lineage-depth
      convention from ``pagerank_user_graph``);
    * hop count is BOUNDED: landmark seeds every ``BFS_SEED_MOD``-th
      node mean the wavefronts meet within a few hops whatever the
      graph size — the same bounded-diameter argument
      ``dedup_clusters_recursive`` makes for near-dup cliques;
    * the DuckDB oracle unrolls the same hops as CTEs, so every
      level assignment is hash-checked.
    """
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = nodes.filter(F.col("node") % BFS_SEED_MOD == 0)
    visited = frontier.select("node", F.lit(0).cast("bigint").alias("level"))
    for hop in range(1, BFS_MAX_HOPS + 1):
        nxt = (
            edges.join(frontier, edges.a == frontier.node)
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        # visited is a union of already-checkpointed level frames — no
        # re-derivation risk, so checkpointing the union too only paid
        # an extra job + copy per hop.
        visited = visited.unionByName(
            nxt.select("node", F.lit(hop).cast("bigint").alias("level"))
        )
        frontier = nxt
    return nodes.join(visited, "node", "left").select(
        "node", F.coalesce("level", F.lit(-1)).cast("bigint").alias("level")
    )


def _sql_bfs() -> str:
    parts = [f"""
        WITH {_sql_edges()},
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT a AS node FROM edges UNION ALL SELECT b AS node FROM edges
          )
        ),
        l0 AS (SELECT node FROM nodes WHERE node % {BFS_SEED_MOD} = 0),
        v0 AS (SELECT node, CAST(0 AS BIGINT) AS level FROM l0)"""]
    for hop in range(1, BFS_MAX_HOPS + 1):
        parts.append(f"""
        , l{hop} AS (
          SELECT DISTINCT e.b AS node
          FROM edges e JOIN l{hop - 1} f ON e.a = f.node
          WHERE NOT EXISTS (
            SELECT 1 FROM v{hop - 1} v WHERE v.node = e.b
          )
        ),
        v{hop} AS (
          SELECT node, level FROM v{hop - 1}
          UNION ALL
          SELECT node, CAST({hop} AS BIGINT) AS level FROM l{hop}
        )""")
    parts.append(f"""
        SELECT n.node, COALESCE(v.level, -1) AS level
        FROM nodes n LEFT JOIN v{BFS_MAX_HOPS} v ON n.node = v.node
    """)
    return "".join(parts)


ORACLE["bfs_hop_levels"] = _sql_bfs()
QUERIES["bfs_hop_levels"] = bfs_hop_levels


# ---- Connected components: alternating large-star / small-star --------------

CC_ROUNDS = 3  # alternation rounds; diameter-log convergence (see docstring)


def connected_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — the algorithm that replaced label propagation for
    web-scale graphs: each round is two neighbor-min aggregations, and
    the component count provably converges in O(log^2 n) rounds versus
    label propagation's O(diameter).  ``dedup_clusters`` carries the
    LPA tier; this is the scalable tier a 100 TB edge list needs.

    One round, expressed relationally (edges kept symmetric):

    * large-star: per node u, every STRICTLY LARGER neighbor v
      re-attaches to m = min(N(u) u {u}) — emit edge (v, m);
    * small-star: per node u, every neighbor v <= u (and u itself)
      attaches to m = min over that set — emit (v, m).

    Both halves are one groupBy-min + one explode-join over the
    current edge list; no global ordering, no driver state beyond the
    loop counter.  After convergence every node points directly at its
    component minimum (a star), so the label read-off is the edge list
    itself.  ``CC_ROUNDS`` alternations suffice for the co-activity
    graph's shallow components (panel-capped hours keep diameters
    small — the ``dedup_clusters_recursive`` bounded-depth argument);
    the ``is_root_label`` audit column surfaces non-convergence
    loudly instead of silently mislabeling.

    The DuckDB oracle unrolls the same alternations CTE by CTE, so
    every round's re-attachment — not just the final labels — is
    hash-checked.  All state is (src, dst) bigint pairs; min over
    int64 is associative under any partitioning.
    """
    und = (
        _edges(spark, sf_dir)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # symmetric edge list; self-loops keep singletons... none exist
    # here (every edge has two endpoints), so nodes = endpoint set.
    # Lazy union over the checkpointed `und` — materializing the union
    # itself was a second copy of the same rows (and one more job).
    cur = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    prev_small = None  # superseded round's checkpoint (released below)
    for _ in range(CC_ROUNDS):
        # large-star: m(u) = min(N(u) u {u}); (v, m) for v in N(u), v > u
        mins = cur.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        # persist (lazy), not an eager checkpoint: `large` feeds both
        # halves of `sym`'s union; the cache is filled during `small`'s
        # one materialization below instead of costing its own job.
        large = (
            cur.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(
                mins.select(F.col("a"), F.col("m").alias("b"))
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .persist()
        )
        sym = large.unionByName(
            large.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        # small-star: m(u) = min over {v <= u} u {u}; attach those v
        small_nbrs = sym.filter(F.col("b") < F.col("a"))
        smins = small_nbrs.groupBy("a").agg(F.min("b").alias("m"))
        # ONE eager materialization per round (was three: large, small,
        # cur each got an eager localCheckpoint = three jobs/round).
        # `cur` is a projection-union over the checkpointed `small`, so
        # its two consumers next round re-read cached partitions, never
        # re-derive the round.
        small = (
            small_nbrs.join(smins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(smins.select("a", F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        large.unpersist()
        if prev_small is not None:
            # this round's eager checkpoint is materialized and `large`
            # (its only other reader) is done, so the previous round's
            # blocks are dead — release them (DataFrame.unpersist would
            # be a no-op on a checkpoint-backed frame, r10 ADVICE)
            free_local_checkpoint(prev_small)
        prev_small = small
        cur = small.unionByName(
            small.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
    labels = cur.filter(F.col("b") < F.col("a")).groupBy("a").agg(
        F.min("b").alias("component")
    )
    nodes = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .distinct()
    )
    out = nodes.join(
        labels.select(F.col("a").alias("node"), "component"),
        "node",
        "left",
    ).select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )
    # audit: a converged labeling's components are their own labels
    roots = out.select(F.col("component").alias("node")).distinct().join(
        out, "node"
    ).select(
        F.col("node"), (F.col("component") == F.col("node")).alias("ok")
    )
    return out.join(
        roots.select(F.col("node").alias("component"), "ok"), "component"
    ).select(
        "node",
        "component",
        F.col("ok").cast("bigint").alias("is_root_label"),
    )


def _sql_cc() -> str:
    parts = [f"""
        WITH {_sql_edges()},
        und AS (SELECT a, b FROM edges WHERE a < b),
        c0 AS MATERIALIZED (
          SELECT a, b FROM und
          UNION ALL SELECT b AS a, a AS b FROM und
        )"""]
    for i in range(1, CC_ROUNDS + 1):
        parts.append(f"""
        , lm{i} AS MATERIALIZED (
          SELECT a, least(min(b), a) AS m FROM c{i - 1} GROUP BY a
        ),
        lg{i} AS MATERIALIZED (
          SELECT DISTINCT a, b FROM (
            SELECT c.b AS a, m.m AS b
            FROM c{i - 1} c JOIN lm{i} m ON c.a = m.a
            WHERE c.b > c.a
            UNION ALL
            SELECT a, m AS b FROM lm{i}
          ) WHERE a <> b
        ),
        ls{i} AS MATERIALIZED (
          SELECT a, b FROM lg{i}
          UNION ALL SELECT b AS a, a AS b FROM lg{i}
        ),
        sn{i} AS MATERIALIZED (SELECT a, b FROM ls{i} WHERE b < a),
        sm{i} AS MATERIALIZED (SELECT a, min(b) AS m FROM sn{i} GROUP BY a),
        sq{i} AS MATERIALIZED (
          SELECT DISTINCT a, b FROM (
            SELECT n.b AS a, m.m AS b
            FROM sn{i} n JOIN sm{i} m ON n.a = m.a
            UNION ALL
            SELECT a, m AS b FROM sm{i}
          ) WHERE a <> b
        ),
        c{i} AS MATERIALIZED (
          SELECT a, b FROM sq{i}
          UNION ALL SELECT b AS a, a AS b FROM sq{i}
        )""")
    parts.append(f"""
        , labels AS MATERIALIZED (
          SELECT a AS node, min(b) AS component
          FROM c{CC_ROUNDS} WHERE b < a GROUP BY a
        ),
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
          )
        ),
        outq AS MATERIALIZED (
          SELECT n.node, COALESCE(l.component, n.node) AS component
          FROM nodes n LEFT JOIN labels l ON l.node = n.node
        ),
        roots AS (
          SELECT r.node AS component,
                 (o2.component = r.node) AS ok
          FROM (SELECT DISTINCT component AS node FROM outq) r
          JOIN outq o2 ON o2.node = r.node
        )
        SELECT o.node, o.component,
               CAST(r.ok AS BIGINT) AS is_root_label
        FROM outq o JOIN roots r ON r.component = o.component
    """)
    return "".join(parts)


ORACLE["connected_components_star"] = _sql_cc()
QUERIES["connected_components_star"] = connected_components_star
