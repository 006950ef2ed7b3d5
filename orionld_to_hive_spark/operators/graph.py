"""Graph analytics over relational edge lists — degree, projection,
triangles, PageRank.

Beyond-reference capability (the reference's query surface is four
HiveQL statements, `hive.py:49-99`, none relational-graph-shaped). A
training-data pipeline needs graph ops constantly: near-dup clusters ARE
connected components (`operators/dedup.py:380`), link graphs drive
domain-level quality scores, and co-occurrence projections back
citation/recommendation features. This module adds the standard
edge-list repertoire expressed as pure DataFrame plans.

Graph model — two graphs derived from the TPC-H-ish star schema:

  * bipartite purchase graph: customer —bought-from→ supplier, from
    lineitem ⋈ orders (distinct pairs);
  * nation trade graph: customer's nation → supplier's nation with
    revenue-sum edge weights — a dense small-vertex digraph (≤ 25²
    edges) whose EDGE DERIVATION is fact-table-scale work.

Scale stance (the part the vertex counts hide):
  - Edge derivation is the 100 TB cost: one fact-table shuffle to
    distinct/aggregate pairs. The fact table is scanned once per query.
    Joins against orders/customer/supplier carry NO explicit broadcast
    hint — those sides are sf-proportional (billions of rows at the
    100 TB design point), so the strategy is left to AQE, which still
    broadcasts them at small scale factors but falls back to
    shuffle-hash when the runtime size exceeds the threshold. Explicit
    hints are reserved for genuinely bounded frames (nation ≤ 25 rows,
    1-row scalar aggregates, the ≤ 25-row out-weight table).
  - Co-occurrence projection (suppliers sharing a part) is the classic
    quadratic trap: a hub part with 10⁵ suppliers would emit 10¹⁰
    pairs. Posting lists are therefore capped per part (deterministic
    lowest-key selection, cap stated in the output) exactly like the
    Jaccard shingle cap at `operators/dedup.py:83-113` — fan-out is
    bounded by cap²/2 per part, and the cap is enforced identically in
    the DuckDB oracle so the parity check covers the capped semantics.
  - Triangle counting uses the degree-ordered orientation (each
    triangle counted once via a<b<c edge direction), so the heaviest
    join probes the adjacency of the LOWER-degree endpoint — the
    standard node-iterator bound O(m^{3/2}).
  - PageRank is the iterative-join pattern: ranks live in a DataFrame
    keyed by node, each iteration is contribution-join + groupBy +
    broadcast of two scalar aggregates (dangling mass is a 1-row agg
    crossJoin, NOT a global window). `localCheckpoint` truncates the
    lineage each iteration like the connected-components loop at
    `operators/dedup.py:439`. Per-iteration rank products are rounded
    then summed in exact DECIMAL so results are shuffle-order-independent
    and bit-identical to the unrolled-CTE DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orionld_to_hive_spark.functions.numeric import DECIMAL_T
from orionld_to_hive_spark.sources.warehouse import load_table

# Deterministic per-part posting-list cap for the co-occurrence
# projection (see module docstring — same idiom as the Jaccard DF cap).
_COOC_CAP = 64

# PageRank constants: damping, iteration count, and the rounding grid
# that makes double arithmetic identical across engines (products
# rounded to 15 dp and summed in DECIMAL(38,18); ranks re-rounded to
# 12 dp each iteration so the next iteration starts from the same
# representable double in both engines).
_PR_D = 0.85
_PR_ITERS = 5
_PR_N = 25  # nation count is fixed by the TPC-H spec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Out-degree distribution of the customer→supplier purchase graph:
# how many distinct suppliers each customer bought from, histogrammed.
# One fact shuffle (distinct pairs), one tiny re-aggregate on degree.
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    deg = edges.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


GRAPH_DEGREE_SQL = """
WITH edges AS (
    SELECT DISTINCT o_custkey, l_suppkey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
deg AS (
    SELECT o_custkey, COUNT(*) AS degree FROM edges GROUP BY o_custkey
)
SELECT degree, COUNT(*) AS n_customers
FROM deg GROUP BY degree ORDER BY degree
"""


# --------------------------------------------------------------------------
# Co-occurrence projection: supplier pairs that ship the same part,
# weighted by the number of distinct shared parts. Posting list per
# part capped at _COOC_CAP suppliers (lowest suppkey first) — fan-out
# is ≤ cap·(cap−1)/2 pairs per part regardless of hub size. The same
# cap is applied in the oracle via ROW_NUMBER, so capped semantics are
# what parity checks. Output: pairs sharing ≥ 2 parts.
def graph_common_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    w = F.row_number().over(
        Window.partitionBy("l_partkey").orderBy("l_suppkey")
    )
    capped = ps.withColumn("rn", w).filter(F.col("rn") <= _COOC_CAP).drop("rn")
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_partkey") == F.col("b.l_partkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(
        F.col("a.l_suppkey").alias("supp_a"),
        F.col("b.l_suppkey").alias("supp_b"),
    )
    return (
        pairs.groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).alias("n_common_parts"))
        .filter(F.col("n_common_parts") >= 2)
    )


GRAPH_COOC_SQL = f"""
WITH ps AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
capped AS (
    SELECT l_partkey, l_suppkey FROM (
        SELECT l_partkey, l_suppkey,
               ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY l_suppkey) AS rn
        FROM ps
    ) WHERE rn <= {_COOC_CAP}
)
SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
       COUNT(*) AS n_common_parts
FROM capped a JOIN capped b
  ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
GROUP BY supp_a, supp_b
HAVING COUNT(*) >= 2
ORDER BY n_common_parts DESC, supp_a, supp_b
"""


# --------------------------------------------------------------------------
# Triangle count on the undirected supplier co-occurrence graph (edges
# = pairs sharing ≥ 2 parts, from the capped projection above), via the
# DEGREE-ORDERED orientation: every edge points from its lower-(degree,
# key) endpoint to the higher one, so every triangle has exactly one
# apex with two outgoing edges, wedges are generated only at the apex,
# and per-node out-degree is O(√m) — the node-iterator O(m^{3/2}) wedge
# bound that a plain key orientation does NOT give (one high-degree,
# low-key hub would emit deg² wedges). The edge list is materialized
# ONCE (localCheckpoint) before the self-joins — without it each alias
# re-derives the projection from the fact table. The oracle keeps the
# simple key-oriented formulation: the COUNT is orientation-invariant,
# so the differential doubles as a proof the reorientation is sound.
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = (
        graph_common_part_pairs(spark, sf_dir)
        .select(F.col("supp_a").alias("u"), F.col("supp_b").alias("v"))
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    ranked = und.join(du, "u").join(dv, "v")
    ord_u = F.struct(F.col("deg_u").alias("d"), F.col("u").alias("k"))
    ord_v = F.struct(F.col("deg_v").alias("d"), F.col("v").alias("k"))
    oriented = ranked.select(
        F.when(ord_u < ord_v, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(ord_u < ord_v, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(ord_u < ord_v, ord_v).otherwise(ord_u).alias("dst_ord"),
    ).localCheckpoint(eager=True)
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    e3 = oriented.alias("e3")
    # wedges at the apex: two out-edges, deterministic b ≺ c ordering so
    # each unordered out-pair is generated once
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src"))
        & (F.col("e1.dst_ord") < F.col("e2.dst_ord")),
    ).select(F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c"))
    # closing edge always runs b→c because b ≺ c in the orientation
    tri = wedges.join(
        e3,
        (F.col("b") == F.col("e3.src")) & (F.col("c") == F.col("e3.dst")),
        "left_semi",
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


GRAPH_TRIANGLES_SQL = f"""
WITH ps AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
capped AS (
    SELECT l_partkey, l_suppkey FROM (
        SELECT l_partkey, l_suppkey,
               ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY l_suppkey) AS rn
        FROM ps
    ) WHERE rn <= {_COOC_CAP}
),
edges AS (
    SELECT a.l_suppkey AS u, b.l_suppkey AS v
    FROM capped a JOIN capped b
      ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    GROUP BY u, v
    HAVING COUNT(*) >= 2
)
SELECT COUNT(*) AS n_triangles
FROM edges e1
JOIN edges e2 ON e1.v = e2.u
JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
"""


# --------------------------------------------------------------------------
# Weighted PageRank on the nation trade graph, fixed 5 iterations,
# d = 0.85, proper dangling-mass redistribution. See module docstring
# for the determinism grid. The oracle is the same recurrence unrolled
# as a CTE chain — a decorrelation-style proof that the computed ranks
# are the textbook fixpoint step.
#
# Two execution strategies (r5):
#   * pagerank_iterate_distributed — ranks live in a DataFrame, each
#     iteration is contribution-join + groupBy + two scalar-aggregate
#     broadcasts, lineage truncated per iteration. The scale path for
#     UNBOUNDED graphs (supplier-level, web-domain-level, ...).
#   * _pagerank_solve_bounded — the nation graph has ≤25 nodes and
#     ≤625 edges BY CONSTRUCTION, so after the fact-scale edge
#     derivation the solve is a bounded-state problem: collect the
#     normalized edge table (≤625 rows — the same k·d-sized collect
#     the k-means loop uses for centroids) and iterate on the driver,
#     mirroring the distributed arithmetic digit-for-digit (same
#     HALF_UP roundings, same exact-decimal sums, same IEEE op order).
#     This removes ~15 tiny shuffle/checkpoint jobs whose fixed cost
#     dominated the query (2.27 s → the edge derivation alone).
# tests/test_graph.py pins driver-solve ≡ distributed-iteration
# equality exactly, and the DuckDB oracle certifies the solve against
# the unrolled recurrence every round.
def pagerank_iterate_distributed(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = None,
    d: float = None,
) -> DataFrame:
    """Distributed PageRank iteration over (src, dst, p) edges and
    (node) vertices — the unbounded-graph path. Returns (node, rank)."""
    iters = _PR_ITERS if iters is None else iters
    d = _PR_D if d is None else d
    n = nodes.count()
    srcs = edges.select(F.col("src").alias("node")).distinct()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))

    base = (1.0 - d) / n
    for _ in range(iters):
        # Dangling mass: 1-row aggregate broadcast (never a global window).
        dm = (
            ranks.join(srcs, "node", "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.round(F.col("rank"), 15).cast("decimal(38,18)")),
                    F.lit(0).cast("decimal(38,18)"),
                )
                .cast("double")
                .alias("dm")
            )
        )
        inc = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(
                    F.round(F.col("rank") * F.col("p"), 15).cast("decimal(38,18)")
                )
                .cast("double")
                .alias("inc")
            )
        )
        ranks = (
            nodes.join(inc, "node", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + d
                    * (F.coalesce(F.col("inc"), F.lit(0.0)) + F.col("dm") / n),
                    12,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def _round_half_up(x: float, scale: int):
    """Exact mirror of Spark's F.round on DoubleType: HALF_UP over the
    shortest decimal representation (java BigDecimal.valueOf ==
    Python repr, both shortest-round-trip)."""
    from decimal import ROUND_HALF_UP, Decimal

    return Decimal(repr(x)).quantize(Decimal(1).scaleb(-scale), ROUND_HALF_UP)


def _pagerank_solve_bounded(
    edge_rows, node_ids, iters: int, d: float
) -> list[tuple[int, float]]:
    """Driver-side solve for BOUNDED graphs (≤ a few thousand edges),
    digit-identical to pagerank_iterate_distributed: per-term HALF_UP
    rounding to 15 dp, exact decimal sums (float() of a Decimal is
    correctly rounded, as BigDecimal.doubleValue), per-iteration rank
    rounding to 12 dp, and the same IEEE operation order in the update
    expression."""
    n = len(node_ids)
    srcs = {s for s, _, _ in edge_rows}
    ranks = {v: 1.0 / n for v in node_ids}
    base = (1.0 - d) / n
    for _ in range(iters):
        dm = float(sum((_round_half_up(ranks[v], 15)
                        for v in node_ids if v not in srcs), start=0))
        inc: dict[int, object] = {}
        for s, t, p in edge_rows:
            term = _round_half_up(ranks[s] * p, 15)
            inc[t] = inc.get(t, 0) + term
        ranks = {
            v: float(
                _round_half_up(
                    base
                    + d * ((float(inc[v]) if v in inc else 0.0) + dm / n),
                    12,
                )
            )
            for v in node_ids
        }
    return sorted(ranks.items())


def _nation_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w) weighted nation-trade edges — the CANONICAL
    fact-scale edge derivation shared by pagerank and label
    propagation (and mirrored by _NATION_EDGES_SQL in both oracles):
    ONE fact scan; join strategy left to AQE (see module docstring —
    orders/customer/supplier are sf-proportional, never
    hint-broadcast); weights exact DECIMAL so every consumer's
    downstream arithmetic starts from the same exact sums."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DECIMAL_T
                )
            ).alias("w")
        )
    )


_NATION_EDGES_SQL = """raw AS (
    SELECT c_nationkey AS src, s_nationkey AS dst,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS w
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY src, dst
)"""


def graph_nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    raw = _nation_edges(spark, sf_dir)
    # ≤ |nations|² = 625 rows by construction — bounded-state collect
    # (k·d-class, like the k-means centroid loop); the fact-scale work
    # above stays distributed and runs as ONE job. Everything after —
    # out-weight normalization, the 5-iteration solve, the name join,
    # the final sort — is ≤625-row arithmetic, so it finishes
    # driver-side with digit-identical roundings (each extra 25-row
    # Spark job measured 0.3-0.8 s of pure scheduling overhead; the
    # old distributed tail cost more than the fact scan itself). The
    # result ships back as a pre-ordered LocalRelation.
    raw_rows = raw.collect()  # (src, dst, w: Decimal), exact
    import decimal

    out_w: dict[int, object] = {}
    with decimal.localcontext() as ctx:
        ctx.prec = 50  # exact at any edge-weight magnitude (Spark's
        # decimal sum widens to precision 37; 50 dominates it)
        for r in raw_rows:
            out_w[r.src] = out_w.get(r.src, 0) + r.w
    # float(Decimal) == BigDecimal.doubleValue: both correctly rounded,
    # so this division mirrors w.cast(double)/out_w.cast(double).
    edge_rows = [
        (
            r.src,
            r.dst,
            float(_round_half_up(float(r.w) / float(out_w[r.src]), 12)),
        )
        for r in raw_rows
    ]
    names = {r.n_nationkey: r.n_name for r in nation.collect()}
    solved = _pagerank_solve_bounded(
        edge_rows, list(names), _PR_ITERS, _PR_D
    )
    rows = sorted(
        ((names[v], float(_round_half_up(r, 9))) for v, r in solved),
        key=lambda t: (-t[1], t[0]),
    )
    return spark.createDataFrame(rows, "n_name STRING, rank DOUBLE")


def _pagerank_sql() -> str:
    """Unroll the PageRank recurrence as a DuckDB CTE chain."""
    head = f"""
WITH {_NATION_EDGES_SQL},
edges AS (
    SELECT src, dst,
           ROUND(CAST(w AS DOUBLE) /
                 CAST(SUM(w) OVER (PARTITION BY src) AS DOUBLE), 12) AS p
    FROM raw
),
nodes AS (SELECT n_nationkey AS node FROM nation),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / {_PR_N} AS rank FROM nodes)"""
    steps = []
    for k in range(1, _PR_ITERS + 1):
        prev = f"r{k - 1}"
        steps.append(
            f""",
dm{k} AS (
    SELECT CAST(COALESCE(SUM(CAST(ROUND(rank, 15) AS DECIMAL(38,18))), 0)
                AS DOUBLE) AS dm
    FROM {prev} WHERE node NOT IN (SELECT src FROM edges)
),
inc{k} AS (
    SELECT e.dst AS node,
           CAST(SUM(CAST(ROUND(r.rank * e.p, 15) AS DECIMAL(38,18)))
                AS DOUBLE) AS inc
    FROM edges e JOIN {prev} r ON e.src = r.node
    GROUP BY e.dst
),
r{k} AS (
    SELECT n.node,
           ROUND({(1.0 - _PR_D) / _PR_N} + {_PR_D} *
                 (COALESCE(i.inc, 0.0) + d.dm / {_PR_N}), 12) AS rank
    FROM nodes n LEFT JOIN inc{k} i ON n.node = i.node CROSS JOIN dm{k} d
)"""
        )
    tail = f"""
SELECT n_name, ROUND(rank, 9) AS rank
FROM r{_PR_ITERS} JOIN nation ON node = n_nationkey
ORDER BY rank DESC, n_name
"""
    return head + "".join(steps) + tail


GRAPH_PAGERANK_SQL = _pagerank_sql()


# --------------------------------------------------------------------------
# Community detection — deterministic synchronous label propagation
# (LPA) over the undirected nation trade graph. Classic LPA is
# nondeterministic (random tie-breaks, random visit order); this
# variant is a pure function of the edge list: FIXED iteration count,
# synchronous updates, each node adopts the label with the largest
# exact-DECIMAL neighbor-weight total (ties -> smallest label),
# isolated nodes keep their label. Determinism is what makes the
# unrolled DuckDB CTE chain an EXACT oracle (the kmeans move).
#
# Scale: edge derivation is the one fact-table shuffle; each iteration
# is a join + groupBy + argmax over the EDGE frame (m rows), the
# Pregel-per-superstep cost, with per-iteration localCheckpoint
# truncating the lineage like the other iterative loops here.
LPA_ITERS = 4


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    raw = _nation_edges(spark, sf_dir)
    und = (
        raw.select(F.col("src").alias("a"), F.col("dst").alias("b"), "w")
        .unionByName(
            raw.select(F.col("dst").alias("a"), F.col("src").alias("b"), "w")
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)  # reused every iteration
    )
    nodes = nation.select(F.col("n_nationkey").alias("v"))
    labels = nodes.withColumn("label", F.col("v"))
    for _ in range(LPA_ITERS):
        scores = (
            und.join(
                labels.select(F.col("v").alias("b"), "label"), "b"
            )
            .groupBy("a", "label")
            .agg(F.sum("w").alias("s"))
        )
        wr = Window.partitionBy("a").orderBy(
            F.col("s").desc(), F.col("label").asc()
        )
        winners = (
            scores.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") == 1)
            .select(F.col("a").alias("v"), F.col("label").alias("new"))
        )
        labels = (
            labels.join(winners, "v", "left")
            .select("v", F.coalesce("new", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
    wsz = Window.partitionBy("label")
    return (
        labels.join(nation, labels.v == nation.n_nationkey)
        .select(
            "n_name",
            F.col("label").cast("int").alias("community"),
            F.count(F.lit(1)).over(wsz).cast("bigint").alias(
                "community_size"
            ),
        )
    )


def _lpa_sql() -> str:
    """Unroll the fixed-iteration LPA as a DuckDB CTE chain."""
    head = f"""
WITH {_NATION_EDGES_SQL},
und AS (
    SELECT a, b, SUM(w) AS w FROM (
        SELECT src AS a, dst AS b, w FROM raw
        UNION ALL
        SELECT dst AS a, src AS b, w FROM raw
    ) WHERE a <> b GROUP BY a, b
),
nodes AS (SELECT n_nationkey AS v FROM nation),
l0 AS (SELECT v, v AS label FROM nodes)"""
    steps = []
    for k in range(1, LPA_ITERS + 1):
        prev = f"l{k - 1}"
        steps.append(
            f""",
s{k} AS (
    SELECT und.a AS v, l.label, SUM(und.w) AS s
    FROM und JOIN {prev} l ON und.b = l.v
    GROUP BY und.a, l.label
),
w{k} AS (
    SELECT v, label,
           row_number() OVER (PARTITION BY v ORDER BY s DESC, label) AS rn
    FROM s{k}
),
l{k} AS (
    SELECT p.v, COALESCE(w.label, p.label) AS label
    FROM {prev} p
    LEFT JOIN (SELECT v, label FROM w{k} WHERE rn = 1) w ON p.v = w.v
)"""
        )
    tail = f"""
SELECT n_name, CAST(label AS INTEGER) AS community,
       CAST(COUNT(*) OVER (PARTITION BY label) AS BIGINT) AS community_size
FROM l{LPA_ITERS} JOIN nation ON v = n_nationkey
ORDER BY n_name
"""
    return head + "".join(steps) + tail


GRAPH_LPA_SQL = _lpa_sql()


# --------------------------------------------------------------------------
# BFS hop histogram — single-source shortest hop counts on the
# undirected supplier co-occurrence graph, from the smallest supplier
# key. The iterative-frontier pattern: each round joins the frontier to
# the (materialized) edge list, anti-joins already-visited nodes, and
# checkpoints — the Pregel-style traversal loop every distributed graph
# engine runs, expressed as DataFrame joins. Hop counts are integers ⇒
# no FP determinism care needed; the oracle is DuckDB's WITH RECURSIVE
# walked to the same depth cap.
_BFS_MAX_HOPS = 6


def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = graph_common_part_pairs(spark, sf_dir).select(
        F.col("supp_a").alias("u"), F.col("supp_b").alias("v")
    )
    edges = (
        pairs.union(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=True)
    )
    # Scalar source read (min key): same driver-side scalar pattern as
    # the incremental-ingest watermark — one value, not a data collect.
    src = edges.agg(F.min("u")).collect()[0][0]
    dist = spark.createDataFrame([(src, 0)], "node long, hop int")
    frontier = dist
    for hop in range(1, _BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.u)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).cast("int").alias("hop"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return (
        dist.groupBy("hop")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


GRAPH_BFS_SQL = f"""
WITH RECURSIVE ps AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
capped AS (
    SELECT l_partkey, l_suppkey FROM (
        SELECT l_partkey, l_suppkey,
               ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY l_suppkey) AS rn
        FROM ps
    ) WHERE rn <= {_COOC_CAP}
),
halfedges AS (
    SELECT a.l_suppkey AS u, b.l_suppkey AS v
    FROM capped a JOIN capped b
      ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    GROUP BY u, v
    HAVING COUNT(*) >= 2
),
edges AS (
    SELECT u, v FROM halfedges UNION ALL SELECT v, u FROM halfedges
),
walk(node, d) AS (
    SELECT (SELECT MIN(u) FROM edges), 0
    UNION
    SELECT e.v, w.d + 1
    FROM walk w JOIN edges e ON e.u = w.node
    WHERE w.d < {_BFS_MAX_HOPS}
),
dist AS (
    SELECT node, MIN(d) AS hop FROM walk GROUP BY node
)
SELECT CAST(hop AS INTEGER) AS hop, COUNT(*) AS n_nodes
FROM dist GROUP BY hop ORDER BY hop
"""


QUERIES = {
    "graph_degree_distribution": graph_degree_distribution,
    "graph_common_part_pairs": graph_common_part_pairs,
    "graph_triangle_count": graph_triangle_count,
    "graph_nation_trade_pagerank": graph_nation_trade_pagerank,
    "graph_label_propagation": graph_label_propagation,
    "graph_bfs_hops": graph_bfs_hops,
}

ORACLES = {
    "graph_degree_distribution": GRAPH_DEGREE_SQL,
    "graph_common_part_pairs": GRAPH_COOC_SQL,
    "graph_triangle_count": GRAPH_TRIANGLES_SQL,
    "graph_nation_trade_pagerank": GRAPH_PAGERANK_SQL,
    "graph_label_propagation": GRAPH_LPA_SQL,
    "graph_bfs_hops": GRAPH_BFS_SQL,
}
