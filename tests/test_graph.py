"""Graph analytics units: invariants the oracle diff can't express.

The oracle sweep proves engine parity; these assert the *algorithmic*
properties — PageRank is a probability distribution, the degree
histogram accounts for every purchasing customer, triangles respect the
orientation bound, and the co-occurrence cap actually bounds fan-out.
"""

from __future__ import annotations

import math

from conftest import SF_SMOKE

from orionld_to_hive_spark.operators import graph


def test_pagerank_is_distribution(spark):
    rows = graph.graph_nation_trade_pagerank(spark, SF_SMOKE).collect()
    assert len(rows) == 25
    total = sum(r["rank"] for r in rows)
    # Ranks are rounded to 9 dp; 25 nodes → total within 25e-9 of 1.
    assert math.isclose(total, 1.0, abs_tol=1e-6)
    assert all(r["rank"] > 0 for r in rows)
    # Sorted descending by construction.
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_degree_distribution_accounts_for_all_buyers(spark):
    from orionld_to_hive_spark.sources.warehouse import load_table

    hist = graph.graph_degree_distribution(spark, SF_SMOKE).collect()
    n_from_hist = sum(r["n_customers"] for r in hist)
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey")
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    n_buyers = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert n_from_hist == n_buyers
    assert all(r["degree"] >= 1 for r in hist)


def test_cooccurrence_cap_and_symmetry(spark):
    pairs = graph.graph_common_part_pairs(spark, SF_SMOKE).collect()
    # Orientation: supp_a < supp_b exactly once per unordered pair.
    seen = set()
    for r in pairs:
        assert r["supp_a"] < r["supp_b"]
        key = (r["supp_a"], r["supp_b"])
        assert key not in seen
        seen.add(key)
        assert r["n_common_parts"] >= 2


def test_triangle_count_nonnegative_and_bounded(spark):
    n_tri = graph.graph_triangle_count(spark, SF_SMOKE).collect()[0]["n_triangles"]
    n_edges = graph.graph_common_part_pairs(spark, SF_SMOKE).count()
    assert n_tri >= 0
    # Any graph with m edges has at most m^{3/2} triangles (folklore bound
    # tied to the node-iterator orientation the plan uses).
    assert n_tri <= max(1, int(n_edges**1.5))


def test_bfs_hops_start_at_single_source(spark):
    rows = {r["hop"]: r["n_nodes"] for r in graph.graph_bfs_hops(spark, SF_SMOKE).collect()}
    assert rows.get(0) == 1  # the source itself
    # hop counts are contiguous from 0 (a frontier can't skip a level)
    hops = sorted(rows)
    assert hops == list(range(len(hops)))


def test_pagerank_driver_solve_equals_distributed_iteration(spark):
    # r5: the bounded-graph driver solve must be DIGIT-identical to the
    # distributed DataFrame iteration (same roundings, same decimal
    # sums, same IEEE op order) — the scale path and the fast path are
    # the same algorithm.
    from pyspark.sql import functions as F

    from orionld_to_hive_spark.functions.numeric import DECIMAL_T
    from orionld_to_hive_spark.sources.warehouse import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, SF_SMOKE, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, SF_SMOKE, "nation").select("n_nationkey")
    raw = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("c_nationkey").alias("src"),
                 F.col("s_nationkey").alias("dst"))
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .cast(DECIMAL_T)).alias("w"))
    )
    out_w = raw.groupBy("src").agg(F.sum("w").alias("out_w"))
    edges = raw.join(F.broadcast(out_w), "src").select(
        "src", "dst",
        F.round(F.col("w").cast("double") / F.col("out_w").cast("double"),
                12).alias("p"),
    ).localCheckpoint(eager=True)
    nodes = nation.select(F.col("n_nationkey").alias("node"))

    dist = {
        r.node: r.rank
        for r in graph.pagerank_iterate_distributed(edges, nodes).collect()
    }
    edge_rows = [(r.src, r.dst, r.p) for r in edges.collect()]
    node_ids = [r.node for r in nodes.collect()]
    solved = dict(graph._pagerank_solve_bounded(
        edge_rows, node_ids, graph._PR_ITERS, graph._PR_D))
    assert dist == solved  # exact float equality, not approx


def test_label_propagation_separates_weakly_linked_cliques(spark, tmp_path):
    """Hand-built graph: two 3-cliques with heavy internal edges and
    one feather-weight bridge — LPA must give each clique one label and
    not merge across the bridge; determinism: repeated runs identical."""
    from orionld_to_hive_spark.operators.graph import (
        graph_label_propagation,
    )

    # synthesize a tiny warehouse: nations 0..5, customers/suppliers
    # one per nation, orders/lineitems encoding the weighted edges
    edges = [
        (0, 1, 900.0), (1, 2, 900.0), (0, 2, 900.0),   # clique A
        (3, 4, 900.0), (4, 5, 900.0), (3, 5, 900.0),   # clique B
        (2, 3, 1.0),                                    # weak bridge
    ]
    nations = [(i, f"N{i}") for i in range(6)]
    spark.createDataFrame(
        nations, "n_nationkey LONG, n_name STRING"
    ).write.parquet(f"{tmp_path}/nation.parquet")
    spark.createDataFrame(
        [(i, i) for i in range(6)], "c_custkey LONG, c_nationkey LONG"
    ).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(i, i) for i in range(6)], "s_suppkey LONG, s_nationkey LONG"
    ).write.parquet(f"{tmp_path}/supplier.parquet")
    orders, lis = [], []
    for k, (a, b, w) in enumerate(edges):
        orders.append((k, a))
        lis.append((k, b, w, 0.0))
    spark.createDataFrame(
        orders, "o_orderkey LONG, o_custkey LONG"
    ).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        lis,
        "l_orderkey LONG, l_suppkey LONG, l_extendedprice DOUBLE, "
        "l_discount DOUBLE",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")

    got = {
        r.n_name: r.community
        for r in graph_label_propagation(spark, str(tmp_path)).collect()
    }
    assert len({got["N0"], got["N1"], got["N2"]}) == 1  # clique A united
    assert len({got["N3"], got["N4"], got["N5"]}) == 1  # clique B united
    assert got["N0"] != got["N3"]  # bridge did not merge them
    again = {
        r.n_name: r.community
        for r in graph_label_propagation(spark, str(tmp_path)).collect()
    }
    assert got == again  # deterministic
