"""Connected components: transitive closure, singletons, chain
convergence (pointer doubling), determinism across partitionings."""

from hadoop_search_spark.operators.graph import connected_components


def _cc(spark, edges, nodes=None):
    e = spark.createDataFrame(edges, "a LONG, b LONG")
    n = spark.createDataFrame([(x,) for x in nodes], "id LONG") if nodes else None
    return {
        r.node: r.component for r in connected_components(e, nodes=n).collect()
    }


def test_cc_transitive_closure(spark):
    # A~B, B~C => one cluster, even though A,C never paired directly
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_singletons_from_node_universe(spark):
    got = _cc(spark, [(5, 6)], nodes=[5, 6, 7, 8])
    assert got == {5: 5, 6: 5, 7: 7, 8: 8}


def test_cc_long_chain_converges(spark):
    # path graph 0-1-2-...-19: diameter 19, must converge well within
    # max_iter thanks to pointer doubling
    got = _cc(spark, [(i, i + 1) for i in range(19)])
    assert set(got.values()) == {0}
    assert len(got) == 20


def test_cc_deterministic_across_partitionings(spark):
    edges = [(i, i + 1) for i in range(0, 30, 3)]  # 10 two-node comps
    e1 = spark.createDataFrame(edges, "a LONG, b LONG")
    got1 = {r.node: r.component for r in connected_components(e1).collect()}
    got2 = {
        r.node: r.component
        for r in connected_components(e1.repartition(13)).collect()
    }
    assert got1 == got2
    assert all(c == min(a, a + 1) for a, c in ((a, got1[a]) for a, _ in edges))


def test_cc_empty_edges_short_circuits(spark):
    # no edges: all universe nodes are singletons, and the propagation
    # loop must not spin max_iter rounds looking for a fixpoint
    import time

    t0 = time.monotonic()
    got = _cc(spark, [], nodes=[1, 2, 3])
    assert got == {1: 1, 2: 2, 3: 3}
    assert time.monotonic() - t0 < 30  # 25 rounds of jobs would blow this


def test_pagerank_bit_exact_vs_pure_python(spark):
    import random

    from hadoop_search_spark.operators.classifier import py_q12
    from hadoop_search_spark.operators.graph import pagerank

    rng = random.Random(7)
    n_nodes = 40
    edge_list = sorted(
        {
            tuple(sorted(rng.sample(range(n_nodes), 2)))
            for _ in range(60)
        }
    )
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "node LONG")
    edges = spark.createDataFrame(edge_list, "a LONG, b LONG")
    iters, d = 5, 0.85

    got = {r.node: r.rank for r in pagerank(edges, nodes, iters=iters).collect()}
    # partitioning invariance — exact
    got2 = {
        r.node: r.rank
        for r in pagerank(edges.repartition(5), nodes.repartition(3), iters=iters).collect()
    }
    assert got == got2

    # independent pure-Python twin with the same quantized arithmetic
    sym: dict[int, list[int]] = {}
    for a, b in edge_list:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    deg = {u: float(len(vs)) for u, vs in sym.items()}
    base = (1.0 - d) / n_nodes
    rank = {u: 1.0 / n_nodes for u in range(n_nodes)}
    from decimal import Decimal

    for _ in range(iters):
        dang = sum(
            (py_q12(rank[u]) for u in range(n_nodes) if u not in deg), Decimal(0)
        )
        dang_share = float(dang) / n_nodes
        contrib: dict[int, Decimal] = {}
        for u, vs in sym.items():
            for v in vs:
                contrib[v] = contrib.get(v, Decimal(0)) + py_q12(rank[u] / deg[u])
        rank = {
            u: base + d * (float(contrib.get(u, Decimal(0))) + dang_share)
            for u in range(n_nodes)
        }
    assert got == rank
    # conservation: total rank stays ~1 (dangling mass redistributed)
    assert abs(sum(got.values()) - 1.0) < 1e-6
