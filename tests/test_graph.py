"""functions/graph.pagerank vs a numpy power-iteration oracle."""

import numpy as np
import pytest


def _np_pagerank(edges, iterations=5, damping=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for a, b in set(edges):
        out.setdefault(a, set()).add(b)
    pr = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.zeros(n)
        dangling = sum(pr[idx[v]] for v in nodes if v not in out)
        for a, targets in out.items():
            for b in targets:
                nxt[idx[b]] += pr[idx[a]] / len(targets)
        pr = (1 - damping) / n + damping * (nxt + dangling / n)
    return {v: pr[idx[v]] for v in nodes}


def _run(spark, edges, **kw):
    from hobbes_spark.functions.graph import pagerank

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {r.node: r.pr for r in pagerank(df, **kw).collect()}


def test_matches_numpy_on_small_graph(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (2, 4)]
    got = _run(spark, edges, iterations=5)
    exp = _np_pagerank(edges, iterations=5)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_dangling_mass_redistributes(spark):
    # 1->2, 2 dangling: without redistribution mass leaks and sum < 1.
    got = _run(spark, [(1, 2)], iterations=10)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    exp = _np_pagerank([(1, 2)], iterations=10)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert got[2] > got[1]  # 2 receives all of 1's linked mass


def test_cycle_is_uniform(spark):
    edges = [(1, 2), (2, 3), (3, 1)]
    got = _run(spark, edges, iterations=7)
    for pr in got.values():
        assert pr == pytest.approx(1.0 / 3, abs=1e-12)


def test_parallel_edges_collapse(spark):
    # Duplicate (1,2) edges must not double 2's share.
    a = _run(spark, [(1, 2), (1, 2), (1, 3)], iterations=4)
    b = _run(spark, [(1, 2), (1, 3)], iterations=4)
    assert a == pytest.approx(b)


def test_zero_iterations_and_validation(spark):
    from hobbes_spark.functions.graph import pagerank

    got = _run(spark, [(1, 2), (3, 4)], iterations=0)
    assert all(pr == pytest.approx(0.25) for pr in got.values())
    df = spark.range(1).selectExpr("id as src", "id + 1 as dst")
    with pytest.raises(ValueError):
        pagerank(df, iterations=-1)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.5)


def test_pagerank_ignores_null_endpoint_edges(spark):
    from hobbes_spark.functions.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, None), (None, 1)], "src bigint, dst bigint"
    )
    pr = pagerank(edges, iterations=5).collect()
    # NULL endpoints contribute no node and leak no mass
    assert sorted(r["node"] for r in pr) == [1, 2]
    assert abs(sum(r["pr"] for r in pr) - 1.0) < 1e-9
