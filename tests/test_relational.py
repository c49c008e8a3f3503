

def test_pagerank_iter_conserves_mass(spark, sf_small):
    import __spark_entry__ as e

    rows = e.queries()["graph_pagerank_iter"](spark, sf_small).collect()
    assert rows
    # damped PageRank from the uniform vector conserves total mass: the
    # graph is symmetric (no dangling nodes), so sum(r1) = 1 up to the
    # per-node rounding the oracle also applies
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-3
    assert all(r.pagerank > 0 for r in rows)
