

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


def test_pagerank_power_matches_python_reference(spark):
    """pagerank_power on a toy path graph vs a pure-Python power loop with
    the identical per-iteration 6-decimal rounding — pins the scaled
    update rho' = 0.15 + 0.85 * sum(rho(u)/d(u)) and the iteration count
    semantics independent of the SQL oracle."""
    from bert_etl_spark.operators.advanced import pagerank_power

    #  1 - 2 - 3 - 4   plus chord 2 - 4
    edges = [(1, 2), (2, 3), (3, 4), (2, 4)]
    df = spark.createDataFrame(edges, "u long, v long")
    k = 5
    got = {r.node: r.pr for r in pagerank_power(df, k).collect()}

    # mirror the engine's integer fixed-point arithmetic exactly: BIGINT
    # micro-units (1e-6), HALF_UP integer divisions — pure int ops, so
    # the reference cannot drift by float rounding either
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    rho = {n: 1_000_000 for n in adj}
    for _ in range(k):
        rho = {
            n: 150_000
            + (
                17
                * sum(
                    (2 * rho[m] + len(adj[m])) // (2 * len(adj[m]))
                    for m in adj[n]
                )
                + 10
            )
            // 20
            for n in adj
        }
    assert got == rho
    # scaled mass conservation: sum(rho) = n micro-million (symmetric
    # graph, no dangling nodes)
    assert abs(sum(got.values()) - len(adj) * 1_000_000) < 1_000


def test_pagerank_power_cache_release_is_flat_in_k(spark):
    """Persist-swap lifecycle: the number of CACHED RDDs after a deep loop
    must equal the count after a shallow one — each iterate releases its
    predecessor once materialized, so cache footprint is O(1) in k, not
    O(k). (The cached set is compared, not the absolute count, so other
    session caches don't flake the test.)"""
    from bert_etl_spark.operators.advanced import pagerank_power

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "u long, v long"
    )

    from bert_etl_spark.operators import registry

    def cached_count() -> int:
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    def run(k: int) -> int:
        registry.release_internals()
        base = cached_count()
        pagerank_power(df, k).count()
        grew = cached_count() - base
        registry.release_internals()
        return grew

    shallow = run(2)
    deep = run(9)  # crosses the localCheckpoint cadence (every 8) too
    # +1 slack: the cadence checkpoint's RDD is freed by GC, not unpersist
    assert deep <= shallow + 1, (shallow, deep)
