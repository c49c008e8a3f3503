

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


def _python_pagerank_until(edges, tol_micro, max_iters):
    """Pure-int mirror of pagerank_to_convergence's loop + stopping rule:
    iterate the HALF_UP fixed-point update until max per-node delta <=
    tol_micro or max_iters; returns (rho, iterations_run)."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    rho = {n: 1_000_000 for n in adj}
    t = 0
    for t in range(1, max_iters + 1):
        nxt = {
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
        delta = max(abs(nxt[n] - rho[n]) for n in adj)
        rho = nxt
        if delta <= tol_micro:
            break
    return rho, t


def test_pagerank_to_convergence_matches_python_mirror(spark):
    """The convergence loop must stop at the SAME iteration as a pure-int
    mirror (the integer state makes the stopping decision deterministic)
    and return the bit-exact fixed-point state at that iteration."""
    from bert_etl_spark.operators.advanced import pagerank_to_convergence

    #  star 1-{2,3,4} plus tail 4-5: asymmetric degrees, converges slowly
    edges = [(1, 2), (1, 3), (1, 4), (4, 5)]
    df = spark.createDataFrame(edges, "u long, v long")
    res, t = pagerank_to_convergence(df, tol_micro=20_000, max_iters=40)
    got = {r.node: r.pr for r in res.collect()}
    res.unpersist()
    rho, t_py = _python_pagerank_until(edges, tol_micro=20_000, max_iters=40)
    assert t == t_py
    assert t < 40  # genuinely converged, not capped
    assert got == rho


def test_pagerank_to_convergence_respects_max_iters(spark):
    """An unreachable tolerance stops at max_iters with the state equal to
    exactly that many fixed-k iterations."""
    from bert_etl_spark.operators.advanced import (
        pagerank_power,
        pagerank_to_convergence,
    )

    edges = [(1, 2), (2, 3), (3, 4), (2, 4)]
    df = spark.createDataFrame(edges, "u long, v long")
    res, t = pagerank_to_convergence(df, tol_micro=-1, max_iters=3)
    assert t == 3
    got = {r.node: r.pr for r in res.collect()}
    res.unpersist()
    want = {r.node: r.pr for r in pagerank_power(df, 3).collect()}
    assert got == want


def test_pagerank_to_convergence_cache_bound(spark):
    """At most two iterates + deg are ever cached: a deep convergence run
    may not leave more cached RDDs behind than a shallow one (persist-swap
    releases each predecessor after the delta action)."""
    from bert_etl_spark.operators import registry
    from bert_etl_spark.operators.advanced import pagerank_to_convergence

    def cached_ids() -> set[int]:
        return {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}

    def run(max_iters: int) -> int:
        # UNIQUE edge data per run (persist_once dedups by canonical plan,
        # so a run reusing another test's identical toy plan would find
        # pieces already cached), and growth counted as NEW RDD ids — a
        # count difference would be deflated by earlier tests' cached
        # entries evicting mid-run (unpersist is asynchronous)
        df = spark.createDataFrame(
            [(max_iters * 1000 + i, max_iters * 1000 + i + 1) for i in range(1, 30)],
            "u long, v long",
        )
        registry.release_internals()
        base = cached_ids()
        res, _ = pagerank_to_convergence(df, tol_micro=-1, max_iters=max_iters)
        grew = len(cached_ids() - base)
        res.unpersist()
        registry.release_internals()
        return grew

    shallow = run(2)
    deep = run(10)  # crosses the localCheckpoint cadence (every 8)
    assert deep <= shallow + 1, (shallow, deep)


def test_kcore_reaches_fixpoint_at_fixture(spark, sf_small):
    """The registered KCORE_PEELS rounds must reach the peeling fixpoint
    on the fixture graph: one MORE peel changes nothing (otherwise the
    registered result is a partially-peeled artifact, not the k-core)."""
    from pyspark.sql import functions as F

    from bert_etl_spark.operators.advanced import (
        KCORE_K,
        copurchase_edges,
        graph_kcore,
    )

    reg = {(r.node, r.core_degree) for r in graph_kcore(spark, sf_small).collect()}
    assert reg
    # every surviving node satisfies the core property
    assert all(deg >= KCORE_K for _, deg in reg)
    # one more peel: recompute degrees on the surviving subgraph edges
    e = copurchase_edges(spark, sf_small)
    nodes = {n for n, _ in reg}
    e5 = e.filter(F.col("u").isin(nodes) & F.col("v").isin(nodes))
    deg5 = {
        r.node: r.deg
        for r in e5.select(F.col("u").alias("node"))
        .unionByName(e5.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .collect()
    }
    assert {(n, d) for n, d in deg5.items()} == reg
