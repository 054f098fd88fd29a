"""CDC operators: snapshot diff + change-log application."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataframeintervals_jl_spark import apply_cdc, snapshot_diff


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_snapshot_diff_classifies_and_drops_unchanged(spark):
    old = _df(
        spark,
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, v string, n long",
    )
    new = _df(
        spark,
        [(1, "a", 10), (2, "B", 20), (4, None, 40), (5, "e", 50)],
        "k long, v string, n long",
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}
    # 1 unchanged (absent), 4 unchanged with nulls (null-safe equality)
    assert set(out) == {2, 3, 5}
    assert out[2]["change"] == "changed"
    assert (out[2]["old_v"], out[2]["new_v"]) == ("b", "B")
    assert out[3]["change"] == "removed" and out[3]["new_v"] is None
    assert out[5]["change"] == "added" and out[5]["old_v"] is None


def test_snapshot_diff_null_to_value_is_changed(spark):
    old = _df(spark, [(1, None)], "k long, v string")
    new = _df(spark, [(1, "x")], "k long, v string")
    (row,) = snapshot_diff(old, new, "k").collect()
    assert row["change"] == "changed"


def test_apply_cdc_latest_wins_and_delete_tiebreak(spark):
    base = _df(
        spark,
        [(1, "one"), (2, "two"), (3, "three")],
        "k long, v string",
    )
    changes = _df(
        spark,
        [
            (1, "one-v2", 100, "U"),
            (1, "one-v3", 200, "U"),  # latest upsert wins
            (2, "ignored", 150, "U"),
            (2, "x", 150, "D"),  # equal ts: delete wins
            (9, "nine", 100, "U"),  # brand-new key
        ],
        "k long, v string, ts long, op string",
    )
    out = {r["k"]: r["v"] for r in apply_cdc(base, changes, "k", "ts").collect()}
    assert out == {1: "one-v3", 3: "three", 9: "nine"}


def test_apply_cdc_composite_key(spark):
    base = _df(spark, [(1, "a", "x"), (1, "b", "y")], "k long, s string, v string")
    changes = _df(
        spark,
        [(1, "a", "x2", 1, "U"), (1, "b", None, 2, "D")],
        "k long, s string, v string, ts long, op string",
    )
    out = apply_cdc(base, changes, ["k", "s"], "ts").collect()
    assert [(r["k"], r["s"], r["v"]) for r in out] == [(1, "a", "x2")]


def test_snapshot_diff_plan_is_single_join(spark):
    """One full-outer equi-join, no nested loop, no Python."""
    old = _df(spark, [(1, "a")], "k long, v string")
    new = _df(spark, [(1, "a")], "k long, v string")
    plan = (
        snapshot_diff(old, new, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "NestedLoop" not in plan


def test_incremental_agg_matches_full_recompute(spark):
    """Incremental update under drops, value edits, group moves, and
    inserts equals the from-scratch aggregation; emptied groups drop."""
    from dataframeintervals_jl_spark import (
        incremental_agg_update,
        snapshot_diff,
    )

    old = _df(
        spark,
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 5)],
        "k long, g string, v long",
    )
    new = _df(
        spark,
        [
            (1, "a", 11),   # value edit
            (2, "b", 20),   # group move a -> b
            (3, "b", 30),   # unchanged
            (5, "d", 7),    # insert into new group
        ],                   # 4/"c" removed -> group c empties out
        "k long, g string, v long",
    )
    state = old.groupBy("g").agg(
        F.count("*").alias("n"), F.sum("v").alias("sum_val")
    )
    diff = snapshot_diff(old, new, "k", compare_cols=("g", "v"))
    got = {
        r["g"]: (r["n"], r["sum_val"])
        for r in incremental_agg_update(state, diff, "g", "v").collect()
    }
    want = {
        r["g"]: (r["n"], r["sum_val"])
        for r in new.groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_val"))
        .collect()
    }
    assert got == want
    assert "c" not in got  # emptied group dropped, not left at zero


def test_triangle_counts_hand_graph(spark):
    """K4 plus a pendant: K4 has 4 triangles, each vertex in 3; the
    pendant is in none and absent from output.  Input direction and
    duplicate edges must not matter."""
    from dataframeintervals_jl_spark.operators.graph import triangle_counts

    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    noisy = edges + [(b, a) for a, b in edges] + edges[:2]
    df = spark.createDataFrame(noisy, "id_a long, id_b long")
    got = {r["v"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_cdc_roundtrip_reconstructs_new_snapshot(spark):
    """apply_cdc(old, diff_to_changes(snapshot_diff(old, new))) == new
    for a randomized pair of snapshots (seeded)."""
    import random

    from dataframeintervals_jl_spark import apply_cdc, snapshot_diff
    from dataframeintervals_jl_spark.operators.cdc import diff_to_changes

    rng = random.Random(7)
    old_rows = [(k, rng.choice("abc"), rng.randint(0, 99)) for k in range(200)]
    new_rows = []
    for k, g, v in old_rows:
        r = rng.random()
        if r < 0.15:
            continue  # removed
        if r < 0.45:
            new_rows.append((k, rng.choice("abcd"), rng.randint(0, 99)))
        else:
            new_rows.append((k, g, v))  # unchanged
    new_rows += [(1000 + i, "e", i) for i in range(17)]  # added
    schema = "k long, g string, v long"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)

    diff = snapshot_diff(old, new, "k")
    changes = diff_to_changes(diff, "k", ("g", "v"))
    rebuilt = apply_cdc(old, changes, "k", ts_col="ts")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_incremental_agg_null_group_merges(spark):
    """NULL is a legitimate group value: state and delta NULL groups
    must merge into ONE row, not two."""
    from dataframeintervals_jl_spark import (
        incremental_agg_update,
        snapshot_diff,
    )

    old = _df(spark, [(1, None, 10), (2, None, 20)], "k long, g string, v long")
    new = _df(
        spark,
        [(1, None, 10), (2, None, 20), (3, None, 7)],
        "k long, g string, v long",
    )
    state = old.groupBy("g").agg(
        F.count("*").alias("n"), F.sum("v").alias("sum_val")
    )
    diff = snapshot_diff(old, new, "k", compare_cols=("g", "v"))
    rows = incremental_agg_update(state, diff, "g", "v").collect()
    assert len(rows) == 1
    assert (rows[0]["g"], rows[0]["n"], rows[0]["sum_val"]) == (None, 3, 37)


def test_apply_cdc_null_op_is_upsert_not_silent_delete(spark):
    from dataframeintervals_jl_spark import apply_cdc

    base = _df(spark, [(1, "one")], "k long, v string")
    changes = _df(spark, [(1, "one-v2", 100, None)], "k long, v string, ts long, op string")
    out = {r["k"]: r["v"] for r in apply_cdc(base, changes, "k", "ts").collect()}
    assert out == {1: "one-v2"}  # preserved as an upsert, not vanished


def test_triangle_counts_large_vertex_ids(spark):
    """Degree ordering must hold for ids >= 1e9 (content-hash ids)."""
    from dataframeintervals_jl_spark.operators.graph import triangle_counts

    big = 7_000_000_000
    edges = [(big, big + 1), (big, big + 2), (big + 1, big + 2), (5, big)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["v"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {big: 1, big + 1: 1, big + 2: 1}


def test_cdc_roundtrip_property_hypothesis(spark):
    """Hypothesis: for ANY pair of snapshots (keys 0..n, arbitrary
    string/int payloads incl. nulls), diff -> changes -> apply
    reconstructs the new snapshot exactly."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from dataframeintervals_jl_spark import apply_cdc, snapshot_diff
    from dataframeintervals_jl_spark.operators.cdc import diff_to_changes

    payload = st.tuples(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        st.one_of(st.none(), st.integers(-5, 5)),
    )
    snapshot = st.dictionaries(st.integers(0, 12), payload, max_size=10)

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(old=snapshot, new=snapshot)
    def check(old, new):
        schema = "k long, g string, v long"
        o = spark.createDataFrame(
            [(k, g, v) for k, (g, v) in old.items()], schema
        )
        n = spark.createDataFrame(
            [(k, g, v) for k, (g, v) in new.items()], schema
        )
        diff = snapshot_diff(o, n, "k")
        changes = diff_to_changes(diff, "k", ("g", "v"))
        rebuilt = apply_cdc(o, changes, "k", ts_col="ts")
        assert sorted(map(tuple, rebuilt.collect())) == sorted(
            (k, g, v) for k, (g, v) in new.items()
        )

    check()


def test_semantic_dedup_plan_contract(spark):
    """PLANS.md: one Arrow pass for cell assignment, the pair search a
    cell EQUI-join — never a cartesian/BNL join."""
    from dataframeintervals_jl_spark.operators.similarity import (
        semantic_dedup,
    )
    from dataframeintervals_jl_spark.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = semantic_dedup(emb, n_centroids=4, threshold=0.4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BatchEvalPython" not in plan  # Arrow only, and only pre-persist


def _brute_k_core(edges, k):
    """Reference peel: adjacency sets, remove < k until stable."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for n in adj[v]:
                adj[n].discard(v)
            del adj[v]
            changed = True
    return {v: len(ns) for v, ns in adj.items() if ns}


def test_k_core_hand_graph(spark):
    """K4 + chain (4-5-6) + pendant (1-7): the 2-core strips the chain
    and pendant in two peels, the 3-core is K4 itself, the 4-core is
    empty; rounds=0 returns the raw degrees."""
    from dataframeintervals_jl_spark.operators.graph import k_core

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (4, 5), (5, 6),  # chain
        (1, 7),  # pendant
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    for k in (2, 3, 4):
        got = {r["v"]: r["deg"] for r in k_core(df, k=k).collect()}
        assert got == _brute_k_core(edges, k), f"k={k}"
    # rounds=0 is the identity peel: full-graph degrees
    got0 = {r["v"]: r["deg"] for r in k_core(df, k=3, rounds=0).collect()}
    assert got0 == _brute_k_core(edges, 0)
    # a fixed round count at/above the peel depth equals the fixpoint
    gotr = {r["v"]: r["deg"] for r in k_core(df, k=2, rounds=5).collect()}
    assert gotr == _brute_k_core(edges, 2)


def test_k_core_randomized_matches_brute(spark):
    """Random graphs, duplicated/reversed/self-loop edges included —
    the distributed peel matches the adjacency-set reference for every
    k, and the empty result is schema-stable."""
    import random

    from dataframeintervals_jl_spark.operators.graph import k_core

    rng = random.Random(8)
    edges = [(rng.randint(1, 18), rng.randint(1, 18)) for _ in range(60)]
    edges += [(b, a) for a, b in edges[:10]]  # reversed dups
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    for k in (2, 3, 4, 6):
        got = {r["v"]: r["deg"] for r in k_core(df, k=k).collect()}
        assert got == _brute_k_core(edges, k), f"k={k}"
    out = k_core(df, k=50)
    assert out.columns == ["v", "deg"] and out.count() == 0


def test_k_core_validation(spark):
    import pytest as _pytest

    from dataframeintervals_jl_spark.operators.graph import k_core

    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with _pytest.raises(ValueError, match="k must be"):
        k_core(df, k=0)
    with _pytest.raises(ValueError, match="rounds must be"):
        k_core(df, k=2, rounds=-1)


def test_k_core_checkpoint_cadence_invariance(spark):
    """localCheckpoint cadence is an execution detail: every cadence
    (including disabled) peels to the identical core."""
    import random

    from dataframeintervals_jl_spark.operators.graph import k_core

    rng = random.Random(11)
    edges = [(rng.randint(1, 15), rng.randint(1, 15)) for _ in range(45)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    base = sorted(tuple(r) for r in k_core(df, k=3).collect())
    for every in (0, 1, 4):
        got = sorted(
            tuple(r) for r in k_core(df, k=3, checkpoint_every=every).collect()
        )
        assert got == base, f"checkpoint_every={every}"


def test_graph_kernels_driver_distributed_parity(spark, monkeypatch):
    """The bounded driver fast path (round 11) computes IDENTICAL rows
    to the distributed kernels — forced through BOTH paths on the same
    graphs (hand shapes incl. self-loops plus a seeded random graph),
    for every kernel and its edge-case parameters (fixpoint and
    bounded-rounds k-core, zero-iteration pagerank, float coeff)."""
    import random

    import dataframeintervals_jl_spark.operators.graph as G

    rng = random.Random(13)
    graphs = {
        "tri_pendant": [(1, 2), (2, 3), (1, 3), (3, 4)],
        "selfloop": [(1, 1), (1, 2), (2, 3), (1, 3)],
        "null_edge": [(1, 2), (2, None), (None, 3), (1, 3)],
        "rand": list(
            {(rng.randrange(30), rng.randrange(30)) for _ in range(90)}
        ),
    }

    def runs(df):
        # str sort key: NULL vertex ids are legal rows (a null-id edge
        # reaches pagerank's output) and None does not compare to int
        return [
            sorted((tuple(r) for r in out.collect()), key=str)
            for out in (
                G.triangle_counts(df),
                G.clustering_coefficient(df),
                G.clustering_coefficient(df, scale_ppm=False),
                G.k_core(df, k=2, rounds=3),
                G.k_core(df, k=3),
                G.pagerank(df, iterations=2),
                G.pagerank(df, iterations=0),
            )
        ]

    for name, edges in graphs.items():
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        monkeypatch.setattr(G, "DRIVER_EDGE_THRESHOLD", 1_000_000)
        via_driver = runs(df)
        monkeypatch.setattr(G, "DRIVER_EDGE_THRESHOLD", -1)
        via_dist = runs(df)
        assert via_driver == via_dist, name


def test_graph_driver_path_wedge_cap_falls_back(spark, monkeypatch):
    """Edges under the row bound but wedges over DRIVER_WEDGE_CAP must
    fall back to the distributed triangle kernel (the O(m^1.5) work is
    what the cap bounds, not the edge count) — and still be correct."""
    import dataframeintervals_jl_spark.operators.graph as G

    edges = [(a, b) for a in range(8) for b in range(a + 1, 8)]  # K8
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    monkeypatch.setattr(G, "DRIVER_WEDGE_CAP", 0)  # force the fallback
    got = {r["v"]: r["n_triangles"] for r in G.triangle_counts(df).collect()}
    assert got == {v: 21 for v in range(8)}  # C(7,2) per K8 vertex
    gotc = {
        r["v"]: (r["d"], r["n_triangles"], r["coeff_ppm"])
        for r in G.clustering_coefficient(df).collect()
    }
    assert gotc == {v: (7, 21, 1_000_000) for v in range(8)}


def test_graph_driver_path_boundary_exact(spark, monkeypatch):
    """Adversarial parity at EXACTLY the driver-edge bound (round 12):
    a count equal to DRIVER_EDGE_THRESHOLD must take the driver path
    (<= semantics), one less must go distributed, and the two paths
    must agree row-for-row.  Also straddles DRIVER_WEDGE_CAP on a
    hub-heavy graph: cap == exact wedge count stays on the driver, one
    below falls back distributed, identical rows either way."""
    import dataframeintervals_jl_spark.operators.graph as G

    # hub vertex 0 (degree 8, wedge-heavy) + a triangle + an island
    edges = [(0, i) for i in range(1, 9)] + [(1, 2), (20, 21)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    m_canon = 10  # distinct canonical undirected edges
    m_sym = 20    # symmetrized loop-table rows (pagerank/k_core bound)

    calls = {"driver": 0}
    real_tri = G._driver_triangles

    def spy(adj):
        calls["driver"] += 1
        return real_tri(adj)

    monkeypatch.setattr(G, "_driver_triangles", spy)

    def rows(out):
        return sorted((tuple(r) for r in out.collect()), key=str)

    # -- edge-count boundary, triangle kernel (canonical count) --
    monkeypatch.setattr(G, "DRIVER_EDGE_THRESHOLD", m_canon)
    at = rows(G.triangle_counts(df))
    assert calls["driver"] == 1, "count == threshold must use the driver"
    monkeypatch.setattr(G, "DRIVER_EDGE_THRESHOLD", m_canon - 1)
    below = rows(G.triangle_counts(df))
    assert calls["driver"] == 1, "count > threshold must go distributed"
    assert at == below

    # -- wedge-cap boundary on the hub graph --
    monkeypatch.setattr(G, "DRIVER_EDGE_THRESHOLD", m_canon)
    adj = G._driver_adjacency(edges)
    key = {x: (len(adj[x]), x) for x in adj}
    up = {x: [w for w in adj[x] if key[w] > key[x]] for x in adj}
    wedges = sum(len(ws) * (len(ws) - 1) // 2 for ws in up.values())
    assert wedges > 0
    monkeypatch.setattr(G, "DRIVER_WEDGE_CAP", wedges)
    at_cap = rows(G.triangle_counts(df))
    monkeypatch.setattr(G, "DRIVER_WEDGE_CAP", wedges - 1)
    over_cap = rows(G.triangle_counts(df))
    assert at_cap == over_cap == at

    # -- symmetrized-count boundary, pagerank and k_core parity --
    monkeypatch.setattr(G, "DRIVER_WEDGE_CAP", 50_000_000)
    for thr in (m_sym - 1, m_sym):
        monkeypatch.setattr(G, "DRIVER_EDGE_THRESHOLD", thr)
        if thr == m_sym - 1:
            pr_dist = rows(G.pagerank(df, iterations=3))
            kc_dist = rows(G.k_core(df, k=2))
        else:
            assert rows(G.pagerank(df, iterations=3)) == pr_dist
            assert rows(G.k_core(df, k=2)) == kc_dist
