"""Iterative graph computation over pair lists — engine extension
(SURVEY.md §2.C: the reference has no graph surface; duplicate-pair
graphs from MinHash/SimHash need clustering and ranking at corpus
scale).

:func:`~.dedup.connected_components` (min-label propagation) lives with
the dedup operators; this module holds :func:`pagerank`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import driver_count, driver_row

#: fixed-point scale for rank mass — ranks are bigints summing to ~SCALE
PR_SCALE = 1_000_000_000_000

#: driver fast-path bound (rows of the loop table collected), the
#: connected_components pattern: near-dup graphs are orders of magnitude
#: smaller than the corpus, and below this bound the iterative kernels'
#: per-round JOB latency (each peel/iteration/wedge pass is several
#: scheduler round-trips) dwarfs the actual data movement — measured at
#: sf0.1: the triangle kernel spends ~3.5s of stage latency on a
#: 256-edge graph.  ~16 MB of ids at the bound; the distributed paths
#: below remain the 100 TB route and compute IDENTICAL rows (parity
#: pytest-forced through both paths on the same graphs).
DRIVER_EDGE_THRESHOLD = 1_000_000

#: extra guard for the wedge-counting kernels: the oriented wedge count
#: is the actual triangle work (O(m^1.5) worst case — quadratic in a
#: hub's up-degree), so a small EDGE count does not by itself bound the
#: driver CPU.  After collecting the edges (cheap, bounded above) the
#: exact wedge count is computed in O(m); above this cap the driver
#: defers to the distributed kernel, which spreads the same wedge work
#: across the cluster.
DRIVER_WEDGE_CAP = 50_000_000


def _driver_adjacency(rows) -> dict:
    """Undirected adjacency sets from collected canonical (u, v) rows."""
    adj: dict = {}
    for r in rows:
        u, v = r[0], r[1]
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


def _driver_triangles(adj: dict):
    """Per-vertex triangle counts via the SAME degree-ordered
    node-iterator the distributed kernel runs (each triangle closes
    exactly once at its order-minimal vertex), or ``None`` when the
    exact oriented wedge count exceeds :data:`DRIVER_WEDGE_CAP` (the
    caller then falls back to the distributed kernel)."""
    key = {x: (len(adj[x]), x) for x in adj}
    up = {x: [w for w in adj[x] if key[w] > key[x]] for x in adj}
    wedges = sum(len(ws) * (len(ws) - 1) // 2 for ws in up.values())
    if wedges > DRIVER_WEDGE_CAP:
        return None
    tri: dict = {}
    for u, ws in up.items():
        ws = sorted(ws, key=key.__getitem__)
        for i, y in enumerate(ws):
            ay = adj[y]
            for z in ws[i + 1 :]:
                if z in ay:
                    tri[u] = tri.get(u, 0) + 1
                    tri[y] = tri.get(y, 0) + 1
                    tri[z] = tri.get(z, 0) + 1
    return tri


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_num: int = 17,
    damping_den: int = 20,
    src: str = "id_a",
    dst: str = "id_b",
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over an UNDIRECTED pair list in exact fixed-point
    integer arithmetic: ``(v, rank_fx)`` with ranks scaled to
    :data:`PR_SCALE`, damping ``damping_num/damping_den`` (default
    17/20 = 0.85), a fixed iteration count — every operation is bigint
    add/mul/floor-div, so a SQL oracle unrolling the same iterations
    matches bit-for-bit (the same replay strategy as the IVF k-means
    oracle).

    Scale design: the out-degree is attached to the persisted edge
    table ONCE (``(u, v, deg)``), so each iteration is exactly one
    equi-join of that table against the (vertex, rank) table plus one
    partial-aggregated groupBy on the destination — the textbook
    distributed PageRank shape at half the per-iteration join count of
    the naive edges⋈ranks⋈degrees form, shuffling only (vertex, long)
    pairs.  ``localCheckpoint`` every ``checkpoint_every`` rounds
    bounds lineage depth exactly like connected_components.  Vertices
    are the edge endpoints (isolated documents are rank-irrelevant
    here); in an undirected graph every vertex has degree >= 1, so
    there are no dangling-mass corrections.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    und = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct()
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ed = und.join(deg, "u").persist()  # (u, v, deg) — the loop's table
    # one action materializes `ed` AND reads both loop constants (the
    # row bound for the driver fast path, the vertex count for the
    # teleport term) — same job count as the old count(verts) probe
    stats = driver_row(
        ed.agg(
            F.count(F.lit(1)).alias("m2"),
            F.count_distinct(F.col("u")).alias("n"),
        )
    )
    n = int(stats["n"]) if stats is not None else 0
    if n == 0:
        ed.unpersist()
        return edges.sparkSession.createDataFrame([], "v long, rank_fx long")

    teleport = (PR_SCALE - (PR_SCALE * damping_num) // damping_den) // n
    if int(stats["m2"]) <= DRIVER_EDGE_THRESHOLD:
        # SMALL-GRAPH FAST PATH (the connected_components trade): each
        # distributed iteration is one join + one partial agg + periodic
        # checkpoints — several scheduler round-trips of latency per
        # round.  Below the bound the loop table fits on the driver;
        # replicate the IDENTICAL exact fixed-point arithmetic (bigint
        # floor division only, all operands positive) over collected
        # (u, v, deg) rows — parity with the distributed loop is
        # pytest-forced on the same graphs.
        rows = [(r[0], r[1], r[2]) for r in ed.collect()]
        ed.unpersist()
        # init over DISTINCT u only — the exact mirror of the
        # distributed `ed.select("u").distinct()` init (on the
        # symmetrized graph every endpoint appears as u; a NULL
        # endpoint appears only as v, and the distributed init
        # excludes it just like this does)
        ranks = {u: PR_SCALE // n for u, _, _ in rows}
        for _ in range(iterations):
            in_sum: dict = {}
            for u, v, d in rows:
                r = ranks.get(u)
                if r is not None:  # inner join: rank-less sources drop
                    in_sum[v] = in_sum.get(v, 0) + r // d
            ranks = {
                v: teleport + (s * damping_num) // damping_den
                for v, s in in_sum.items()
            }
        return edges.sparkSession.createDataFrame(
            [(v, r) for v, r in ranks.items()], "v long, rank_fx long"
        )
    ranks = ed.select("u").distinct().select(
        F.col("u").alias("v"), F.lit(PR_SCALE // n).cast("long").alias("r")
    )
    for i in range(iterations):
        contrib = (
            ed.join(ranks.withColumnRenamed("v", "u"), "u")
            .select(F.col("v"), F.expr("r DIV deg").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = contrib.select(
            "v",
            (
                F.lit(teleport)
                + F.expr(f"(in_sum * {damping_num}) DIV {damping_den}")
            ).cast("long").alias("r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    # final checkpoint cuts the plan's dependence on the persisted edge
    # table so it can be released here instead of leaking per call
    # (measured ~0.1s at sf0.1 — the leak-free contract is worth it)
    ranks = ranks.localCheckpoint(eager=True)
    ed.unpersist()
    return ranks.select(F.col("v"), F.col("r").alias("rank_fx"))


def _normalized_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected edge table ``(u < v)``: self-loops dropped,
    direction and duplicates collapsed — the shared front door of every
    graph kernel here (one distinct shuffle, reused by the caller)."""
    a, b = F.col(src), F.col(dst)
    return (
        edges.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Per-vertex triangle participation over an undirected pair list:
    ``(v, n_triangles)`` for every vertex in at least one triangle —
    the local clustering signal (a near-dup pair inside a dense
    triangle cluster is structural; an isolated pair is noise).

    Algorithm: DEGREE-ORDERED node-iterator (Suri & Vassilvitskii's
    MR-friendly variant).  Every edge is oriented from its
    (degree, id)-smaller endpoint to the larger; each triangle
    ``x<y<z`` in that total order then materializes exactly once as
    wedge ``(x→y, x→z)`` closed by ``y→z`` — no post-dedup.  The
    orientation is the scale guard: a hub of degree d contributes
    wedges only through neighbors ORDERED ABOVE it, bounding wedge
    fan-out by O(m^1.5) total instead of Σ d(v)² (the difference
    between a celebrity node exploding and not).

    Shuffle shape: one degree aggregation, two equi-joins on vertex
    keys (wedge build + closing-edge semi-join), one final explode +
    groupBy over triangle rows.  All bigint/id arithmetic —
    SQL-replayable."""
    e = _normalized_edges(edges, src, dst).persist()
    # the count is read by the driver fast-path bound; the action also
    # materializes the cache for the degree agg and orientation sides
    if driver_count(e) <= DRIVER_EDGE_THRESHOLD:
        tri = _driver_triangles(_driver_adjacency(e.collect()))
        if tri is not None:  # wedge count within the driver CPU cap
            e.unpersist()
            return edges.sparkSession.createDataFrame(
                list(tri.items()), "v long, n_triangles long"
            )
    out = _triangle_counts_normalized(e)
    e.unpersist()
    return out


def _triangle_counts_normalized(e: DataFrame) -> DataFrame:
    """Triangle kernel over an ALREADY persisted canonical ``(u, v)``
    table; the caller owns ``e``'s lifecycle (so composite operators
    like :func:`clustering_coefficient` pay the upstream pair
    generation exactly once).  Returns an eagerly localCheckpointed
    result — safe to read after ``e`` is unpersisted."""
    deg = (
        e.select(F.col("u").alias("x"))
        .unionByName(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # total-order key: degree-major, id tiebreak — a STRUCT, compared
    # lexicographically (a packed `d*1e9 + x` bigint silently corrupts
    # the order for ids >= 1e9, e.g. 64-bit content-hash vertex ids)
    ok = deg.select(
        "x", F.struct(F.col("d").alias("d"), F.col("x").alias("i")).alias("ok")
    )
    o = (
        e.join(ok.select(F.col("x").alias("u"), F.col("ok").alias("ku")), "u")
        .join(ok.select(F.col("x").alias("v"), F.col("ok").alias("kv")), "v")
        .select(
            F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("t"),
            F.when(F.col("ku") < F.col("kv"), F.col("kv"))
            .otherwise(F.col("ku"))
            .alias("kt"),
        )
    )
    # o is read three times (both wedge sides + the closing-edge
    # probe); without the boundary each reference re-runs the degree
    # agg and both orientation joins — measured 10.8s -> materialized
    # once the whole query is pair-generation-bound
    o = o.persist()
    driver_count(o)
    e1 = o.select(F.col("s"), F.col("t").alias("t1"), F.col("kt").alias("k1"))
    e2 = o.select(F.col("s"), F.col("t").alias("t2"), F.col("kt").alias("k2"))
    wedges = e1.join(e2, "s").filter(F.col("k1") < F.col("k2"))
    tri = wedges.join(
        o.select(F.col("s").alias("t1"), F.col("t").alias("t2")),
        ["t1", "t2"],
    ).select(F.col("s").alias("x"), F.col("t1").alias("y"), F.col("t2").alias("z"))
    verts = (
        tri.select(F.col("x").alias("v"))
        .unionByName(tri.select(F.col("y").alias("v")))
        .unionByName(tri.select(F.col("z").alias("v")))
    )
    out = verts.groupBy("v").agg(F.count(F.lit(1)).alias("n_triangles"))
    # eager checkpoint of the (vertex-sized) result, THEN release the
    # persisted tables — unpersisting before the caller's action would
    # silently recompute the whole pair generation at execution time
    out = out.localCheckpoint(eager=True)
    o.unpersist()
    return out


def clustering_coefficient(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    scale_ppm: bool = True,
) -> DataFrame:
    """Per-vertex LOCAL CLUSTERING COEFFICIENT over an undirected pair
    list: ``2·T(v) / (d(v)·(d(v)-1))`` — how close a vertex's
    neighborhood is to a clique.  On a near-dup graph this separates
    structural duplicate clusters (coefficient → 1: boilerplate
    families, mirrored sites) from chain-like accidental similarity
    (coefficient → 0), the standard refinement of the raw triangle
    signal.

    Output: ``(v, d, n_triangles, coeff_ppm)`` for every vertex of
    degree ≥ 2 (degree-1 vertices have no defined coefficient).
    ``coeff_ppm`` is exact bigint parts-per-million floor arithmetic
    when ``scale_ppm`` (deterministic cross-engine — no float
    division); ``scale_ppm=False`` emits a double ``coeff`` instead.

    Cost: :func:`triangle_counts` (the O(m^1.5) oriented wedge join)
    + one degree aggregation + one vertex-keyed join — nothing beyond
    the triangle pass's own shape.  The canonical edge table is
    normalized and persisted ONCE and fed to both the degree agg and
    the triangle kernel: before this sharing the operator evaluated
    the caller's edge lineage (at the catalog query, a full MinHash
    pair generation) twice — solo baseline 6.4s -> ~6.0s at sf0.1
    (the duplicated pair generation was cheaper than its first-run
    cost suggests once the scan is warm, but it was pure waste)."""
    e = _normalized_edges(edges, src, dst).persist()
    if driver_count(e) <= DRIVER_EDGE_THRESHOLD:
        adj = _driver_adjacency(e.collect())
        dtri = _driver_triangles(adj)
        if dtri is not None:
            e.unpersist()
            rows = []
            for x, nbrs in adj.items():
                d = len(nbrs)
                if d < 2:
                    continue
                t = dtri.get(x, 0)
                if scale_ppm:
                    rows.append((x, d, t, 2 * t * 1_000_000 // (d * (d - 1))))
                else:
                    # 2t and d(d-1) are exact ints — the float division
                    # rounds identically to the JVM double path
                    rows.append((x, d, t, (2 * t) / (d * (d - 1))))
            col = "coeff_ppm long" if scale_ppm else "coeff double"
            return edges.sparkSession.createDataFrame(
                rows, f"v long, d long, n_triangles long, {col}"
            )
    deg = (
        e.select(F.col("u").alias("x"))
        .unionByName(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    tri = _triangle_counts_normalized(e)
    out = (
        deg.filter(F.col("d") >= 2)
        .join(tri, deg["x"] == tri["v"], "left")
        .select(
            deg["x"].alias("v"),
            "d",
            F.coalesce("n_triangles", F.lit(0).cast("long")).alias(
                "n_triangles"
            ),
        )
    )
    if scale_ppm:
        out = out.withColumn(
            "coeff_ppm",
            F.expr("2 * n_triangles * 1000000 DIV (d * (d - 1))").cast(
                "long"
            ),
        )
    else:
        out = out.withColumn(
            "coeff",
            (2 * F.col("n_triangles")).cast("double")
            / (F.col("d") * (F.col("d") - 1)).cast("double"),
        )
    # the deg side still reads `e` at action time — checkpoint the
    # (vertex-sized) result eagerly so `e` can be released here
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
    src: str = "id_a",
    dst: str = "id_b",
    checkpoint_every: int = 4,
    max_rounds: int = 100,
) -> DataFrame:
    """k-CORE of an undirected pair list: iteratively peel every vertex
    of degree < ``k`` until the survivors all have degree >= ``k``
    inside the surviving subgraph.  Output ``(v, deg)`` — each core
    vertex with its within-core degree (empty when no k-core exists).
    On a near-dup graph this is the standard densest-region filter one
    notch cheaper than triangles: the 2-core strips pendant/chain
    accidental similarity, higher k isolates boilerplate families.

    ``rounds=None`` (default) runs to the exact fixpoint with a
    driver-side convergence check — one ``count()`` per peel, which IS
    the convergence test, not overhead.  ``rounds=N`` bounds the peel
    count at exactly N, making the operator a pure function of the
    input that a SQL oracle replays by unrolling N rounds (the
    pagerank/IVF replay strategy); callers pick N at or above the
    graph's peel depth to get the true core.  Both modes stop as soon
    as a peel removes nothing: peeling is IDEMPOTENT at fixpoint, so
    the skipped rounds are provably no-ops and the result is identical
    to running all N — the early exit spares the per-round job
    overhead that dominates on small/converged graphs (measured 17.6s
    → ~4s on the catalog query, whose graph converges in 2 peels).

    Scale shape: the loop state is the symmetric edge table ``(a, b)``
    — never adjacency lists, never collected.  Each peel is one
    partial-aggregated degree count plus two ``left_semi`` joins on a
    vertex key (hash-partitioned both sides, no broadcast needed at
    any size); edges only ever SHRINK, so per-round cost is monotone
    non-increasing.  ``localCheckpoint`` every ``checkpoint_every``
    peels bounds lineage depth exactly like pagerank's loop.  Peel
    count is bounded by the graph's degeneracy ordering depth —
    typically single digits on power-law duplicate graphs —
    and hard-capped at ``max_rounds`` (raises rather than silently
    stopping early, honoring the no-silent-caps rule)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds is not None and rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    e = _normalized_edges(edges, src, dst)
    und = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        e.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    und = und.persist()
    n_edges = driver_count(und)

    if n_edges <= DRIVER_EDGE_THRESHOLD:
        # SMALL-GRAPH FAST PATH (the connected_components trade): each
        # peel is a degree agg + two semi-joins + a count — several jobs
        # of scheduler latency per round.  Replicate the IDENTICAL peel
        # loop (including the bounded-rounds / early-exit / max_rounds
        # contract) over the collected symmetric edge list.
        cur = [(r[0], r[1]) for r in und.collect()]
        und.unpersist()
        total = rounds if rounds is not None else max_rounds
        i, m = 0, len(cur)
        while i < total and m > 0:
            degd: dict = {}
            for a, _ in cur:
                degd[a] = degd.get(a, 0) + 1
            nxt = [
                (a, b)
                for a, b in cur
                if degd[a] >= k and degd.get(b, 0) >= k
            ]
            i += 1
            if len(nxt) == m:
                cur = nxt
                break
            if rounds is None and i == max_rounds:
                raise RuntimeError(
                    f"k_core did not converge within max_rounds={max_rounds}"
                )
            cur, m = nxt, len(nxt)
        outd: dict = {}
        for a, _ in cur:
            outd[a] = outd.get(a, 0) + 1
        return edges.sparkSession.createDataFrame(
            list(outd.items()), "v long, deg long"
        )

    def _peel(cur: DataFrame) -> DataFrame:
        deg = cur.groupBy("a").agg(F.count(F.lit(1)).alias("__d"))
        core = deg.filter(F.col("__d") >= k).select("a")
        return cur.join(core, "a", "left_semi").join(
            core.withColumnRenamed("a", "b"), "b", "left_semi"
        )

    total = rounds if rounds is not None else max_rounds
    i = 0
    while i < total and n_edges > 0:
        nxt = _peel(und)
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            # either/or (the bpe.py loop's pattern): checkpointing a
            # persisted frame rebinds the handle, stranding the persist's
            # cache blocks until session end — checkpoint rounds skip the
            # persist entirely (eager checkpoint materializes anyway)
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
        n_next = driver_count(nxt)
        und.unpersist()
        und = nxt
        i += 1
        if n_next == n_edges:
            # fixpoint: every further peel is a no-op (idempotence), in
            # BOTH modes — identical result, minus the no-op jobs
            break
        if rounds is None and i == max_rounds:
            und.unpersist()
            raise RuntimeError(
                f"k_core did not converge within max_rounds={max_rounds}"
            )
        n_edges = n_next

    out = und.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    return out
