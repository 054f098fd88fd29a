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

from ..session import driver_count

#: fixed-point scale for rank mass — ranks are bigints summing to ~SCALE
PR_SCALE = 1_000_000_000_000


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
    verts = ed.select("u").distinct()
    n = driver_count(verts)  # also materializes `ed` for the loop
    if n == 0:
        ed.unpersist()
        return edges.sparkSession.createDataFrame([], "v long, rank_fx long")

    teleport = (PR_SCALE - (PR_SCALE * damping_num) // damping_den) // n
    ranks = verts.select(
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
    driver_count(e)  # read by the degree agg and both orientation sides
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
    driver_count(e)
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
