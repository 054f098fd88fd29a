"""TF-IDF term scoring over a document table.

Training-data-pipeline text analysis: surface each document's most
characteristic terms (filter boilerplate, build topic filters, feed
quality heuristics).  Engine extension — the reference has no text
surface at all.

Determinism contract: the IDF is INTEGER-scaled — ``(N * 1e6) // df``
with exact bigint arithmetic — so Spark and the DuckDB oracle rank
identical scores with identical ties (log-based IDF would hinge on the
last ulp of two different libm implementations).  Monotonicity is
preserved (x -> (N*1e6)//x is non-increasing), which is all ranking
needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import driver_count, driver_row, driver_rows

from ..functions.text import tokens


def tf_idf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Top-``k`` terms per document by TF x integer-scaled IDF.

    Output: ``(id_col, rank, term, score)``, rank 1..k per document,
    ties broken by term (binary collation — identical in both engines).

    Scale shape: two partial-aggregated groupBys (doc-term TF, term DF),
    one equi-join of the TF table against the term-DF table (shuffle on
    the term key; document payloads are never shuffled — only (id,
    term, count) triples), and a per-document window for the top-k.
    The corpus size N comes from one count action.
    """
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    toks = docs.select(F.col(id_col), F.explode(tokens(text)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = driver_count(docs)
    scored = tf.join(df_, "term").select(
        F.col(id_col),
        "term",
        (F.col("tf") * F.expr(f"({n} * 1000000L) DIV df")).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "score")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    lowercase: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query under BM25 (k1=1.2, b=0.75), the
    standard lexical-retrieval ranking function.

    Output: ``(query_id, rank, id_col, score)`` — rank 1..k per query,
    score a bigint, ties broken by document id.

    Determinism contract: the whole score is EXACT bigint arithmetic.
    With k1=1.2, b=0.75 fixed, scale the term score by 10·total:

        idf   = (N * 1000) // df                      (integer IDF)
        num   = idf * tf * 22                         (10 · tf·(k1+1) · idf)
        den   = (10·tf + 3) · total + 9 · dl · N      (10 · BM25 denom · total)
        score = Σ_terms (num * total) // den

    Every value is a long; the per-term floor division and the sum are
    order-independent, so Spark and a SQL oracle agree bit-for-bit —
    no libm ``ln`` and no float summation order anywhere.  Overflow
    envelope (Spark 4 ANSI longs): ``num * total < 2^63`` holds while
    ``N·total·tf ≲ 4e14`` — beyond that drop the IDF scale from 1000.

    Scale shape: the query term list is tiny and BROADCAST; the corpus
    side computes (doc, term, tf) and per-doc lengths with partial
    aggregation, keeps only rows matching query terms (broadcast
    semi-join — the 100 TB side is filtered before any shuffle), and
    the final per-query top-k is a window over ≤ |queries|·|matched
    docs| rows."""
    text = F.col(text_col)
    qtext = F.col(query_text_col)
    if lowercase:
        text, qtext = F.lower(text), F.lower(qtext)

    qterms = (
        queries.select(
            F.col(query_id_col), F.explode(tokens(qtext)).alias("term")
        )
        .distinct()
    )

    toks = docs.select(F.col(id_col), F.explode(tokens(text)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # only query terms survive past this broadcast join — the corpus
    # never shuffles at full width
    tfq = tf.join(F.broadcast(qterms.select("term").distinct()), "term")
    dfq = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    dl = docs.select(
        F.col(id_col), F.size(tokens(text)).cast("long").alias("dl")
    )
    stats = driver_row(
        dl.agg(F.sum("dl").alias("total"), F.count(F.lit(1)).alias("n"))
    )
    total, n = int(stats["total"]), int(stats["n"])

    scored = (
        tfq.join(dfq, "term")
        .join(F.broadcast(qterms), "term")
        .join(dl, id_col)
        .select(
            F.col(query_id_col),
            F.col(id_col),
            (
                F.expr(f"({n} * 1000L) DIV df")
                * F.col("tf")
                * F.lit(22)
                * F.lit(total)
            ).alias("__num"),
            (
                (F.col("tf") * F.lit(10) + F.lit(3)) * F.lit(total)
                + F.lit(9) * F.col("dl") * F.lit(n)
            ).alias("__den"),
        )
        .select(
            query_id_col,
            id_col,
            F.expr("__num DIV __den").alias("__s"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__s").alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )


def bigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
    alpha: int = 4,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-trained bigram language-model likelihood score per
    document — the n-gram generalization of unigram commonness
    (``q_mean_token_rank``): a document full of bigrams the corpus has
    never seen in that left-context scores low, boilerplate scores
    high.  This is the classic KenLM-style perplexity quality filter
    with the log-space float replaced by an exact integer contract.

    Per bigram ``(w1, w2)``: ``p_scaled = (scale * c(w1,w2)) DIV
    (c(w1,·) + alpha)`` where ``c(w1,·)`` counts bigrams starting with
    ``w1`` — a floor-scaled smoothed conditional probability.  The
    additive ``alpha`` is load-bearing, not a nicety: unsmoothed, a
    hapax prefix makes its unique continuation a perfect ``p = 1``, so
    one-off word salad outscores genuine boilerplate; with ``alpha``,
    a continuation only approaches 1 when its prefix is FREQUENT and
    the continuation dominates it.  Per
    document: ``lm_score = sum(p_scaled) DIV n_bigrams``.  Every step
    is bigint floor arithmetic (no libm ``log``, no float summation
    order), so the DuckDB oracle matches bit-for-bit — monotone in the
    geometric-mean sense a ranking filter needs.

    Output: ``(id_col, n_bigrams, lm_score)``; documents with fewer
    than two tokens have no bigrams and are absent.

    Scale shape (100 TB): the corpus shuffles only ``(doc_id, w1,
    w2)`` triples — never text.  Both count tables are
    partial-aggregated (popular bigrams combine map-side, so token
    skew does not concentrate a reducer); the prefix-count join keys
    on ``w1`` against an already-aggregated table, and the final
    per-document agg is the only pass touching doc ids.
    """
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    toks = docs.select(F.col(id_col), tokens(text).alias("__t"))
    nb = F.greatest(F.size("__t") - F.lit(1), F.lit(0))
    bigrams = (
        toks.select(
            F.col(id_col),
            F.explode(
                F.zip_with(
                    F.slice("__t", F.lit(1), nb),
                    F.slice("__t", F.lit(2), nb),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    # NOT materialized: the three consumers below re-run the tokenize+
    # zip+explode pass, but a round-11 interleaved A/B measured
    # persist+count+eager-checkpoint LOSING at bench scale (min 1.2-1.5s
    # -> 1.8-2.5s): two extra materialization jobs cost more than the
    # repeated map-only pass saves.  Same verdict for the TF table in
    # tf_idf_top_terms/bm25_topk; gram_novelty keeps its cache because
    # its per-row md5-60bit hashing is an order heavier than tokenize.
    c2 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c2"))
    c1 = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("__c1"))
    scored = c2.join(c1, "w1").select(
        "w1",
        "w2",
        F.expr(f"({scale}L * __c2) DIV (__c1 + {int(alpha)}L)").alias("__p"),
    )
    return (
        bigrams.join(scored, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__p").alias("__ps"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.expr("__ps DIV n_bigrams").alias("lm_score"),
        )
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_buckets: int = 4096,
    scale: int = 1_000_000,
    lowercase: bool = True,
    force_decimal: bool = False,
) -> DataFrame:
    """Hashed n-gram importance weights for data selection — the DSIR
    recipe (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling") with the log-likelihood float replaced by
    this engine's exact integer contract.

    Both the raw ``corpus`` and the small high-quality ``target`` set
    are reduced to hashed word-n-gram bucket distributions
    (``portable_hash60(gram) % num_buckets``).  Each bucket gets an
    add-one-smoothed importance ratio, floor-scaled to ppm::

        r_b = (scale * (c_t[b]+1) * (N_r+B)) DIV ((c_r[b]+1) * (N_t+B))

    (``c_t``/``c_r`` bucket counts on target/corpus, ``N`` their gram
    totals, ``B = num_buckets``; ``r_b > scale`` ⇔ over-represented in
    the target).  A document's weight is the floor-MEAN of its grams'
    ratios — the arithmetic mean of ratios replacing DSIR's sum of
    logs (a geometric mean), keeping every step bigint floor
    arithmetic: deterministic cross-engine and monotone in the
    target-likeness a resampling filter needs.  Ratios saturate at
    ``scale**2`` (a documented 1e6× over-representation cap keeping
    doc-level sums inside long range).  Intermediate products route
    through DECIMAL(38,0) whenever the long-range bound
    ``scale·(N_t+B)·(N_r+B) < 2^63`` would not hold, so results are
    representation-independent.

    Output: ``(id_col, n_grams, dsir_weight)``; documents whose text
    has no tokens still emit one empty gram (n_grams >= 1 always), so
    every corpus row is weighted.  Feed the weights to
    :func:`~.sampling.mixture_sample`-style thresholding or a top-k
    cut for the actual resampling step.

    Scale shape (100 TB): the corpus shuffles only ``(doc_id, bucket)``
    pairs — never text; both bucket-count aggregations are
    partial-aggregated (hot buckets combine map-side), the ratio table
    is at most ``num_buckets`` rows and broadcast onto the gram
    stream, and the per-document mean is the only doc-keyed shuffle.
    The target side is typically tiny but follows the same bounded
    shape regardless of its size."""
    from ..functions.text import portable_hash60, shingles

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")

    def _grams(df: DataFrame, cols: list) -> DataFrame:
        from ..sources import ensure_parallelism

        text = F.col(text_col)
        if lowercase:
            text = F.lower(text)
        # the tokenize+shingle explode is CPU-bound: a small parquet
        # input is one scan task, serializing the whole pass (measured
        # 6.5s -> ~1s at sf0.1 on local[32])
        return ensure_parallelism(df).select(
            *cols, F.explode(shingles(text, n)).alias("__g")
        ).select(
            *cols, (portable_hash60(F.col("__g")) % num_buckets).alias("__b")
        )

    tg = _grams(target, [])
    # the corpus gram stream is consumed twice (bucket counts, then
    # the per-document weight join) and each evaluation re-runs the
    # tokenize + per-gram md5 — the md5 makes the recompute an order
    # heavier than plain tokenization (the gram_novelty lesson: cache
    # md5-hashed gram tables, don't cache tokenize-only ones), so
    # persist it; the bucket-count job below materializes it for free
    # and it is released before return behind the result checkpoint
    cg = _grams(corpus, [F.col(id_col)]).persist()
    # both count tables are <= num_buckets rows but cost a full gram
    # pass each — persist them so the totals collect, the ratio build,
    # and the final join don't re-tokenize the corpus (3 passes -> 1
    # per side)
    ct = tg.groupBy("__b").agg(F.count(F.lit(1)).alias("__ct")).persist()
    cr = cg.groupBy("__b").agg(F.count(F.lit(1)).alias("__cr")).persist()
    # ONE action for both gram totals: union the two (<= num_buckets
    # row) persisted count tables with a side tag and aggregate once —
    # two sequential 1-row collects were one driver round-trip too many
    totals = {
        row["__side"]: row["__s"]
        for row in driver_rows(
            ct.select(F.lit("t").alias("__side"), F.col("__ct").alias("__c"))
            .unionByName(
                cr.select(
                    F.lit("r").alias("__side"), F.col("__cr").alias("__c")
                )
            )
            .groupBy("__side")
            .agg(F.sum("__c").alias("__s"))
        )
    }
    n_t = (totals.get("t") or 0) + num_buckets
    n_r = (totals.get("r") or 0) + num_buckets
    cap = scale * scale
    # exact long arithmetic while the worst intermediate fits; DECIMAL
    # above (identical floor-division results, just wider registers —
    # force_decimal exists so a test can assert that equivalence)
    wide = force_decimal or scale * n_t * n_r >= (1 << 63)
    ty = "DECIMAL(38,0)" if wide else "BIGINT"
    ratio = cr.join(ct, "__b", "left").select(
        "__b",
        F.expr(
            f"CAST(least(({scale} * (CAST(coalesce(__ct, 0) + 1 AS {ty}))"
            f" * {n_r}) DIV ((CAST(__cr AS {ty}) + 1) * {n_t}),"
            f" {cap}) AS BIGINT)"
        ).alias("__r"),
    )
    # the ratio table is the only consumer of the persisted counts:
    # checkpoint it (<= num_buckets rows) and release them here rather
    # than leaking two cached tables per call
    ratio = ratio.localCheckpoint(eager=True)
    ct.unpersist()
    cr.unpersist()
    out = (
        cg.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("__r").alias("__rs"),
        )
        .select(
            id_col,
            "n_grams",
            F.expr("__rs DIV n_grams").alias("dsir_weight"),
        )
    )
    # eagerly materialize the document-sized weight table (3 narrow
    # columns) and release the gram cache: downstream consumers
    # routinely evaluate the weights more than once (max-weight
    # aggregate + resampling filter in importance_resample), and
    # without the checkpoint each evaluation replays the gram join —
    # the gram_novelty materialize-once pattern
    out = out.localCheckpoint(eager=True)
    cg.unpersist()
    return out


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    lowercase: bool = True,
) -> DataFrame:
    """Pointwise-mutual-information collocations — the corpus
    exploration staple ("new york", "et al"): adjacent token pairs
    whose joint frequency beats the independence expectation,
    ``pmi = ln(p(xy) / (p(x)·p(y)))`` with ``p(xy)`` over the bigram
    total and ``p(x)`` over the token total, computed as ONE
    fixed-order double expression over exact integer counts
    (``ln((c_xy·Nu·Nu) / (Nb·u_x·u_y))``) — the shared hash contract.
    Pairs below ``min_count`` joint occurrences drop first (a hapax
    pair maxes PMI by construction — the filter IS the statistic's
    standard guard).

    Output: ``(w1, w2, pair_count, pmi)``.

    Scale shape (100 TB): the corpus shuffles only token/bigram
    pairs — never text; both count tables partial-aggregate (popular
    pairs combine map-side).  The unigram joins key the FILTERED
    collocation table (#pairs ≥ min_count, vocabulary-sized) against
    aggregated unigram counts; the two scalar totals broadcast.
    Nothing driver-side."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    toks = docs.select(tokens(text).alias("__t"))
    nb = F.greatest(F.size("__t") - F.lit(1), F.lit(0))
    bigrams = toks.select(
        F.explode(
            F.zip_with(
                F.slice("__t", F.lit(1), nb),
                F.slice("__t", F.lit(2), nb),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    uni = toks.select(F.explode("__t").alias("w"))
    c2 = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    u = uni.groupBy("w").agg(F.count(F.lit(1)).alias("__u"))
    totals = bigrams.agg(
        F.count(F.lit(1)).alias("__nb")
    ).crossJoin(uni.agg(F.count(F.lit(1)).alias("__nu")))
    j = (
        c2.join(u.select(F.col("w").alias("w1"), F.col("__u").alias("__ux")), "w1")
        .join(u.select(F.col("w").alias("w2"), F.col("__u").alias("__uy")), "w2")
        .crossJoin(F.broadcast(totals))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("pair_count") * d("__nu") * d("__nu")
    den = d("__nb") * d("__ux") * d("__uy")
    return j.select(
        "w1", "w2", "pair_count", F.round(F.log(num / den), 6).alias("pmi")
    )
