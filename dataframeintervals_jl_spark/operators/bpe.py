"""Byte-pair-encoding merge learning — tokenizer training on-cluster.

The missing piece between :func:`~.tfidf.tf_idf_top_terms`-style corpus
statistics and an actual trainable tokenizer: learn the first
``n_merges`` BPE merge rules from the corpus, exactly the algorithm of
Sennrich et al. 2016 — repeatedly merge the globally most frequent
adjacent symbol pair.

Scale design (100 TB): BPE never needs the corpus after one pass — it
runs on the WORD-FREQUENCY table (distinct word → count), which is
vocabulary-sized, not corpus-sized.  That table is built with one
partial-aggregated groupBy and persisted; each merge round is then a
tiny pair-count aggregation over it plus a narrow per-row ``replace``.
The driver holds only the k winning pairs (like the IVF centroids),
never any table.

Determinism contract (DuckDB-replayable): counts are exact bigints;
the winning pair breaks ties by ``(count DESC, left, right)`` over
ASCII symbols — total order.  Merge application is literal string
``replace`` over a packed representation in which EVERY symbol is
wrapped in two distinct sentinels, ``\\x1e sym \\x1f``: the pattern
``\\x1e lhs \\x1f \\x1e rhs \\x1f`` can therefore only ever match two
COMPLETE adjacent symbols (a symbol merely ending in ``lhs`` or
starting with ``rhs`` lacks the enclosing sentinels), while the
self-contained replacement ``\\x1e lhsrhs \\x1f`` lets run merges
chain exactly like BPE's greedy left-to-right scan: ``aaaa`` under
``(a,a)`` → ``(aa)(aa)``, ``aaa`` → ``(aa)(a)``.  A single-sentinel
separator encoding is NOT sound here — the pattern can glue a suffix
of one symbol to a prefix of the next.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import driver_count, driver_rows

#: per-symbol sentinels in the packed word representation — control
#: chars that never appear in the [a-z]+ word charset.  Every symbol
#: is stored as ``L + sym + R``.
L = "\x1e"
R = "\x1f"

#: regex extracting the symbol contents back out of the packed form
_SYM_RE = f"{L}([^{L}{R}]+){R}"

#: lineage-truncation cadence for the merge loop: localCheckpoint the
#: vocabulary table every this many rounds so plan depth (and optimizer
#: time) stays bounded at any n_merges.
_CHECKPOINT_EVERY = 8

#: n_merges above this emits the sequential-rounds advisory.
_WARN_MERGES = 1024


def _pack_chars(word_col) -> F.Column:
    """Word string → packed symbol string of wrapped single chars."""
    return F.array_join(
        F.transform(
            F.regexp_extract_all(word_col, F.lit("."), 0),
            lambda c: F.concat(F.lit(L), c, F.lit(R)),
        ),
        "",
    )


def _adjacent_pairs(df: DataFrame, s_col: str, cnt_col: str) -> DataFrame:
    syms = F.regexp_extract_all(F.col(s_col), F.lit(_SYM_RE), 1)
    nb = F.greatest(F.size(syms) - F.lit(1), F.lit(0))
    return df.select(
        F.explode(
            F.zip_with(
                F.slice(syms, F.lit(1), nb),
                F.slice(syms, F.lit(2), nb),
                lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
            )
        ).alias("p"),
        F.col(cnt_col),
    ).select(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"), cnt_col)


def _merge_pattern(lhs: str, rhs: str) -> tuple[str, str]:
    return L + lhs + R + L + rhs + R, L + lhs + rhs + R


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn the first ``n_merges`` BPE merge rules from the corpus.

    Returns ``[(merge_rank, lhs, rhs, pair_count), ...]`` — rank 1 is
    the first (most frequent) merge; ``pair_count`` is the weighted
    occurrence count at the time the pair won.  Words are lowercase
    ``[a-z]+`` runs; symbols start as single characters.

    One corpus pass builds the word-frequency table; each round is a
    pair-count aggregation over that (persisted, vocabulary-sized)
    table, one 1-row ``orderBy().limit(1)`` collect, and a narrow
    ``replace`` projection.  Every ``_CHECKPOINT_EVERY`` rounds the
    vocabulary table is ``localCheckpoint``-ed (eager), truncating the
    accumulated ``replace`` lineage — so plan size and optimizer time
    stay BOUNDED and total work is LINEAR in ``n_merges`` (bench probe
    ``bpe_merges_64``), not quadratic in plan depth.  The driver-side
    boundary is inherent to BPE itself (each round is one tiny Spark
    job + a 1-row collect — rounds are sequential by definition): at a
    real tokenizer's 32k merges that is 32k scheduler round-trips, so
    very large ``n_merges`` emits a warning pointing at the practical
    recipe (learn on the vocabulary of a SAMPLE; the word-frequency
    table of even a 100 TB corpus is vocabulary-sized anyway).
    """
    import warnings

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if n_merges > _WARN_MERGES:
        warnings.warn(
            f"learn_bpe_merges(n_merges={n_merges}): each merge is one "
            "sequential Spark job (inherent to BPE) — thousands of "
            "merges mean thousands of scheduler round-trips. Work per "
            "round is vocabulary-sized and lineage is checkpoint-"
            "bounded, so this completes, but for full tokenizer "
            "training consider learning on a sampled corpus's "
            "vocabulary table.",
            stacklevel=2,
        )
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("w")
    )
    w = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_pack_chars(F.col("w")).alias("s"), "cnt")
    )
    w = w.persist()
    driver_count(w)

    merges: list[tuple[int, str, str, int]] = []
    # `base` is the materialized anchor the current replace chain hangs
    # off (the initial vocabulary, then each checkpoint).  Rounds no
    # longer materialize every intermediate table: between checkpoints
    # the chain is at most _CHECKPOINT_EVERY map-only `replace`
    # projections over the cached base — re-evaluating those inside the
    # next round's pair aggregation is far cheaper than the one full
    # materialization job per round it replaces (round 11: per-round
    # jobs halve; the checkpoint cadence still bounds plan depth
    # exactly as before, cadence-invariance tested).
    base = w
    for r in range(1, n_merges + 1):
        # one scheduler round-trip per learning round (the TakeOrdered
        # final stage is a single partition; AQE would add 2 jobs per
        # round — see session.driver_rows)
        top = driver_rows(
            _adjacent_pairs(w, "s", "cnt")
            .groupBy("lhs", "rhs")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "lhs", "rhs")
            .limit(1)
        )
        if not top:
            break  # every word is a single symbol — nothing to merge
        lhs, rhs, c = top[0]["lhs"], top[0]["rhs"], int(top[0]["c"])
        merges.append((r, lhs, rhs, c))
        if r == n_merges:
            break  # the merged table would never be read — skip the pass
        pat, rep = _merge_pattern(lhs, rhs)
        w = w.select(
            F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("s"),
            "cnt",
        )
        if r % _CHECKPOINT_EVERY == 0:
            # truncate the replace-projection lineage: without this the
            # logical plan nests one replace per round and optimizer
            # time grows with r — the checkpoint keeps every round O(1)
            # plan work.  Eager, so the old base is fully consumed
            # before its blocks are released.
            w = w.localCheckpoint(eager=True)
            base.unpersist()
            base = w
    base.unpersist()
    return merges


def bpe_merges_frame(
    docs: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> DataFrame:
    """:func:`learn_bpe_merges` as a (tiny) DataFrame:
    ``(merge_rank, lhs, rhs, pair_count)`` — the shape the catalog
    query and a downstream tokenizer loader consume."""
    merges = learn_bpe_merges(docs, n_merges=n_merges, text_col=text_col)
    return docs.sparkSession.createDataFrame(
        merges, "merge_rank long, lhs string, rhs string, pair_count long"
    )


def synthetic_merges(n: int) -> list[tuple[int, str, str, int]]:
    """A deterministic merge table of any size, for gates and benches
    that need a REAL-vocabulary-scale rule list without paying n
    sequential learning rounds: single-letter pairs cycled over the
    frequency-ordered alphabet, with every third merge chaining off
    the previous merged symbol so multi-char symbols (and therefore
    merge-order-dependent tokenizations) are exercised.  Pure
    arithmetic — the same constants embed into the DuckDB oracle."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    base = "etaoinshrdlcumwfgypbvkjxqz"
    out: list[tuple[int, str, str, int]] = []
    prev = None
    for i in range(n):
        a = base[i % 26]
        b = base[(i * 7 + 3) % 26]
        if prev is not None and i % 3 == 2:
            lhs, rhs = prev, a
        else:
            lhs, rhs = a, b
        out.append((i + 1, lhs, rhs, 0))
        prev = lhs + rhs
    return out


def _tokenize_word(word: str, ranks_of: dict, merge_at: dict) -> list:
    """Exact replay of the sequential rank-order replace chain for ONE
    word, in O(applied merges · |word|) instead of O(n_merges · |word|):
    a min-heap holds the ranks of merges whose pair is (or was) present;
    ranks pop in increasing order, each applied as the same greedy
    left-to-right non-overlapping pass ``replace`` performs.  A merge
    can only CREATE pairs that involve its merged symbol, and those are
    pushed only when their rank is still ahead (> last) — exactly the
    ranks the sequential chain would still visit; pairs destroyed
    before their rank's turn no-op in the pass, exactly like the
    sequential chain's no-op replace.  Equivalence to
    :func:`apply_bpe_merges` is property-tested (tests/test_text_*)."""
    import heapq

    syms = list(word)
    if len(syms) < 2:
        return syms
    heap: list = []
    seen: set = set()
    for p in zip(syms, syms[1:]):
        for r in ranks_of.get(p, ()):
            if r not in seen:
                seen.add(r)
                heapq.heappush(heap, r)
    last = 0
    while heap:
        r = heapq.heappop(heap)
        lhs, rhs, merged = merge_at[r]
        out = []
        i, n, changed = 0, len(syms), False
        while i < n:
            if i + 1 < n and syms[i] == lhs and syms[i + 1] == rhs:
                out.append(merged)
                i += 2
                changed = True
            else:
                out.append(syms[i])
                i += 1
        last = r
        if changed:
            syms = out
            if len(syms) < 2:
                break
            for p in zip(syms, syms[1:]):
                for rr in ranks_of.get(p, ()):
                    if rr > last and rr not in seen:
                        seen.add(rr)
                        heapq.heappush(heap, rr)
    return syms


#: word-tokenization memo cap per python worker — vocabulary-sized in
#: practice (natural-language corpora repeat words massively); cleared
#: wholesale if a pathological corpus exceeds it
_TOKENIZE_CACHE_CAP = 1_000_000


def bpe_tokenize(
    df: DataFrame,
    merges,
    text_col: str = "text",
    out_col: str = "tokens",
    max_tokens: int = 0,
):
    """Arrow-batched BPE tokenizer for REAL vocabulary sizes — the
    production-scale twin of :func:`apply_bpe_merges`, whose literal
    ``replace`` chain is codegen'd per merge and therefore cannot carry
    a 32k-merge tokenizer.  Identical semantics (property-tested
    equal wherever both are legal): lowercase ``[a-z]+`` words, merges
    applied in list order, each a greedy left-to-right non-overlapping
    pass; ``max_tokens > 0`` truncates the flattened output.

    Scale shape (100 TB): one narrow Arrow-batched projection
    (``pandas_udf``, the sanctioned multimodal/ewma pattern) — no
    shuffle, no join; the merge table rides the task closure
    (~1 MB at 32k merges, vocabulary-sized like the IVF centroids) and
    is inverted ONCE per python worker into rank dicts; per-word
    results memoize across batches (the cache persists for the
    worker's lifetime, so per-task cost is ~vocabulary-sized, not
    corpus-sized).  Adds ``out_col`` (array<string>) to ``df``."""
    from pyspark.sql.functions import pandas_udf

    rules = [(str(m[1]), str(m[2])) for m in merges]
    if max_tokens < 0:
        raise ValueError(f"max_tokens must be >= 0, got {max_tokens}")
    cut = int(max_tokens)

    state: dict = {}

    def _ensure_state():
        if "ranks_of" not in state:
            ranks_of: dict = {}
            merge_at: dict = {}
            for i, (lhs, rhs) in enumerate(rules):
                r = i + 1
                ranks_of.setdefault((lhs, rhs), []).append(r)
                merge_at[r] = (lhs, rhs, lhs + rhs)
            state["ranks_of"] = ranks_of
            state["merge_at"] = merge_at
            state["cache"] = {}
        return state["ranks_of"], state["merge_at"], state["cache"]

    @pandas_udf("array<string>")
    def _tok(texts):
        import re

        import pandas as pd

        ranks_of, merge_at, cache = _ensure_state()
        word_re = re.compile("[a-z]+")
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list = []
            for w in word_re.findall(t.lower()):
                got = cache.get(w)
                if got is None:
                    if len(cache) >= _TOKENIZE_CACHE_CAP:
                        cache.clear()
                    got = _tokenize_word(w, ranks_of, merge_at)
                    cache[w] = got
                toks.extend(got)
                if cut and len(toks) >= cut:
                    break
            out.append(toks[:cut] if cut else toks)
        return pd.Series(out)

    return df.withColumn(out_col, _tok(F.col(text_col)))


def apply_bpe_merges(text, merges, max_tokens: int = 0):
    """Segment ``text`` with learned merges: array-of-symbols column —
    lowercase ``[a-z]+`` words exploded to characters, then each merge
    applied in rank order (k literal ``replace`` ops, codegen'd; no
    Python).  ``max_tokens > 0`` truncates the output array.  The
    inference half of :func:`learn_bpe_merges`."""
    col = text if not isinstance(text, str) else F.col(text)
    words = F.regexp_extract_all(F.lower(col), F.lit("[a-z]+"), 0)
    packed = F.transform(words, _pack_chars)

    def _merge_fn(lhs: str, rhs: str):
        # single-arg closure: PySpark counts a lambda's parameters
        # (defaults included) as higher-order-function arguments
        pat, rep = _merge_pattern(lhs, rhs)
        return lambda x: F.replace(x, F.lit(pat), F.lit(rep))

    for _, lhs, rhs, _ in merges:
        packed = F.transform(packed, _merge_fn(lhs, rhs))
    out = F.flatten(
        F.transform(
            packed, lambda x: F.regexp_extract_all(x, F.lit(_SYM_RE), 1)
        )
    )
    if max_tokens > 0:
        out = F.slice(out, 1, int(max_tokens))
    return out
