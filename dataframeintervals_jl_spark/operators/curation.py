"""URL / domain-level corpus curation — the CommonCrawl-shaped front
half of a pre-training pipeline.

Beyond the reference's surface (SURVEY.md §2.C: it has no string or
web functions); added per the engine's training-data mandate.  Three
pieces, all built on primitives the engine already plans well:

- host / registered-domain extraction: pure expressions
  (``parse_url`` + label slicing) — codegen'd, no shuffle;
- per-domain document caps: :func:`~.sampling.topk_per_group`, whose
  ``WindowGroupLimit`` plan never materializes more than a group's
  top slice;
- blocklist filtering: a broadcast anti-join — the blocklist is
  dimension-sized (thousands of domains), so at 100 TB the filter is
  map-side with ZERO shuffle of the corpus.

Determinism contract: host extraction is ``parse_url(url, 'HOST')``
(scheme://[host][:port]/... grammar); the registered domain is the
LAST ``n_labels`` host labels — a deliberate public-suffix-list-free
approximation (the PSL is a mutable external artifact; callers who
need exact PSL semantics can join their own suffix table against
``host``).  Both are replayed exactly by the DuckDB oracles.
"""

from __future__ import annotations

from typing import Iterable, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the host grammar parse_url implements, as a regex — kept here so
#: tests can assert the expression path and the oracle replay agree
HOST_RE = r"^[a-z]+://([^/:?#]+)"


def url_host(url) -> Column:
    """Host component of a URL column (``try_parse_url(url, 'HOST')``
    — the non-ANSI-raising form: a 100 TB crawl WILL contain malformed
    URLs and one bad row must not kill the stage): NULL for malformed
    input, port and userinfo excluded."""
    col = F.col(url) if isinstance(url, str) else url
    return F.try_parse_url(col, F.lit("HOST"))


def registered_domain(host, n_labels: int = 2) -> Column:
    """Last ``n_labels`` labels of a host — the naive registered
    domain (``www.blog.example.com`` → ``example.com``).  Hosts with
    fewer labels pass through whole; NULL propagates."""
    if n_labels < 1:
        raise ValueError(f"n_labels must be >= 1, got {n_labels}")
    col = F.col(host) if isinstance(host, str) else host
    labels = F.split(col, r"\.")
    start = F.greatest(F.size(labels) - F.lit(n_labels - 1), F.lit(1))
    return F.array_join(F.slice(labels, start, F.lit(n_labels)), ".")


def extract_url_parts(
    df: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    domain_col: str = "domain",
    n_labels: int = 2,
) -> DataFrame:
    """Add ``host`` and registered-``domain`` columns derived from
    ``url_col``.  Pure narrow projection: no shuffle, pushdown- and
    codegen-friendly."""
    host = url_host(F.col(url_col))
    return df.withColumn(host_col, host).withColumn(
        domain_col, registered_domain(F.col(host_col), n_labels)
    )


def domain_caps(
    df: DataFrame,
    cap: int,
    order_by: Sequence[Column],
    domain_col: str = "domain",
    rank_col: str = "domain_rank",
) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain under a
    deterministic preference order (include a unique tiebreaker) —
    the standard anti-SEO-spam / source-balance gate.  One shuffle on
    the domain key; Spark's ``WindowGroupLimit`` evaluates the cap
    inside the window stage, so a million-document domain never
    materializes past its top ``cap`` rows (plan-locked in
    tests/test_plans.py)."""
    from .sampling import topk_per_group

    return topk_per_group(df, domain_col, order_by, cap, rank_col=rank_col)


def blocklist_filter(
    df: DataFrame,
    blocklist: Union[DataFrame, Iterable[str]],
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose ``domain_col`` appears in ``blocklist`` (a
    1-column DataFrame or an iterable of domain strings) via a
    broadcast LEFT ANTI join — the blocklist is dimension-sized, so
    the corpus is filtered map-side with no shuffle.  Exact
    registered-domain match; to block whole subtrees, blocklist the
    registered domain and filter on the ``registered_domain`` of the
    host (the extraction default)."""
    if not isinstance(blocklist, DataFrame):
        rows = sorted({str(d) for d in blocklist})
        bl = df.sparkSession.createDataFrame(
            [(d,) for d in rows], f"{domain_col} string"
        )
    else:
        cols = blocklist.columns
        if len(cols) != 1:
            raise ValueError(
                f"blocklist DataFrame must have exactly 1 column, got {cols}"
            )
        bl = blocklist.withColumnRenamed(cols[0], domain_col).distinct()
    return df.join(F.broadcast(bl), domain_col, "left_anti")


def domain_quota_sample(
    df: DataFrame,
    quota: int,
    key_col: str = "doc_id",
    domain_col: str = "domain",
    salt: str = "domquota",
) -> DataFrame:
    """Uniform deterministic down-sample to ~``quota`` documents per
    registered domain — the cheaper cousin of :func:`domain_caps` when
    any uniform subset (not the best-k under a preference order) is
    wanted: ONE partial-aggregated count per domain, the per-domain
    keep rate broadcast back, membership a pure row-local hash
    threshold.  No window, no sort, no top-k state — at 100 TB the
    corpus is filtered map-side after a domain-count agg whose output
    is dimension-sized.

    Exact ppm thresholds (``rate_ppm = least(1e6, quota·1e6 DIV n)``,
    the :func:`~.sampling.deterministic_sample` contract): the kept
    count per domain is ~``quota`` in expectation (hash-uniform), not
    exact — callers needing an exact cap use :func:`domain_caps`.
    Same key + salt → same decision on any engine or partitioning.
    NULL domains (malformed URLs) form their own quota group."""
    from .sampling import BUCKETS, _bucket

    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    rates = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            F.col(domain_col).alias("__dom"),
            # exact integer floor division (DIV) — a float `/` then
            # cast could disagree with the oracle's `//` at boundaries
            F.expr(
                f"CAST(least({BUCKETS}, "
                f"({int(quota)} * {BUCKETS}) DIV __n) AS BIGINT)"
            ).alias("__rppm"),
        )
    )
    return (
        df.join(
            F.broadcast(rates),
            F.col(domain_col).eqNullSafe(F.col("__dom")),
        )
        .filter(_bucket(F.col(key_col), salt) < F.col("__rppm"))
        .drop("__dom", "__rppm")
    )


#: query parameters dropped by canonical_url — session/campaign
#: tracking noise that changes the STRING without changing the page
TRACKING_PARAM_RE = r"^(utm_[a-z0-9]+|gclid|fbclid|ref|mc_cid|mc_eid)="


def canonical_url(url, strip_www: bool = True) -> Column:
    """URL canonicalization for dedup keys (RFC 3986 normalization +
    the standard tracking-parameter strip): lowercase scheme and
    host, drop the fragment, drop default ports (``:80`` for http,
    ``:443`` for https), optionally strip a leading ``www.``, strip
    trailing path slashes, and remove :data:`TRACKING_PARAM_RE` query
    parameters (remaining parameters keep their order; an emptied
    query drops its ``?``).  Two URLs that canonicalize equal are the
    standard exact-dup page key a crawl dedup stage groups by.

    Pure Column expressions in the RE2 subset — codegen'd, zero
    Python, byte-replayable by a SQL oracle.  Malformed URLs (no
    ``scheme://host``) canonicalize to NULL (callers decide whether
    NULL keys group or pass through)."""
    u = F.regexp_replace(_c(url), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", "")
    path = F.regexp_replace(
        F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit(""))
        & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(kept, "&")
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (host != ""), out)


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x
