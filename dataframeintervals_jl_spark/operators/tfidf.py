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
    n = docs.count()
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
