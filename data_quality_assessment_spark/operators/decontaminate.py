"""Benchmark decontamination — flag training documents that share long
word n-grams with an evaluation/benchmark corpus (the overlap check of
GPT-3 Appendix C / Llama / Gopher data pipelines; public papers, no
reference-repo analog). Training on eval text silently inflates
benchmark scores, so corpus builds run this filter before every
release.

Semantics: a document is CONTAMINATED when any of its word ``n``-grams
(n = 13 in the papers) appears among the distinct word n-grams of the
benchmark corpus. Exact string match over whitespace tokens — no
hashing, so there are no false positives to argue about and the DuckDB
oracle is a direct re-derivation.

Scale shape (the reason this is join-shaped, not a UDF): the benchmark
side is tiny relative to the corpus — thousands of eval documents vs
10^12 training docs — so its distinct-gram set BROADCASTS and the
training side never shuffles: scan -> explode distinct grams ->
broadcast-hash semi-join -> per-doc count. Work is O(corpus tokens);
the only wide row is (id, gram) between two narrow stages. For a
benchmark too big to broadcast, drop the hint and AQE falls back to a
shuffled join keyed by the gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textstats as ts
from .repetition import _ngrams

DEFAULT_N = 13  # the GPT-3 / Llama overlap window


def benchmark_ngrams(
    bench: DataFrame, text_col: str, n: int = DEFAULT_N
) -> DataFrame:
    """Distinct word n-grams of the benchmark corpus: one column
    ``_g``. Materializes the words array before the gram HOF (the
    CodegenFallback re-eval lesson)."""
    w = bench.select(ts.words(F.col(text_col)).alias("_ws"))
    return (
        w.select(F.explode(_ngrams(F.col("_ws"), n)).alias("_g"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = DEFAULT_N,
    broadcast: bool = True,
) -> DataFrame:
    """(id, n_contaminated_grams, contaminated) for every doc in
    ``docs``: how many of the doc's DISTINCT n-grams appear in the
    benchmark, and the keep/drop-grade boolean. Callers drop or
    span-excise contaminated docs (compose with
    ``winnow.exact_substring_removal`` for the surgical variant)."""
    bg = benchmark_ngrams(bench, bench_text_col, n).withColumn(
        "_hit", F.lit(1)
    )
    if broadcast:
        bg = F.broadcast(bg)
    w = docs.select(
        F.col(id_col), ts.words(F.col(text_col)).alias("_ws")
    )
    # explode_outer keeps gram-less docs as one null-gram row, so the
    # zero-count rows fall out of the same aggregation (null join keys
    # never match) instead of a second corpus scan + distinct + left
    # join for the id spine (r6: one scan of docs, one exchange)
    dg = w.select(
        id_col,
        F.explode_outer(
            F.array_distinct(_ngrams(F.col("_ws"), n))
        ).alias("_g"),
    )
    hits = dg.join(bg, "_g", "left").groupBy(id_col).agg(
        F.count("_hit").alias("n_contaminated_grams")
    )
    return hits.select(
        id_col,
        F.col("n_contaminated_grams"),
        (F.col("n_contaminated_grams") > 0).alias("contaminated"),
    )
