"""Repetition quality signals (Gopher-style, Rae et al. 2021 §A1.1 —
public paper; no reference-repo analog).

The flagship kernel already carries two cheap per-row repetition
signals (``dup_line_frac``, ``top_bigram_share``). These operators are
their CHAR-WEIGHTED, distribution-grade cousins — the rules web-scale
quality filters actually threshold on:

  * ``dup_line_char_frac`` — fraction of line characters sitting in
    repeat OCCURRENCES of a line (occurrences beyond the first), per
    document. A page whose one repeated line is 400 chars of boilerplate
    scores high even when the count-based fraction looks small.
  * ``top_ngram_char_frac`` — fraction of word characters covered by
    the most frequent word n-gram (count * token-chars of the n-gram /
    total token chars). Ties break to the lexicographically-smallest
    n-gram so the result is deterministic cross-engine.

Scale shape: both are explode -> groupBy aggregations — partial
(map-side) aggregation applies, no window over the whole corpus, no
driver state; the widest shuffle row is (doc_id, line-or-ngram, count).
At 10^12 docs the explode fan-out is bounded by document size, and AQE
handles doc-length skew like any other key skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import textstats as ts


def _dup_unit_char_frac(
    df: DataFrame, unit: Column, out: str, id_col: str
) -> DataFrame:
    """Shared shape for the char-weighted duplicate-UNIT fraction
    (units = lines or paragraphs): frac = sum over distinct units of
    (occurrences - 1) * chars / sum of occurrences * chars. Documents
    with no units score 0.0.

    ``explode_outer`` keeps unit-less documents as a single null-unit
    row, so their 0.0 rows fall out of the same aggregation (null
    lengths vanish from the sums -> null frac -> coalesce) instead of
    a second scan + distinct + left join for the id spine (r6: one
    scan, two exchanges — was two scans, three exchanges + join)."""
    d = df.select(F.col(id_col), F.explode_outer(unit).alias("_u"))
    per = d.groupBy(id_col, "_u").agg(
        F.count(F.lit(1)).alias("_c"), F.length("_u").alias("_len")
    )
    agg = per.groupBy(id_col).agg(
        F.round(
            F.sum((F.col("_c") - 1) * F.col("_len"))
            / F.sum(F.col("_c") * F.col("_len")),
            6,
        ).alias(out)
    )
    return agg.select(id_col, F.coalesce(out, F.lit(0.0)).alias(out))


def dup_line_char_frac(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, dup_line_char_frac) per document (stripped non-empty lines
    as ``textstats.lines``)."""
    return _dup_unit_char_frac(
        df, ts.lines(F.col(text_col)), "dup_line_char_frac", id_col
    )


def dup_paragraph_char_frac(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, dup_paragraph_char_frac) per document — the Gopher
    duplicate-paragraph twin of :func:`dup_line_char_frac` (paragraphs
    = blank-line-separated blocks, ``textstats.paragraphs``)."""
    return _dup_unit_char_frac(
        df, ts.paragraphs(F.col(text_col)), "dup_paragraph_char_frac",
        id_col,
    )


def dup_ngram_char_frac(
    df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, dup_ngram_char_frac) — Gopher's duplicate n-gram CHAR
    COVERAGE (n = 5..10 in the paper): the fraction of token characters
    lying inside at least one occurrence of a word n-gram that occurs
    more than once in the document, each character counted ONCE however
    many duplicated grams overlap it (Rae et al. 2021 §A1.1: "taking
    care not to count characters multiple times").

    Exact interval-union semantics, all native, ONE exchange on the
    doc-stats path: word char offsets via a cumulative sum window, gram
    intervals via lead(), duplicate tagging via a COUNT WINDOW over
    (id, gram) — not a groupBy + self-join back, which would recompute
    the whole gram derivation for both join sides (measured: 6
    exchanges vs 2-3) — then the classic running-max interval-union
    window. HashPartitioning(id) from the first window satisfies every
    later clustering requirement ((id, gram) included), so Catalyst
    inserts sorts, not shuffles; the only other exchanges are the
    distinct-ids spine the zero rows join against and its join
    alignment (plan-pinned <= 3 by tests/test_plan_shape.py). Every
    step is SQL-expressible, which is what the DuckDB oracle checks.
    """
    from pyspark.sql import Window

    w = df.select(
        F.col(id_col), ts.words(F.col(text_col)).alias("_ws")
    ).withColumn("_total", F.length(F.concat_ws("", F.col("_ws"))))
    pos = w.select(
        id_col, "_total", F.posexplode("_ws").alias("_i", "_w")
    )
    cum = Window.partitionBy(id_col).orderBy("_i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    lead_w = Window.partitionBy(id_col).orderBy("_i")
    pos = pos.withColumn("_end", F.sum(F.length("_w")).over(cum))
    pos = pos.withColumn("_start", F.col("_end") - F.length("_w"))
    gram = F.concat_ws(
        " ", F.col("_w"), *[F.lead("_w", k).over(lead_w) for k in range(1, n)]
    )
    gend = F.lead("_end", n - 1).over(lead_w)
    grams = pos.select(
        id_col, "_total", "_start", gram.alias("_g"), gend.alias("_gend")
    ).filter(F.col("_gend").isNotNull())
    cnt_w = Window.partitionBy(id_col, "_g")
    ivals = grams.withColumn(
        "_c", F.count(F.lit(1)).over(cnt_w)
    ).filter(F.col("_c") > 1)
    merge = (
        Window.partitionBy(id_col).orderBy("_start", "_gend")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.coalesce(F.max("_gend").over(merge), F.lit(0))
    new_chars = F.greatest(
        F.col("_gend") - F.greatest(F.col("_start"), prev_max), F.lit(0)
    )
    agg = ivals.withColumn("_nc", new_chars).groupBy(id_col).agg(
        F.round(F.sum("_nc") / F.first("_total"), 6).alias(
            "dup_ngram_char_frac"
        )
    )
    ids = df.select(id_col).distinct()
    return ids.join(agg, id_col, "left").select(
        id_col,
        F.coalesce("dup_ngram_char_frac", F.lit(0.0)).alias(
            "dup_ngram_char_frac"
        ),
    )


def _ngrams(words_col: Column, n: int) -> Column:
    """Array of space-joined word n-grams from a MATERIALIZED words
    array column (HOFs re-evaluate their argument subtree — callers
    materialize the words array first, the dedup.py lesson)."""
    return F.when(
        F.size(words_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words_col) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words_col, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def top_ngram_char_frac(
    df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, top_ngram, top_ngram_char_frac) per document.

    frac = count(top n-gram) * token-chars(top n-gram) / total token
    chars, where token-chars of a space-joined n-gram is its length
    minus the (n-1) separator spaces. Top pick: highest count, ties ->
    smallest n-gram string (byte order — cross-engine stable).
    Documents with fewer than n words score 0.0 with a NULL n-gram.
    """
    w = df.select(
        F.col(id_col), ts.words(F.col(text_col)).alias("_ws")
    ).withColumn("_total", F.length(F.concat_ws("", F.col("_ws"))))
    grams = w.select(
        id_col, "_total", F.explode(_ngrams(F.col("_ws"), n)).alias("_g")
    )
    counts = grams.groupBy(id_col, "_total", "_g").agg(
        F.count(F.lit(1)).alias("_c")
    )
    # smallest-tie argmax via min(struct(-count, gram)) — the
    # mode_smallest pattern (cadence.py), one partial-agg shuffle
    top = counts.groupBy(id_col, "_total").agg(
        F.min(F.struct((-F.col("_c")).alias("nc"), F.col("_g").alias("g")))
        .alias("_m")
    ).select(
        id_col,
        F.col("_m.g").alias("top_ngram"),
        F.round(
            (-F.col("_m.nc")) * (F.length("_m.g") - (n - 1))
            / F.col("_total"),
            6,
        ).alias("top_ngram_char_frac"),
    )
    ids = df.select(id_col).distinct()
    return ids.join(top, id_col, "left").select(
        id_col,
        "top_ngram",
        F.coalesce("top_ngram_char_frac", F.lit(0.0)).alias(
            "top_ngram_char_frac"
        ),
    )
