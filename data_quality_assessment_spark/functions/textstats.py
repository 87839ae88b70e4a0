"""Native-Column text statistics — the JVM/codegen twins of ``textcore``.

Each function returns a ``pyspark.sql.Column`` computing exactly the same
value as its pure-Python twin (pinned by ``tests/test_textstats_parity.py``).
These stay inside whole-stage codegen — no Python boundary — which is why
the heuristic rule stage costs ~nothing at 100 TB.

Reference lineage: these are the scale-path rewrites of the reference's
per-row validation loop (``/root/reference/scripts/metricModules.py:104-149``)
per SURVEY.md §2.7.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .textcore import STOPWORDS, SYMBOL_CLASS, WHITESPACE_CLASS

_WS_SPLIT = WHITESPACE_CLASS + "+"
# strip = remove pinned-whitespace runs at either end (same class as Python)
_STRIP_HEAD = "^" + WHITESPACE_CLASS + "+"
_STRIP_TAIL = WHITESPACE_CLASS + "+$"


def words(text: Column) -> Column:
    """Array of non-empty whitespace-separated tokens ([] for null text)."""
    raw = F.split(F.coalesce(text, F.lit("")), _WS_SPLIT)
    return F.filter(raw, lambda w: w != F.lit(""))


def n_words(text: Column) -> Column:
    return F.size(words(text)).cast("long")


def mean_word_len(text: Column) -> Column:
    ws = words(text)
    total = F.aggregate(ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    return F.when(F.size(ws) > 0, total / F.size(ws)).otherwise(F.lit(0.0))


def symbol_word_ratio(text: Column) -> Column:
    ws = words(text)
    syms = F.regexp_count(F.coalesce(text, F.lit("")), F.lit(SYMBOL_CLASS))
    return F.when(F.size(ws) > 0, syms / F.size(ws)).otherwise(F.lit(0.0))


def stopword_frac(text: Column) -> Column:
    ws = words(text)
    hits = F.size(F.filter(ws, lambda w: F.lower(w).isin(*STOPWORDS)))
    return F.when(F.size(ws) > 0, hits / F.size(ws)).otherwise(F.lit(0.0))


def lines(text: Column) -> Column:
    raw = F.split(F.coalesce(text, F.lit("")), F.lit("\n"), -1)
    stripped = F.transform(
        raw,
        lambda ln: F.regexp_replace(
            F.regexp_replace(ln, _STRIP_HEAD, ""), _STRIP_TAIL, ""
        ),
    )
    return F.filter(stripped, lambda ln: ln != F.lit(""))


def dup_line_frac(text: Column) -> Column:
    lns = lines(text)
    n = F.size(lns)
    return F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct(lns)) / n
    ).otherwise(F.lit(0.0))


def is_blank(text: Column) -> Column:
    """Null, empty, or whitespace-only."""
    return text.isNull() | (
        F.regexp_replace(text, WHITESPACE_CLASS + "+", "") == F.lit("")
    )


def host_of(url: Column) -> Column:
    """Extract ``host`` from ``scheme://host/path`` (the per-entity key —
    reference analog: trip_id/license_plate, SURVEY.md §1.3)."""
    return F.substring_index(F.substring_index(url, "://", -1), "/", 1)
