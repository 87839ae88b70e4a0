"""Winnowing fingerprints — exact-substring duplicate detection
(Schleimer, Wilkerson & Aiken 2003, "Winnowing: Local Algorithms for
Document Fingerprinting" — the MOSS algorithm; public paper, no
reference-repo analog).

MinHash/SimHash catch WHOLE-document near-duplicates; the remaining
LLM-data failure mode is long VERBATIM spans shared between otherwise
different pages (boilerplate, licenses, syndicated paragraphs —
Lee et al. 2021's exact-substring dedup). Winnowing gives the
shuffle-friendly form of that signal:

  1. hash every char k-gram of the text (positions 1..n-k+1);
  2. slide a window of w consecutive k-gram hashes; keep the window
     minimum, RIGHTMOST occurrence on ties (robust winnowing);
  3. the distinct kept (hash) values are the document's fingerprints.

THE guarantee (the reason this beats strided tiling): selection
depends on hash CONTENT, not position, so any shared substring of
length >= w + k - 1 yields at least one identical fingerprint in both
documents regardless of where the span sits in each (strided sampling
misses spans whose phases differ; tested with phase-shifted plants).
Density is ~2/(w+1) of all k-grams — the index stays a small fraction
of the corpus.

Scale shape: fingerprinting is per-row (codegen/HOF over materialized
arrays — each step reads a computed column, the CodegenFallback
lesson); the only shuffle groups (fingerprint -> docs), and the pair
join is bounded by shared-fingerprint buckets like the MinHash band
join. ``fast=True`` uses xxhash64; ``fast=False`` the md5 family the
DuckDB oracle reproduces bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _h64

DEFAULT_K = 12   # chars per gram: shorter than a sentence, longer than a word
DEFAULT_W = 6    # window: guarantee threshold = w + k - 1 = 17 chars


def _gram_hashes(text: Column, k: int, fast: bool) -> Column:
    """Array of k-gram hashes (empty for texts shorter than k)."""
    t = F.coalesce(text, F.lit(""))
    h = (lambda s: F.xxhash64(s)) if fast else (lambda s: _h64(s))
    return F.when(
        F.length(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (k - 1)),
            lambda i: h(F.substring(t, i, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<long>"))


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str,
    k: int = DEFAULT_K, w: int = DEFAULT_W, *, fast: bool = True,
) -> DataFrame:
    """(id, fp) — one row per DISTINCT selected fingerprint hash.

    Hash array and the per-window minima are materialized as columns
    between steps so no HOF re-evaluates its argument subtree."""
    d = df.select(
        F.col(id_col), _gram_hashes(F.col(text_col), k, fast).alias("_h")
    )
    # window minima: for window start i (1-based), min of _h[i..i+w-1]
    d = d.withColumn(
        "_mins",
        F.when(
            F.size("_h") >= w,
            F.transform(
                F.sequence(F.lit(1), F.size("_h") - (w - 1)),
                lambda i: F.array_min(F.slice(F.col("_h"), i, w)),
            ),
        ).otherwise(F.array().cast("array<long>")),
    )
    # distinct minima ARE the fingerprint set: each window keeps its
    # min, and a value selected anywhere is selected as a value — the
    # (value, rightmost-position) pairs of classic winnowing collapse
    # to values once deduped, which is all the cross-doc join needs
    return d.select(
        id_col, F.explode(F.array_distinct("_mins")).alias("fp")
    )


def exact_substring_removal(
    df: DataFrame, id_col: str, text_col: str,
    k: int = DEFAULT_K, w: int = DEFAULT_W, min_len: int = 30,
    *, fast: bool = True,
    max_df: int | None = None, max_partners: int | None = None,
) -> DataFrame:
    """Exact-substring REMOVAL (the Lee et al. 2021 'Deduplicating
    Training Data' step that fingerprinting enables): for every
    candidate pair from :func:`winnow_pairs`, excise from the LOWER-
    priority document (larger id) every span of >= ``min_len`` chars
    that appears verbatim in its higher-priority partner, keeping the
    canonical copy intact. Returns ``df``'s columns plus ``text_clean``
    (the excised text; unchanged docs pass through) and ``n_removed``
    (chars removed).

    Semantics (mirrored exactly by the DuckDB oracle):
      * a position p in doc b is MATCHED against partner a when b's
        char k-gram hash at p occurs anywhere in a's k-gram multiset
        (content match, not positional — phase shifts don't matter);
      * a maximal run of >= min_len - k + 1 consecutive matched
        positions [p0, p1] covers chars [p0, p1 + k - 1];
      * covered chars are unioned over ALL higher-priority partners
        (computed per pair — runs never bridge two partners) and
        removed. Partners contribute their ORIGINAL grams even if they
        are themselves cleaned against someone above them (single-pass
        determinism; no iterative fixpoint).

    Scale shape: pair candidates are bounded by the winnowing
    fingerprint buckets (never all-pairs); gram arrays are computed
    once in codegen and shipped only for candidate pairs (~8 bytes per
    char per paired doc — the price of span-exact removal); the
    excision kernel is one ``applyInPandas`` over ``id_b`` groups
    doing integer array ops. Guarantee: a shared span of length
    >= max(min_len, w + k - 1) is always excised.

    Two skew guards for web scale (both default off so the oracle
    parity check sees exact semantics):
      * ``max_df`` — drop fingerprints shared by more than max_df docs
        before pairing (see :func:`winnow_pairs`), bounding candidate
        fan-out from viral boilerplate;
      * ``max_partners`` — keep only the top-N partners per ``id_b``
        (by n_shared desc, id_a asc — the partners most likely to
        contribute coverage), bounding the gram bytes one excision
        group collects: an id_b paired with thousands of partners
        would otherwise gather all their full gram arrays (~8 B/char
        each) into one in-memory pandas group and OOM the task.
    """
    import numpy as np
    import pandas as pd

    pairs = winnow_pairs(df, id_col, text_col, k, w, fast=fast,
                         max_df=max_df)
    if max_partners is not None:
        from pyspark.sql import Window

        wnd = (
            Window.partitionBy("id_b")
            .orderBy(F.col("n_shared").desc(), F.col("id_a").asc())
        )
        pairs = (
            pairs.withColumn("_rk", F.row_number().over(wnd))
            .filter(F.col("_rk") <= max_partners)
            .drop("_rk")
        )
    grams = df.select(
        F.col(id_col), _gram_hashes(F.col(text_col), k, fast).alias("_g")
    )
    ga = grams.select(F.col(id_col).alias("id_a"), F.col("_g").alias("_ga"))
    gb = grams.select(F.col(id_col).alias("id_b"), F.col("_g").alias("_gb"))
    btext = df.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("_btext")
    )
    j = pairs.join(ga, "id_a").join(gb, "id_b").join(btext, "id_b")

    run_min = min_len - k + 1

    def _clean(pdf: pd.DataFrame) -> pd.DataFrame:
        text = pdf["_btext"].iloc[0] or ""
        gb0 = pdf["_gb"].iloc[0]
        gb_arr = np.asarray(
            [] if gb0 is None else gb0, dtype=np.int64
        )
        covered = np.zeros(len(text), dtype=bool)
        for ga_list in pdf["_ga"]:
            ga_arr = np.unique(np.asarray(
                [] if ga_list is None else ga_list, dtype=np.int64
            ))
            if ga_arr.size == 0 or gb_arr.size == 0:
                continue
            idx = np.searchsorted(ga_arr, gb_arr)
            safe = np.minimum(idx, ga_arr.size - 1)
            hit = (ga_arr[safe] == gb_arr).astype(np.int8)
            edges = np.diff(np.concatenate(([0], hit, [0])))
            starts = np.where(edges == 1)[0]
            ends = np.where(edges == -1)[0]
            for s, e in zip(starts, ends):
                if e - s >= run_min:
                    covered[s:e - 1 + k] = True
        n_rm = int(covered.sum())
        cleaned = (
            "".join(np.array(list(text))[~covered]) if n_rm else text
        )
        return pd.DataFrame(
            {"id_b": [pdf["id_b"].iloc[0]], "_cleaned": [cleaned],
             "_nrm": [n_rm]}
        )

    id_type = df.schema[id_col].dataType.simpleString()
    res = j.groupBy("id_b").applyInPandas(
        _clean, schema=f"id_b {id_type}, _cleaned string, _nrm int"
    )
    return (
        df.join(res, df[id_col] == res["id_b"], "left")
        .withColumn(
            "text_clean", F.coalesce(F.col("_cleaned"), F.col(text_col))
        )
        .withColumn("n_removed", F.coalesce(F.col("_nrm"), F.lit(0)))
        .drop("id_b", "_cleaned", "_nrm")
    )


def winnow_pairs(
    df: DataFrame, id_col: str, text_col: str,
    k: int = DEFAULT_K, w: int = DEFAULT_W,
    min_shared: int = 1, *, fast: bool = True,
    max_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, n_shared) — document pairs sharing >= min_shared
    winnowing fingerprints, i.e. pairs with verbatim spans of length
    >= w + k - 1 chars in common. Join is per-fingerprint bucket (the
    MinHash-band shape): no all-pairs path exists.

    ``max_df`` caps the document frequency of a fingerprint before the
    self-join: a license header / boilerplate span present in F
    documents would otherwise emit F^2/2 candidate pairs from ONE hot
    key — quadratic blowup at web scale. Fingerprints past the cap
    carry no dedup information (they identify boilerplate, not copied
    documents), so dropping them bounds per-key join work at
    max_df^2/2 without hurting recall on genuinely copied spans (such
    spans also share their non-boilerplate fingerprints). The filter is
    a count window over the join key itself, so it rides the join's own
    fp exchange — no extra shuffle (plan-pinned). Default None keeps
    exact semantics for the oracle parity check."""
    from pyspark.sql import Window

    fp = winnow_fingerprints(df, id_col, text_col, k, w, fast=fast)
    if max_df is not None:
        fp = (
            fp.withColumn(
                "_df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
            )
            .filter(F.col("_df") <= max_df)
            .drop("_df")
        )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, "fp")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
