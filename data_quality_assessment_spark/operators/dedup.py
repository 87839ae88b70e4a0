"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Exact dedup and the duplicate-count metric reimagine the reference's D1-D3
(``/root/reference/scripts/metricModules.py:95-99``,
``scripts/PreProcessing.py:85-94,217-224`` — SURVEY.md §2.3); the near-dup
family is the web-scale extension (training-data pipeline requirement).

Hashing convention: every hash is ``int64('0x' + md5(payload)[:15])`` —
computable identically in Spark (``conv(substr(md5(x),1,15),16,10)``) and
DuckDB (``('0x' || substr(md5(x),1,15))::BIGINT``), so every operator here
has an exact SQL oracle. xxhash64 would be ~3x faster but is not
reproducible outside Spark; swap ``_h64`` for ``F.xxhash64`` in production.

Scale notes: MinHash signatures/bands are computed per-row inside
whole-stage codegen (no UDF, no explode of shingles); the only shuffle is
the band-key self-join, which AQE handles (skewed bands = near-identical
boilerplate clusters; the band key is already high-cardinality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textstats as ts

# LSH geometry: 16 hashes, 8 bands of 2 → catches Jaccard >~0.6 pairs w.h.p.
N_HASHES = 16
BAND_SIZE = 2
N_BANDS = N_HASHES // BAND_SIZE
SHINGLE_K = 3
SIMHASH_BITS = 32
SIMHASH_CHUNKS = 4


def _h64(payload: Column) -> Column:
    """Cross-engine deterministic 60-bit hash (see module docstring)."""
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# exact dedup + duplicate metric (reference D1/D2)
# ---------------------------------------------------------------------------


def dup_count_metric(df: DataFrame, keys: list[str]) -> DataFrame:
    """D1: one row (n_total, n_dupes, dupe_score). Reference counts
    ``len(df) - len(drop_duplicates(keys))`` on the RAW frame (Q9) and
    rounds to 3dp; here one groupBy shuffle instead of a full sort."""
    g = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_c"))
    return g.agg(
        F.sum("_c").cast("long").alias("n_total"),
        (F.sum("_c") - F.count(F.lit(1))).cast("long").alias("n_dupes"),
        F.round(F.lit(1.0) - (F.sum("_c") - F.count(F.lit(1))) / F.sum("_c"), 3).alias("dupe_score"),
    )


def dedup_exact(df: DataFrame, keys: list[str], tiebreak: Column) -> DataFrame:
    """D2 with a deterministic winner (reference keeps first-in-file-order,
    which is nondeterministic under distribution — SURVEY.md §2.3)."""
    w = Window.partitionBy(*keys).orderBy(tiebreak)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def entity_dup_counts(df: DataFrame, entity: str, keys: list[str]) -> DataFrame:
    """D3: per-entity packet counts before vs after dedup; entities whose
    counts differ (reference drops equal ones,
    ``scripts/PreProcessing.py:217-224``)."""
    pre = df.groupBy(entity).agg(F.count(F.lit(1)).alias("n_pre"))
    post = (
        df.dropDuplicates(keys)
        .groupBy(entity)
        .agg(F.count(F.lit(1)).alias("n_post"))
    )
    return (
        pre.join(post, entity)
        .filter(F.col("n_pre") != F.col("n_post"))
        .orderBy(entity)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def _shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Word k-shingles (joined by single spaces); whole doc if < k words."""
    ws = ts.words(text)
    n = F.size(ws)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(ws, i, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", ws)))


def minhash_signature(text: Column, n_hashes: int = N_HASHES) -> Column:
    """Array of n_hashes min-hashes over the shingle set — all codegen."""
    sh = _shingles(text)
    return F.array(*[
        F.array_min(
            F.transform(sh, lambda s: _h64(F.concat(s, F.lit(f"#{i}"))))
        )
        for i in range(n_hashes)
    ])


def minhash_bands(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, band_idx, band_key) — one row per band per doc."""
    sig = minhash_signature(F.col(text_col))
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                ":", *[sig[b * BAND_SIZE + j].cast("string") for j in range(BAND_SIZE)]
            ).alias("band_key"),
        )
        for b in range(N_BANDS)
    ])
    return df.select(F.col(id_col), F.explode(bands).alias("b")).select(
        id_col, "b.band_idx", "b.band_key"
    )


def minhash_candidates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct candidate near-dup pairs (id_a < id_b) sharing any band."""
    b = minhash_bands(df, id_col, text_col)
    a = b.alias("a")
    c = b.alias("c")
    return (
        a.join(c, ["band_idx", "band_key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"c.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"c.{id_col}").alias("id_b"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """Per-doc SimHash over word hashes (one occurrence = one vote).

    One hash per word, then ``bits`` cheap array passes for the bit votes —
    no explode, no shuffle; stays in codegen.
    """
    hashes = F.transform(ts.words(text), lambda w: _h64(w))
    acc = F.lit(0).cast("long")
    for j in range(bits):
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda a, h, j=j: a + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1),
        )
        acc = acc + F.when(vote > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0))
    return acc


def simhash_chunks(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash, chunk_idx, chunk_val) — hamming<=chunks-1 candidates
    share at least one chunk (pigeonhole)."""
    d = df.select(id_col, simhash(F.col(text_col)).alias("simhash"))
    width = SIMHASH_BITS // SIMHASH_CHUNKS
    chunks = F.array(*[
        F.struct(
            F.lit(i).alias("chunk_idx"),
            F.shiftright(F.col("simhash"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("chunk_val"),
        )
        for i in range(SIMHASH_CHUNKS)
    ])
    return d.select(id_col, "simhash", F.explode(chunks).alias("c")).select(
        id_col, "simhash", "c.chunk_idx", "c.chunk_val"
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (verification pass for candidates; exact, blocked)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    k: int = SHINGLE_K,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact Jaccard over distinct word k-shingles for all pairs within a
    block (e.g. same source/host, or an LSH band key). Returns
    (id_a, id_b, jaccard). The block keeps the self-join linear-ish; a
    global pairwise Jaccard at 10^12 docs is intentionally impossible."""
    sh = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col),
        F.array_distinct(_shingles(F.col(text_col), k)).alias("_sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a._sh"), F.col("b._sh")))
    union = F.size(F.array_union(F.col("a._sh"), F.col("b._sh")))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        a.join(b, F.col("a._blk") == F.col("b._blk"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
