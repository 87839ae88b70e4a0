"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension (no reference analog — the reference
has no vector data). Two paths:

  * ``cosine_topk`` — exact brute force: broadcast the query set,
    all math in codegen (``zip_with`` + ``aggregate``), one pass over
    the corpus, top-k via window rank. The baseline and the rerank
    kernel.
  * ``lsh_topk`` — random-hyperplane LSH: sign-bit signature per
    vector (deterministic hyperplanes derived from the cross-engine
    md5 hash — no model state to broadcast), bucket equi-join between
    query and corpus signatures, exact cosine rerank inside buckets.
    At 10^12 rows the bucket join shuffles only (sig, id, vec) pairs
    and AQE handles bucket skew; brute force would be a full cross
    product and is intentionally impossible.

Hyperplane determinism: component j,i = (h64(f"hp:{j}:{i}") % 2001 -
1000)/1000 in [-1, 1] — reproducible in any engine, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _h64


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    a, b = _to_double(a), _to_double(b)
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k per query: (q_id, vec_id, cos, rank). Queries are
    broadcast — the corpus side never shuffles."""
    j = corpus.crossJoin(F.broadcast(queries))
    scored = j.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos"),
    ).filter(F.col(q_id_col) != F.col(id_col))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup: (id_a, id_b, cos) for pairs within a
    block with cosine >= threshold. Blocking (a cluster id, an LSH
    bucket, a host) keeps the self-join linear-ish — an unblocked
    pairwise pass at 10^12 rows is intentionally impossible; compose
    with lsh_signature for the open-domain case."""
    side = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col),
        _to_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_n", _norm(F.col("_v")))
    a, b = side.alias("a"), side.alias("b")
    cos = _dot(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n"))
    return (
        a.join(b, F.col("a._blk") == F.col("b._blk"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cos, 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def hyperplane(j: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane j as an array Column."""
    return F.array(*[
        (
            F.pmod(_h64(F.lit(f"hp:{j}:{i}")), F.lit(2001)) - F.lit(1000)
        ).cast("double") / F.lit(1000.0)
        for i in range(dim)
    ])


def lsh_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Sign-bit signature: bit j = 1 iff dot(vec, plane_j) > 0."""
    v = _to_double(vec)
    acc = F.lit(0).cast("long")
    for j in range(n_planes):
        acc = acc + F.when(
            _dot(v, hyperplane(j, dim)) > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0))
    return acc


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: same-signature bucket join + exact rerank.

    Recall comes from bucket width (fewer planes = bigger buckets =
    better recall, more rerank work); multi-probe (flip one bit) is the
    standard extension — implemented here as probing the exact bucket
    plus all 1-bit neighbors of the query signature.
    """
    c = corpus.withColumn("sig", lsh_signature(F.col(vec_col), dim, n_planes))
    probes = F.array(
        F.col("q_sig"),
        *[
            F.col("q_sig").bitwiseXOR(F.lit(1 << j).cast("long"))
            for j in range(n_planes)
        ],
    )
    q = (
        queries.withColumn(
            "q_sig", lsh_signature(F.col(q_vec_col), dim, n_planes)
        )
        .withColumn("sig", F.explode(probes))
        .drop("q_sig")
    )
    j = c.join(q, "sig")
    scored = j.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos"),
    ).filter(F.col(q_id_col) != F.col(id_col)).dropDuplicates(
        [q_id_col, id_col]
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
