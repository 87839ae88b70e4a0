"""Skew handling for hot keys (north_star: "salting for skewed hosts").

Where skew actually bites in this engine, and the countermeasure used:

  * **hash aggregations** (``groupBy(host).agg``): Spark's partial
    (map-side) aggregation already collapses a hot host to one row per
    map task before the shuffle — no salting needed; verified in plans
    as ``HashAggregate(Partial) -> Exchange -> HashAggregate(Final)``.
  * **window dedup** (``row_number over (partition by keys)``): Spark 4
    inserts ``WindowGroupLimit(Partial)`` before the exchange for
    rank<=k filters, pre-pruning hot groups map-side.
  * **sort-merge joins**: AQE ``skewJoin`` splits oversized partitions
    at runtime (enabled in session.py).
  * **the residual case** — an aggregation whose per-group state is NOT
    map-side-collapsible (exact distinct counts, collect-style state) on
    a hot key — needs explicit two-stage salting. That is what this
    module provides.

``salted_distinct_count`` is the canonical shape: stage 1 aggregates on
(key, salt) — the hot key's rows spread over ``buckets`` reducers —
stage 2 merges the per-salt partials on the now-tiny keyspace.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_of(row_key: Column, buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from any row-unique column."""
    return F.pmod(F.xxhash64(row_key), F.lit(buckets)).cast("int")


def salted_distinct_count(
    df: DataFrame,
    group_key: str,
    value_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Exact count(distinct value) per group, skew-safe.

    A plain ``groupBy(key).agg(countDistinct(v))`` expands (no map-side
    collapse: the distinct set must survive to the reducer), so one hot
    key overloads one task. Two salted stages bound any task's input to
    ~|hot key| / buckets rows.
    """
    stage1 = (
        df.withColumn("_salt", salt_of(F.col(value_col), buckets))
        .groupBy(group_key, "_salt")
        .agg(F.count_distinct(value_col).alias("_partial"))
    )
    # distinct values are routed to salts by their own hash, so per-salt
    # distinct sets are disjoint: the final distinct count is the sum
    return stage1.groupBy(group_key).agg(
        F.sum("_partial").cast("long").alias("n_distinct")
    )


def hot_keys(
    df: DataFrame, key: str, threshold: int
) -> DataFrame:
    """Keys whose row count exceeds ``threshold`` (one cheap pre-pass;
    partial agg makes it skew-safe by construction)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
    )


def salted_repartition(
    df: DataFrame, key: str, num_partitions: int, buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Repartition by (key, salt) so a hot key's rows spread over
    ``buckets`` partitions instead of one — the explicit form of the
    north_star's "repartition by url-hash with salting for skewed
    hosts" for downstream per-partition work that groups by key.

    The salt MUST be deterministic row content, never
    ``monotonically_increasing_id``/``rand``: on a stage retry after a
    fetch failure the recomputed nondeterministic mapping differs and
    rows are duplicated or lost (the SPARK-23207 class of bug) —
    precisely at the cluster scale this utility targets. Default salt:
    hash of ALL the row's columns (``salt_cols`` narrows it when the
    caller knows a cheaper row-unique subset)."""
    cols = salt_cols if salt_cols is not None else df.columns
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)).cast("int")
    return df.repartition(num_partitions, F.col(key), salt)
