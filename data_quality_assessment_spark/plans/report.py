"""The reference's flagship artifact in Spark: the six-metric quality
report over an IoT-shaped frame (entity_id, observationDateTime,
payload columns) — EP1 of SURVEY.md §3, quirks Q1-Q9 included.

Parity notes (each cites the reference line and the quirk):

  * dupe metric runs on the RAW frame (Q9, DQReportGenerator.py:157)
  * dedup THEN IAT (DQReportGenerator.py:129-131); IAT uses the GLOBAL
    lag over (entity, ts) order, crossing entity boundaries (Q1,
    PreProcessing.py:102-103) — reproduced with an unpartitioned window
    (parity mode is fixture-scale; the scale path partitions by entity
    and is validated by F1, not equality)
  * IAT >= 0 kept (zeros kept, Q2, PreProcessing.py:104)
  * mode ties -> smallest (Q3); outliers one-sided mod-z > 3.5 with the
    post-clean denominator (Q4, metricModules.py:84-88)
  * scores rounded 3dp like the reference's ``round`` calls (Q8 —
    Python banker's rounding differs from Spark HALF_UP on exact .5
    ties; IAT metrics land on .5 boundaries with probability ~0 and
    the parity test pins equality on the fixtures)
  * format/unknown/completeness per the typed-table reinterpretation
    in tests/oracle.py: format error = null in a typed required field
    (Q6 — the reference's Surat format errors are all nulls), unknown
    attribute = non-null field outside the declared set
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import cadence


def with_reference_iat(df: DataFrame, entity: str, ts: str) -> DataFrame:
    """Q1 parity: lag over the GLOBAL (entity, ts) order."""
    return cadence.with_iat(df, entity, ts, global_order=True)


def dupe_score(df: DataFrame, keys: list[str]) -> DataFrame:
    from ..operators.dedup import dup_count_metric

    return dup_count_metric(df, keys).select("dupe_score")


def six_metric_report(
    df: DataFrame,
    entity: str = "entity_id",
    ts: str = "observationDateTime",
    required: list[str] | None = None,
    known: list[str] | None = None,
) -> DataFrame:
    """One-row DataFrame with the six scores + avg (reference F1-F7).

    ``ts`` may be a string column (ISO-8601 with offset, the reference's
    wire format) or a timestamp; it is parsed with to_timestamp.
    """
    required = required or [entity, ts, "payload_str", "payload_num"]
    known = known or required
    d = df.withColumn("_ts", F.to_timestamp(F.col(ts)))

    # --- dupe (Q9: raw frame), reference rounds 3dp
    n = F.count(F.lit(1))
    dupe_df = d.groupBy(entity, "_ts").agg(F.count(F.lit(1)).alias("_c")).agg(
        F.round(
            F.lit(1.0) - (F.sum("_c") - n) / F.sum("_c"), 3
        ).alias("dupe")
    )

    # --- dedup then IAT (global order, Q1)
    w = Window.partitionBy(entity, "_ts").orderBy(F.monotonically_increasing_id())
    dd = d.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    iat = cadence.with_iat(dd, entity, "_ts", global_order=True)
    clean = iat.filter(F.col("iat").isNotNull()).select("iat")

    reg_df = cadence.regularity_score(clean, "iat").select(
        F.round("reg_score", 3).alias("regularity")
    )
    out_df = cadence.outlier_score(clean, "iat").select(
        F.round("out_score", 3).alias("outliers")
    )

    # --- schema metrics over typed columns
    req_null = [F.col(c).isNull() for c in required if c != ts]
    req_null.append(F.col("_ts").isNull())
    any_null = req_null[0]
    for c in req_null[1:]:
        any_null = any_null | c
    n_missing = sum(c.cast("long") for c in req_null)
    extras = [c for c in df.columns if c not in known]
    any_extra = (
        F.lit(False) if not extras
        else __import__("functools").reduce(
            lambda a, b: a | b, [F.col(c).isNotNull() for c in extras]
        )
    )
    schema_df = d.agg(
        F.round(F.lit(1.0) - F.sum(any_null.cast("long")) / n, 4).alias(
            "format_adherence"
        ),
        F.round(F.lit(1.0) - F.sum(any_extra.cast("long")) / n, 4).alias(
            "unknown_absence"
        ),
        F.round(
            F.lit(1.0) - F.sum(n_missing) / (n * len(required)), 6
        ).alias("completeness"),
    )

    row = (
        dupe_df.crossJoin(reg_df)
        .crossJoin(out_df)
        .crossJoin(schema_df)
    )
    avg = F.round(
        (
            F.col("dupe") + F.col("regularity") + F.col("outliers")
            + F.col("format_adherence") + F.col("unknown_absence")
            + F.col("completeness")
        ) / 6,
        3,
    )
    return row.withColumn("avg_score", avg)


def time_range(df: DataFrame, ts: str) -> DataFrame:
    """W3 (PreProcessing.py:66-82): min/max timestamp + display format."""
    t = F.to_timestamp(F.col(ts))
    return df.agg(
        F.min(t).alias("t_min"),
        F.max(t).alias("t_max"),
        F.date_format(F.min(t), "MMM yyyy").alias("from_label"),
        F.date_format(F.max(t), "MMM yyyy").alias("to_label"),
    )


def report_json(report_row: dict, path: str) -> None:
    """S5 analog: machine-readable JSON report sink."""
    import json

    with open(path, "w") as f:
        json.dump(report_row, f, indent=2, default=str)
