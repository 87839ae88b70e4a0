"""JSON-Schema rule engine over dynamic JSON payloads (SURVEY.md §2.7).

Reimplements the reference's per-record validation
(``/root/reference/scripts/metricModules.py:104-169`` — fastjsonschema /
Draft7 ``iter_errors`` + regex error classification V2) as native Column
predicates over Spark 4 VARIANT — no per-row Python, no string-matching
on error messages; every rule is first-class.

Semantics preserved exactly (and their quirks):

  * **type error**: declared property present whose JSON type does not
    match, **including JSON null** (the reference's Surat "format"
    errors are all nulls in typed fields — Q6).
  * **unknown attribute** (``additionalProperties=False``): flagged 0/1
    per record (A13, ``:129-137``).
  * **required error count**: counts EVERY absent required key — a
    per-error count, unlike the per-record err count (A13 ``:139-144``).
  * **missing count** (completeness, A14 ``:151-169``): required keys
    absent **or JSON-null** (V3).
  * **F1 (format) = 1 - (err - add - req)/n can exceed 1** (Q7): the
    unit-inconsistent subtraction is reproduced as-is.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# declared JSON-Schema type -> accepted schema_of_variant prefixes
_TYPE_ACCEPT: dict[str, tuple[str, ...]] = {
    "number": ("BIGINT", "DOUBLE", "DECIMAL", "INT", "SMALLINT", "TINYINT", "FLOAT"),
    "integer": ("BIGINT", "INT", "SMALLINT", "TINYINT"),
    "string": ("STRING",),
    "boolean": ("BOOLEAN",),
    "object": ("OBJECT", "STRUCT"),
    "array": ("ARRAY",),
}


@dataclass(frozen=True)
class JsonSchema:
    """The subset of JSON Schema the reference uses (SURVEY.md §1.1):
    ``properties`` types, ``required``, ``additionalProperties``."""

    properties: dict[str, str]  # name -> declared type
    required: tuple[str, ...] = ()
    additional_properties: bool = True

    @staticmethod
    def from_dict(d: dict) -> "JsonSchema":
        return JsonSchema(
            properties={
                k: v.get("type", "string") for k, v in d.get("properties", {}).items()
            },
            required=tuple(d.get("required", ())),
            additional_properties=bool(d.get("additionalProperties", True)),
        )


def _type_ok(v: Column, key: str, declared: str) -> Column:
    got = F.schema_of_variant(F.variant_get(v, f"$.{key}", "variant"))
    accept = _TYPE_ACCEPT.get(declared, ("STRING",))
    cond = F.lit(False)
    for p in accept:
        cond = cond | got.startswith(p)
    return cond


def validate(df: DataFrame, json_col: str, schema: JsonSchema) -> DataFrame:
    """Adds per-record validation columns:

    ``v_type_err_cnt`` (declared-present-but-wrong-type, null counts),
    ``v_add_err`` (any unknown key, 0/1), ``v_req_err_cnt`` (absent
    required keys, per-error), ``v_missing_cnt`` (absent-or-null required
    keys), ``v_err_any`` (record has any violation).
    """
    v = F.try_parse_json(F.col(json_col))
    keys = F.json_object_keys(F.col(json_col))
    declared = list(schema.properties)

    present = {k: F.array_contains(keys, k) for k in declared}
    is_null = {
        k: F.is_variant_null(F.variant_get(v, f"$.{k}", "variant")) for k in declared
    }
    type_err = [
        F.when(
            present[k] & (is_null[k] | ~_type_ok(v, k, t)), F.lit(1)
        ).otherwise(F.lit(0))
        for k, t in schema.properties.items()
    ]
    type_err_cnt = sum(type_err[1:], type_err[0]) if type_err else F.lit(0)

    if schema.additional_properties:
        add_err = F.lit(0)
    else:
        unknown = F.array_except(keys, F.array(*[F.lit(k) for k in declared]))
        add_err = F.when(F.size(unknown) > 0, F.lit(1)).otherwise(F.lit(0))

    req_absent = [
        F.when(~present[k], F.lit(1)).otherwise(F.lit(0))
        for k in schema.required
        if k in present
    ] + [F.lit(1) for k in schema.required if k not in schema.properties]
    req_err_cnt = sum(req_absent[1:], req_absent[0]) if req_absent else F.lit(0)

    missing = [
        F.when(~present[k] | is_null[k], F.lit(1)).otherwise(F.lit(0))
        for k in schema.required
        if k in present
    ] + [F.lit(1) for k in schema.required if k not in schema.properties]
    missing_cnt = sum(missing[1:], missing[0]) if missing else F.lit(0)

    bad_json = F.col(json_col).isNotNull() & v.isNull()
    return (
        df.withColumn("v_type_err_cnt", F.when(bad_json, F.lit(1)).otherwise(type_err_cnt))
        .withColumn("v_add_err", add_err)
        .withColumn("v_req_err_cnt", req_err_cnt)
        .withColumn("v_missing_cnt", missing_cnt)
        .withColumn(
            "v_err_any",
            (
                (F.col("v_type_err_cnt") > 0)
                | (F.col("v_add_err") > 0)
                | (F.col("v_req_err_cnt") > 0)
            ).cast("int"),
        )
    )


def schema_metrics(df: DataFrame, json_col: str, schema: JsonSchema) -> DataFrame:
    """One-row metrics frame: the reference's F1/F2/F3 score formulas
    (``DQReportGenerator.py:65,86,109``), Q7 included (F1 may exceed 1)."""
    d = validate(df, json_col, schema)
    n = F.count(F.lit(1))
    err = F.sum("v_err_any")
    add = F.sum("v_add_err")
    req = F.sum("v_req_err_cnt")
    miss = F.sum("v_missing_cnt")
    n_req = max(len(schema.required), 1)
    return d.agg(
        err.cast("long").alias("err_count"),
        add.cast("long").alias("add_err_count"),
        req.cast("long").alias("req_err_cnt"),
        miss.cast("long").alias("missing_cnt"),
        F.round(F.lit(1.0) - (err - add - req) / n, 6).alias("format_score"),
        F.round(F.lit(1.0) - add / n, 6).alias("unknown_score"),
        F.round(F.lit(1.0) - miss / (n * n_req), 6).alias("completeness_score"),
    )
