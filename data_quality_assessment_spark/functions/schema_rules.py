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
    ``properties`` types, ``required``, ``additionalProperties``, plus ONE
    level of nested object schemas (``nested``) — the reference's Draft7
    validator recurses into object-typed properties, and the EnvAQM golden
    report's 231 format errors are ALL nested
    (``so2.avgOverTime: null`` etc. — verified against
    ``/root/reference/schemas/schema_EnvAQM.json`` + Draft7)."""

    properties: dict[str, str]  # name -> declared type
    required: tuple[str, ...] = ()
    additional_properties: bool = True
    # object-typed property name -> its sub-schema (properties/required)
    nested: dict[str, "JsonSchema"] = field(default_factory=dict)

    @staticmethod
    def from_dict(d: dict) -> "JsonSchema":
        props = d.get("properties", {})
        return JsonSchema(
            properties={k: v.get("type", "string") for k, v in props.items()},
            required=tuple(d.get("required", ())),
            additional_properties=bool(d.get("additionalProperties", True)),
            nested={
                k: JsonSchema.from_dict(v)
                for k, v in props.items()
                if v.get("type") == "object"
                and ("properties" in v or "required" in v)
            },
        )


def _nested_type_ok(nv: Column, declared: str) -> Column:
    got = F.schema_of_variant(nv)
    accept = _TYPE_ACCEPT.get(declared, ("STRING",))
    cond = F.lit(False)
    for p in accept:
        cond = cond | got.startswith(p)
    return cond


def _type_ok(v: Column, key: str, declared: str) -> Column:
    return _nested_type_ok(F.variant_get(v, f"$.{key}", "variant"), declared)


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
    # one level of recursion into object-typed properties (Draft7 descends;
    # nested ``required``/``properties`` keywords apply only when the value
    # IS an object — a wrong-typed parent yields only the top-level error)
    nested_req = []
    for k, sub in schema.nested.items():
        k_is_obj = present[k] & ~is_null[k] & _type_ok(v, k, "object")
        for nk, nt in sub.properties.items():
            nv = F.variant_get(v, f"$.{k}.{nk}", "variant")
            # SQL NULL <=> key absent; VARIANT null <=> JSON null present
            n_present = nv.isNotNull()
            n_bad = F.is_variant_null(nv) | ~_nested_type_ok(nv, nt)
            type_err.append(
                F.when(k_is_obj & n_present & n_bad, F.lit(1)).otherwise(F.lit(0))
            )
            if nk in sub.required:
                # jsonschema emits "... is a required property" for these,
                # which the reference's suffix-match counts into
                # req_prop_err_count (metricModules.py:139-144)
                nested_req.append(
                    F.when(k_is_obj & ~n_present, F.lit(1)).otherwise(F.lit(0))
                )
    type_err_cnt = sum(type_err[1:], type_err[0]) if type_err else F.lit(0)

    if schema.additional_properties:
        add_err = F.lit(0)
    else:
        unknown = F.array_except(keys, F.array(*[F.lit(k) for k in declared]))
        add_err = F.when(F.size(unknown) > 0, F.lit(1)).otherwise(F.lit(0))

    # required keys outside ``properties`` are still checked for presence
    # against the record's actual keys (valid JSON Schema does not require
    # required ⊆ properties)
    req_absent = [
        F.when(
            ~(present[k] if k in present else F.array_contains(keys, k)),
            F.lit(1),
        ).otherwise(F.lit(0))
        for k in schema.required
    ] + nested_req
    req_err_cnt = sum(req_absent[1:], req_absent[0]) if req_absent else F.lit(0)

    def _null_of(k: str) -> Column:
        if k in is_null:
            return is_null[k]
        return F.is_variant_null(F.variant_get(v, f"$.{k}", "variant"))

    missing = [
        F.when(
            ~(present[k] if k in present else F.array_contains(keys, k))
            | _null_of(k),
            F.lit(1),
        ).otherwise(F.lit(0))
        for k in schema.required
    ]
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


def schema_metrics(
    df: DataFrame, json_col: str, schema: JsonSchema, round_dp: int | None = 6
) -> DataFrame:
    """One-row metrics frame: the reference's F1/F2/F3 score formulas
    (``DQReportGenerator.py:65,86,109``), Q7 included (F1 may exceed 1).

    ``round_dp=None`` leaves the scores unrounded — the reference's JSON
    report emits the schema scores at full float precision (Q8,
    ``DQReportGenerator.py:651,658,665``)."""
    d = validate(df, json_col, schema)
    n = F.count(F.lit(1))
    err = F.sum("v_err_any")
    add = F.sum("v_add_err")
    req = F.sum("v_req_err_cnt")
    miss = F.sum("v_missing_cnt")
    n_req = max(len(schema.required), 1)

    def _r(c: Column) -> Column:
        return F.round(c, round_dp) if round_dp is not None else c

    return d.agg(
        err.cast("long").alias("err_count"),
        add.cast("long").alias("add_err_count"),
        req.cast("long").alias("req_err_cnt"),
        miss.cast("long").alias("missing_cnt"),
        _r(F.lit(1.0) - (err - add - req) / n).alias("format_score"),
        _r(F.lit(1.0) - add / n).alias("unknown_score"),
        _r(F.lit(1.0) - miss / (n * n_req)).alias("completeness_score"),
    )
