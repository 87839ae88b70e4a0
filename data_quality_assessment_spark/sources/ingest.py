"""JSON ingest — the reference's whole-file scan, Spark-native (S1).

The reference loads a JSON array of sensor packets and flattens nested
objects to dotted columns via ``pd.json_normalize``
(``/root/reference/scripts/PreProcessing.py:33-36``). Spark's JSON
source infers the nested StructType directly; ``flatten_structs`` is the
``json_normalize`` analog — a pure projection (Catalyst column-prunes
it), emitting ``parent.child`` dotted names.

Scale note: ``multiLine=true`` (a JSON *array* file, the reference's
wire format) cannot be split — one task per file. Fine for config-sized
inputs; bulk data should be JSON-Lines (the default, splittable) or
parquet. Both are exposed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_structs(df: DataFrame, sep: str = ".") -> DataFrame:
    """Recursively flatten StructType columns to dotted leaf columns
    (arrays/maps left intact, as json_normalize leaves them)."""
    paths: list[str] = []

    def walk(prefix: str, dtype: T.DataType) -> None:
        if isinstance(dtype, T.StructType):
            for fld in dtype.fields:
                walk(f"{prefix}{sep}{fld.name}" if prefix else fld.name,
                     fld.dataType)
        else:
            paths.append(prefix)

    for fld in df.schema.fields:
        walk(fld.name, fld.dataType)
    # F.col("a.b") resolves nested fields (JSON-inferred names are dot-free)
    return df.select(*[F.col(p).alias(p) for p in paths])


def read_packets_json(
    spark: SparkSession, path: str, *, array_file: bool = True
) -> DataFrame:
    """Read sensor packets: a JSON-array file (reference format) or
    JSON-Lines, then flatten nested objects to dotted columns."""
    reader = spark.read.option("multiLine", "true") if array_file else spark.read
    return flatten_structs(reader.json(path))


def read_packets_raw(
    spark: SparkSession, path: str, *, array_file: bool = True
) -> DataFrame:
    """Read packets as RAW JSON strings (column ``raw``) — the input the
    schema rule engine needs, since a typed read cannot distinguish a JSON
    null from an absent key (V3, ``metricModules.py:160-165``).

    JSON-Lines (the scale path): ``spark.read.text`` — splittable, one
    record per line. JSON-array files (the reference's wire format) are
    unsplittable single-task reads anyway (S1), so they are parsed on the
    driver and re-serialized per record with ``json.dumps`` (preserves
    null-vs-absent and key order); fine at config scale, convert to
    JSONL/parquet for bulk data.
    """
    if not array_file:
        return spark.read.text(path).withColumnRenamed("value", "raw")
    import json

    with open(path) as f:
        records = json.load(f)
    return spark.createDataFrame(
        [(json.dumps(r),) for r in records], schema="raw string"
    )
