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
