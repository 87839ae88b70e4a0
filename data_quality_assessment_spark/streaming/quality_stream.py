"""Structured Streaming surface for the quality DAG.

The reference is pure batch (SURVEY.md §2.12) and the north rule is
batch too; this module exists because the engine's stages are naturally
stream-safe — annotate/rules/scrub are stateless per-row, and the only
stateful pieces map onto standard streaming state:

  * exact dedup (D2)      -> ``dropDuplicatesWithinWatermark`` keyed on
                             (url, warc_ts): first arrival wins within
                             the watermark horizon (the batch path's
                             deterministic tiebreak needs global sight,
                             which a stream by definition lacks)
  * per-host cadence (A9) -> watermarked sliding-window counts

State sizing at scale: dedup state is keyed by (url, warc_ts) and GC'd
at the watermark, so executor state is bounded by the late-data horizon
x ingest rate, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..plans import pipeline

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def streaming_pipeline(
    stream: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    watermark: str = "1 hour",
    dedup: bool = True,
) -> DataFrame:
    """The flagship DAG over a streaming pages DataFrame."""
    if dedup:
        stream = stream.withWatermark("warc_ts", watermark)
        stream = stream.dropDuplicatesWithinWatermark(["url", "warc_ts"])
    out = pipeline.verdict(
        pipeline.scrub(pipeline.annotate(stream)), cfg
    )
    return out.select(*pipeline.OUTPUT_COLUMNS)


def host_window_counts(
    stream: DataFrame,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-host page counts over event-time windows (append-mode safe)."""
    from ..functions import textstats as ts

    s = stream.withWatermark("warc_ts", watermark)
    w = F.window("warc_ts", window, slide) if slide else F.window("warc_ts", window)
    return (
        s.withColumn("host", ts.host_of(F.col("url")))
        .groupBy(w.alias("win"), "host")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select("win.start", "win.end", "host", "n_pages")
    )


def read_pages_stream(
    spark: SparkSession, input_dir: str, max_files: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def run_stream_once(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> None:
    """Process everything currently in input_dir (availableNow trigger)
    and stop — incremental across invocations via the stream checkpoint,
    the streaming twin of plans/resumable.py."""
    out = streaming_pipeline(read_pages_stream(spark, input_dir), cfg)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
