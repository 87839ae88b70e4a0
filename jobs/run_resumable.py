"""spark-submit entrypoint for the RESUMABLE flagship pipeline.

    spark-submit --py-files dq.zip jobs/run_resumable.py \
        --input  /path/to/pages_or_documents_parquet \
        --warehouse /path/to/warehouse_dir \
        [--run-id runN] [--num-parts 256] [--master local[32]]

Re-running the same command after a crash (or on new cluster capacity)
skips every partition already recorded in the checkpoint table and
writes only the pending ones — the north rule's "resumable mid-run
without recomputing completed partitions". Prints a JSON summary line.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--run-id", default="run0")
    p.add_argument("--num-parts", type=int, default=None)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from data_quality_assessment_spark.config import DEFAULT_CONFIG, PipelineConfig
    from data_quality_assessment_spark.plans import resumable
    from data_quality_assessment_spark.session import get_spark, ship_package
    from data_quality_assessment_spark.sources.warehouse import Warehouse
    from jobs.run_pipeline import map_documents_to_pages

    cfg = PipelineConfig.from_json(args.config) if args.config else DEFAULT_CONFIG
    cfg = dataclasses.replace(cfg, run_id=args.run_id)
    spark = get_spark(app_name="dq-run-resumable", master=args.master)
    ship_package(spark)
    t0 = time.time()
    df = spark.read.parquet(args.input)
    if "doc_id" in df.columns and "url" not in df.columns:
        df = map_documents_to_pages(df)
    wh = Warehouse(spark, args.warehouse)
    res = resumable.run_resumable(
        spark, df, wh, cfg, num_parts=args.num_parts
    )
    out = {
        **res,
        "wall_sec": round(time.time() - t0, 2),
        "warehouse": args.warehouse,
        "run_id": args.run_id,
    }
    if wh.exists(resumable.METRICS):
        from pyspark.sql import functions as F

        m = wh.read(resumable.METRICS).agg(
            F.sum("n_docs").alias("docs"), F.sum("n_kept").alias("kept")
        ).collect()[0]
        out["total_docs"] = m.docs
        out["total_kept"] = m.kept
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
