"""Extra benchmarks (r6 optimization round) — NOT part of the driver
contract; bench.py stays the frozen measurement harness.

Decomposes the flagship pipeline per guide §1.4 (noop sink) so each
stage's cost is visible in isolation:

  * scan_only        — parquet scan of the corpus to noop
  * annotate_noop    — scan + fused ArrowEvalPython kernel to noop
  * pipeline_noop    — full pipeline (annotate + dedup + verdict) to noop
  * pipeline_parquet — full pipeline + parquet write (what bench.py times)

Usage: python bench_extra.py [corpus_dir] [cores] [docs]
Prints one JSON line with min-of-2 wall seconds per leg.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else ".bench_cache/pages_v5_1000000"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from bench import _split_bytes, ensure_warm_corpus
    from data_quality_assessment_spark.session import get_spark
    from data_quality_assessment_spark.config import DEFAULT_CONFIG
    from data_quality_assessment_spark.plans import pipeline as P
    from pyspark.sql import functions as F

    split = _split_bytes(corpus)
    spark = get_spark(
        app_name=f"bench-extra-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(64, 2 * cores),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": split,
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": split,
        },
    )
    sc = spark.sparkContext
    out_dir = "/tmp/bench_extra_out"

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def pq(df):
        df.write.mode("overwrite").parquet(out_dir)

    df = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    warm = spark.read.parquet(ensure_warm_corpus())

    legs = {
        "scan_only": lambda d: noop(d),
        "annotate_noop": lambda d: noop(
            P.annotate(d.withColumn("_tb", P.content_tiebreak()))
        ),
        "pipeline_noop": lambda d: noop(
            P.pages_out(P.run_pipeline(d, DEFAULT_CONFIG))
        ),
        "pipeline_parquet": lambda d: pq(
            P.pages_out(P.run_pipeline(d, DEFAULT_CONFIG))
        ),
    }
    results = {}
    for name, fn in legs.items():
        sc.setJobDescription(f"warm:{name}")
        fn(warm)
        best = float("inf")
        for _ in range(2):
            sc.setJobDescription(name)
            t0 = time.time()
            fn(df)
            best = min(best, time.time() - t0)
        results[name] = round(best, 2)
    sc.setJobDescription(None)
    print(json.dumps({"cores": cores, "corpus": corpus, "legs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
