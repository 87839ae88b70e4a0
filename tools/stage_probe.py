"""Stage-level 8->32 scaling decomposition of the flagship pipeline.

Times cumulative plan prefixes at local[8] and local[32] (interleaved,
min-of-N) so we can see WHICH stage loses efficiency:

  scan      : read parquet -> write url,warc_ts projection
  dedup     : + row_number dedup window (the one shuffle)
  enrich    : + the fused ArrowEvalPython UDF
  stats     : + native-Column textstats (regexp codegen)
  full      : + verdict + full pages_out write

Usage: python tools/stage_probe.py [n_docs] [trials]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402


def _variants():
    from data_quality_assessment_spark.config import DEFAULT_CONFIG
    from data_quality_assessment_spark.plans import pipeline as P

    cfg = DEFAULT_CONFIG

    def scan(df):
        return df.select("url", "warc_ts")

    def dedup(df):
        return P.dedup_pages(df, cfg.dedup_keys).select("url", "warc_ts")

    def enrich(df):
        from data_quality_assessment_spark.functions.udfs import enrich_udf

        d = P.dedup_pages(df, cfg.dedup_keys)
        ann = enrich_udf(F.col("html"), F.col("text"))
        return d.withColumn("_ann", ann).select("url", "warc_ts", "_ann.*")

    def stats(df):
        d = P.annotate(P.dedup_pages(df, cfg.dedup_keys))
        return d.drop("html", "text")

    def full(df):
        return P.pages_out(P.run_pipeline(df, cfg))

    return [("scan", scan), ("dedup", dedup), ("enrich", enrich),
            ("stats", stats), ("full", full)]


def run_once(cores: int, corpus: str, out: str) -> dict[str, float]:
    from data_quality_assessment_spark.session import get_spark

    spark = get_spark(f"probe-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=max(32, cores))
    res = {}
    try:
        df = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
        # warmup: full plan once on a slice
        from data_quality_assessment_spark.config import DEFAULT_CONFIG
        from data_quality_assessment_spark.plans import pipeline as P

        P.pages_out(P.run_pipeline(df.limit(2000).repartition(2 * cores),
                                   DEFAULT_CONFIG)).write.mode("overwrite").parquet(out)
        for name, fn in _variants():
            t0 = time.time()
            fn(df).write.mode("overwrite").parquet(out)
            res[name] = time.time() - t0
    finally:
        spark.stop()
        shutil.rmtree(out, ignore_errors=True)
    return res


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    os.environ["SPARK_GRAFT_BENCH_DOCS"] = str(n_docs)
    import bench

    corpus = bench.ensure_corpus()
    out = os.path.join(os.path.dirname(corpus), "_probe_out")
    best: dict[str, dict[str, float]] = {"8": {}, "32": {}}
    for _ in range(trials):
        for cores in (32, 8):
            r = run_once(cores, corpus, out)
            b = best[str(cores)]
            for k, v in r.items():
                b[k] = min(b.get(k, float("inf")), v)
    report = {}
    prev8 = prev32 = 0.0
    for name, _ in _variants():
        t8, t32 = best["8"][name], best["32"][name]
        d8, d32 = t8 - prev8, t32 - prev32
        report[name] = {
            "t8": round(t8, 2), "t32": round(t32, 2),
            "cum_eff": round(t8 / t32 / 4, 3),
            "delta8": round(d8, 2), "delta32": round(d32, 2),
            "delta_eff": round(d8 / d32 / 4, 3) if d32 > 0.05 else None,
        }
        prev8, prev32 = t8, t32
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
