"""spark-submit entrypoint for corpus-level dedup — the LLM-training-data
composition the candidate-pair operators feed:

    scan docs → [optional] benchmark DECONTAMINATION (drop docs sharing
                any word 13-gram with the eval corpus — --benchmark)
              → MinHash-LSH near-dup clusters (keep one winner per
                cluster, drop the rest)
              → winnowing exact-substring removal over the survivors
                (excise >= min_len verbatim spans from lower-priority
                docs — boilerplate/licenses/syndicated paragraphs)
              → cleaned parquet + one-row metrics

    spark-submit --py-files dq.zip jobs/run_dedup.py \
        --input  /path/to/documents_parquet \
        --output /path/to/out_dir \
        [--id-col doc_id] [--text-col text] [--min-jaccard 0.6] \
        [--min-len 30] [--checkpoint-dir hdfs://...] [--master ...]

Every stage is candidate-bounded (band/bucket joins — no all-pairs
path); pass --checkpoint-dir on a real cluster so the connected-
components loop survives executor loss (reliable checkpoint() instead
of localCheckpoint).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-jaccard", type=float, default=0.6)
    p.add_argument("--min-len", type=int, default=30)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument(
        "--max-df", type=int, default=None,
        help="drop MinHash bands / winnowing fingerprints shared by "
        "more than this many docs before the candidate self-join "
        "(bounds the quadratic blowup of viral boilerplate; see "
        "operators/winnow.winnow_pairs)",
    )
    p.add_argument(
        "--max-partners", type=int, default=None,
        help="cap partners per doc in exact-substring removal (top-N "
        "by shared fingerprints) so one doc paired against thousands "
        "cannot OOM its excision task",
    )
    p.add_argument(
        "--benchmark", default=None,
        help="optional parquet of eval/benchmark docs (text column): "
        "training docs sharing any word 13-gram with it are DROPPED "
        "before near-dup clustering (GPT-3/Llama decontamination)",
    )
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from data_quality_assessment_spark.session import get_spark, ship_package
    from data_quality_assessment_spark.operators.dedup import near_dup_clusters
    from data_quality_assessment_spark.operators.winnow import (
        exact_substring_removal,
    )

    spark = get_spark(app_name="dq-run-dedup", master=args.master)
    ship_package(spark)
    t0 = time.time()
    df = spark.read.parquet(args.input)
    n_in = df.count()

    n_decontaminated = 0
    if args.benchmark:
        from data_quality_assessment_spark.operators.decontaminate import (
            decontaminate,
        )

        bench = spark.read.parquet(args.benchmark)
        flags = decontaminate(df, bench, args.id_col, args.text_col)
        dirty = flags.filter(F.col("contaminated")).select(args.id_col)
        clean = df.join(dirty, args.id_col, "left_anti")
        n_clean = clean.count()
        n_decontaminated = n_in - n_clean
        df = clean

    clusters = near_dup_clusters(
        df, args.id_col, args.text_col,
        min_jaccard=args.min_jaccard, checkpoint_dir=args.checkpoint_dir,
        max_df=args.max_df,
    )
    losers = clusters.filter(~F.col("keep")).select(args.id_col)
    kept = df.join(losers, args.id_col, "left_anti")

    cleaned = exact_substring_removal(
        kept, args.id_col, args.text_col, min_len=args.min_len,
        max_df=args.max_df, max_partners=args.max_partners,
    )
    cleaned.write.mode("overwrite").parquet(args.output + "/docs_clean")

    out = spark.read.parquet(args.output + "/docs_clean")
    n_kept = out.count()
    span_stats = out.agg(
        F.sum((F.col("n_removed") > 0).cast("long")).alias("docs_excised"),
        F.sum("n_removed").alias("chars_removed"),
    ).collect()[0]
    dt = time.time() - t0
    summary = {
        "n_docs_in": n_in,
        "n_decontaminated": n_decontaminated,
        "n_near_dup_dropped": n_in - n_decontaminated - n_kept,
        "n_docs_kept": n_kept,
        "n_docs_span_excised": int(span_stats.docs_excised or 0),
        "n_chars_removed": int(span_stats.chars_removed or 0),
        "wall_sec": round(dt, 2),
        "output": args.output + "/docs_clean",
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
