

def test_cosine_prenorm_matches_cosine(spark):
    """r6: hoisting the query-side norm must be bit-identical to the
    flat-codegen cosine computing both norms per row."""
    import random

    from pyspark.sql import functions as F

    from data_quality_assessment_spark.operators.similarity import (
        cosine, cosine_prenorm, vec_norm,
    )

    rnd = random.Random(5)
    dim = 16
    rows = [
        (i, [rnd.uniform(-2, 2) for _ in range(dim)]) for i in range(80)
    ]
    e = spark.createDataFrame(rows, "vec_id long, v array<double>")
    q = spark.createDataFrame(rows[:3], "qid long, qv array<double>")
    plain = (
        e.crossJoin(F.broadcast(q))
        .select("vec_id", "qid", cosine(F.col("v"), F.col("qv"), dim).alias("c"))
        .collect()
    )
    pre = (
        e.crossJoin(
            F.broadcast(q.withColumn("_qn", vec_norm(F.col("qv"), dim)))
        )
        .select(
            "vec_id", "qid",
            cosine_prenorm(F.col("v"), F.col("qv"), F.col("_qn"), dim).alias("c"),
        )
        .collect()
    )
    a = {(r.vec_id, r.qid): r.c for r in plain}
    b = {(r.vec_id, r.qid): r.c for r in pre}
    assert a == b
