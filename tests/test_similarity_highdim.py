"""High-dim vectorized similarity path: the dim-gated pandas-UDF
kernels must be BIT-IDENTICAL to the literal-expression paths (same
left-to-right fold order), and the plan must stay O(1) expression nodes
at real embedding dims (768+), where the literal plan would be 50k+
nodes and choke driver analysis."""

from __future__ import annotations

import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_assessment_spark.operators import similarity as sim

DIM = 256  # >= VEC_UDF_DIM_THRESHOLD -> auto-gates to the vectorized path


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(7)
    rows = [
        (i, [float(np.float32(x)) for x in rng.randn(DIM)])
        for i in range(48)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_gate_threshold():
    assert not sim._use_vectorized(64, None)
    assert sim._use_vectorized(sim.VEC_UDF_DIM_THRESHOLD, None)
    assert sim._use_vectorized(64, True)
    assert not sim._use_vectorized(4096, False)


def test_cosine_bit_identical(spark, vecs):
    q = vecs.limit(1).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    j = vecs.crossJoin(F.broadcast(q))
    lit = {
        r.vec_id: r.c
        for r in j.select(
            "vec_id",
            sim.cosine(
                F.col("embedding"), F.col("q_vec"), DIM, vectorized=False
            ).alias("c"),
        ).collect()
    }
    vec = {
        r.vec_id: r.c
        for r in j.select(
            "vec_id",
            sim.cosine(F.col("embedding"), F.col("q_vec"), DIM).alias("c"),
        ).collect()
    }
    assert lit == vec  # exact float equality, not approx


def test_lsh_signature_bit_identical(spark, vecs):
    lit = {
        r.vec_id: r.sig
        for r in sim.with_lsh_signature(
            vecs, "embedding", DIM, 16, "sig", vectorized=False
        ).collect()
    }
    vec = {
        r.vec_id: r.sig
        for r in sim.with_lsh_signature(
            vecs, "embedding", DIM, 16, "sig"
        ).collect()
    }
    assert lit == vec


def test_ivf_cell_bit_identical(spark, vecs):
    cb = sim.ivf_codebook(8, DIM)
    lit = {
        r.vec_id: r.cell
        for r in sim.with_ivf_cell(
            vecs, "embedding", cb, vectorized=False
        ).select("vec_id", "cell").collect()
    }
    vec = {
        r.vec_id: r.cell
        for r in sim.with_ivf_cell(vecs, "embedding", cb)
        .select("vec_id", "cell").collect()
    }
    assert lit == vec


def test_highdim_plan_stays_small(spark):
    """dim=1024: analysis must complete in seconds (not minutes) and the
    physical plan must contain exactly ONE ArrowEvalPython node and no
    dim-expanded expression tree (sub-linear plan growth — the r2
    VERDICT's acceptance test for this path)."""
    rng = np.random.RandomState(11)
    rows = [
        (i, [float(np.float32(x)) for x in rng.randn(1024)])
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    t0 = time.time()
    sig = sim.with_lsh_signature(df, "embedding", 1024, 16, "sig")
    plan = sig._jdf.queryExecution().executedPlan().toString()
    elapsed = time.time() - t0
    assert elapsed < 30, elapsed
    assert plan.count("ArrowEvalPython") == 1, plan
    # a literal-expansion plan at dim 1024 x 16 planes would be ~1.5 MB
    # of plan text; the vectorized plan is O(1)
    assert len(plan) < 20_000, len(plan)
    assert sig.count() == 8


def test_lsh_topk_highdim_end_to_end(spark, vecs):
    """The composed operator (bucket join + rerank) runs through the
    vectorized gate and returns well-formed ranks."""
    q = vecs.limit(2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = sim.lsh_topk(vecs, q, DIM, k=5, n_planes=8).collect()
    assert len(out) > 0
    for r in out:
        assert 1 <= r.rank <= 5
        assert -1.0001 <= r.cos <= 1.0001


def test_cosine_near_dup_pairs_highdim_bit_identical(spark, vecs):
    blocked = vecs.withColumn("blk", F.col("vec_id") % 4)
    lit = {
        (r.id_a, r.id_b): r.cos
        for r in sim.cosine_near_dup_pairs(
            blocked, "vec_id", "embedding", "blk", threshold=-1.0
        ).collect()  # dim=None -> HOF fallback path
    }
    vec = {
        (r.id_a, r.id_b): r.cos
        for r in sim.cosine_near_dup_pairs(
            blocked, "vec_id", "embedding", "blk", threshold=-1.0, dim=DIM
        ).collect()  # dim=256 -> vectorized kernel
    }
    assert lit == vec and len(lit) > 0
