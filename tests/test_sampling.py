"""Deterministic sampling operators (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_assessment_spark.operators import sampling as sp


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr").alias("lang"),
    )


def test_sample_fraction_deterministic_and_layout_stable(spark, docs):
    a = {r.doc_id for r in sp.sample_fraction(docs, "doc_id", 0.2, seed=5).collect()}
    b = {
        r.doc_id
        for r in sp.sample_fraction(
            docs.repartition(13).orderBy(F.desc("doc_id")), "doc_id", 0.2, seed=5
        ).collect()
    }
    assert a == b
    assert 0.15 < len(a) / 5000 < 0.25
    # different seed -> a different (roughly independent) sample
    c = {r.doc_id for r in sp.sample_fraction(docs, "doc_id", 0.2, seed=6).collect()}
    assert c != a
    # nested property: a smaller fraction with the same seed is a SUBSET
    d = {r.doc_id for r in sp.sample_fraction(docs, "doc_id", 0.1, seed=5).collect()}
    assert d <= a


def test_stratified_rates(spark, docs):
    out = sp.stratified_sample(
        docs, "doc_id", "lang", {"en": 0.9, "de": 0.1}, default_fraction=0.5,
        seed=1,
    )
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # ~1667 per stratum in the base
    assert got["en"] > 1400
    assert got["de"] < 300
    assert 600 < got["fr"] < 1100


def test_split_disjoint_exhaustive_stable(spark, docs):
    w = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    out = sp.with_split(docs, "doc_id", w, seed=3)
    rows = out.groupBy("split").agg(F.count("*").alias("n")).collect()
    got = {r.split: r.n for r in rows}
    assert sum(got.values()) == 5000  # exhaustive, disjoint by construction
    assert got["train"] > 3700 and got["val"] > 300 and got["test"] > 300
    # stability under layout
    again = {
        (r.doc_id, r.split)
        for r in sp.with_split(
            docs.repartition(7), "doc_id", w, seed=3
        ).collect()
    }
    first = {(r.doc_id, r.split) for r in out.collect()}
    assert first == again


def test_md5_family_matches_rates_and_is_deterministic(spark, docs):
    a = {r.doc_id for r in sp.sample_fraction(docs, "doc_id", 0.3, seed=2, fast=False).collect()}
    b = {r.doc_id for r in sp.sample_fraction(docs, "doc_id", 0.3, seed=2, fast=False).collect()}
    assert a == b
    assert 0.25 < len(a) / 5000 < 0.35


def test_sample_predicate_is_codegen_no_shuffle(spark, docs):
    plan = (
        sp.stratified_sample(docs, "doc_id", "lang", {"en": 0.5}, seed=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure per-row predicate
