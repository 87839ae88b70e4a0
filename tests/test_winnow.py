"""Winnowing fingerprints: the phase-free shared-substring guarantee
(any verbatim span >= w + k - 1 chars is detected regardless of its
offset in either document), selectivity, and edge cases."""

from __future__ import annotations

import random
import string

import pytest
from pyspark.sql import functions as F

from data_quality_assessment_spark.operators import winnow


def _rand_text(rng, n):
    return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))


def test_phase_shifted_span_detected(spark):
    """The same 40-char span planted at DIFFERENT offsets (1 and 7
    chars — every phase class mod any small stride) must connect the
    pair; strided tiling misses mismatched phases, winnowing cannot."""
    rng = random.Random(5)
    span = "this exact span is shared verbatim here!"
    assert len(span) >= winnow.DEFAULT_W + winnow.DEFAULT_K - 1
    rows = []
    did = 0
    for off_a in (0, 1, 3, 7):
        for off_b in (0, 2, 5, 11):
            a = _rand_text(rng, 60 + off_a) + span + _rand_text(rng, 50)
            b = _rand_text(rng, 60 + off_b) + span + _rand_text(rng, 50)
            rows.append((did, a))
            rows.append((did + 1, b))
            did += 2
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in winnow.winnow_pairs(df, "doc_id", "text").collect()
    }
    for i in range(0, did, 2):
        assert (i, i + 1) in pairs, f"planted pair ({i},{i+1}) missed"


def test_unrelated_docs_share_nothing(spark):
    rng = random.Random(9)
    rows = [(i, _rand_text(rng, 300)) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert winnow.winnow_pairs(df, "doc_id", "text").count() == 0


def test_short_and_null_texts(spark):
    rows = [(1, None), (2, ""), (3, "tiny"), (4, "x" * 30), (5, "x" * 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow.winnow_fingerprints(df, "doc_id", "text")
    ids = {r.doc_id for r in fp.collect()}
    assert 1 not in ids and 2 not in ids and 3 not in ids
    # identical repetitive docs still pair (one distinct fingerprint)
    pairs = winnow.winnow_pairs(df, "doc_id", "text").collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(4, 5)]


def test_density_bound(spark):
    """Fingerprint count is a small fraction of k-grams (~2/(w+1))."""
    rng = random.Random(11)
    df = spark.createDataFrame(
        [(1, _rand_text(rng, 2000))], "doc_id long, text string"
    )
    n_fp = winnow.winnow_fingerprints(df, "doc_id", "text").count()
    n_grams = 2000 - winnow.DEFAULT_K + 1
    assert n_fp <= n_grams * 3 / (winnow.DEFAULT_W + 1)


def test_fast_and_oracle_families_agree_on_pairs(spark):
    """xxhash64 and md5 families select different hashes but must find
    the same PAIR STRUCTURE on planted data."""
    rng = random.Random(3)
    span = "another long shared verbatim sentence goes right here"
    rows = [
        (0, _rand_text(rng, 80) + span + _rand_text(rng, 40)),
        (1, _rand_text(rng, 30) + span + _rand_text(rng, 90)),
        (2, _rand_text(rng, 250)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = {(r.id_a, r.id_b)
            for r in winnow.winnow_pairs(df, "doc_id", "text").collect()}
    slow = {(r.id_a, r.id_b)
            for r in winnow.winnow_pairs(df, "doc_id", "text",
                                         fast=False).collect()}
    assert (0, 1) in fast and (0, 1) in slow
    assert all(2 not in p for p in fast | slow)
