"""Gopher-style repetition operators: hand-computed fractions, edge
cases, and determinism of the smallest-tie top-ngram pick."""

from __future__ import annotations

import pytest

from data_quality_assessment_spark.operators import repetition


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 0: "ab" x3 + "wxyz" x1: dup chars = 2*2, total = 3*2+4
        (0, "ab\nab\nab\nwxyz"),
        # doc 1: no duplicate lines
        (1, "one\ntwo\nthree"),
        # doc 2: empty
        (2, ""),
        (3, None),
        # doc 4: blank/whitespace lines are stripped before counting
        (4, "  x  \n\n   \nx"),
        # doc 5: trigram "a b c" twice; tokens: a b c a b c d
        (5, "a b c a b c d"),
        # doc 6: tie between two trigrams -> smallest string wins
        (6, "z y x q p o"),
        # doc 7: fewer than 3 words
        (7, "just two"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_line_char_frac(docs):
    got = {
        r.doc_id: r.dup_line_char_frac
        for r in repetition.dup_line_char_frac(docs).collect()
    }
    assert got[0] == pytest.approx(4 / 10)  # (3-1)*2 / (3*2 + 4)
    assert got[1] == 0.0
    assert got[2] == 0.0
    assert got[3] == 0.0
    assert got[4] == pytest.approx(1 / 2)  # "x" twice after stripping
    assert len(got) == 8  # every input doc has a row


def test_top_ngram_char_frac(docs):
    got = {
        r.doc_id: (r.top_ngram, r.top_ngram_char_frac)
        for r in repetition.top_ngram_char_frac(docs, 3).collect()
    }
    # doc 5: "a b c" twice, 3 token chars, total token chars = 7
    assert got[5] == ("a b c", pytest.approx(6 / 7))
    # doc 6: all trigrams occur once; tie -> smallest string "p o"? no:
    # trigrams of [z y x q p o] are "z y x","y x q","x q p","q p o";
    # smallest = "q p o"; frac = 1*3/6
    assert got[6] == ("q p o", pytest.approx(3 / 6))
    assert got[7] == (None, 0.0)
    assert got[2] == (None, 0.0)
    assert got[3] == (None, 0.0)


def test_plan_is_partial_agg_no_window(spark, docs):
    """Scale shape: aggregation-only plans — no Window operator, no
    global sort; partial (map-side) HashAggregate present."""
    plan = repetition.dup_line_char_frac(docs)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "Window" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan, plan


def test_dup_paragraph_char_frac(spark):
    rows = [
        (1, "para one\n\npara two\n\n\npara one"),     # dup: 8/24
        (2, "only\n\nunique\n\nparagraphs here"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.dup_paragraph_char_frac
           for r in repetition.dup_paragraph_char_frac(df).collect()}
    assert got[1] == round(8 / 24, 6)
    assert got[2] == 0.0 and got[3] == 0.0


def test_dup_ngram_char_frac_coverage(spark):
    """Hand-computed Gopher 5-gram coverage incl. the overlap case
    (each char counted once however many duplicated grams cover it)."""
    rows = [
        # "a b c d e" twice: covers chars [0,5) and [6,11) of 12 -> 10/12
        (1, "a b c d e x a b c d e y"),
        # fully self-overlapping duplicated grams -> whole doc covered
        (2, "a b a b a b a b"),
        (3, "no repeated five grams in this short sentence at all"),
        (4, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.dup_ngram_char_frac
           for r in repetition.dup_ngram_char_frac(df, 5).collect()}
    assert got[1] == round(10 / 12, 6)
    assert got[2] == 1.0
    assert got[3] == 0.0
    assert got[4] == 0.0
