"""Spark six-metric report == vendored reference oracle (quirks Q1-Q9)
on the IoT-mirror fixture (SURVEY.md §5.2: the reference's own flagship
artifact, reproduced end-to-end in Spark)."""

from __future__ import annotations

import pytest

from data_quality_assessment_spark.plans import report
from data_quality_assessment_spark.sources.fixture_gen import gen_iot
from tests.oracle import oracle_six_metrics


@pytest.fixture(scope="module", params=[7, 8, 9])
def iot(request):
    return gen_iot(400, n_entities=15, seed=request.param)


def test_six_metrics_match_oracle(spark, iot):
    want = oracle_six_metrics(iot)
    got = report.six_metric_report(
        spark.createDataFrame(iot.astype(object).where(iot.notna(), None))
    ).collect()[0]
    assert got.dupe == pytest.approx(want.dupe, abs=1e-9)
    assert got.regularity == pytest.approx(want.regularity, abs=1e-9)
    assert got.outliers == pytest.approx(want.outliers, abs=1e-9)
    assert got.format_adherence == pytest.approx(want.format_adherence, abs=1e-9)
    assert got.unknown_absence == pytest.approx(want.unknown_absence, abs=1e-9)
    assert got.completeness == pytest.approx(want.completeness, abs=1e-6)
    assert got.avg_score == pytest.approx(want.avg(), abs=2e-3)


def test_time_range(spark, iot):
    got = report.time_range(
        spark.createDataFrame(iot), "observationDateTime"
    ).collect()[0]
    assert got.t_min <= got.t_max
    assert got.from_label  # "Jan 2022"-style labels render
