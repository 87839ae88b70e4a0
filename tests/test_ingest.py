"""S1 JSON ingest: array-file scan + json_normalize-style flattening."""

from __future__ import annotations

import json

from data_quality_assessment_spark.sources.ingest import (
    flatten_structs,
    read_packets_json,
)

PACKETS = [
    {
        "trip_id": "t1",
        "observationDateTime": "2022-01-01T10:10:35+05:30",
        "speed": 42.5,
        "location": {"type": "Point", "coordinates": [72.8, 21.2]},
        "last_stop_arrival_time": None,
    },
    {
        "trip_id": "t2",
        "observationDateTime": "2022-01-01T10:11:05+05:30",
        "speed": 17,
        "location": {"type": "Point", "coordinates": [72.9, 21.3]},
        "last_stop_arrival_time": "10:05",
    },
]


def test_read_json_array_and_flatten(spark, tmp_path):
    p = str(tmp_path / "packets.json")
    with open(p, "w") as f:
        json.dump(PACKETS, f)
    df = read_packets_json(spark, p)
    assert "location.type" in df.columns
    assert "location.coordinates" in df.columns
    assert "location" not in df.columns
    rows = {r["trip_id"]: r for r in df.collect()}
    assert rows["t1"]["location.type"] == "Point"
    assert list(rows["t1"]["location.coordinates"]) == [72.8, 21.2]
    assert rows["t1"]["last_stop_arrival_time"] is None


def test_flatten_nested_two_levels(spark):
    df = spark.createDataFrame(
        [(1, ((2, "x"), 3))],
        "id int, a struct<b: struct<c: int, d: string>, e: int>",
    )
    out = flatten_structs(df)
    assert set(out.columns) == {"id", "a.b.c", "a.b.d", "a.e"}
    r = out.collect()[0]
    assert (r["a.b.c"], r["a.b.d"], r["a.e"]) == (2, "x", 3)
