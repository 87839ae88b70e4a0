"""spark-submit entrypoint for the reference's six-metric quality report
(EP1, ``/root/reference/scripts/DQReportGenerator.py`` end-to-end) — the
drop-in replacement a user of the reference tool runs instead of
``python3 DQReportGenerator.py``:

    spark-submit --py-files dq.zip jobs/run_reference_report.py \
        --config /path/to/suratITMSConfig.json \
        --data-dir /path/to/data_root --schema-dir /path/to/schemas \
        [--out report.json] [--master local[8]]

``--config`` takes the reference's OWN config format verbatim
(datasetName / folderName / dataFileNameJSON / schemaFileName /
duplicateDetection.inputFields — see ``config/suratITMSConfig.json`` in
the reference repo); the emitted JSON carries the same six scores the
reference's ``outputReports/*_Report.json`` files hold, reproduced
exactly (tests/test_golden_reference.py pins equality on both shipped
golden reports).
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
    p.add_argument("--config", required=True,
                   help="reference-format dataset config JSON")
    p.add_argument("--data-dir", required=True,
                   help="directory holding <folderName>/<dataFileNameJSON>")
    p.add_argument("--schema-dir", required=True,
                   help="directory holding <schemaFileName>")
    p.add_argument("--out", default=None, help="write the report JSON here")
    p.add_argument("--artifacts-dir", default=None,
                   help="also write the PNG score chart + PDF report + "
                        "JSON here (the reference generator's full "
                        "artifact trio — plans/report_sinks.py)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    with open(args.config) as f:
        cfg = json.load(f)
    entity = cfg["duplicateDetection"]["inputFields"][0]
    ts = cfg["duplicateDetection"]["inputFields"][1]
    data_path = os.path.join(
        args.data_dir, cfg["folderName"], cfg["dataFileNameJSON"]
    )
    schema_path = os.path.join(args.schema_dir, cfg["schemaFileName"])

    from data_quality_assessment_spark.plans import report
    from data_quality_assessment_spark.session import get_spark, ship_package

    spark = get_spark("reference-report", master=args.master)
    ship_package(spark)
    t0 = time.time()
    row = report.reference_report(
        spark, data_path, schema_path, entity, ts
    ).collect()[0]
    doc = {
        "fileName": cfg.get("datasetName", cfg["dataFileNameJSON"]),
        "startTime": row.start_time,
        "endTime": row.end_time,
        "No. of data packets": row.n_packets,
        "avgDataQualityScore": row.avg_score,
        "IAT Regularity": row.regularity,
        "IATOutliers": row.outliers,
        "Absence of Duplicate Values": row.dupe,
        "Adherence to Attribute Format": row.format_adherence,
        "Absence of Unknown Attributes": row.unknown_absence,
        "Adherence to Mandatory Attributes": row.completeness,
        "wall_sec": round(time.time() - t0, 2),
    }
    if args.out:
        report.report_json(doc, args.out)
    if args.artifacts_dir:
        from data_quality_assessment_spark.plans.report_sinks import (
            reference_report_artifacts,
        )

        paths = reference_report_artifacts(row, args.artifacts_dir)
        doc["artifacts"] = paths
    print(json.dumps(doc))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
