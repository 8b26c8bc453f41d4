#!/usr/bin/env python
"""joern-scan equivalent CLI: run the query bundle over a pages table and
print the score-sorted report (or SARIF with --sarif).

    spark-submit --py-files joern_spark.zip jobs/scan.py \
        --pages <pages-parquet> [--sarif out.sarif]
"""

from __future__ import annotations

import argparse


def main():
    from joern_spark.query.scan import findings_report, findings_sarif, scan_findings
    from joern_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--sarif", help="also write a SARIF 2.1.0 file here")
    ap.add_argument("--sarif-evidence",
                    help="write evidence-grade SARIF (per-match locations "
                         "+ code flows) here")
    args = ap.parse_args()

    spark = get_spark(app_name="joern-spark-scan")
    spark.sparkContext.setLogLevel("ERROR")
    findings = scan_findings(spark.read.parquet(args.pages)).localCheckpoint()
    for row in findings_report(findings).collect():
        print(row.line)
    if args.sarif:
        with open(args.sarif, "w") as f:
            f.write(findings_sarif(findings))
    if args.sarif_evidence:
        import json

        from joern_spark.query.sarif import scan_evidence_sarif
        with open(args.sarif_evidence, "w") as f:
            json.dump(scan_evidence_sarif(
                spark.read.parquet(args.pages)), f)


if __name__ == "__main__":
    main()
