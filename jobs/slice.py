#!/usr/bin/env python
"""joern-slice equivalent CLI (reference: joern-cli JoernSlice.scala):
data-flow or usage slices over a pages table.

    spark-submit --py-files joern_spark.zip jobs/slice.py \
        --pages <pages-parquet> --mode usages|dataflow [--out slices.jsonl]
"""

from __future__ import annotations

import argparse
import json


def main():
    from joern_spark.dataflow.slicing import data_flow_slices, usage_slices
    from joern_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--mode", default="usages", choices=["usages", "dataflow"])
    ap.add_argument("--min-num-calls", type=int, default=1)
    ap.add_argument("--exclude-operator-calls", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="joern-spark-slice")
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(args.pages)
    if args.mode == "usages":
        df = usage_slices(pages, args.min_num_calls, args.exclude_operator_calls)
        for row in df.collect():
            print(json.dumps({"url": row.url, "slice": json.loads(row.slice_json)}))
    else:
        for row in data_flow_slices(pages).collect():
            print(row)


if __name__ == "__main__":
    main()
