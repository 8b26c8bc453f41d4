#!/usr/bin/env python
"""spark-submit entry point for the streaming CPG scan job (docs/DEPLOY.md).

    spark-submit --py-files joern_spark.zip jobs/run_stream.py \
        --pages <pages-dir-or-table> --out <out-dir> --checkpoint <cp-dir> \
        [--available-now]

Runs: pages stream → watermark → dedup → CPG scan → windowed counts →
exactly-once sink; resumable from --checkpoint.
"""

from __future__ import annotations

import argparse

from joern_spark.session import get_spark
from joern_spark.streaming.job import run_stream


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet dir / table path")
    ap.add_argument("--out", required=True, help="sink output dir")
    ap.add_argument("--checkpoint", required=True, help="checkpoint dir")
    ap.add_argument("--available-now", action="store_true",
                    help="drain available input then stop (backfill mode)")
    args = ap.parse_args()

    spark = get_spark(app_name="joern-spark-stream", master=None)
    q = run_stream(spark, args.pages, args.out, args.checkpoint,
                   available_now=args.available_now)
    q.awaitTermination()


if __name__ == "__main__":
    main()
