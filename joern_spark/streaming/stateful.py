"""Custom stateful streaming operators (north_star: "state (open windows,
partial CPG fragments, dedup keys) lives in the RocksDB state store" +
"stateful stream-stream joins keyed on (url, node_id)").

- `domain_running_stats`: an `applyInPandasWithState` operator keeping
  per-domain running aggregates (pages seen, matches, last event time) in
  the state store — the "partial fragments" pattern: only small per-key
  summaries are stateful, heavy CPG work stays in the stateless batch part.
- `join_pages_with_meta`: watermarked stream-stream inner join of the
  pages stream with a late-arriving metadata stream on url within a
  bounded event-time range — the late-WARC-record join of the north_star.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

STATS_OUTPUT = StructType([
    StructField("domain", StringType()),
    StructField("n_pages", LongType()),
    StructField("last_ts", TimestampType()),
])
STATS_STATE = StructType([
    StructField("n_pages", LongType()),
    StructField("last_ts_us", LongType()),
])


def _update_domain_stats(key: Any, pdfs: Iterator[pd.DataFrame],
                         state: GroupState) -> Iterator[pd.DataFrame]:
    (domain,) = key
    if state.exists:
        n_pages, last_us = state.get
    else:
        n_pages, last_us = 0, 0
    for pdf in pdfs:
        n_pages += len(pdf)
        if len(pdf):
            last_us = max(last_us, int(pdf["warc_ts"].max().value // 1000))
    state.update((n_pages, last_us))
    yield pd.DataFrame({
        "domain": [domain],
        "n_pages": [n_pages],
        "last_ts": [pd.Timestamp(last_us * 1000)],
    })


def domain_running_stats(pages: DataFrame) -> DataFrame:
    """Streaming: running per-domain totals via applyInPandasWithState
    (state = one small tuple per domain, stored in RocksDB)."""
    domain = F.regexp_extract("url", r"https://([^/]+)/", 1).alias("domain")
    keyed = pages.select(domain, "warc_ts")
    return keyed.groupBy("domain").applyInPandasWithState(
        _update_domain_stats,
        outputStructType=STATS_OUTPUT,
        stateStructType=STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def join_pages_with_meta(pages: DataFrame, meta: DataFrame,
                         watermark: str = "2 hours",
                         max_lateness: str = "1 hour") -> DataFrame:
    """Watermarked stream-stream inner join on url: a metadata record may
    arrive up to `max_lateness` after its page (and vice versa within the
    watermark); join state ages out past the watermark."""
    p = pages.withWatermark("warc_ts", watermark).alias("p")
    m = meta.withWatermark("meta_ts", watermark).alias("m")
    cond = (
        (F.col("p.url") == F.col("m.url"))
        & (F.col("m.meta_ts") >= F.col("p.warc_ts") - F.expr(f"INTERVAL {max_lateness}"))
        & (F.col("m.meta_ts") <= F.col("p.warc_ts") + F.expr(f"INTERVAL {max_lateness}"))
    )
    return p.join(m, cond).select(
        F.col("p.url").alias("url"), F.col("p.warc_ts").alias("warc_ts"),
        F.col("m.fetch_status").alias("fetch_status"),
        F.col("m.meta_ts").alias("meta_ts"),
    )


def synth_meta_stream_frame(pages: DataFrame) -> DataFrame:
    """Deterministic metadata twin of a pages frame (batch or stream):
    meta_ts lags warc_ts by a url-hash-dependent delay (some 'late')."""
    delay = (F.abs(F.hash("url")) % 1800).cast("long")
    return pages.select(
        "url",
        (F.col("warc_ts") + F.make_interval(secs=delay)).alias("meta_ts"),
        F.when(F.abs(F.hash("url")) % 17 == 0, F.lit(404)).otherwise(F.lit(200))
        .alias("fetch_status"),
    )
