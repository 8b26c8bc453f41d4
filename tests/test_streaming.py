"""Streaming-layer tests: watermarked windowed counts, exactly-once sink,
and kill+resume-from-checkpoint reproducibility (BASELINE.md target
"identical per-window counts after kill+resume")."""

from __future__ import annotations

import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from joern_spark.streaming import job


@pytest.fixture(scope="module")
def corpus_dir(spark):
    d = tempfile.mkdtemp(prefix="pages_")
    job.write_corpus_chunks(spark, d, n_docs=48, n_chunks=4)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_to_completion(spark, corpus_dir, out_dir, cp_dir):
    q = job.run_stream(spark, corpus_dir, out_dir, cp_dir, available_now=True)
    q.awaitTermination(300)
    return job.read_results(spark, out_dir).collect()


def test_stream_end_to_end_and_resume(spark, corpus_dir):
    base = tempfile.mkdtemp(prefix="stream_")
    try:
        # uninterrupted run
        full = _run_to_completion(spark, corpus_dir, f"{base}/out1", f"{base}/cp1")
        assert len(full) > 0
        ref = {(str(r.window_start), r.query_name): (r.n_matches, r.n_docs) for r in full}

        # interrupted run: stop after the first progress, then resume
        q = job.run_stream(spark, corpus_dir, f"{base}/out2", f"{base}/cp2")
        deadline = time.time() + 120
        while time.time() < deadline:
            if q.lastProgress and q.lastProgress["numInputRows"] > 0:
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)

        resumed = _run_to_completion(spark, corpus_dir, f"{base}/out2", f"{base}/cp2")
        got = {(str(r.window_start), r.query_name): (r.n_matches, r.n_docs) for r in resumed}
        assert got == ref, "kill+resume must reproduce identical per-window counts"
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_windowed_counts_match_batch(spark, corpus_dir):
    """Stream results == batch computation over the same corpus (unified
    semantics check)."""
    base = tempfile.mkdtemp(prefix="streamb_")
    try:
        stream_rows = _run_to_completion(spark, corpus_dir, f"{base}/out", f"{base}/cp")
        got = {(str(r.window_start), r.query_name): (r.n_matches, r.n_docs)
               for r in stream_rows}
        batch_pages = spark.read.parquet(corpus_dir).dropDuplicates(["url", "warc_ts"])
        batch = job.windowed_findings(batch_pages).collect()
        expected = {(str(r.window_start), r.query_name): (r.n_matches, r.n_docs)
                    for r in batch}
        assert got == expected
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stateful_domain_stats(spark, corpus_dir):
    """applyInPandasWithState: running per-domain totals; final state equals
    the batch group-by."""
    import tempfile
    from joern_spark.streaming.stateful import domain_running_stats

    base = tempfile.mkdtemp(prefix="state_")
    stream = job.pages_stream(spark, corpus_dir)
    out = domain_running_stats(stream)
    results = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            results[r.domain] = r.n_pages  # update semantics: latest wins

    q = (out.writeStream.outputMode("update")
         .option("checkpointLocation", f"{base}/cp")
         .foreachBatch(sink).trigger(availableNow=True).start())
    q.awaitTermination(300)

    batch = (spark.read.parquet(corpus_dir)
             .groupBy(F.regexp_extract("url", r"https://([^/]+)/", 1).alias("domain"))
             .count().collect())
    expected = {r.domain: r["count"] for r in batch}
    assert results == expected


def test_stream_stream_join(spark, corpus_dir):
    """Watermarked stream-stream join: every page finds its (possibly late)
    metadata record exactly once."""
    import tempfile
    from joern_spark.streaming.stateful import (join_pages_with_meta,
                                                synth_meta_stream_frame)

    base = tempfile.mkdtemp(prefix="ssj_")
    # write the deterministic meta twin as its own parquet stream source
    meta_dir = f"{base}/meta"
    synth_meta_stream_frame(spark.read.parquet(corpus_dir)).write.parquet(meta_dir)
    pages = job.pages_stream(spark, corpus_dir, files_per_trigger=4)
    meta = (spark.readStream
            .schema(spark.read.parquet(meta_dir).schema)
            .option("maxFilesPerTrigger", 4).parquet(meta_dir))
    joined = join_pages_with_meta(pages, meta)
    rows = []

    def sink(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = (joined.writeStream.outputMode("append")
         .option("checkpointLocation", f"{base}/cp")
         .foreachBatch(sink).trigger(availableNow=True).start())
    q.awaitTermination(300)

    n_pages = spark.read.parquet(corpus_dir).count()
    assert len(rows) == n_pages, f"expected {n_pages} joined rows, got {len(rows)}"
    assert {r.fetch_status for r in rows} <= {200, 404}
