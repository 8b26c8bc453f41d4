"""Streaming-layer tests: watermarked windowed counts, exactly-once sink,
and kill+resume-from-checkpoint reproducibility (BASELINE.md target
"identical per-window counts after kill+resume")."""

from __future__ import annotations

import shutil
import tempfile
import time

import pytest

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
