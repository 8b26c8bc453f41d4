"""Streaming near-duplicate suppression (streaming/neardup.py): the
streaming twin of the batch minhash→LSH chain.

Contract under test (COVERAGE.md "streaming near-dup"):
- collision predicate == batch `lsh_candidate_pairs` exactly (same
  shingle/minhash/band math);
- first-owner-wins per band bucket, deterministic (warc_ts, url)
  tie-break inside a micro-batch → an exact golden via a pure-Python
  prefix simulation;
- duplicate families collapse transitively onto early arrivals
  (A~B, B~C: C is suppressed even though A and C never collide);
- kill+resume from checkpoint reproduces the identical survivor set;
- bucket owners age out past the event-time horizon (state is bounded
  by the dedup horizon, not the stream length).
"""

from __future__ import annotations

import shutil
import tempfile
import time
from collections import defaultdict
from datetime import datetime, timezone

from joern_spark.sources.corpus import PAGE_SCHEMA
from joern_spark.streaming import neardup

T0 = 1704067200  # 2024-01-01T00:00:00Z

# A ~ B collide (2 bands), B ~ C collide (1 band), A and C share NO band
# (verified by the fixture assert in test_transitive_suppression_golden) —
# the transitive-family shape that distinguishes streaming prefix
# semantics from "pairwise only".
_BASE = [f"tok{i}" for i in range(40)]
TEXT_A = " ".join(_BASE)
_B = list(_BASE)
_B[1] = "CHANGED_B"
TEXT_B = " ".join(_B)
_C = list(_B)
_C[8] = "CHANGED_C"
TEXT_C = " ".join(_C)

TEXT_DUP = "exact duplicate body with enough tokens to shingle cleanly"
UNIQUE = [
    "first unique filler document body about astronomy and parquet files",
    "second unique filler document body describing watermark semantics",
    "third unique filler document body on rocksdb state store behavior",
]


def _ts(epoch_s: int):
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc).replace(tzinfo=None)


def _write_chunk(spark, pages_dir: str, rows):
    """One time-ordered single-file chunk (file source orders by mod
    time — multi-file chunks arrive in arbitrary order, see
    test_streaming.py / the round-4 soak gotcha)."""
    data = [(i, url, _ts(ts), b"<html></html>", text, "en")
            for i, (url, ts, text) in enumerate(rows)]
    df = spark.createDataFrame(data, PAGE_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(pages_dir)


def _simulate(chunks):
    """Pure-Python prefix simulation of the stateful operator: per band
    bucket, first owner wins; inside a batch the owner is the
    (warc_ts, url)-min row; a page survives iff no band collided.
    Independent of Spark — this IS the golden."""
    owners: dict = {}
    survivors: dict = {}
    for chunk in chunks:
        buckets = defaultdict(list)
        for url, ts, text in chunk:
            for b, h in enumerate(neardup.py_band_hashes(text)):
                buckets[(b, h)].append((ts, url))
        collided = {url: False for url, _, _ in chunk}
        for key, items in buckets.items():
            items.sort()
            owner = owners.setdefault(key, items[0][1])
            for _t, url in items:
                if url != owner:
                    collided[url] = True
        for url, _, _ in chunk:
            survivors[url] = not collided[url]
    return survivors


def _chunks_fixture():
    """3 micro-batches: A then B then C (the transitive family), an
    intra-batch exact-dup pair, a cross-batch exact dup, unique fillers."""
    return [
        [
            ("https://a.example.com/A", T0 + 0, TEXT_A),
            ("https://a.example.com/D1", T0 + 60, TEXT_DUP),
            ("https://a.example.com/D2", T0 + 120, TEXT_DUP),  # same batch
            ("https://a.example.com/E1", T0 + 180, UNIQUE[0]),
        ],
        [
            ("https://a.example.com/B", T0 + 600, TEXT_B),
            ("https://a.example.com/U1", T0 + 660, UNIQUE[1]),
        ],
        [
            ("https://a.example.com/C", T0 + 1200, TEXT_C),
            ("https://a.example.com/E2", T0 + 1260, UNIQUE[0]),  # x-batch dup
            ("https://a.example.com/U2", T0 + 1320, UNIQUE[2]),
        ],
    ]


def _run_and_read(spark, pages_dir, out_dir, cp_dir):
    q = neardup.run_near_dup_stream(spark, pages_dir, out_dir, cp_dir,
                                    available_now=True)
    q.awaitTermination(300)
    return {r.url: r.survivor
            for r in neardup.read_survivors(spark, out_dir).collect()}


def test_band_collisions_equal_batch_lsh_pairs(spark):
    """A pair that collides in the stream is EXACTLY a batch
    `lsh_candidate_pairs` pair — identical shingle/minhash/band math."""
    from joern_spark.pipeline.dedup import lsh_candidate_pairs, minhash_signature

    texts = [TEXT_A, TEXT_B, TEXT_C, TEXT_DUP, TEXT_DUP] + UNIQUE
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {(r.doc_a, r.doc_b)
           for r in lsh_candidate_pairs(minhash_signature(docs)).collect()}
    bh = [set(enumerate(neardup.py_band_hashes(t))) for t in texts]
    expected = {(i, j) for i in range(len(texts))
                for j in range(i + 1, len(texts)) if bh[i] & bh[j]}
    assert got == expected
    assert (0, 1) in expected and (1, 2) in expected and (3, 4) in expected


def test_page_band_rows_batch_parity(spark):
    """The Arrow band-row pass emits N_BANDS rows per page with the
    py_band_hashes values (batch/stream unified semantics)."""
    from joern_spark.pipeline.dedup import N_BANDS

    rows = [("https://x/p0", T0, TEXT_A), ("https://x/p1", T0 + 60, TEXT_DUP)]
    pages = spark.createDataFrame(
        [(i, url, _ts(ts), b"", text, "en")
         for i, (url, ts, text) in enumerate(rows)], PAGE_SCHEMA)
    got = defaultdict(dict)
    for r in neardup.page_band_rows(pages).collect():
        got[r.url][r.band_idx] = r.band_hash
    for url, _ts_, text in rows:
        want = {b: h for b, h in enumerate(neardup.py_band_hashes(text))}
        assert got[url] == want and len(want) == N_BANDS


def test_transitive_suppression_golden(spark):
    """End-to-end stream vs the prefix simulation, plus the hand-checked
    family shape: A survives, B and C are suppressed — C transitively
    (it never collides with A), D2 same-batch, E2 cross-batch."""
    chunks = _chunks_fixture()
    # fixture shape guards (fail loudly if the texts ever change)
    ba = set(enumerate(neardup.py_band_hashes(TEXT_A)))
    bb = set(enumerate(neardup.py_band_hashes(TEXT_B)))
    bc = set(enumerate(neardup.py_band_hashes(TEXT_C)))
    assert ba & bb and bb & bc and not (ba & bc)

    base = tempfile.mkdtemp(prefix="neardup_")
    try:
        for chunk in chunks:
            _write_chunk(spark, f"{base}/pages", chunk)
        got = _run_and_read(spark, f"{base}/pages", f"{base}/out",
                            f"{base}/cp")
        expected = _simulate(chunks)
        assert got == expected
        assert got["https://a.example.com/A"] is True
        assert got["https://a.example.com/B"] is False
        assert got["https://a.example.com/C"] is False  # transitive
        assert got["https://a.example.com/D1"] is True
        assert got["https://a.example.com/D2"] is False  # same-batch dup
        assert got["https://a.example.com/E1"] is True
        assert got["https://a.example.com/E2"] is False  # cross-batch dup
        assert all(got[u] for u in ("https://a.example.com/U1",
                                    "https://a.example.com/U2"))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_kill_resume_reproduces_survivors(spark):
    """Interrupt after the first progress, resume from checkpoint, drain:
    the survivor set must be identical (owner state restored from
    RocksDB; epoch sink idempotent under replay)."""
    chunks = _chunks_fixture()
    base = tempfile.mkdtemp(prefix="neardup_resume_")
    try:
        for chunk in chunks:
            _write_chunk(spark, f"{base}/pages", chunk)
        q = neardup.run_near_dup_stream(spark, f"{base}/pages",
                                        f"{base}/out", f"{base}/cp")
        deadline = time.time() + 120
        while time.time() < deadline:
            if q.lastProgress and q.lastProgress["numInputRows"] > 0:
                break
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(60)
        got = _run_and_read(spark, f"{base}/pages", f"{base}/out",
                            f"{base}/cp")
        assert got == _simulate(chunks)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_bucket_owner_ages_out_past_horizon(spark):
    """State is bounded by the dedup horizon: a bucket owner whose
    timeout timestamp falls behind the advancing watermark is evicted,
    so a much-later exact duplicate becomes a fresh owner and SURVIVES
    (contrast with E2 in the golden test, a dup inside the horizon).

    Timeline (HORIZON = watermark = 2h): P0 at t0 arms its buckets'
    timeout at t0+2h; batch 2 (t0+6h) advances the watermark to t0+4h;
    batch 3 fires the timeout for the (data-less) P0 buckets; batch 4's
    P3 (same text, t0+7h) finds them unowned."""
    h6, h7 = 6 * 3600, 7 * 3600
    chunks = [
        [("https://x.example.com/P0", T0, TEXT_DUP)],
        [("https://x.example.com/F1", T0 + h6, UNIQUE[0])],
        [("https://x.example.com/F2", T0 + h6 + 60, UNIQUE[1])],
        [("https://x.example.com/P3", T0 + h7, TEXT_DUP)],
    ]
    base = tempfile.mkdtemp(prefix="neardup_age_")
    try:
        for chunk in chunks:
            _write_chunk(spark, f"{base}/pages", chunk)
        got = _run_and_read(spark, f"{base}/pages", f"{base}/out",
                            f"{base}/cp")
        assert got == {u: True for u in got}
        assert got["https://x.example.com/P3"] is True
    finally:
        shutil.rmtree(base, ignore_errors=True)
