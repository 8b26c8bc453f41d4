"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

Generates the `pages(url, warc_ts, html, text, lang)` table: Common-Crawl
shaped, zipf-skewed hot domains (exercises salting / AQE skew handling),
deterministic timestamps with a configurable out-of-order fraction
(exercises watermarks/late data), HTML bodies embedding the golden JS
snippets (snippet = i mod len(snippets)).

Everything is a pure function of (i, seed) so any row can be regenerated
anywhere — the property that makes exactly-once sinks and checkpoint
resume testable (identical reruns) and lets executors generate partitions
independently at 10^12-document scale (no driver-side data).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType, TimestampType,
)

from joern_spark.fixtures import SNIPPETS

PAGE_SCHEMA = StructType([
    StructField("doc_seq", LongType()),
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])

DOMAINS = (
    ["hot-0.example.com"] * 8 + ["hot-1.example.com"] * 4
    + [f"site-{i}.example.org" for i in range(20)]
)
BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z

SNIPPET_IDS = sorted(SNIPPETS)


def snippet_id_for(i: int) -> str:
    return SNIPPET_IDS[i % len(SNIPPET_IDS)]


def page_for(i: int, seed: int = 42, late_fraction: float = 0.1,
             extra_js: str | None = None):
    """Deterministic page row for index i (pure function).  `text` is the
    GOLDEN extracted script text (byte-identity check target).

    `extra_js` appends a statement to the embedded snippet BEFORE html
    assembly, so html and extracted text stay byte-consistent — the
    near-dup injection hook (a page whose snippet carries a unique extra
    statement is a NEAR duplicate of its base-snippet family: most
    3-token shingles shared, some not)."""
    from joern_spark.extract import extract_script_text

    h = int.from_bytes(hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "big")
    domain = DOMAINS[h % len(DOMAINS)]
    url = f"https://{domain}/page-{i}"
    snippet = SNIPPETS[snippet_id_for(i)]
    if extra_js:
        snippet = f"{snippet}\n{extra_js}"
    html = f"<html><head><title>p{i}</title></head><body><script>{snippet}\n</script></body></html>"
    # event time: monotone base + jitter; a fraction arrives out-of-order/late
    ts = BASE_EPOCH + i * 7 + (h % 5)
    if (h % 100) < int(late_fraction * 100):
        ts -= 3600  # one hour late vs its arrival position
    return url, ts, html.encode("utf-8"), extract_script_text(html)


def make_pages(spark: SparkSession, n_docs: int = 256, seed: int = 42,
               late_fraction: float = 0.1, n_partitions: int | None = None) -> DataFrame:
    """Distributed generation: spark.range → mapInPandas(page_for)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                url, ts, html, text = page_for(int(i), seed, late_fraction)
                rows.append((int(i), url, pd.Timestamp(ts, unit="s"), html, text, "en"))
            yield pd.DataFrame(
                rows, columns=["doc_seq", "url", "warc_ts", "html", "text", "lang"])

    rng = spark.range(n_docs, numPartitions=n_partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, PAGE_SCHEMA)


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a pages table from the driver's `documents` parquet table —
    ties the CPG pipeline to the graded testdata: html embeds the golden JS
    snippet chosen by doc_id (plus the document text as body prose), and
    `text` carries the golden extracted script text, same as make_pages."""
    n = len(SNIPPET_IDS)
    snippet = F.element_at(F.array(*[F.lit(SNIPPETS[s]) for s in SNIPPET_IDS]),
                           (F.col("doc_id") % n + 1).cast("int"))
    html = F.concat(
        F.lit("<html><head><title>d</title></head><body><script>"), snippet,
        F.lit("\n</script><p>"), F.col("text"), F.lit("</p></body></html>"),
    )
    return docs.select(
        F.col("doc_id").alias("doc_seq"),
        F.concat(F.lit("https://docs.example.com/doc-"), F.col("doc_id")).alias("url"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("doc_id") * 7).alias("warc_ts"),
        html.cast("binary").alias("html"),
        # the golden extracted-script text for this page, matching
        # make_pages: extract_script_text(html) == snippet + "\n" (the
        # byte-identity invariant consumers assert against `text`)
        F.concat(snippet, F.lit("\n")).alias("text"),
        F.col("lang"),
    )


# ---------------------------------------------------------------------------
# Web-taint corpus: pages embedding the WEB_TAINT_SNIPPETS mix (positives
# and negatives for the web_taint_bundle), same deterministic pure-function
# construction as page_for.
# ---------------------------------------------------------------------------

WEB_TAINT_IDS = None  # populated lazily from fixtures (sorted keys)


def _web_taint_ids():
    global WEB_TAINT_IDS
    if WEB_TAINT_IDS is None:
        from joern_spark.fixtures import WEB_TAINT_SNIPPETS
        WEB_TAINT_IDS = sorted(WEB_TAINT_SNIPPETS)
    return WEB_TAINT_IDS


def taint_page_for(i: int, seed: int = 42):
    """Deterministic web-taint page row for index i (pure function)."""
    from joern_spark.extract import extract_script_text
    from joern_spark.fixtures import WEB_TAINT_SNIPPETS

    ids = _web_taint_ids()
    h = int.from_bytes(hashlib.md5(f"taint:{seed}:{i}".encode()).digest()[:8], "big")
    domain = DOMAINS[h % len(DOMAINS)]
    url = f"https://{domain}/taint-{i}"
    snippet = WEB_TAINT_SNIPPETS[ids[i % len(ids)]]
    html = (f"<html><head><title>t{i}</title></head><body><script>{snippet}"
            f"\n</script></body></html>")
    ts = BASE_EPOCH + i * 7 + (h % 5)
    return url, ts, html.encode("utf-8"), extract_script_text(html)


def make_taint_pages(spark: SparkSession, n_docs: int = 256, seed: int = 42,
                     n_partitions: int | None = None) -> DataFrame:
    """Distributed generation of the web-taint scan corpus."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                url, ts, html, text = taint_page_for(int(i), seed)
                rows.append((int(i), url, pd.Timestamp(ts, unit="s"), html,
                             text, "en"))
            yield pd.DataFrame(
                rows, columns=["doc_seq", "url", "warc_ts", "html", "text",
                               "lang"])

    rng = spark.range(n_docs, numPartitions=n_partitions
                      or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, PAGE_SCHEMA)


# ---------------------------------------------------------------------------
# Site corpus: pages of one domain share a global namespace — "lib" pages
# define functions, "app" pages call them.  Drives the cross-document flow
# query (query/crosspage.py).
# ---------------------------------------------------------------------------

SITE_SNIPPETS = [
    # 0: lib — getParam returns USER INPUT, helper does not
    ("lib", "function getParam() { var p = location.search; return p; }\n"
            "function helper(x) { return x; }"),
    # 1: app — eval of getParam() result (cross-page flow when a lib page
    #    of the same domain defines it)
    ("app", "var p = getParam(); eval(p);"),
    # 2: app — eval of helper() result (no flow: helper is clean)
    ("app", "var q = helper('x'); eval(q);"),
    # 3: lib — getConfig returns a constant (clean definition)
    ("lib", "function getConfig() { var c = 'none'; return c; }"),
    # 4: app — getParam result only logged (call not tainted)
    ("app", "var r = getParam(); log(r);"),
    # 5: app — eval of getConfig() result (no flow: clean source)
    ("app", "var s = getConfig(); eval(s);"),
]


def site_page_for(i: int, seed: int = 42):
    """Deterministic site-corpus page row (pure function)."""
    from joern_spark.extract import extract_script_text

    h = int.from_bytes(hashlib.md5(f"site:{seed}:{i}".encode()).digest()[:8],
                       "big")
    domain = DOMAINS[h % len(DOMAINS)]
    url = f"https://{domain}/site-{i}"
    _kind, snippet = SITE_SNIPPETS[i % len(SITE_SNIPPETS)]
    html = (f"<html><head><title>s{i}</title></head><body><script>{snippet}"
            f"\n</script></body></html>")
    ts = BASE_EPOCH + i * 7 + (h % 5)
    return url, ts, html.encode("utf-8"), extract_script_text(html)


# Chain corpus: wrapper functions pass user input ALONG — page A defines
# getParam, page B wraps it in buildUrl, page C wraps that in navTo, page
# D evals navTo()'s result.  No single page (or page pair) contains the
# flow; it only closes transitively over the wrap edges.  Drives
# cross_page_flows_transitive (query/crosspage.py).
CHAIN_SNIPPETS = [
    # 0: origin — getParam returns USER INPUT
    ("lib", "function getParam() { var p = location.search; return p; }"),
    # 1: wrapper hop 1 — buildUrl's return depends on getParam()'s result
    ("wrap", "function buildUrl() { var b = getParam(); "
             "var u = 'http://go/' + b; return u; }"),
    # 2: wrapper hop 2 — navTo wraps buildUrl
    ("wrap", "function navTo() { var t = buildUrl(); return t; }"),
    # 3: sink, 3-hop chain getParam -> buildUrl -> navTo -> eval
    ("app", "var z = navTo(); eval(z);"),
    # 4: sink, direct 1-hop (base case still closes)
    ("app", "var p = getParam(); eval(p);"),
    # 5: clean origin — getConfig returns a constant
    ("lib", "function getConfig() { var c = 'none'; return c; }"),
    # 6: wrapper over the CLEAN origin — chain exists, taint does not
    ("wrap", "function confUrl() { var u = getConfig(); return u; }"),
    # 7: sink over the clean chain — must NOT flow
    ("app", "var s = confUrl(); eval(s);"),
    # 8: wrapper that DROPS the taint (return doesn't depend on the call)
    ("wrap", "function ignoreIt() { var x = getParam(); "
             "var y = 'safe'; return y; }"),
    # 9: sink over the dropped-taint wrapper — must NOT flow
    ("app", "var w = ignoreIt(); eval(w);"),
    # 10: sink, 2-hop chain getParam -> buildUrl -> eval
    ("app", "var u = buildUrl(); eval(u);"),
    # 11: tainted chain tip only logged — must NOT flow
    ("app", "var r = navTo(); log(r);"),
]


def chain_page_for(i: int, seed: int = 42):
    """Deterministic chain-corpus page row (pure function)."""
    from joern_spark.extract import extract_script_text

    h = int.from_bytes(hashlib.md5(f"chain:{seed}:{i}".encode()).digest()[:8],
                       "big")
    domain = DOMAINS[h % len(DOMAINS)]
    url = f"https://{domain}/chain-{i}"
    _kind, snippet = CHAIN_SNIPPETS[i % len(CHAIN_SNIPPETS)]
    html = (f"<html><head><title>c{i}</title></head><body><script>{snippet}"
            f"\n</script></body></html>")
    ts = BASE_EPOCH + i * 7 + (h % 5)
    return url, ts, html.encode("utf-8"), extract_script_text(html)


def make_chain_pages(spark: SparkSession, n_docs: int = 256, seed: int = 42,
                     n_partitions: int | None = None) -> DataFrame:
    """Distributed generation of the chain corpus."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                url, ts, html, text = chain_page_for(int(i), seed)
                rows.append((int(i), url, pd.Timestamp(ts, unit="s"), html,
                             text, "en"))
            yield pd.DataFrame(
                rows, columns=["doc_seq", "url", "warc_ts", "html", "text",
                               "lang"])

    rng = spark.range(n_docs, numPartitions=n_partitions
                      or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, PAGE_SCHEMA)


def make_site_pages(spark: SparkSession, n_docs: int = 256, seed: int = 42,
                    n_partitions: int | None = None) -> DataFrame:
    """Distributed generation of the site corpus."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                url, ts, html, text = site_page_for(int(i), seed)
                rows.append((int(i), url, pd.Timestamp(ts, unit="s"), html,
                             text, "en"))
            yield pd.DataFrame(
                rows, columns=["doc_seq", "url", "warc_ts", "html", "text",
                               "lang"])

    rng = spark.range(n_docs, numPartitions=n_partitions
                      or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, PAGE_SCHEMA)
