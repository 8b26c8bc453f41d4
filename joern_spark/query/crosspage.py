"""Cross-document (site-level) taint flows.

A web site is many pages sharing one global namespace: a "library" page
defines `function getParam() { return location.search; }`, an "app" page
on the same domain calls `eval(getParam())`.  Neither page alone contains
a source-to-sink flow — the flow only exists across the document
boundary.

Scale design (the summarize-then-join interprocedural pattern): a single
narrow Arrow pass builds per-page SUMMARIES with the full per-document
engine —

- for every function a page defines: does its return value carry user
  input? (reachableBy from the web-source field reads to the RETURN
  nodes, dataflow/engine.py semantics)
- for every unresolved call a page makes: does the call's result reach
  an eval-family sink argument?

and the corpus layer joins the two small summary frames on
(domain, function name), def-page != call-page.  Blobs/HTML never pass a
shuffle; only the summary rows (a few per page) do — at 10^12 documents
the join keys are (domain, name), naturally partitioned by domain, and a
hot-domain skew salts exactly like the events pipeline (pipeline/skew.py).

The per-page summaries mirror Joern's reachableBy over each document;
the cross-page composition is this engine's site-level extension
(the reference models one project per CPG — cited deviation)."""

from __future__ import annotations

from collections.abc import Iterator
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, StringType, StructField, StructType,
)

from joern_spark.cpg.build import build_cpg
from joern_spark.dataflow.engine import reachable_by_flows
from joern_spark.extract import extract_script_text
from joern_spark.query.cpgql import Q
from joern_spark.query.scan import _web_sources

SUMMARY_SCHEMA = StructType([
    StructField("domain", StringType()),
    StructField("url", StringType()),
    StructField("kind", StringType()),       # 'def' | 'call'
    StructField("func_name", StringType()),
    StructField("tainted", BooleanType()),   # def: returns user input;
                                             # call: result reaches eval
])

_EVAL_RE = "(eval|Function|execScript)"


def summarize_page(url: str, html: str) -> list[tuple]:
    """Per-page summary rows (pure function; also used by the fixture
    oracle generator)."""
    domain = urlparse(url).netloc
    text = extract_script_text(html)
    cpg = build_cpg(text, url)
    q = Q(cpg)
    rows = []

    sources = _web_sources(q)
    defined = set()
    for m in cpg.methods():
        if m.name.startswith((":", "<")) or m.is_external:
            continue
        defined.add(m.name)
        rets = [n for n in cpg.method_body_nodes(m) if n.label == "RETURN"]
        tainted = bool(sources and rets
                       and reachable_by_flows(cpg, rets, sources))
        rows.append((domain, url, "def", m.name, tainted))

    eval_args = [a for c in q.call().name(_EVAL_RE).l()
                 for a in cpg.arguments(c) if a.argument_index >= 1]
    # Group ALL call nodes by callee name and taint-test the whole group:
    # `var r = f(); log(r); var p = f(); eval(p);` must summarize f as
    # tainted even though only the SECOND call feeds eval.
    by_name: dict[str, list] = {}
    for c in q.call().l():
        name = c.name
        if (name.startswith("<operator>") or name in defined
                or not name
                or name in ("eval", "Function", "execScript")):
            continue
        by_name.setdefault(name, []).append(c)
    for name, calls in by_name.items():
        tainted = bool(eval_args
                       and reachable_by_flows(cpg, eval_args, calls))
        rows.append((domain, url, "call", name, tainted))
    return rows


def page_flow_summaries(pages: DataFrame) -> DataFrame:
    """pages(url, html) → per-page def/call summary rows.  One narrow
    mapInPandas; no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SUMMARY_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                try:
                    h = (bytes(html).decode("utf-8", "replace")
                         if not isinstance(html, str) else html)
                    rows.extend(summarize_page(url, h))
                except Exception:
                    pass
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(run, SUMMARY_SCHEMA)


def cross_page_flows(pages: DataFrame) -> DataFrame:
    """Site-level flows: (domain, func_name) where SOME page's definition
    returns user input and SOME OTHER page's call feeds that result into
    eval.  One row per (domain, func_name) with page counts and the
    number of cross-page (def_url, call_url) pairs.

    Plan shape: a SINGLE conditional aggregation over the summary rows —
    one shuffle on (domain, func_name) with map-side partials.  A
    def/call self-join would re-execute the CPG-build UDF once per
    branch, and collect_set would be unbounded on hot domains; distinct
    counting is not.  def and call URL sets are structurally disjoint
    (summarize_page never emits a call row for a name the same page
    defines), so n_cross_flows is exactly the product."""
    s = page_flow_summaries(pages)
    out = (s.where(F.col("tainted"))
           .groupBy("domain", "func_name")
           .agg(F.countDistinct(
                    F.when(F.col("kind") == "def", F.col("url")))
                .alias("n_source_pages"),
                F.countDistinct(
                    F.when(F.col("kind") == "call", F.col("url")))
                .alias("n_sink_pages")))
    return (out.where((F.col("n_source_pages") > 0)
                      & (F.col("n_sink_pages") > 0))
            .withColumn("n_cross_flows",
                        F.col("n_source_pages") * F.col("n_sink_pages")))
