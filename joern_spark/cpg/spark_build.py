"""Distributed CPG construction: pages DataFrame → (nodes, edges) DataFrames.

The Spark re-expression of joern-parse (SURVEY.md §3a): stages 2-5 of the
reference pipeline collapse into ONE `mapInPandas` over the pages table —
per-document CPGs are independent, so no shuffle is needed at all for
construction (narrow transformation); shuffles only appear in the queries
that follow, keyed on (url, node_id).

Node ids are globally stable: hash64(url, label, start, end, per-doc seq)
(FIXTURES.md §2) — identical across reruns/retries/checkpoint resume,
which is what makes the exactly-once sink idempotent.

Scale notes (100 TB):
- html never shuffles; it is read once per partition and dropped.
- maxRecordsPerBatch bounds Arrow batch memory for large pages.
- skew: hot domains are fine here (unit of work = row, not domain); the
  groupBy-shaped variants downstream salt on url-hash.
- parse errors degrade per-document into an error row (never kill a batch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType, IntegerType, LongType, StringType, StructField, StructType,
)

from joern_spark.cpg.build import build_cpg
from joern_spark.extract import extract_script_text

NODES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("node_id", LongType()),
    StructField("label", StringType()),
    StructField("name", StringType()),
    StructField("code", StringType()),
    StructField("full_name", StringType()),
    StructField("order", IntegerType()),
    StructField("argument_index", IntegerType()),
    StructField("line", IntegerType()),
    StructField("column", IntegerType()),
    StructField("type_full_name", StringType()),
    StructField("dispatch_type", StringType()),
    StructField("method_full_name", StringType()),
    StructField("control_structure_type", StringType()),
    StructField("is_external", BooleanType()),
    StructField("index", IntegerType()),
])

EDGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("src", LongType()),
    StructField("dst", LongType()),
    StructField("label", StringType()),
    StructField("variable", StringType()),
])

ERRORS_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("error", StringType()),
])


def stable_node_id(url: str, node) -> int:
    """hash64(url, label, start, end, per-doc id) — deterministic under
    retry/resume; the per-document sequence id disambiguates synthetic nodes
    sharing one source span."""
    key = f"{url}|{node.label}|{node.start}|{node.end}|{node.id}"
    return int.from_bytes(hashlib.blake2b(key.encode(), digest_size=8).digest(),
                          "big", signed=True)


def cpg_rows_for_document(url: str, html: bytes):
    """One document → (node_rows, edge_rows). Raises on parse failure."""
    text = extract_script_text(bytes(html).decode("utf-8", errors="replace"))
    cpg = build_cpg(text, url)
    ids = {n.id: stable_node_id(url, n) for n in cpg.nodes}
    node_rows = [
        (url, ids[n.id], n.label, n.name, n.code, n.full_name, n.order,
         n.argument_index, n.line, n.column, n.type_full_name, n.dispatch_type,
         n.method_full_name, n.control_structure_type, bool(n.is_external), n.index)
        for n in cpg.nodes
    ]
    edge_rows = [
        (url, ids[e.src.id], ids[e.dst.id], e.label, e.variable or "")
        for e in cpg.edges
    ]
    return node_rows, edge_rows


def build_cpg_tables(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """pages(url, html, ...) → (nodes, edges) DataFrames."""

    def run_nodes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in NODES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                try:
                    node_rows, _ = cpg_rows_for_document(url, html)
                    rows.extend(node_rows)
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=cols)

    def run_edges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in EDGES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                try:
                    _, edge_rows = cpg_rows_for_document(url, html)
                    rows.extend(edge_rows)
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=cols)

    src = pages.select("url", "html")
    return src.mapInPandas(run_nodes, NODES_SCHEMA), src.mapInPandas(run_edges, EDGES_SCHEMA)
