"""Single-pass CPG construction invariants (VERDICT r1 item 1).

Asserts (a) build_cpg_tables parses/builds each document EXACTLY once even
when both the nodes and edges tables are consumed, and (b) the combined
union-schema split reproduces the per-document engine's node/edge rows.
"""

from __future__ import annotations

import os
import tempfile

from joern_spark.cpg.spark_build import (
    build_cpg_tables, cpg_rows_for_document,
)
from joern_spark.sources.corpus import make_pages


def _count_hook(path):
    # Pickled into the Arrow worker closure; appends one line per document
    # build.  O_APPEND writes of one short line are atomic on Linux.
    def hook(url):
        with open(path, "a") as f:
            f.write(url + "\n")
    return hook


def test_build_once_per_document(spark):
    n_docs = 24
    pages = make_pages(spark, n_docs=n_docs, n_partitions=4)
    with tempfile.TemporaryDirectory() as d:
        marker = os.path.join(d, "builds.log")
        open(marker, "w").close()
        nodes, edges = build_cpg_tables(pages, on_build=_count_hook(marker))
        n_nodes = nodes.count()
        n_edges = edges.count()
        assert n_nodes > 0 and n_edges > 0
        with open(marker) as f:
            built = [line.strip() for line in f if line.strip()]
        assert len(built) == n_docs, (
            f"expected {n_docs} builds, saw {len(built)} — "
            "document CPGs are being rebuilt per consumer")
        assert len(set(built)) == n_docs
        nodes.unpersist()


def test_split_matches_engine_rows(spark):
    pages = make_pages(spark, n_docs=6, n_partitions=2)
    nodes, edges = build_cpg_tables(pages)
    rows = {r.url: r for r in pages.select("url", "html").collect()}
    got_nodes = {}
    got_edges = {}
    for r in nodes.collect():
        got_nodes.setdefault(r.url, set()).add(
            (r.node_id, r.label, r.name, r.code, r.order))
    for r in edges.collect():
        got_edges.setdefault(r.url, set()).add(
            (r.src, r.dst, r.label, r.variable))
    for url, page in rows.items():
        node_rows, edge_rows = cpg_rows_for_document(url, page.html)
        want_nodes = {(nr[1], nr[2], nr[3], nr[4], nr[6]) for nr in node_rows}
        want_edges = {(er[1], er[2], er[3], er[4]) for er in edge_rows}
        assert got_nodes[url] == want_nodes
        assert got_edges[url] == want_edges
    nodes.unpersist()
