"""joern-export format tests: graphml + graphson (JoernExport.scala:34-49
representations via flatgraph GraphML/GraphSON exporter shapes)."""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import pytest

from joern_spark.cpg.spark_build import build_cpg_tables
from joern_spark.query.export import export_graphml, export_graphson
from joern_spark.sources.corpus import make_pages


@pytest.fixture(scope="module")
def graph(spark):
    pages = make_pages(spark, n_docs=6, n_partitions=2)
    nodes, edges = build_cpg_tables(pages)
    return (nodes.localCheckpoint(eager=True), edges.localCheckpoint(eager=True))


def test_graphml_valid_and_complete(spark, graph):
    nodes, edges = graph
    out = {r.url: r.graphml for r in export_graphml(nodes, edges, "ast").collect()}
    assert len(out) == 6
    url = sorted(out)[0]
    root = ET.fromstring(out[url])
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    g = root.find(f"{ns}graph")
    xml_nodes = g.findall(f"{ns}node")
    xml_edges = g.findall(f"{ns}edge")
    n_nodes = nodes.where(nodes.url == url).count()
    n_ast = edges.where((edges.url == url) & (edges.label == "AST")).count()
    assert len(xml_nodes) == n_nodes
    assert len(xml_edges) == n_ast
    # labelV key present on every node entry
    first = xml_nodes[0]
    keys = {d.get("key") for d in first.findall(f"{ns}data")}
    assert {"labelV", "name", "code"} <= keys


def test_graphson_valid_and_typed(spark, graph):
    nodes, edges = graph
    out = {r.url: r.graphson for r in export_graphson(nodes, edges, "cfg").collect()}
    url = sorted(out)[0]
    doc = json.loads(out[url])
    assert doc["@type"] == "tinker:graph"
    vs = doc["@value"]["vertices"]
    es = doc["@value"]["edges"]
    assert len(vs) == nodes.where(nodes.url == url).count()
    assert len(es) == edges.where((edges.url == url) & (edges.label == "CFG")).count()
    v0 = vs[0]
    assert v0["@type"] == "g:Vertex"
    assert v0["@value"]["id"]["@type"] == "g:Int64"
    e0 = es[0]
    assert e0["@type"] == "g:Edge"
    assert e0["@value"]["label"] == "CFG"
    assert isinstance(e0["@value"]["outV"]["@value"], int)


def test_method_dot_frames(spark):
    """Per-method dot export: one DotSerializer-format digraph per
    internal method, rendered distributed."""
    from joern_spark.query.export import method_dot_frames
    from joern_spark.sources.corpus import make_pages

    pages = make_pages(spark, n_docs=16, n_partitions=2)
    rows = method_dot_frames(pages, "cfg").collect()
    assert len(rows) > 0
    assert all(r.dot.startswith("digraph ") and r.dot.endswith("}\n")
               for r in rows)
    assert any(":program" in r.method_full_name for r in rows)
