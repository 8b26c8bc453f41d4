"""Data-flow slicing (the joern-slice equivalent).

Behavioral port of DataFlowSlicing.scala:19-67: for each call site, take
its arguments as slice seeds, walk backwards over visible DDG steps up to
`slice_depth`, and return the induced REACHING_DEF subgraph.

Spark surface: `data_flow_slices(pages)` runs per document inside one
Arrow pass and emits slice rows; per-document slices are independent.
"""

from __future__ import annotations

from joern_spark.cpg.core import Cpg, Node
from joern_spark.dataflow.engine import Engine, PathElement
from joern_spark.cpg.semantics import Semantics, default_semantics

DEFAULT_SLICE_DEPTH = 20


def ddg_in(engine: Engine, node: Node) -> list[Node]:
    """One visible backward DDG step (ExtendedCfgNodeMethods.ddgIn
    semantics: invisible elements are stepped through transparently)."""
    out: list[Node] = []
    seen: set[int] = set()
    stack = [(node, (node.id,))]
    while stack:
        cur, path_ids = stack.pop()
        elems = engine._expand_in(cur, [PathElement(n) for n in _fake_path(engine, path_ids)], ())
        for e in elems:
            if e.visible:
                if e.node.id not in seen:
                    seen.add(e.node.id)
                    out.append(e.node)
            elif e.node.id not in path_ids:
                stack.append((e.node, path_ids + (e.node.id,)))
    return out


def _fake_path(engine: Engine, path_ids):
    id_map = {n.id: n for n in engine.cpg.nodes}
    return [id_map[i] for i in path_ids]


def slice_for_call(cpg: Cpg, call: Node, slice_depth: int = DEFAULT_SLICE_DEPTH,
                   semantics: Semantics | None = None):
    """(slice_nodes, slice_edges) for one call's arguments."""
    engine = Engine(cpg, semantics or default_semantics())
    seeds = cpg.arguments(call)
    nodes: dict[int, Node] = {n.id: n for n in seeds}
    frontier = list(seeds)
    for _depth in range(slice_depth):
        nxt = []
        for n in frontier:
            for m in ddg_in(engine, n):
                if m.id not in nodes:
                    nodes[m.id] = m
                    nxt.append(m)
        if not nxt:
            break
        frontier = nxt
    edges = []
    for n in nodes.values():
        for e in cpg.inn(n, "REACHING_DEF"):
            if e.src.id in nodes:
                edges.append((e.src.id, e.dst.id, e.variable))
    return list(nodes.values()), edges


def data_flow_slices(pages, call_code_regex: str = ".*",
                     slice_depth: int = DEFAULT_SLICE_DEPTH):
    """Spark job: pages → slice rows (url, call_code, n_nodes, n_edges,
    node_codes)."""
    import re
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                                   StructField, StructType)

    from joern_spark.cpg.build import build_cpg
    from joern_spark.extract import extract_script_text

    schema = StructType([
        StructField("url", StringType()),
        StructField("call_code", StringType()),
        StructField("n_nodes", IntegerType()),
        StructField("n_edges", IntegerType()),
        StructField("node_codes", ArrayType(StringType())),
    ])
    rx = re.compile(call_code_regex, re.DOTALL)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                try:
                    cpg = build_cpg(extract_script_text(bytes(html).decode("utf-8", "replace")), url)
                except Exception:
                    continue
                calls = [n for n in cpg.nodes if n.label == "CALL"
                         and not n.name.startswith("<operator>")
                         and rx.fullmatch(n.code or "")]
                for c in calls:
                    nodes, edges = slice_for_call(cpg, c, slice_depth)
                    rows.append((url, c.code, len(nodes), len(edges),
                                 sorted({n.code for n in nodes})))
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(run, schema)
