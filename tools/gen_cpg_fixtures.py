#!/usr/bin/env python
"""Generate DuckDB-readable oracle fixtures for the CPG driver queries.

The CPG queries (cpg_node_stats, cpg_build_flows, cpg_reachable_pairs,
cpg_scan_throughput) are not SQL-expressible, so their oracle is a
checked-in fixture computed here by the PURE-PYTHON engine running locally
in one process — no Spark.  The fixture oracle therefore checks that the
DISTRIBUTED orchestration (mapInPandas build, splits, joins, aggregations)
reproduces the local engine exactly; the local engine itself is verified
against the reference's own test suites (tests/test_dataflow_goldens.py,
test_cfg_goldens*.py — 40/40 + 96/96 reference assertions).

Exactness shortcut: a page's CPG depends only on its embedded script text,
which both page generators choose by doc index modulo len(SNIPPETS) — so we
build each residue class once and multiply by its cardinality.

Usage: python tools/gen_cpg_fixtures.py  (writes fixtures/*.csv)
"""

from __future__ import annotations

import csv
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from joern_spark.cpg.build import build_cpg  # noqa: E402
from joern_spark.extract import extract_script_text  # noqa: E402
from joern_spark.fixtures import SNIPPETS  # noqa: E402
from joern_spark.query.cpgql import Q  # noqa: E402
from joern_spark.query.scan import default_bundle  # noqa: E402
from joern_spark.sources.corpus import SNIPPET_IDS, page_for  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")
N_SNIPPETS = len(SNIPPET_IDS)


def build_for_residue(residue: int):
    """CPG for a pages_from_documents page with doc_id ≡ residue — only the
    script matters (extract drops body prose), mirroring corpus.py."""
    snippet = SNIPPETS[SNIPPET_IDS[residue % N_SNIPPETS]]
    html = ("<html><head><title>d</title></head><body><script>" + snippet
            + "\n</script><p>ignored</p></body></html>")
    text = extract_script_text(html)
    return build_cpg(text)


def label_counts(cpg) -> Counter:
    return Counter(n.label for n in cpg.nodes)


def scan_counts(cpg) -> dict[str, int]:
    q = Q(cpg)
    out = {}
    for query in default_bundle():
        n = int(query.matcher(cpg, q))
        if n > 0:
            out[query.name] = n
    return out


def reachable_pair_count(cpg) -> int:
    """Python replica of dataflow.reachable.reachable_pairs semantics:
    backward BFS from read-call sinks over REACHING_DEF edges; count
    distinct (source, sink) pairs with source an identifier named sz."""
    rev = defaultdict(list)
    for e in cpg.edges:
        if e.label == "REACHING_DEF":
            rev[e.dst.id].append(e.src.id)
    sources = {n.id for n in cpg.nodes
               if n.label == "IDENTIFIER" and n.name == "sz"}
    sinks = [n for n in cpg.nodes
             if n.label == "CALL" and n.code.startswith("read")]
    pairs = set()
    for sink in sinks:
        seen = {sink.id}
        frontier = [sink.id]
        while frontier:
            nxt = []
            for cur in frontier:
                for src in rev[cur]:
                    if src not in seen:
                        seen.add(src)
                        nxt.append(src)
            frontier = nxt
        for s in seen & sources:
            pairs.add((s, sink.id))
    return len(pairs)


def write_csv(name: str, header: list[str], rows: list[tuple]):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, name)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    print(f"wrote {path} ({len(rows)} rows)")


def main():
    con = duckdb.connect()
    doc_ids = [r[0] for r in con.sql(
        f"SELECT doc_id FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()]

    residue_cpg = {r: build_for_residue(r) for r in range(N_SNIPPETS)}
    residue_labels = {r: label_counts(c) for r, c in residue_cpg.items()}
    residue_scan = {r: scan_counts(c) for r, c in residue_cpg.items()}
    residue_pairs = {r: reachable_pair_count(c) for r, c in residue_cpg.items()}

    # cpg_node_stats: doc_id < 128
    totals: Counter = Counter()
    for d in doc_ids:
        if d < 128:
            totals.update(residue_labels[d % N_SNIPPETS])
    write_csv("cpg_node_stats_sf001.csv", ["label", "n_nodes"],
              sorted(totals.items()))

    # cpg_build_flows: doc_id < 256 → (query_name, n_docs_flagged, n_matches)
    flagged: Counter = Counter()
    matches: Counter = Counter()
    for d in doc_ids:
        if d < 256:
            for qn, n in residue_scan[d % N_SNIPPETS].items():
                flagged[qn] += 1
                matches[qn] += n
    write_csv("cpg_build_flows_sf001.csv",
              ["query_name", "n_docs_flagged", "n_matches"],
              sorted((qn, flagged[qn], matches[qn]) for qn in flagged))

    # cpg_reachable_pairs: doc_id < 64 → (url, n_pairs) for n_pairs > 0
    rows = []
    for d in doc_ids:
        if d < 64:
            n = residue_pairs[d % N_SNIPPETS]
            if n > 0:
                rows.append((f"https://docs.example.com/doc-{d}", n))
    write_csv("cpg_reachable_pairs_sf001.csv", ["url", "n_pairs"],
              sorted(rows))

    # cpg_scan_throughput: make_pages(4096) — page_for(i) embeds the same
    # snippet residue; urls/timestamps don't affect counts
    flagged = Counter()
    matches = Counter()
    for i in range(4096):
        for qn, n in residue_scan[i % N_SNIPPETS].items():
            flagged[qn] += 1
            matches[qn] += n
    # sanity: page_for must embed exactly snippet_id_for(i)'s snippet
    url, ts, html, text = page_for(7)
    assert SNIPPETS[SNIPPET_IDS[7 % N_SNIPPETS]] in html.decode()
    write_csv("cpg_scan_throughput.csv",
              ["query_name", "n_docs_flagged", "n_matches"],
              sorted((qn, flagged[qn], matches[qn]) for qn in flagged))

    # cpg_web_taint: make_taint_pages(1024) — snippet = i mod len(ids),
    # scanned with the web_taint_bundle
    from joern_spark.fixtures import WEB_TAINT_SNIPPETS
    from joern_spark.query.scan import web_taint_bundle
    from joern_spark.sources.corpus import taint_page_for

    ids = sorted(WEB_TAINT_SNIPPETS)
    taint_bundle = web_taint_bundle()

    def taint_scan_counts(residue: int) -> dict[str, int]:
        html = ("<html><head><title>t</title></head><body><script>"
                + WEB_TAINT_SNIPPETS[ids[residue]]
                + "\n</script></body></html>")
        cpg = build_cpg(extract_script_text(html))
        q = Q(cpg)
        return {query.name: n for query in taint_bundle
                if (n := int(query.matcher(cpg, q))) > 0}

    residue_taint = {r: taint_scan_counts(r) for r in range(len(ids))}
    flagged = Counter()
    matches = Counter()
    for i in range(1024):
        for qn, n in residue_taint[i % len(ids)].items():
            flagged[qn] += 1
            matches[qn] += n
    # sanity: taint_page_for must embed exactly ids[i % len]'s snippet
    _, _, html7, _ = taint_page_for(7)
    assert WEB_TAINT_SNIPPETS[ids[7 % len(ids)]] in html7.decode()
    write_csv("cpg_web_taint.csv",
              ["query_name", "n_docs_flagged", "n_matches"],
              sorted((qn, flagged[qn], matches[qn]) for qn in flagged))

    # cpg_cross_page_flows: make_site_pages(512) — per-residue summaries
    # via the SAME summarize_page the Spark UDF runs, then the
    # (domain, func_name) def×call join in plain Python
    from joern_spark.query.crosspage import summarize_page
    from joern_spark.sources.corpus import SITE_SNIPPETS, site_page_for

    residue_summary = {}
    for r in range(len(SITE_SNIPPETS)):
        url, _, html, _ = site_page_for(r)
        # flags depend only on the snippet; recompute once per residue
        residue_summary[r] = [
            (kind, name, tainted)
            for (_d, _u, kind, name, tainted) in
            summarize_page(url, html.decode())
        ]
    defs_by = defaultdict(set)    # (domain, name) -> def urls
    calls_by = defaultdict(set)   # (domain, name) -> call urls
    for i in range(512):
        url, _, _, _ = site_page_for(i)
        domain = url.split("/")[2]
        for kind, name, tainted in residue_summary[i % len(SITE_SNIPPETS)]:
            if not tainted:
                continue
            (defs_by if kind == "def" else calls_by)[(domain, name)].add(url)
    rows = []
    for key in sorted(set(defs_by) & set(calls_by)):
        domain, name = key
        pairs = sum(1 for d in defs_by[key] for c in calls_by[key] if d != c)
        if pairs:
            rows.append((domain, name, len(defs_by[key]),
                         len({c for d in defs_by[key]
                              for c in calls_by[key] if d != c}),
                         pairs))
    write_csv("cpg_cross_page_flows.csv",
              ["domain", "func_name", "n_source_pages", "n_sink_pages",
               "n_cross_flows"], rows)

    # cpg_cross_page_flows_transitive: make_chain_pages(256) — the fixture
    # is the per-page EXTENDED summary rows (def/call/wrap); the closure
    # itself is computed by DuckDB's recursive CTE in oracle_sql(), an
    # implementation independent of both the Spark BFS and this script.
    from joern_spark.query.crosspage import summarize_page_ext
    from joern_spark.sources.corpus import CHAIN_SNIPPETS, chain_page_for

    chain_residues = {}
    for r in range(len(CHAIN_SNIPPETS)):
        url, _, html, _ = chain_page_for(r)
        chain_residues[r] = [
            (kind, name, callee, tainted)
            for (_d, _u, kind, name, callee, tainted) in
            summarize_page_ext(url, html.decode())
        ]
    rows = []
    for i in range(256):
        url, _, _, _ = chain_page_for(i)
        domain = url.split("/")[2]
        for kind, name, callee, tainted in chain_residues[i % len(CHAIN_SNIPPETS)]:
            rows.append((domain, url, kind, name, callee or "",
                         "true" if tainted else "false"))
    write_csv("cpg_chain_summaries.csv",
              ["domain", "url", "kind", "func_name", "callee_name",
               "tainted"], rows)


if __name__ == "__main__":
    main()
