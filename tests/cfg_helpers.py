"""Shared CFG-golden helper replicating the reference fixture's node
indexing (CfgTestFixture.scala:33-48: `cpg.method.ast.isCfgNode` order =
methods, each in AST preorder by `order` fields)."""

from __future__ import annotations


def cfg_nodes_in_fixture_order(cpg):
    out = []
    methods = sorted(cpg.methods(), key=lambda m: m.id)
    # program method first (the reference stores the file AST first)
    methods.sort(key=lambda m: 0 if m.name == ":program" else 1)
    for m in methods:
        for n in cpg.ast_subtree(m):
            # exclude METHOD_PARAMETER_OUT: the reference CFG fixture runs
            # only frontend+CFG passes, so paramOut nodes (a base-overlay
            # artifact) don't exist in its node indexing
            if n.is_cfg_node and n.label != "METHOD_PARAMETER_OUT":
                out.append(n)
    return out


def _match(n, code):
    # CfgTestFixture.matchCode: Method nodes match by NAME, others by code
    return n.name == code if n.label == "METHOD" else n.code == code


def succ_pairs(cpg, code, occurrence=0, label=None):
    matches = [n for n in cfg_nodes_in_fixture_order(cpg)
               if _match(n, code) and (label is None or n.label == label)]
    n = matches[occurrence]
    return {(e.dst.code if e.dst.label != "METHOD_RETURN" else "RET", e.variable)
            for e in cpg.out(n, "CFG")}


def succ_codes(cpg, code, occurrence=0, label=None):
    return {c for c, _k in succ_pairs(cpg, code, occurrence, label)}
