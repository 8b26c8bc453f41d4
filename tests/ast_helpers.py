"""Shared helpers for AST-structure golden tests (the JsSrc2CpgSuite
traversal vocabulary over our per-document CPG)."""

from __future__ import annotations


def control_structures(cpg, cs_type: str):
    return [n for n in cpg.nodes if n.label == "CONTROL_STRUCTURE"
            and n.control_structure_type == cs_type]


def out_nodes(cpg, node, label: str):
    return [e.dst for e in cpg.out(node, label)]


def condition_codes(cpg, node):
    return [n.code for n in out_nodes(cpg, node, "CONDITION")]


def ast_children(cpg, node):
    return sorted((e.dst for e in cpg.out(node, "AST")), key=lambda n: n.order)


def child_codes(cpg, node):
    return [c.code for c in ast_children(cpg, node)]
