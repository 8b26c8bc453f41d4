"""CPGQL-style traversal steps over a per-document CPG.

Mirrors the reference's query algebra (SURVEY.md §2B): node-type starters,
full-match regex property filters, AST/CFG hops, call/argument navigation,
where/whereNot, union/dedup.  The same steps exist as DataFrame operators
in joern_spark.query.frames for corpus-level queries; this in-memory form
runs inside per-document UDFs (scan jobs) and in tests.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable

from joern_spark.cpg.core import ALL_ASSIGNMENT_TYPES, Cpg, Node


class Steps:
    """A lazy-ish traversal: wraps a list of nodes + the cpg."""

    def __init__(self, cpg: Cpg, nodes: Iterable[Node]):
        self.cpg = cpg
        self.nodes = list(nodes)

    # --- relational glue ---------------------------------------------------
    def l(self) -> list[Node]:
        return list(self.nodes)

    def dedup(self) -> "Steps":
        seen, out = set(), []
        for n in self.nodes:
            if n.id not in seen:
                seen.add(n.id)
                out.append(n)
        return Steps(self.cpg, out)

    def size(self) -> int:
        return len(self.nodes)

    def filter(self, pred: Callable[[Node], bool]) -> "Steps":
        return Steps(self.cpg, [n for n in self.nodes if pred(n)])

    def where(self, trav: Callable[["Steps"], "Steps"]) -> "Steps":
        return self.filter(lambda n: trav(Steps(self.cpg, [n])).size() > 0)

    def where_not(self, trav: Callable[["Steps"], "Steps"]) -> "Steps":
        return self.filter(lambda n: trav(Steps(self.cpg, [n])).size() == 0)

    def union(self, other: "Steps") -> "Steps":
        return Steps(self.cpg, self.nodes + other.nodes)

    def sort_by_id(self) -> "Steps":
        return Steps(self.cpg, sorted(self.nodes, key=lambda n: n.id))

    # --- property filters (full-match regex, like the reference) ------------
    def name(self, regex: str) -> "Steps":
        r = re.compile(regex)
        return self.filter(lambda n: r.fullmatch(n.name or "") is not None)

    def name_exact(self, s: str) -> "Steps":
        return self.filter(lambda n: n.name == s)

    def code(self, regex: str) -> "Steps":
        r = re.compile(regex, re.DOTALL)
        return self.filter(lambda n: r.fullmatch(n.code or "") is not None)

    def code_exact(self, s: str) -> "Steps":
        return self.filter(lambda n: n.code == s)

    def line_number(self, line: int) -> "Steps":
        return self.filter(lambda n: n.line == line)

    def order(self, i: int) -> "Steps":
        return self.filter(lambda n: n.order == i)

    def index(self, i: int) -> "Steps":
        return self.filter(lambda n: n.index == i)

    def argument_index(self, i: int) -> "Steps":
        return self.filter(lambda n: n.argument_index == i)

    # --- label filters -------------------------------------------------------
    def _label(self, label: str) -> "Steps":
        return self.filter(lambda n: n.label == label)

    def is_call(self) -> "Steps":
        return self._label("CALL")

    def is_identifier(self) -> "Steps":
        return self._label("IDENTIFIER")

    def is_literal(self) -> "Steps":
        return self._label("LITERAL")

    def is_return(self) -> "Steps":
        return self._label("RETURN")

    def is_block(self) -> "Steps":
        return self._label("BLOCK")

    def is_control_structure(self) -> "Steps":
        return self._label("CONTROL_STRUCTURE")

    def is_member(self) -> "Steps":
        return self._label("MEMBER")

    def is_method_ref(self) -> "Steps":
        return self._label("METHOD_REF")

    def is_expression(self) -> "Steps":
        return self.filter(lambda n: n.is_expression)

    # --- AST steps -------------------------------------------------------------
    def ast(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(self.cpg.ast_subtree(n))
        return Steps(self.cpg, out)

    def ast_children(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(self.cpg.ast_children(n))
        return Steps(self.cpg, out)

    def ast_parent(self) -> "Steps":
        out = []
        for n in self.nodes:
            p = self.cpg.ast_parent(n)
            if p is not None:
                out.append(p)
        return Steps(self.cpg, out)

    def in_ast(self) -> "Steps":
        out = []
        for n in self.nodes:
            cur = n
            while cur is not None:
                out.append(cur)
                cur = self.cpg.ast_parent(cur)
        return Steps(self.cpg, out)

    # --- CFG steps ----------------------------------------------------------------
    def cfg_next(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(e.dst for e in self.cpg.out(n, "CFG"))
        return Steps(self.cpg, out)

    def cfg_prev(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(e.src for e in self.cpg.inn(n, "CFG"))
        return Steps(self.cpg, out)

    # --- call structure -------------------------------------------------------------
    def argument(self, i: int | None = None) -> "Steps":
        out = []
        for n in self.nodes:
            if i is None:
                out.extend(self.cpg.arguments(n))
            else:
                a = self.cpg.argument(n, i)
                if a is not None:
                    out.append(a)
        return Steps(self.cpg, out)

    def receiver(self) -> "Steps":
        out = []
        for n in self.nodes:
            r = self.cpg.receiver(n)
            if r is not None:
                out.append(r)
        return Steps(self.cpg, out)

    def in_call(self) -> "Steps":
        out = []
        for n in self.nodes:
            c = self.cpg.in_call(n)
            if c is not None:
                out.append(c)
        return Steps(self.cpg, out)

    def callee(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(e.dst for e in self.cpg.out(n, "CALL"))
        return Steps(self.cpg, out)

    def call_in(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(e.src for e in self.cpg.inn(n, "CALL"))
        return Steps(self.cpg, out)

    # --- method structure ---------------------------------------------------------------
    def parameter(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(self.cpg.parameters(n))
        return Steps(self.cpg, out)

    def method_return(self) -> "Steps":
        return Steps(self.cpg, [self.cpg.method_return(n) for n in self.nodes])

    def method(self) -> "Steps":
        out = []
        for n in self.nodes:
            m = self.cpg.method_of(n)
            if m is not None:
                out.append(m)
        return Steps(self.cpg, out)

    def refs_to(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(e.dst for e in self.cpg.out(n, "REF"))
        return Steps(self.cpg, out)

    # --- DOM / PDOM / CDG closures (CfgNodeMethods.scala:42-108) --------------
    def _closure(self, edge_label: str, forward: bool) -> "Steps":
        out, seen = [], set()
        frontier = list(self.nodes)
        while frontier:
            nxt = []
            for n in frontier:
                es = self.cpg.out(n, edge_label) if forward else self.cpg.inn(n, edge_label)
                for e in es:
                    m = e.dst if forward else e.src
                    if m.id not in seen:
                        seen.add(m.id)
                        out.append(m)
                        nxt.append(m)
            frontier = nxt
        return Steps(self.cpg, out)

    def dominates(self) -> "Steps":
        return self._closure("DOMINATE", forward=True)

    def dominated_by(self) -> "Steps":
        return self._closure("DOMINATE", forward=False)

    def post_dominates(self) -> "Steps":
        return self._closure("POST_DOMINATE", forward=True)

    def post_dominated_by(self) -> "Steps":
        return self._closure("POST_DOMINATE", forward=False)

    def controls(self) -> "Steps":
        return self._closure("CDG", forward=True)

    def controlled_by(self) -> "Steps":
        return self._closure("CDG", forward=False)

    # --- tagging (NodeSteps.scala:98-117: newTagNode → TAG + TAGGED_BY) -------
    def new_tag_node(self, name: str) -> "Steps":
        from joern_spark.cpg.core import Node
        for n in self.nodes:
            tag = Node("TAG", name=name, code=name)
            self.cpg.add_node(tag)
            self.cpg.add_edge(n, tag, "TAGGED_BY")
        return self

    def tag(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(e.dst for e in self.cpg.out(n, "TAGGED_BY"))
        return Steps(self.cpg, out)

    # --- operator views -------------------------------------------------------
    def assignment(self) -> "Steps":
        return self.filter(lambda n: n.label == "CALL" and n.name in ALL_ASSIGNMENT_TYPES)

    def field_access(self) -> "Steps":
        return self.filter(lambda n: n.label == "CALL" and n.name == "<operator>.fieldAccess")

    def field_identifier(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(c for c in self.cpg.ast_children(n) if c.label == "FIELD_IDENTIFIER")
        return Steps(self.cpg, out)

    def canonical_name(self, regex: str) -> "Steps":
        r = re.compile(regex)
        return self.filter(lambda n: r.fullmatch(n.canonical_name or "") is not None)


class Q:
    """Root starters (NodeTypeStarters)."""

    def __init__(self, cpg: Cpg):
        self.cpg = cpg

    def all(self) -> Steps:
        return Steps(self.cpg, self.cpg.nodes)

    def method(self, regex: str | None = None) -> Steps:
        s = Steps(self.cpg, self.cpg.methods())
        return s.name(regex) if regex else s

    def call(self, regex: str | None = None) -> Steps:
        s = Steps(self.cpg, [n for n in self.cpg.nodes if n.label == "CALL"])
        return s.name(regex) if regex else s

    def identifier(self, regex: str | None = None) -> Steps:
        s = Steps(self.cpg, [n for n in self.cpg.nodes if n.label == "IDENTIFIER"])
        return s.name(regex) if regex else s

    def literal(self, regex: str | None = None) -> Steps:
        s = Steps(self.cpg, [n for n in self.cpg.nodes if n.label == "LITERAL"])
        return s.code(regex) if regex else s

    def local(self) -> Steps:
        return Steps(self.cpg, [n for n in self.cpg.nodes if n.label == "LOCAL"])

    def member(self) -> Steps:
        return Steps(self.cpg, [n for n in self.cpg.nodes if n.label == "MEMBER"])

    def ret(self) -> Steps:
        return Steps(self.cpg, [n for n in self.cpg.nodes if n.label == "RETURN"])

    def field_access(self) -> Steps:
        return Steps(self.cpg, [n for n in self.cpg.nodes
                                if n.label == "CALL" and n.name == "<operator>.fieldAccess"])
