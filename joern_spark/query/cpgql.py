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

from joern_spark.cpg.core import (
    ALL_ARITHMETIC_TYPES, ALL_ARRAY_ACCESS_TYPES, ALL_ASSIGNMENT_TYPES,
    ALL_FIELD_ACCESS_TYPES, Cpg, Node,
)


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

    def is_local(self) -> "Steps":
        return self._label("LOCAL")

    def is_method(self) -> "Steps":
        return self._label("METHOD")

    def is_type_ref(self) -> "Steps":
        return self._label("TYPE_REF")

    def is_field_identifier(self) -> "Steps":
        return self._label("FIELD_IDENTIFIER")

    def is_jump_target(self) -> "Steps":
        return self._label("JUMP_TARGET")

    def is_parameter(self) -> "Steps":
        return self._label("METHOD_PARAMETER_IN")

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

    # --- generic repeat/emit/until (flatgraph repeat semantics) ----------------
    def repeat(self, step, until=None, max_depth: int = 64, emit: bool = True) -> "Steps":
        """repeat(_.step)(_.emit.until(cond)): union of all iterations'
        frontiers (emit), stopping expansion at nodes matching `until`."""
        out, seen = [], set()
        frontier = list(self.nodes)
        for _ in range(max_depth):
            if not frontier:
                break
            if emit:
                for n in frontier:
                    if n.id not in seen:
                        seen.add(n.id)
                        out.append(n)
            stop = set()
            if until is not None:
                stop = {n.id for n in frontier
                        if until(Steps(self.cpg, [n])).size() > 0}
            nxt_nodes = step(Steps(self.cpg, [n for n in frontier
                                              if n.id not in stop])).l()
            frontier = [n for n in nxt_nodes if n.id not in seen]
        return Steps(self.cpg, out)

    # --- more AST steps (AstNodeTraversal.scala:23-94) -------------------------
    def ast_siblings(self) -> "Steps":
        out = []
        for n in self.nodes:
            p = self.cpg.ast_parent(n)
            if p is not None:
                out.extend(c for c in self.cpg.ast_children(p) if c.id != n.id)
        return Steps(self.cpg, out)

    def ast_minus_root(self) -> "Steps":
        roots = {n.id for n in self.nodes}
        return self.ast().filter(lambda n: n.id not in roots)

    def parent_block(self) -> "Steps":
        """AstNodeTraversal.parentBlock: `repeat(_._astIn)(_.emit.until(
        Block))` — the walk EMITS the starting node, so a block's parent
        block is itself."""
        out = []
        for n in self.nodes:
            cur = n
            while cur is not None and cur.label != "BLOCK":
                cur = self.cpg.ast_parent(cur)
            if cur is not None:
                out.append(cur)
        return Steps(self.cpg, out)

    def depth(self) -> int:
        """max AST depth over the traversal's roots."""
        def d(n):
            kids = self.cpg.ast_children(n)
            return 1 + (max((d(k) for k in kids), default=0))
        return max((d(n) for n in self.nodes), default=0)

    def contains_call_to(self, regex: str) -> "Steps":
        import re as _re
        r = _re.compile(regex, _re.DOTALL)
        return self.filter(lambda n: any(
            x.label == "CALL" and r.fullmatch(x.code or "")
            for x in self.cpg.ast_subtree(n)))

    # --- more CFG steps (CfgNodeMethods.scala:18-39) ---------------------------
    def cfg_next_n(self, n_hops: int) -> "Steps":
        s = self
        for _ in range(n_hops):
            s = s.cfg_next()
        return s

    def cfg_next_rec(self, depth: int) -> "Steps":
        """cfgNext(n): ALL CFG successors within n hops, nearest first
        (CfgNodeTraversal.scala)."""
        out, cur = [], self
        for _ in range(depth):
            cur = cur.cfg_next().dedup()
            out.extend(cur.l())
        return Steps(self.cpg, out).dedup()

    def cfg_prev_rec(self, depth: int) -> "Steps":
        """cfgPrev(n): ALL CFG predecessors within n hops, nearest first."""
        out, cur = [], self
        for _ in range(depth):
            cur = cur.cfg_prev().dedup()
            out.extend(cur.l())
        return Steps(self.cpg, out).dedup()

    def calls(self, regex: str | None = None) -> "Steps":
        """MethodTraversal.call: CALL nodes within the method body."""
        out = []
        for n in self.nodes:
            out.extend(x for x in self.cpg.method_body_nodes(n)
                       if x.label == "CALL")
        s = Steps(self.cpg, out)
        return s.name(regex) if regex else s

    def cfg_first(self) -> "Steps":
        return self.cfg_next()

    def cfg_last(self) -> "Steps":
        out = []
        for n in self.nodes:
            ret = self.cpg.method_return(n) if n.label == "METHOD" else None
            if ret is not None:
                out.extend(e.src for e in self.cpg.inn(ret, "CFG"))
        return Steps(self.cpg, out)

    # --- control-structure parts (ControlStructureTraversal.scala:19-59) ------
    def condition(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(e.dst for e in self.cpg.out(n, "CONDITION"))
        return Steps(self.cpg, out)

    def when_true(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(e.dst for e in self.cpg.out(n, "TRUE_BODY"))
        return Steps(self.cpg, out)

    def when_false(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(e.dst for e in self.cpg.out(n, "FALSE_BODY"))
        return Steps(self.cpg, out)

    def is_if(self) -> "Steps":
        return self.filter(lambda n: n.control_structure_type == "IF")

    def is_while(self) -> "Steps":
        return self.filter(lambda n: n.control_structure_type == "WHILE")

    # --- method structure (types/structure/MethodTraversal.scala:97-173) ------
    def internal(self) -> "Steps":
        return self.filter(lambda n: not n.is_external)

    def external(self) -> "Steps":
        return self.filter(lambda n: n.is_external)

    def is_stub(self) -> "Steps":
        from joern_spark.cpg.passes import is_stub as _is_stub
        return self.filter(lambda n: n.label == "METHOD" and _is_stub(self.cpg, n))

    def body(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(c for c in self.cpg.ast_children(n) if c.label == "BLOCK")
        return Steps(self.cpg, out)

    def local(self) -> "Steps":
        out = []
        for n in self.nodes:
            for x in self.cpg.ast_subtree(n):
                if x.label == "LOCAL":
                    out.append(x)
        return Steps(self.cpg, out)

    def number_of_lines(self) -> list[int]:
        out = []
        for n in self.nodes:
            lines = [x.line for x in self.cpg.ast_subtree(n) if x.line is not None]
            out.append(max(lines) - min(lines) + 1 if lines else 0)
        return out

    def typ(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(e.dst for e in self.cpg.out(n, "EVAL_TYPE"))
        return Steps(self.cpg, out)

    def index_from(self, i: int) -> "Steps":
        """MethodParameterTraversal.indexFrom."""
        return self.filter(lambda n: (n.index or 0) >= i)

    def index_to(self, i: int) -> "Steps":
        """MethodParameterTraversal.indexTo."""
        return self.filter(lambda n: (n.index or 0) <= i)

    def has_modifier(self, modifier_type: str) -> "Steps":
        """AstNodeMethods.hasModifier: a MODIFIER AST child of that type."""
        return self.filter(lambda n: any(
            c.label == "MODIFIER" and c.modifier_type == modifier_type
            for c in self.cpg.ast_children(n)))

    def defining_type_decl(self) -> "Steps":
        """MethodTraversal.definingTypeDecl: nearest TYPE_DECL ancestor."""
        out = []
        for n in self.nodes:
            cur = self.cpg.ast_parent(n)
            while cur is not None and cur.label != "TYPE_DECL":
                cur = self.cpg.ast_parent(cur)
            if cur is not None:
                out.append(cur)
        return Steps(self.cpg, out)

    def namespace(self) -> "Steps":
        """NAMESPACE of the node: FILE/TYPE_DECL/METHOD resolve through
        their (possibly enclosing) NAMESPACE_BLOCK's REF edge; a FILE
        resolves through blocks attached via SOURCE_FILE."""
        out = []
        for n in self.nodes:
            blocks = []
            if n.label == "FILE":
                blocks = [e.src for e in self.cpg.inn(n, "SOURCE_FILE")
                          if e.src.label == "NAMESPACE_BLOCK"]
            else:
                cur = n if n.label == "NAMESPACE_BLOCK" else self.cpg.ast_parent(n)
                while cur is not None and cur.label != "NAMESPACE_BLOCK":
                    cur = self.cpg.ast_parent(cur)
                if cur is not None:
                    blocks = [cur]
            for b in blocks:
                out.extend(e.dst for e in self.cpg.out(b, "REF")
                           if e.dst.label == "NAMESPACE")
        return Steps(self.cpg, out)

    def file(self) -> "Steps":
        """FILE of the node: SOURCE_FILE out-edge, or the enclosing
        method's/typedecl's file for expressions."""
        out = []
        for n in self.nodes:
            cur = n
            while cur is not None:
                files = [e.dst for e in self.cpg.out(cur, "SOURCE_FILE")]
                if files:
                    out.extend(files)
                    break
                cur = self.cpg.ast_parent(cur)
        return Steps(self.cpg, out)

    def contained_type_decls(self) -> "Steps":
        """TYPE_DECLs of a FILE (via SOURCE_FILE in-edges) or AST children
        of a NAMESPACE_BLOCK / REF-in blocks of a NAMESPACE."""
        out = []
        for n in self.nodes:
            if n.label == "FILE":
                out.extend(e.src for e in self.cpg.inn(n, "SOURCE_FILE")
                           if e.src.label == "TYPE_DECL")
            elif n.label == "NAMESPACE_BLOCK":
                out.extend(c for c in self.cpg.ast_children(n)
                           if c.label == "TYPE_DECL")
            elif n.label == "NAMESPACE":
                for e in self.cpg.inn(n, "REF"):
                    if e.src.label == "NAMESPACE_BLOCK":
                        out.extend(c for c in self.cpg.ast_children(e.src)
                                   if c.label == "TYPE_DECL")
        return Steps(self.cpg, out)

    def top_level_expressions(self) -> "Steps":
        """MethodTraversal.topLevelExpressions: the body block's direct
        expression children."""
        out = []
        for n in self.nodes:
            for block in self.cpg.ast_children(n):
                if block.label != "BLOCK":
                    continue
                out.extend(c for c in self.cpg.ast_children(block)
                           if c.is_expression and c.label != "BLOCK")
        return Steps(self.cpg, out)

    def literal_in(self) -> "Steps":
        """MethodTraversal.literal: literals within the method body."""
        out = []
        for n in self.nodes:
            out.extend(x for x in self.cpg.method_body_nodes(n)
                       if x.label == "LITERAL")
        return Steps(self.cpg, out)

    def content(self) -> list[str]:
        """Method.content: the [offset, offsetEnd) slice of the node's
        FILE content (only when both the span and the file exist)."""
        out = []
        for n in self.nodes:
            if n.start is None or n.end is None:
                continue
            files = Steps(self.cpg, [n]).file().l()
            if not files or not files[0].content:
                continue
            out.append(files[0].content[n.start:n.end])
        return out

    def location(self) -> list[tuple[str, str, int]]:
        """(filename, method name, line) per node (NodeSteps.location)."""
        out = []
        for n in self.nodes:
            m = self.cpg.method_of(n)
            out.append((self.cpg.filename, m.name if m else "<global>", n.line))
        return out

    def to_json(self) -> str:
        import json
        return json.dumps([
            {"id": n.id, "label": n.label, "name": n.name, "code": n.code,
             "line": n.line} for n in self.nodes])

    # --- operator views (operatorextension package.scala:5-55) -----------------
    def arithmetic(self) -> "Steps":
        return self.filter(lambda n: n.label == "CALL"
                           and n.name in ALL_ARITHMETIC_TYPES)

    def array_access(self) -> "Steps":
        return self.filter(lambda n: n.label == "CALL"
                           and n.name in ALL_ARRAY_ACCESS_TYPES)

    def target(self) -> "Steps":
        """assignment target = argument(1) (AssignmentTraversal.scala:13-16)."""
        return self.argument(1)

    def source(self) -> "Steps":
        """assignment source = argument(2)."""
        return self.argument(2)

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
        return self.filter(lambda n: n.label == "CALL"
                           and n.name in ALL_FIELD_ACCESS_TYPES)

    # --- type hierarchy (TypeDecl/Type traversals, TypeTests.scala) ----------
    def member(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(c for c in self.cpg.ast_children(n)
                       if c.label == "MEMBER")
        return Steps(self.cpg, out)

    def is_static(self) -> "Steps":
        return self.has_modifier("STATIC")

    def _decl_of(self, n):
        if n.label == "TYPE_DECL":
            return n
        if n.label == "TYPE":
            for e in self.cpg.out(n, "REF"):
                if e.dst.label == "TYPE_DECL":
                    return e.dst
        return None

    def _type_of(self, n):
        if n.label == "TYPE":
            return n
        if n.label == "TYPE_DECL":
            for e in self.cpg.inn(n, "REF"):
                if e.src.label == "TYPE":
                    return e.src
        return None

    def base_type_decl(self) -> "Steps":
        out = []
        for n in self.nodes:
            for e in self.cpg.out(n, "INHERITS_FROM"):
                d = self._decl_of(e.dst)
                if d is not None:
                    out.append(d)
        return Steps(self.cpg, out)

    def derived_type_decl(self) -> "Steps":
        out = []
        for n in self.nodes:
            targets = [n, self._type_of(n)]
            for t in targets:
                if t is None:
                    continue
                out.extend(e.src for e in self.cpg.inn(t, "INHERITS_FROM")
                           if e.src.label == "TYPE_DECL")
        return Steps(self.cpg, out).dedup()

    def _hier_transitive(self, step) -> "Steps":
        out, frontier, seen = [], self, set(n.id for n in self.nodes)
        for _ in range(64):
            frontier = step(frontier).filter(lambda n: n.id not in seen)
            if not frontier.nodes:
                break
            seen.update(n.id for n in frontier.nodes)
            out.extend(frontier.nodes)
        return Steps(self.cpg, out)

    def base_type_decl_transitive(self) -> "Steps":
        return self._hier_transitive(Steps.base_type_decl)

    def derived_type_decl_transitive(self) -> "Steps":
        return self._hier_transitive(Steps.derived_type_decl)

    def base_type(self) -> "Steps":
        decls = Steps(self.cpg, [d for d in (self._decl_of(n)
                                             for n in self.nodes)
                                 if d is not None])
        out = [t for t in (self._type_of(d)
                           for d in decls.base_type_decl().l())
               if t is not None]
        return Steps(self.cpg, out)

    def derived_type(self) -> "Steps":
        decls = Steps(self.cpg, [d for d in (self._decl_of(n)
                                             for n in self.nodes)
                                 if d is not None])
        out = [t for t in (self._type_of(d)
                           for d in decls.derived_type_decl().l())
               if t is not None]
        return Steps(self.cpg, out)

    def base_type_transitive(self) -> "Steps":
        return self._hier_transitive(Steps.base_type)

    def derived_type_transitive(self) -> "Steps":
        return self._hier_transitive(Steps.derived_type)

    def referenced_member(self) -> "Steps":
        """fieldAccess.referencedMember (FieldAccessLinkerPass REF edges)."""
        out = []
        for n in self.nodes:
            out.extend(e.dst for e in self.cpg.out(n, "REF")
                       if e.dst.label == "MEMBER")
        return Steps(self.cpg, out)

    def alias_of(self) -> "Steps":
        """TYPE_DECL.aliasedType via ALIAS_OF (AliasLinkerPass)."""
        out = []
        for n in self.nodes:
            out.extend(e.dst for e in self.cpg.out(n, "ALIAS_OF"))
        return Steps(self.cpg, out)

    # --- binding extension (bindingextension Binding/TypeDecl/Method) -------
    def method_binding(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(e.dst for e in self.cpg.out(n, "BINDS")
                       if e.dst.label == "BINDING")
        return Steps(self.cpg, out)

    def bound_method(self) -> "Steps":
        out = []
        for n in self.nodes:
            if n.label == "BINDING":
                out.extend(e.dst for e in self.cpg.out(n, "REF")
                           if e.dst.label == "METHOD")
            elif n.label == "TYPE_DECL":
                for e in self.cpg.out(n, "BINDS"):
                    out.extend(e2.dst for e2 in self.cpg.out(e.dst, "REF")
                               if e2.dst.label == "METHOD")
        return Steps(self.cpg, out)

    def referencing_binding(self) -> "Steps":
        out = []
        for n in self.nodes:
            out.extend(e.src for e in self.cpg.inn(n, "REF")
                       if e.src.label == "BINDING")
        return Steps(self.cpg, out)

    def binding_type_decl(self) -> "Steps":
        out = []
        for n in self.nodes:
            bindings = ([n] if n.label == "BINDING"
                        else [e.src for e in self.cpg.inn(n, "REF")
                              if e.src.label == "BINDING"])
            for b in bindings:
                out.extend(e.src for e in self.cpg.inn(b, "BINDS")
                           if e.src.label == "TYPE_DECL")
        return Steps(self.cpg, out)

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
                                if n.label == "CALL"
                                and n.name in ALL_FIELD_ACCESS_TYPES])

    def assignment(self) -> Steps:
        return Steps(self.cpg, [n for n in self.cpg.nodes
                                if n.label == "CALL"
                                and n.name in ALL_ASSIGNMENT_TYPES])

    def arithmetic(self) -> Steps:
        return Steps(self.cpg, [n for n in self.cpg.nodes
                                if n.label == "CALL"
                                and n.name in ALL_ARITHMETIC_TYPES])

    def array_access(self) -> Steps:
        return Steps(self.cpg, [n for n in self.cpg.nodes
                                if n.label == "CALL"
                                and n.name in ALL_ARRAY_ACCESS_TYPES])

    def type_decl(self, regex: str | None = None) -> Steps:
        s = Steps(self.cpg, [n for n in self.cpg.nodes if n.label == "TYPE_DECL"])
        return s.name(regex) if regex else s

    def file(self) -> Steps:
        return Steps(self.cpg, [n for n in self.cpg.nodes if n.label == "FILE"])

    def namespace_block(self) -> Steps:
        return Steps(self.cpg, [n for n in self.cpg.nodes
                                if n.label == "NAMESPACE_BLOCK"])

    def namespace(self, regex: str | None = None) -> Steps:
        s = Steps(self.cpg, [n for n in self.cpg.nodes
                             if n.label == "NAMESPACE"])
        return s.name(regex) if regex else s

    def typ(self, regex: str | None = None) -> Steps:
        s = Steps(self.cpg, [n for n in self.cpg.nodes
                             if n.label == "TYPE"])
        return s.name(regex) if regex else s

    def control_structure(self, cs_type: str | None = None) -> Steps:
        s = Steps(self.cpg, [n for n in self.cpg.nodes
                             if n.label == "CONTROL_STRUCTURE"])
        return s.filter(lambda n: n.control_structure_type == cs_type) if cs_type else s
