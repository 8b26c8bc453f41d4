"""Interprocedural taint/reachability engine (`reachableBy`).

Behavioral port of the reference's backward task engine
(dataflowengineoss queryengine/Engine.scala:23-298, TaskSolver.scala:23-213,
TaskCreator.scala:11-184, package.scala:5-106) as a synchronous
single-document solver: tasks are processed from a queue instead of a
work-stealing pool, which makes results deterministic and lets Spark own
the parallelism (one document per group, many documents per executor).

The corpus-scale variant (iterative DataFrame joins over the REACHING_DEF
edge table) lives in joern_spark/dataflow/reachable.py.
"""

from __future__ import annotations

from collections import deque
from typing import Optional

from joern_spark.cpg.core import Cpg, FIELD_ACCESS_NAMES, Node
from joern_spark.cpg.passes import called_methods, is_stub
from joern_spark.cpg.reachingdef import SemanticsView
from joern_spark.cpg.semantics import Semantics, default_semantics

MAX_CALL_DEPTH = 4
MAX_ARGS_TO_ALLOW = 1000
MAX_OUTPUT_ARGS_EXPANSION = 1000


class PathElement:
    __slots__ = ("node", "call_site_stack", "visible", "is_output_arg", "out_edge_label")

    def __init__(self, node: Node, call_site_stack=(), visible=True,
                 is_output_arg=False, out_edge_label=""):
        self.node = node
        self.call_site_stack = tuple(call_site_stack)
        self.visible = visible
        self.is_output_arg = is_output_arg
        self.out_edge_label = out_edge_label

    def key(self):
        return (self.node.id, tuple(c.id for c in self.call_site_stack),
                self.visible, self.is_output_arg, self.out_edge_label)


class Fingerprint:
    __slots__ = ("sink", "call_site_stack", "call_depth")

    def __init__(self, sink: Node, call_site_stack=(), call_depth=0):
        self.sink = sink
        self.call_site_stack = tuple(call_site_stack)
        self.call_depth = call_depth

    def key(self):
        return (self.sink.id, tuple(c.id for c in self.call_site_stack), self.call_depth)

    def __eq__(self, other):
        return self.key() == other.key()

    def __hash__(self):
        return hash(self.key())


class Result:
    __slots__ = ("task_stack", "path", "partial")

    def __init__(self, task_stack: list[Fingerprint], path: list[PathElement], partial=False):
        self.task_stack = task_stack
        self.path = path
        self.partial = partial

    @property
    def fingerprint(self) -> Fingerprint:
        return self.task_stack[-1]

    @property
    def call_site_stack(self):
        return self.fingerprint.call_site_stack

    @property
    def call_depth(self):
        return self.fingerprint.call_depth

    def output_argument(self) -> Optional[Node]:
        if self.path and self.path[0].is_output_arg:
            return self.path[0].node
        return None


class Task:
    __slots__ = ("task_stack", "initial_path")

    def __init__(self, task_stack: list[Fingerprint], initial_path: list[PathElement]):
        self.task_stack = task_stack
        self.initial_path = initial_path

    @property
    def fingerprint(self) -> Fingerprint:
        return self.task_stack[-1]

    @property
    def sink(self) -> Node:
        return self.fingerprint.sink


class Engine:
    def __init__(self, cpg: Cpg, semantics: Optional[Semantics] = None,
                 max_call_depth: int = MAX_CALL_DEPTH):
        self.cpg = cpg
        self.semantics = semantics or default_semantics()
        self.view = SemanticsView(cpg, self.semantics)
        self.max_call_depth = max_call_depth

    # --- public API --------------------------------------------------------
    def backwards(self, sinks: list[Node], sources: list[Node]) -> list[list[PathElement]]:
        """Engine.backwards: one task per sink; deterministic queue order."""
        sources_set = {s.id for s in sources}
        main_table: dict[Fingerprint, list[list[PathElement]]] = {}
        started: set[Fingerprint] = set()
        held: list[Task] = []
        queue: deque[Task] = deque()

        def submit(tasks):
            for t in tasks:
                if t.fingerprint in started:
                    held.append(t)
                else:
                    started.add(t.fingerprint)
                    queue.append(t)

        submit([Task([Fingerprint(s, (), 0)], []) for s in sinks])
        while queue:
            task = queue.popleft()
            entries, new_tasks = self._solve(task, sources_set)
            submit(new_tasks)
            for fp, path in entries:
                main_table.setdefault(fp, []).append(path)

        self._complete_held_tasks(held, main_table)
        results = []
        for sink in sinks:
            results.extend(main_table.get(Fingerprint(sink, (), 0), []))
        return self._deduplicate_final(results)

    # --- task solving (TaskSolver) ------------------------------------------
    def _solve(self, task: Task, sources: set[int]):
        table: dict[Fingerprint, list[Result]] = {}
        path = [PathElement(task.sink, task.fingerprint.call_site_stack)]
        self._results(task, task.sink, path, table, task.fingerprint.call_site_stack, sources)
        final = []
        for r in table.get(Fingerprint(task.sink, task.fingerprint.call_site_stack,
                                       task.fingerprint.call_depth), []):
            ts = r.task_stack[:-1] + [Fingerprint(r.fingerprint.sink,
                                                  r.fingerprint.call_site_stack,
                                                  task.fingerprint.call_depth)]
            final.append(Result(ts, r.path + task.initial_path, r.partial))
        partial = [r for r in final if r.partial]
        complete = [r for r in final if not r.partial]
        new_tasks = self._create_tasks(partial)
        entries = []
        for r in complete:
            entries.extend(self._result_to_entries(r))
        return entries, new_tasks

    def _result_to_entries(self, r: Result):
        out = []
        node_ids = [p.node.id for p in r.path]
        for parent in r.task_stack:
            try:
                stop = node_ids.index(parent.sink.id)
            except ValueError:
                stop = len(r.path)
            new_path = r.path[:stop] + [PathElement(parent.sink, parent.call_site_stack)]
            out.append((parent, new_path))
        return out

    def _results(self, task: Task, sink: Node, path: list[PathElement],
                 table: dict, call_site_stack, sources: set[int]):
        cur = path[0].node
        fp_key = Fingerprint(cur, task.fingerprint.call_site_stack,
                             task.fingerprint.call_depth)

        def compute_parents() -> list[Result]:
            res = []
            for parent_elem in self._expand_in(cur, path, call_site_stack):
                cached = table.get(Fingerprint(parent_elem.node,
                                               task.fingerprint.call_site_stack,
                                               task.fingerprint.call_depth))
                if cached is not None:
                    for r in cached:
                        pk = [(x.node.id, x.call_site_stack) for x in r.path]
                        try:
                            stop = pk.index((parent_elem.node.id, parent_elem.call_site_stack))
                        except ValueError:
                            stop = len(r.path)
                        complete = r.path[:stop] + [parent_elem] + path
                        res.append(Result(r.task_stack, complete, r.partial))
                else:
                    res.extend(self._results(task, sink, [parent_elem] + path, table,
                                             call_site_stack, sources))
            return _dedup_within_task(res)

        label = cur.label
        if cur.id in sources:
            if label == "METHOD_PARAMETER_IN":
                res = [Result(task.task_stack, list(path)),
                       Result(task.task_stack, list(path), partial=True)] + compute_parents()
            else:
                res = [Result(task.task_stack, list(path))] + compute_parents()
        elif label == "METHOD_PARAMETER_IN":
            res = [Result(task.task_stack, list(path), partial=True)]
        elif (label == "CALL"
              and self.view.is_call_to_internal_method_without_semantic(cur)
              and not self._is_arg_or_ret_of_method_we_came_from(cur, path)):
            res = [Result(task.task_stack,
                          [PathElement(cur, call_site_stack, is_output_arg=True)] + path[1:],
                          partial=True)]
        elif (cur.is_expression and len(path) > 1
              and self._in_call_without_semantic(cur)
              and not self._in_call_is_method_we_came_from(cur, path)):
            res = [Result(task.task_stack,
                          [PathElement(cur, call_site_stack, is_output_arg=True)] + path[1:],
                          partial=True)]
        elif label == "METHOD_REF":
            res = [Result(task.task_stack,
                          [PathElement(cur, call_site_stack, is_output_arg=True)] + path[1:],
                          partial=True)]
        else:
            res = compute_parents()

        table.setdefault(fp_key, []).extend(res)
        return res

    def _in_call_without_semantic(self, expr: Node) -> bool:
        call = self.cpg.in_call(expr)
        return call is not None and self.view.is_call_to_internal_method_without_semantic(call)

    def _is_arg_or_ret_of_method_we_came_from(self, call: Node, path) -> bool:
        if len(path) < 2:
            return False
        second = path[1].node
        if second.label in ("METHOD_RETURN", "METHOD_PARAMETER_IN"):
            m = self.cpg.method_of(second)
            return any(m2.id == m.id for m2 in called_methods(self.cpg, call))
        return False

    def _in_call_is_method_we_came_from(self, expr: Node, path) -> bool:
        call = self.cpg.in_call(expr)
        if call is None:
            return False
        return self._is_arg_or_ret_of_method_we_came_from(call, path)

    # --- DDG expansion (Engine.expandIn / elemForEdge / ddgInE) ----------------
    def _expand_in(self, cur: Node, path, call_site_stack) -> list[PathElement]:
        out = []
        on_path = {p.node.id for p in path}
        for e in self.cpg.inn(cur, "REACHING_DEF"):
            src = e.src
            if src.label == "METHOD" or src.id in on_path or not src.is_cfg_node:
                continue
            elem = self._elem_for_edge(e, call_site_stack)
            if elem is not None:
                out.append(elem)
        return out

    def _elem_for_edge(self, e, call_site_stack) -> Optional[PathElement]:
        cur, par = e.dst, e.src
        out_label = e.variable or ""
        if not self.view.is_valid_edge(cur, par):
            return None
        if cur.is_expression and par.is_expression:
            same_call_site = self.view.same_call_site(par, cur)
            if same_call_site:
                sem_exists = bool(self.view.for_call_by_arg(par))
                par_call = self.cpg.in_call(par)
                internal = [m for m in called_methods(self.cpg, par_call)
                            if not m.is_external] if par_call is not None else []
                visible = (sem_exists and self.view.is_defined(par)) or not internal
            else:
                visible = self.view.is_defined(par)
            is_out_arg = self.view.is_output_arg_of_internal_method(par)
            return PathElement(par, call_site_stack, visible, is_out_arg, out_label)
        return PathElement(par, call_site_stack, out_edge_label=out_label)

    # --- task creation (TaskCreator) ---------------------------------------------
    def _create_tasks(self, results: list[Result]) -> list[Task]:
        tasks = self._tasks_for_params(results) + self._tasks_for_out_args(results)
        valid = [t for t in tasks if t.fingerprint.call_depth <= self.max_call_depth]
        out = []
        for t in valid:
            keys = [f.key() for f in t.task_stack]
            if len(set(keys)) == len(keys):
                out.append(t)
        return out

    def _param_to_args(self, param: Node) -> list[Node]:
        method = self.cpg.method_of(param)
        args = []
        for e in self.cpg.inn(method, "CALL"):
            call = e.src
            arg = self.cpg.argument(call, param.index)
            if arg is not None:
                args.append(arg)
        # method-ref receivers: foo.bar(m) style — receiver of calls that
        # reference the method (paramToMethodRefCallReceivers, arg 0)
        for mr in [n for n in self.cpg.nodes if n.label == "METHOD_REF"
                   and n.method_full_name == method.full_name]:
            call = self.cpg.in_call(mr)
            if call is not None:
                arg0 = self.cpg.argument(call, 0)
                if arg0 is not None:
                    args.append(arg0)
        if len(args) > MAX_ARGS_TO_ALLOW:
            return []
        return args

    def _tasks_for_params(self, results: list[Result]) -> list[Task]:
        tasks = []
        for r in results:
            if not r.path or r.path[0].node.label != "METHOD_PARAMETER_IN":
                continue
            param = r.path[0].node
            stack = list(r.call_site_stack)
            if stack:
                call_site, tail = stack[0], stack[1:]
                for arg in self._param_to_args(param):
                    arg_call = self.cpg.in_call(arg)
                    if arg_call is not None and arg_call.id == call_site.id:
                        tasks.append(Task(
                            r.task_stack + [Fingerprint(arg, tail, r.call_depth - 1)],
                            list(r.path)))
            else:
                for arg in self._param_to_args(param):
                    tasks.append(Task(
                        r.task_stack + [Fingerprint(arg, (), r.call_depth + 1)],
                        list(r.path)))
        return tasks

    def _tasks_for_out_args(self, results: list[Result]) -> list[Task]:
        for_calls: list[Task] = []
        for_args: list[Task] = []
        for_method_refs: list[Task] = []
        seen = set()
        items = []
        for r in results:
            out_arg = r.output_argument()
            key = (id(r), out_arg.id if out_arg else None)
            if key in seen:
                continue
            seen.add(key)
            items.append((r, out_arg))
        for r, out_arg in items:
            if out_arg is None:
                continue
            if out_arg.label == "CALL":
                call = out_arg
                for m in called_methods(self.cpg, call):
                    m_ret = self.cpg.method_return(m)
                    return_statements = [e.src for e in self.cpg.inn(m_ret, "REACHING_DEF")
                                         if e.src.label == "RETURN"]
                    if m.is_external or is_stub(self.cpg, m):
                        recv = self.cpg.receiver(call)
                        cands = ([recv] if recv is not None else []) + self.cpg.arguments(call)
                        for arg in cands:
                            ts = r.task_stack + [Fingerprint(arg, r.call_site_stack,
                                                             r.call_depth)]
                            for_calls.append(Task(ts, list(r.path)))
                    else:
                        for ret_stmt in return_statements:
                            new_path = [PathElement(m_ret, r.call_site_stack)] + r.path
                            ts = r.task_stack + [Fingerprint(
                                ret_stmt, (call,) + tuple(r.call_site_stack),
                                r.call_depth + 1)]
                            for_calls.append(Task(ts, new_path))
            if out_arg.is_expression:
                if not r.call_site_stack:
                    in_call = self.cpg.in_call(out_arg)
                    if in_call is not None:
                        for m in called_methods(self.cpg, in_call):
                            if m.is_external:
                                continue
                            for p in self.cpg.parameters(m):
                                if p.index == out_arg.argument_index:
                                    p_out = self.cpg.param_out(p)
                                    if p_out is None:
                                        continue
                                    new_stack = (in_call,) + tuple(r.call_site_stack)
                                    ts = r.task_stack + [Fingerprint(
                                        p_out, new_stack, r.call_depth + 1)]
                                    for_args.append(Task(ts, list(r.path)))
            if out_arg.label == "METHOD_REF":
                for e in self.cpg.out(out_arg, "REF"):
                    m = e.dst
                    if m.label != "METHOD":
                        continue
                    m_ret = self.cpg.method_return(m)
                    for ret_stmt in [x.src for x in self.cpg.inn(m_ret, "REACHING_DEF")
                                     if x.src.label == "RETURN"]:
                        new_path = [PathElement(m_ret, r.call_site_stack)] + r.path
                        ts = r.task_stack + [Fingerprint(ret_stmt, r.call_site_stack,
                                                         r.call_depth + 1)]
                        for_method_refs.append(Task(ts, new_path))

        def restrict(lst):
            return lst if len(lst) <= MAX_OUTPUT_ARGS_EXPANSION else []

        return restrict(for_calls) + restrict(for_args) + restrict(for_method_refs)

    # --- held tasks (HeldTaskCompletion, simplified synchronous variant) --------
    def _complete_held_tasks(self, held: list[Task], main_table):
        changed = True
        while changed:
            changed = False
            for t in held:
                results = main_table.get(t.fingerprint)
                if not results:
                    continue
                for path in results:
                    for parent in t.task_stack[:-1]:
                        node_ids = [p.node.id for p in path + t.initial_path]
                        full = path + t.initial_path
                        try:
                            stop = node_ids.index(parent.sink.id)
                        except ValueError:
                            stop = len(full)
                        new_path = full[:stop] + [PathElement(parent.sink,
                                                              parent.call_site_stack)]
                        bucket = main_table.setdefault(parent, [])
                        if not _path_in(bucket, new_path):
                            bucket.append(new_path)
                            changed = True

    # --- final dedup (Engine.deduplicateFinal:154-179) ---------------------------
    def _deduplicate_final(self, paths: list[list[PathElement]]):
        groups: dict[tuple[int, int], list[list[PathElement]]] = {}
        for p in paths:
            if not p:
                continue
            groups.setdefault((p[0].node.id, p[-1].node.id), []).append(p)
        out = []
        for _k, lst in groups.items():
            max_len = max(len(p) for p in lst)
            with_max = [p for p in lst if len(p) == max_len]
            if len(with_max) == 1:
                out.append(with_max[0])
            else:
                out.append(min(with_max, key=lambda p: "-".join(
                    str((x.node.id, [c.id for c in x.call_site_stack], x.visible,
                         x.is_output_arg, x.out_edge_label)) for x in p)))
        return out


def _dedup_within_task(results: list[Result]) -> list[Result]:
    """TaskSolver.deduplicateWithinTask:89-117."""
    groups: dict = {}
    for r in results:
        if not r.path:
            continue
        h, l = r.path[0], r.path[-1]
        key = ((h.node.id, h.call_site_stack, h.is_output_arg),
               (l.node.id, l.call_site_stack, l.is_output_arg), r.partial, r.call_depth)
        groups.setdefault(key, []).append(r)
    out = []
    for _k, lst in groups.items():
        max_len = max(len(r.path) for r in lst)
        with_max = [r for r in lst if len(r.path) == max_len]
        if len(with_max) == 1:
            out.append(with_max[0])
        else:
            out.append(min(with_max, key=lambda r: (
                str(r.call_depth) + " "
                + str([(f.sink.id, [c.id for c in f.call_site_stack]) for f in r.task_stack])
                + " " + "-".join(str((x.node.id, [c.id for c in x.call_site_stack],
                                      x.visible, x.is_output_arg, x.out_edge_label))
                                 for x in r.path))))
    return out


def _path_in(bucket, path):
    pk = [(x.node.id, x.call_site_stack) for x in path]
    for b in bucket:
        if [(x.node.id, x.call_site_stack) for x in b] == pk:
            return True
    return False


# ---------------------------------------------------------------------------
# User-facing API (ExtendedCfgNode.reachableByFlows + Path.resultPairs)
# ---------------------------------------------------------------------------

def sources_to_starting_points(cpg: Cpg, sources: list[Node]) -> list[tuple[Node, Node]]:
    """SourcesToStartingPoints (simplified to the JS-relevant cases):
    returns (starting_point, source) pairs."""
    out: list[tuple[Node, Node]] = []
    for src in sources:
        if src.label == "METHOD_RETURN":
            m = cpg.method_of(src)
            for e in cpg.inn(m, "CALL"):
                out.append((e.src, src))
        elif src.label == "LITERAL":
            out.append((src, src))
            for target in _module_targets(cpg, src):
                for e in cpg.out(target, "REF"):
                    decl = e.dst
                    for usage in _first_usages_for_decl(cpg, decl):
                        out.append((usage, src))
        elif src.label == "IDENTIFIER":
            nodes = [src] + _field_and_index_accesses(cpg, src)
            for e in cpg.out(src, "REF"):
                decl = e.dst
                nodes.extend(_first_usages_for_decl(cpg, decl))
            for x in nodes:
                if x.label == "CALL":
                    out.append((x, src))
                    recv_in = [e.src for e in cpg.out(x, "RECEIVER")]
                    for rc in recv_in:
                        out.append((rc, src))
                else:
                    out.append((x, src))
        elif src.label == "CALL":
            out.append((src, src))
            for e in cpg.inn(src, "RECEIVER"):
                out.append((e.src, src))
        elif src.label == "MEMBER":
            # usages of the member name in methods of the type
            for m in cpg.methods():
                idents = [n for n in cpg.ast_subtree(m) if n.label == "IDENTIFIER"
                          and n.name == src.name]
                idents.sort(key=lambda x: (x.line or 0, x.column or 0))
                for i in idents[:1]:
                    out.append((i, src))
        elif src.is_cfg_node:
            out.append((src, src))
    # dedup, keep deterministic order by source id then sp id
    seen = set()
    res = []
    for sp, s in sorted(out, key=lambda t: (t[1].id, t[0].id)):
        if (sp.id, s.id) in seen:
            continue
        seen.add((sp.id, s.id))
        res.append((sp, s))
    return res


def _module_targets(cpg: Cpg, lit: Node) -> list[Node]:
    m = cpg.method_of(lit)
    if m is None:
        return []
    is_module = any(c.label == "MODIFIER" and c.modifier_type == "MODULE"
                    for c in cpg.ast_children(m))
    if not is_module:
        return []
    out = []
    cur = lit
    while cur is not None:
        parent = cpg.ast_parent(cur)
        if parent is None or not parent.is_expression:
            break
        if parent.label == "CALL" and parent.name == "<operator>.assignment":
            t = cpg.argument(parent, 1)
            if t is not None:
                out.append(t)
        cur = parent
    return out


def _first_usages_for_decl(cpg: Cpg, decl: Node) -> list[Node]:
    out = []
    for d, m in cpg.captures:
        if d.id != decl.id:
            continue
        idents = [n for n in cpg.ast_subtree(m) if n.label == "IDENTIFIER"
                  and n.name == decl.name]
        idents.sort(key=lambda x: (x.line or 0, x.column or 0))
        if idents:
            out.append(idents[0])
    return out


def _field_and_index_accesses(cpg: Cpg, ident: Node) -> list[Node]:
    if cpg.in_call(ident) is not None and cpg.inn(ident, "ARGUMENT"):
        return []
    m = cpg.method_of(ident)
    if m is None:
        return []
    out = []
    for n in cpg.method_body_nodes(m):
        if n.label == "IDENTIFIER" and n.name == ident.name:
            c = cpg.in_call(n)
            if c is not None and c.name in FIELD_ACCESS_NAMES:
                out.append(c)
    return out


def reachable_by(cpg: Cpg, sinks: list[Node], sources: list[Node],
                 semantics: Optional[Semantics] = None) -> list[Node]:
    """reachableBy: the head node of every (deduplicated) flow — one element
    per flow, duplicates included, matching the reference's `.size`
    semantics (`.dedup.size` = distinct sources)."""
    flows = _reachable_internal(cpg, sinks, sources, semantics)
    return [path[0].node for path in flows]


def reachable_by_count(cpg: Cpg, sinks: list[Node], sources: list[Node],
                       semantics: Optional[Semantics] = None, dedup=False) -> int:
    flows = _reachable_internal(cpg, sinks, sources, semantics)
    if dedup:
        return len({path[0].node.id for path in flows})
    return len(flows)


def _reachable_internal(cpg: Cpg, sinks, sources, semantics=None):
    sps = sources_to_starting_points(cpg, sources)
    engine = Engine(cpg, semantics)
    sink_list = sorted({s.id: s for s in sinks}.values(), key=lambda n: n.id)
    results = engine.backwards(sink_list, [sp for sp, _ in sps])
    sp_to_source = {sp.id: src for sp, src in sps}
    source_ids = {src.id for _sp, src in sps}
    out = []
    for path in results:
        head = path[0].node
        if head.id not in source_ids and head.id in sp_to_source:
            src = sp_to_source[head.id]
            if src.id != head.id:
                path = [PathElement(src)] + path
        out.append(path)
    return out


def reachable_by_flows(cpg: Cpg, sinks: list[Node], sources: list[Node],
                       semantics: Optional[Semantics] = None) -> list[list[Node]]:
    """reachableByFlows: visible path node lists (pre resultPairs)."""
    sps = sources_to_starting_points(cpg, sources)
    starting_ids = {sp.id for sp, _ in sps}
    flows = _reachable_internal(cpg, sinks, sources, semantics)
    out = []
    seen = set()
    for path in flows:
        first = path[0]
        if not first.visible and first.node.id not in starting_ids:
            continue
        visible = [x.node for x in path if x.node.id in starting_ids or x.visible]
        dedup_nodes = _remove_consecutive_dups(visible)
        key = tuple(n.id for n in dedup_nodes)
        if key not in seen:
            seen.add(key)
            out.append(dedup_nodes)
    return out


def _remove_consecutive_dups(nodes: list[Node]) -> list[Node]:
    out = []
    for n in nodes:
        if not out or out[-1].id != n.id:
            out.append(n)
    return out


def result_pairs(cpg: Cpg, flow: list[Node]) -> list[tuple[str, Optional[int]]]:
    """Path.resultPairs (Path.scala:10-20): (code, line) per element with
    consecutive duplicates collapsed; MethodParameterIn renders as
    `methodName(param codes...)`."""
    pairs = []
    for node in flow:
        if node.label == "METHOD_PARAMETER_IN":
            method = cpg.method_of(node)
            params = sorted(cpg.parameters(method), key=lambda p: p.order)
            code = f"{method.name}({', '.join(p.code for p in params)})"
            pairs.append((code, node.line))
        else:
            stmt = cpg.statement(node)
            pairs.append((cpg.repr_of(stmt), node.line))
    out = []
    for p in pairs:
        if not out or out[-1] != p:
            out.append(p)
    return out
