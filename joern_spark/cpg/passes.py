"""Base + call-graph passes (per document).

Behavioral ports of x2cpg passes:
- method stubs for called-but-undefined full names
  (passes/base/MethodStubCreator.scala:24-95)
- static call linking by methodFullName
  (passes/callgraph/StaticCallLinker.scala:11-39)
- naive call linking by name for still-unlinked calls
  (passes/callgraph/NaiveCallLinker.scala:13-29)

Spark mapping: each of these is an equi-join (calls × methods) when done
corpus-wide; here they run per document inside the build UDF since call
resolution never crosses documents (a page is a self-contained program).
"""

from __future__ import annotations

from joern_spark.cpg.core import Cpg, Node

DYNAMIC_UNKNOWN = "<unknownFullName>"


def create_method_stubs(cpg: Cpg):
    existing = {m.full_name for m in cpg.methods()}
    seen: dict[str, Node] = {}
    for call in [n for n in cpg.nodes if n.label == "CALL"]:
        fn = call.method_full_name
        if not fn or fn == DYNAMIC_UNKNOWN or fn in existing or fn in seen:
            continue
        args = cpg.arguments(call)
        min_arg = min((a.argument_index for a in args), default=0)
        n_args = len(args)
        method = Node("METHOD", name=call.name, full_name=fn, code=call.name,
                      is_external=True, order=0)
        cpg.add_node(method)
        start = 0 if min_arg == 0 else 1
        for p_order in range(start, start + n_args):
            param = Node("METHOD_PARAMETER_IN", name=f"p{p_order}", code=f"p{p_order}",
                         order=p_order, index=p_order, evaluation_strategy="BY_VALUE",
                         type_full_name="ANY")
            cpg.add_edge(method, param, "AST")
        block = Node("BLOCK", order=1, argument_index=1, type_full_name="ANY", code="<empty>")
        cpg.add_edge(method, block, "AST")
        ret = Node("METHOD_RETURN", order=2, code="RET", type_full_name="ANY")
        cpg.add_edge(method, ret, "AST")
        seen[fn] = method


def link_calls(cpg: Cpg):
    methods_by_full = {}
    methods_by_name = {}
    for m in cpg.methods():
        methods_by_full.setdefault(m.full_name, []).append(m)
        methods_by_name.setdefault(m.name, []).append(m)
    calls = [n for n in cpg.nodes if n.label == "CALL"]
    # static linking
    for call in calls:
        if call.dispatch_type in ("STATIC_DISPATCH", "INLINED"):
            for m in methods_by_full.get(call.method_full_name, []):
                cpg.add_edge(call, m, "CALL")
    # naive linking for the rest
    for call in calls:
        if cpg.out(call, "CALL"):
            continue
        ms = methods_by_name.get(call.name)
        if not ms:
            continue
        for m in ms:
            cpg.add_edge(call, m, "CALL")
        if len(ms) == 1:
            call.method_full_name = ms[0].full_name
    # closure-call resolution: `const f = (..) => {..}; f()` — resolve by the
    # unique METHOD_REF assigned to the callee name (the effect of the
    # reference's JS type-recovery post-processing, XTypeRecovery, A19)
    ref_by_name: dict[str, list[str]] = {}
    for call in calls:
        if call.name != "<operator>.assignment":
            continue
        args = cpg.arguments(call)
        if len(args) == 2 and args[0].label == "IDENTIFIER" and args[1].label == "METHOD_REF":
            ref_by_name.setdefault(args[0].name, []).append(args[1].method_full_name)
    for call in calls:
        if cpg.out(call, "CALL"):
            continue
        fns = ref_by_name.get(call.name)
        if fns and len(set(fns)) == 1:
            for m in methods_by_full.get(fns[0], []):
                cpg.add_edge(call, m, "CALL")
            call.method_full_name = fns[0]


def called_methods(cpg: Cpg, call: Node) -> list[Node]:
    """NoResolve.getCalledMethods: follow existing CALL edges."""
    return [e.dst for e in cpg.out(call, "CALL")]


def is_stub(cpg: Cpg, method: Node) -> bool:
    """Method with an empty body block (MethodTraversal.isStub semantics)."""
    for c in cpg.ast_children(method):
        if c.label == "BLOCK":
            return len(cpg.ast_children(c)) == 0
    return True
