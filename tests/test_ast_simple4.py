"""AST golden batch 4: SimpleAstCreationPassTests.scala 905-1100 (while
body blocks, function locals/bindings, params incl. rest, decl
assignments, nested expressions, while loop orders)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q

FN = "script.js"  # reference fixture: Test0.js


def _only(steps):
    xs = steps.l()
    assert len(xs) == 1, [f"{n.label}:{n.code}" for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


def _params(cpg, m):
    return sorted([e.dst for e in cpg.out(m, "AST")
                   if e.dst.label == "METHOD_PARAMETER_IN"],
                  key=lambda p: p.index)


# SimpleAstCreationPassTests.scala:913-921 (while with brackets → block)
def test_while_with_brackets_has_block():
    cpg = build_cpg("while (x < 0) {}")
    block = _only(Q(cpg).method().name_exact(":program")
                  .ast_children().is_block())
    w = _only(_at(cpg, block).ast_children().is_control_structure())
    assert w.control_structure_type == "WHILE"
    assert _at(cpg, w).ast_children().is_block().size() == 1


# SimpleAstCreationPassTests.scala:923-934 (while without brackets → none)
def test_while_without_brackets_no_block():
    cpg = build_cpg("""
while (x < 0)
  x += 1
""")
    block = _only(Q(cpg).method().name_exact(":program")
                  .ast_children().is_block())
    w = _only(_at(cpg, block).ast_children().is_control_structure())
    assert w.control_structure_type == "WHILE"
    assert _at(cpg, w).ast_children().is_block().size() == 0


# SimpleAstCreationPassTests.scala:936-944 (function local type full name)
def test_function_local_type_full_name():
    cpg = build_cpg("function method(x) {}")
    prog = _only(Q(cpg).method().name_exact(":program"))
    block = _only(_at(cpg, prog).ast_children().is_block())
    local = _only(_at(cpg, block).ast_children().is_local())
    assert local.name == "method"
    assert local.type_full_name.endswith(f"{FN}::program:method")


# SimpleAstCreationPassTests.scala:946-958 (type decl + bindings)
def test_function_type_decl_bindings():
    cpg = build_cpg("function method(x) {}")
    tds = [n for n in Q(cpg).type_decl().name_exact("method").l()]
    assert len(tds) == 1
    assert tds[0].full_name.endswith(f"{FN}::program:method")
    bindings = [e.dst for e in cpg.out(tds[0], "BINDS")]
    assert len(bindings) == 1 and bindings[0].label == "BINDING"
    assert bindings[0].name == ""
    bound = [e.dst for e in cpg.out(bindings[0], "REF")]
    assert [m.name for m in bound] == ["method"]


# SimpleAstCreationPassTests.scala:960-966 (empty method params)
def test_empty_method_params():
    cpg = build_cpg("function method(x) {}")
    m = _only(Q(cpg).method().name_exact("method"))
    assert _at(cpg, m).ast_children().is_block().size() == 1
    params = _params(cpg, m)
    assert [(p.index, p.name, p.type_full_name) for p in params] == [
        (0, "this", "ANY"), (1, "x", "ANY")]


# SimpleAstCreationPassTests.scala:968-984 (rest parameter)
def test_rest_parameter():
    cpg = build_cpg("function method(x, ...args) {}")
    m = _only(Q(cpg).method().name_exact("method"))
    t, x, args = _params(cpg, m)
    assert (t.index, t.name) == (0, "this")
    assert (x.index, x.name) == (1, "x")
    assert (args.index, args.name, args.code) == (2, "args", "...args")
    assert args.is_variadic


# SimpleAstCreationPassTests.scala:986-1006 (decl assignment)
def test_decl_assignment():
    cpg = build_cpg("function foo(x) { var local = 1; }")
    m = _only(Q(cpg).method().name_exact("foo"))
    block = _only(_at(cpg, m).ast_children().is_block())
    t, x = _params(cpg, m)
    assert (t.index, t.name) == (0, "this")
    assert (x.index, x.name) == (1, "x")
    local = _only(_at(cpg, block).ast_children().is_local())
    assert local.name == "local"
    assignment = _only(_at(cpg, block).ast_children().is_call())
    out = _only(_at(cpg, assignment).ast_children().is_identifier())
    assert out.name == "local"


# SimpleAstCreationPassTests.scala:1008-1029 (decl assignment w/ identifier)
def test_decl_assignment_identifier_rhs():
    cpg = build_cpg("function foo(x) { var local = x; }")
    m = _only(Q(cpg).method().name_exact("foo"))
    block = _only(_at(cpg, m).ast_children().is_block())
    local = _only(_at(cpg, block).ast_children().is_local())
    assert local.name == "local"
    assignment = _only(_at(cpg, block).ast_children().is_call())
    lv, xv = _at(cpg, assignment).ast_children().is_identifier().l()
    assert (lv.name, xv.name) == ("local", "x")


# SimpleAstCreationPassTests.scala:1031-1062 (multiple locals)
def test_decl_assignment_multiple_locals():
    cpg = build_cpg("function foo(x,y) { var local1 = x; var local2 = y; }")
    m = _only(Q(cpg).method().name_exact("foo"))
    block = _only(_at(cpg, m).ast_children().is_block())
    t, x, y = _params(cpg, m)
    assert [(p.index, p.name) for p in (t, x, y)] == [
        (0, "this"), (1, "x"), (2, "y")]
    l1, l2 = _at(cpg, block).ast_children().is_local().l()
    assert (l1.name, l2.name) == ("local1", "local2")
    a1, a2 = _at(cpg, block).ast_children().is_call().l()
    assert (a1.code, a2.code) == ("var local1 = x", "var local2 = y")
    o1, r1 = _at(cpg, a1).ast_children().is_identifier().l()
    assert (o1.name, r1.name) == ("local1", "x")
    o2, r2 = _at(cpg, a2).ast_children().is_identifier().l()
    assert (o2.name, r2.name) == ("local2", "y")


# SimpleAstCreationPassTests.scala:1064-1076 (nested expression)
def test_nested_expression_ast():
    cpg = build_cpg("function method() { var x; var y; var z; x = y + z; }")
    m = _only(Q(cpg).method().name_exact("method"))
    block = _only(_at(cpg, m).ast_children().is_block())
    assignment = _only(_at(cpg, block).ast_children().is_call())
    ix = _only(_at(cpg, assignment).ast_children().is_identifier())
    assert ix.name == "x"
    plus = _only(_at(cpg, assignment).ast_children().is_call())
    iy, iz = _at(cpg, plus).ast_children().is_identifier().l()
    assert (iy.name, iz.name) == ("y", "z")


# SimpleAstCreationPassTests.scala:1078-1105 (while loop orders)
def test_while_loop_orders():
    cpg = build_cpg("""
function method(x) {
  while (x < 1) {
    x += 1;
  }
}
""")
    m = _only(Q(cpg).method().name_exact("method"))
    mblock = _only(_at(cpg, m).ast_children().is_block())
    w = _only(_at(cpg, mblock).ast_children().is_control_structure())
    assert w.control_structure_type == "WHILE"
    assert w.order == 1
    cond = _only(_at(cpg, w).ast_children().is_call())
    assert (cond.code, cond.order) == ("x < 1", 1)
    wblock = _only(_at(cpg, w).ast_children().is_block())
    assert wblock.order == 2
    assign = _only(_at(cpg, wblock).ast_children().is_call())
    assert (assign.code, assign.order) == ("x += 1", 1)
