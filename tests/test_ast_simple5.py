"""AST golden batch 5: SimpleAstCreationPassTests.scala 1111-1300 (if /
if-else orders, for-in / for-of desugaring AST incl. the full
checkForInOrOf helper, for-loop shapes)."""

from __future__ import annotations

import pytest

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q

FN = "script.js"


def _only(steps):
    xs = steps.l()
    assert len(xs) == 1, [f"{n.label}:{n.code}" for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


# SimpleAstCreationPassTests.scala:1111-1140 (if)
def test_if_ast_orders():
    cpg = build_cpg("""
function method(x) {
  var y;
  if (x > 0)
    y = 0;
}
""")
    m = _only(Q(cpg).method().name_exact("method"))
    mblock = _only(_at(cpg, m).ast_children().is_block())
    assert _at(cpg, mblock).ast_children().is_local().size() == 1
    ifn = _only(_at(cpg, mblock).ast_children().is_control_structure())
    assert ifn.control_structure_type == "IF"
    assert ifn.order == 1
    cond = _only(_at(cpg, ifn).ast_children().is_call().order(1))
    assert cond.code == "x > 0"
    assign = _only(_at(cpg, ifn).ast_children().is_call().order(2))
    assert assign.code == "y = 0"
    iy = _only(_at(cpg, assign).ast_children().is_identifier())
    assert (iy.code, iy.order) == ("y", 1)
    lit = _only(_at(cpg, assign).ast_children().is_literal())
    assert (lit.code, lit.order) == ("0", 2)


# SimpleAstCreationPassTests.scala:1142-1176 (if-else)
def test_if_else_ast_orders():
    cpg = build_cpg("""
function method(x) {
  var y;
  if (x > 0) {
    y = 0;
  } else {
    y = 1;
  }
}
""")
    m = _only(Q(cpg).method().name_exact("method"))
    mblock = _only(_at(cpg, m).ast_children().is_block())
    local_y = _only(_at(cpg, mblock).ast_children().is_local())
    assert local_y.order == 0
    ifn = _only(_at(cpg, mblock).ast_children().is_control_structure())
    assert ifn.control_structure_type == "IF"
    assert ifn.order == 1
    cond = _only(_at(cpg, ifn).ast_children().is_call())
    assert (cond.code, cond.order) == ("x > 0", 1)
    if_block = _only(_at(cpg, ifn).ast_children().is_block().order(2))
    a0 = _only(_at(cpg, if_block).ast_children().is_call())
    assert (a0.code, a0.order) == ("y = 0", 1)
    else_block = _only(_at(cpg, ifn).ast_children().is_block().order(3))
    a1 = _only(_at(cpg, else_block).ast_children().is_call())
    assert (a1.code, a1.order) == ("y = 1", 1)


def _check_for_in_or_of(cpg, node):
    """checkForInOrOf (SimpleAstCreationPassTests.scala:2003-2077)."""
    li = _only(_at(cpg, node).ast_children().is_local().name_exact("_iterator_0"))
    assert li.code == "_iterator_0"
    lr = _only(_at(cpg, node).ast_children().is_local().name_exact("_result_0"))
    assert lr.code == "_result_0"
    lv = _only(_at(cpg, node).ast_children().is_local().name_exact("i"))
    assert lv.code == "i"

    it_assign = _only(_at(cpg, node).ast_children().is_call()
                      .code_exact("_iterator_0 = <operator>.iterator(arr)"))
    assert it_assign.name == "<operator>.assignment"
    lhs = _only(_at(cpg, it_assign).ast_children().is_identifier())
    assert (lhs.name, lhs.order, lhs.argument_index) == ("_iterator_0", 1, 1)
    rhs = _only(_at(cpg, it_assign).ast_children().is_call())
    assert rhs.code == "<operator>.iterator(arr)"
    assert (rhs.order, rhs.argument_index) == (2, 2)
    assert rhs.name == "<operator>.iterator"
    assert rhs.method_full_name == "<operator>.iterator"
    assert rhs.dispatch_type == "STATIC_DISPATCH"
    arg = _only(_at(cpg, rhs).argument(1))
    assert (arg.name, arg.order) == ("arr", 1)

    vr = _only(_at(cpg, node).ast_children().is_identifier()
               .name_exact("_result_0"))
    assert vr.code == "_result_0"
    vi = _only(_at(cpg, node).ast_children().is_identifier().name_exact("i"))
    assert vi.code == "i"

    loop = _only(_at(cpg, node).ast_children().is_control_structure())
    assert loop.control_structure_type == "WHILE"
    test_call = _only(_at(cpg, loop).ast_children().is_call()
                      .code_exact("!(_result_0 = _iterator_0.next()).done"))
    assert test_call.name == "<operator>.not"
    assert test_call.order == 1
    done_ma = _only(_at(cpg, test_call).ast_children().is_call()
                    .code_exact("(_result_0 = _iterator_0.next()).done"))
    assert done_ma.name == "<operator>.fieldAccess"
    done_base = _only(_at(cpg, done_ma).ast_children().is_call()
                      .code_exact("(_result_0 = _iterator_0.next())"))
    assert done_base.name == "<operator>.assignment"
    assert (done_base.order, done_base.argument_index) == (1, 1)
    base_lhs = _only(_at(cpg, done_base).ast_children().is_identifier().order(1))
    assert (base_lhs.name, base_lhs.argument_index) == ("_result_0", 1)
    base_rhs = _only(_at(cpg, done_base).ast_children().is_call().order(2))
    assert (base_rhs.code, base_rhs.argument_index) == ("_iterator_0.next()", 2)
    done_member = _only(_at(cpg, done_ma).ast_children().is_field_identifier()
                        .canonical_name("done"))
    assert (done_member.order, done_member.argument_index) == (2, 2)

    wblock = _only(_at(cpg, loop).ast_children().is_block())
    assert wblock.order == 2
    loop_var_assign = _only(_at(cpg, wblock).ast_children().is_call()
                            .code_exact("i = _result_0.value"))
    assert loop_var_assign.name == "<operator>.assignment"
    assert loop_var_assign.order == 1
    foo_call = _only(_at(cpg, wblock).ast_children().is_block()
                     .ast_children().is_call().code_exact("foo(i)"))
    assert foo_call.name == "foo"


@pytest.mark.parametrize("src", [
    # :1224-1233 (for-in) / :1235-1244 (for-in, no declaration)
    "for (var i in arr) {\n   foo(i)\n}",
    "for (i in arr) {\n   foo(i)\n}",
    # :1246-1255 (for-of) / :1257-1266 (for-of, no declaration)
    "for (var i of arr) {\n   foo(i)\n}",
    "for (i of arr) {\n   foo(i)\n}",
])
def test_for_in_or_of_ast(src):
    cpg = build_cpg(src)
    m = _only(Q(cpg).method().name_exact(":program"))
    mblock = _only(_at(cpg, m).ast_children().is_block())
    loop_block = _only(_at(cpg, mblock).ast_children().is_block())
    _check_for_in_or_of(cpg, loop_block)


# SimpleAstCreationPassTests.scala:1268-1279 (for with empty test)
def test_for_empty_test_ast():
    cpg = build_cpg("for(;;){}")
    m = _only(Q(cpg).method().name_exact(":program"))
    mblock = _only(_at(cpg, m).ast_children().is_block())
    forn = _only(_at(cpg, mblock).ast_children().is_control_structure())
    assert forn.control_structure_type == "FOR"
    assert forn.order == 1
    cond = _only(_at(cpg, forn).ast_children().is_literal().order(2))
    assert cond.code == "true"


# SimpleAstCreationPassTests.scala:1281-1318 (full for-loop)
def test_for_loop_ast_orders():
    cpg = build_cpg("""
function method(x,y) {
  for (x = 0; x < 1; x += 1) {
    z = 0;
  }
}
""")
    m = _only(Q(cpg).method().name_exact("method"))
    params = {p.order: p for e in cpg.out(m, "AST")
              for p in [e.dst] if p.label == "METHOD_PARAMETER_IN"}
    assert params[1].name == "x"
    assert params[2].name == "y"
    mblock = _only(_at(cpg, m).ast_children().is_block())
    forn = _only(_at(cpg, mblock).ast_children().is_control_structure())
    assert forn.control_structure_type == "FOR"
    assert forn.order == 1
    init = _only(_at(cpg, forn).ast_children().is_call().order(1))
    assert init.code == "x = 0"
    cond = _only(_at(cpg, forn).ast_children().is_call().order(2))
    assert cond.code == "x < 1"
    mod = _only(_at(cpg, forn).ast_children().is_call().order(3))
    assert mod.code == "x += 1"
    fblock = _only(_at(cpg, forn).ast_children().is_block())
    assert fblock.order == 4
    inner = _only(_at(cpg, fblock).ast_children().is_call())
    assert (inner.code, inner.order) == ("z = 0", 1)
