"""AST golden batch 7: SimpleAstCreationPassTests.scala 1560-1775 (switch
with lambda, logical/unary ops, member-access assignment shapes, returns)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q


def _only(steps):
    xs = steps.l()
    assert len(xs) == 1, [f"{n.label}:{n.code}" for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


# SimpleAstCreationPassTests.scala:1560-1574 (switch with lambda)
def test_switch_with_lambda():
    cpg = build_cpg('switch ((x) => "") { }')
    program = _only(Q(cpg).method().name_exact(":program"))
    pblock = _only(_at(cpg, program).ast_children().is_block())
    sw = _only(_at(cpg, pblock).ast_children().is_control_structure())
    assert sw.control_structure_type == "SWITCH"
    expr = _only(_at(cpg, sw).ast_children().is_method_ref())
    assert expr.order == 1
    assert expr.code == "<lambda>0"


# SimpleAstCreationPassTests.scala:1576-1590 (logical expression)
def test_logical_and_ast():
    cpg = build_cpg("""
function method(x) {
  true && false;
}
""")
    m = _only(Q(cpg).method().name_exact("method"))
    call = _only(_at(cpg, m).ast_children().is_block().ast_children().is_call())
    assert call.name == "<operator>.logicalAnd"
    a1 = _only(_at(cpg, call).ast_children().is_literal().argument_index(1))
    assert a1.code == "true"
    a2 = _only(_at(cpg, call).ast_children().is_literal().argument_index(2))
    assert a2.code == "false"


# SimpleAstCreationPassTests.scala:1592-1604 (unary '++')
def test_unary_preincrement_ast():
    cpg = build_cpg("""
function method(x) {
  ++x;
}
""")
    m = _only(Q(cpg).method().name_exact("method"))
    mblock = _only(_at(cpg, m).ast_children().is_block())
    call = _only(_at(cpg, mblock).ast_children().is_call())
    assert call.code == "++x"
    ix = _only(_at(cpg, call).ast_children().is_identifier())
    assert ix.name == "x"


# SimpleAstCreationPassTests.scala:1606-1630 (member access, direct)
def test_member_access_assignment_direct():
    cpg = build_cpg("""
function method(x) {
  z = x.a;
}
""")
    m = _only(Q(cpg).method().name_exact("method"))
    mblock = _only(_at(cpg, m).ast_children().is_block())
    assignment = _only(_at(cpg, mblock).ast_children().is_call())
    assert assignment.method_full_name == "<operator>.assignment"
    iz = _only(_at(cpg, assignment).ast_children().is_identifier())
    assert iz.name == "z"
    rhs = _only(_at(cpg, assignment).ast_children().is_call())
    assert rhs.method_full_name == "<operator>.fieldAccess"
    ix = _only(_at(cpg, rhs).ast_children().is_identifier().argument_index(1))
    assert (ix.name, ix.code) == ("x", "x")
    fa = _only(_at(cpg, rhs).ast_children().is_field_identifier()
               .argument_index(2))
    assert (fa.canonical_name, fa.code) == ("a", "a")


# SimpleAstCreationPassTests.scala:1632-1666 (member access, chained)
def test_member_access_assignment_chained():
    cpg = build_cpg("""
function method(x) {
  z = x.a.b.c;
}
""")
    m = _only(Q(cpg).method().name_exact("method"))
    mblock = _only(_at(cpg, m).ast_children().is_block())
    assignment = _only(_at(cpg, mblock).ast_children().is_call())
    assert assignment.method_full_name == "<operator>.assignment"
    assert _only(_at(cpg, assignment).ast_children().is_identifier()).name == "z"
    right_c = _only(_at(cpg, assignment).ast_children().is_call())
    assert right_c.method_full_name == "<operator>.fieldAccess"
    assert _only(_at(cpg, right_c).ast_children()
                 .is_field_identifier()).canonical_name == "c"
    right_b = _only(_at(cpg, right_c).ast_children().is_call())
    assert right_b.method_full_name == "<operator>.fieldAccess"
    assert _only(_at(cpg, right_b).ast_children()
                 .is_field_identifier()).canonical_name == "b"
    right_a = _only(_at(cpg, right_b).ast_children().is_call())
    assert right_a.method_full_name == "<operator>.fieldAccess"
    assert _only(_at(cpg, right_a).ast_children().is_identifier()
                 .argument_index(1)).name == "x"
    assert _only(_at(cpg, right_a).ast_children().is_field_identifier()
                 .argument_index(2)).canonical_name == "a"


# SimpleAstCreationPassTests.scala:1668-1708 (chained with method call)
def test_member_access_chained_with_call():
    cpg = build_cpg("""
function method(x) {
  z = x.a.b.c();
}
""")
    m = _only(Q(cpg).method().name_exact("method"))
    mblock = _only(_at(cpg, m).ast_children().is_block())
    assignment = _only(_at(cpg, mblock).ast_children().is_call())
    assert assignment.method_full_name == "<operator>.assignment"
    assert _only(_at(cpg, assignment).ast_children().is_identifier()).name == "z"
    right = _only(_at(cpg, assignment).ast_children().is_call())
    assert right.name == "c"
    call_to_c = _only(_at(cpg, right).ast_children().is_call())
    assert call_to_c.method_full_name == "<operator>.fieldAccess"
    assert _only(_at(cpg, call_to_c).ast_children()
                 .is_field_identifier()).canonical_name == "c"
    tmp_assign = _only(_at(cpg, call_to_c).ast_children().is_call())
    assert tmp_assign.method_full_name == "<operator>.assignment"
    assert _only(_at(cpg, tmp_assign).ast_children()
                 .is_identifier()).name == "_tmp_0"
    fa_xab = _only(_at(cpg, tmp_assign).ast_children().is_call())
    assert fa_xab.method_full_name == "<operator>.fieldAccess"
    assert _only(_at(cpg, fa_xab).ast_children()
                 .is_field_identifier()).canonical_name == "b"
    call_to_a = _only(_at(cpg, fa_xab).ast_children().is_call())
    assert call_to_a.method_full_name == "<operator>.fieldAccess"
    assert _only(_at(cpg, call_to_a).ast_children().is_identifier()
                 .argument_index(1)).name == "x"
    assert _only(_at(cpg, call_to_a).ast_children().is_field_identifier()
                 .argument_index(2)).canonical_name == "a"


# SimpleAstCreationPassTests.scala:1710-1727 (member access as return)
def test_member_access_as_return():
    cpg = build_cpg("""
function method(x) {
  return x.a;
}""")
    m = _only(Q(cpg).method().name_exact("method"))
    mblock = _only(_at(cpg, m).ast_children().is_block())
    ret = _only(_at(cpg, mblock).ast_children().is_return())
    rhs = _only(_at(cpg, ret).ast_children().is_call())
    assert (rhs.order, rhs.argument_index) == (1, 1)
    assert rhs.method_full_name == "<operator>.fieldAccess"
    assert _only(_at(cpg, rhs).ast_children().is_identifier()
                 .argument_index(1)).name == "x"
    assert _only(_at(cpg, rhs).ast_children().is_field_identifier()
                 .argument_index(2)).canonical_name == "a"


# SimpleAstCreationPassTests.scala:1729-1738 (function used as return)
def test_function_as_return():
    cpg = build_cpg("""
function method(x) {
  return function foo() {};
}
""")
    m = _only(Q(cpg).method().name_exact("method"))
    ref = _only(_at(cpg, m).ast().is_return().ast_children().is_method_ref())
    assert ref.code == "foo"


# SimpleAstCreationPassTests.scala:1740-1756 (useless member statement)
def test_member_access_useless_statement():
    cpg = build_cpg("""
function method(x) {
  x.a;
}
""")
    m = _only(Q(cpg).method().name_exact("method"))
    mblock = _only(_at(cpg, m).ast_children().is_block())
    stmt = _only(_at(cpg, mblock).ast_children().is_call())
    assert stmt.method_full_name == "<operator>.fieldAccess"
    assert _only(_at(cpg, stmt).ast_children().is_identifier()
                 .argument_index(1)).name == "x"
    assert _only(_at(cpg, stmt).ast_children().is_field_identifier()
                 .argument_index(2)).canonical_name == "a"


# SimpleAstCreationPassTests.scala:1758-1765 (empty method RET)
def test_empty_method_ret():
    cpg = build_cpg("function method() {}")
    m = _only(Q(cpg).method().name_exact("method"))
    assert _at(cpg, m).ast_children().is_block().size() == 1
    rets = [e.dst for e in cpg.out(m, "AST") if e.dst.label == "METHOD_RETURN"]
    assert [r.code for r in rets] == ["RET"]
