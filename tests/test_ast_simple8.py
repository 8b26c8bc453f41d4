"""AST golden batch 8: SimpleAstCreationPassTests.scala 1178-1222 for-of
destructuring variants (checkForInOrOfObject / checkForInOrOfArray
helpers, :1825-2001)."""

from __future__ import annotations

import pytest

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q


def _only(steps):
    xs = steps.l()
    assert len(xs) == 1, [f"{n.label}:{n.code}" for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


def _check_common(cpg, node, source_name):
    for nm in ("_iterator_0", "_result_0", "a", "b", "c"):
        local = _only(_at(cpg, node).ast_children().is_local().name_exact(nm))
        assert local.code == nm
    it_assign = _only(_at(cpg, node).ast_children().is_call()
                      .code_exact(f"_iterator_0 = <operator>.iterator({source_name})"))
    assert it_assign.name == "<operator>.assignment"
    lhs = _only(_at(cpg, it_assign).ast_children().is_identifier())
    assert (lhs.name, lhs.order, lhs.argument_index) == ("_iterator_0", 1, 1)
    rhs = _only(_at(cpg, it_assign).ast_children().is_call())
    assert rhs.code == f"<operator>.iterator({source_name})"
    assert (rhs.order, rhs.argument_index) == (2, 2)
    assert rhs.name == rhs.method_full_name == "<operator>.iterator"
    assert rhs.dispatch_type == "STATIC_DISPATCH"
    arg = _only(_at(cpg, rhs).argument(1))
    assert (arg.name, arg.order) == (source_name, 1)
    for nm in ("_result_0", "a", "b", "c"):
        ident = _only(_at(cpg, node).ast_children().is_identifier()
                      .name_exact(nm))
        assert ident.code == nm
    loop = _only(_at(cpg, node).ast_children().is_control_structure())
    assert loop.control_structure_type == "WHILE"
    test_call = _only(_at(cpg, loop).ast_children().is_call()
                      .code_exact("!(_result_0 = _iterator_0.next()).done"))
    assert test_call.name == "<operator>.not"
    assert test_call.order == 1
    done_ma = _only(_at(cpg, test_call).ast_children().is_call()
                    .code_exact("(_result_0 = _iterator_0.next()).done"))
    assert done_ma.name == "<operator>.fieldAccess"
    done_member = _only(_at(cpg, done_ma).ast_children().is_field_identifier()
                        .canonical_name("done"))
    assert (done_member.order, done_member.argument_index) == (2, 2)
    wblock = _only(_at(cpg, loop).ast_children().is_block())
    assert wblock.order == 2
    return wblock


def _check_object(cpg, node):
    wblock = _check_common(cpg, node, "obj")
    for i, nm in enumerate(("a", "b", "c"), start=1):
        a = _only(_at(cpg, wblock).ast_children().is_call()
                  .code_exact(f"{nm} = _result_0.value.{nm}"))
        assert a.name == "<operator>.assignment"
        assert a.order == i
    foo = _only(_at(cpg, wblock).ast_children().is_block()
                .ast_children().is_call().code_exact("foo(a, b, c)"))
    assert foo.name == "foo"


def _check_array(cpg, node):
    wblock = _check_common(cpg, node, "arr")
    for i, nm in enumerate(("a", "b", "c"), start=1):
        a = _only(_at(cpg, wblock).ast_children().is_call()
                  .code_exact(f"{nm} = _result_0.value[{i - 1}]"))
        assert a.name == "<operator>.assignment"
        assert a.order == i
    foo = _only(_at(cpg, wblock).ast_children().is_block()
                .ast_children().is_call().code_exact("foo(a, b, c)"))
    assert foo.name == "foo"


def _loop_block(cpg):
    m = _only(Q(cpg).method().name_exact(":program"))
    mblock = _only(_at(cpg, m).ast_children().is_block())
    return _only(_at(cpg, mblock).ast_children().is_block())


# SimpleAstCreationPassTests.scala:1178-1188 / 1190-1199
@pytest.mark.parametrize("src", [
    "for(var {a, b, c} of obj) {\n   foo(a, b, c)\n}",
    "for({a, b, c} of obj) {\n   foo(a, b, c)\n}",
])
def test_for_of_object_destructuring(src):
    cpg = build_cpg(src)
    _check_object(cpg, _loop_block(cpg))


# SimpleAstCreationPassTests.scala:1201-1210 / 1212-1222
@pytest.mark.parametrize("src", [
    "for(var [a, b, c] of arr) {\n   foo(a, b, c)\n}",
    "for([a, b, c] of arr) {\n   foo(a, b, c)\n}",
])
def test_for_of_array_destructuring(src):
    cpg = build_cpg(src)
    _check_array(cpg, _loop_block(cpg))


# SimpleAstCreationPassTests.scala:519-538 (object with object function +
# computed string key)
def test_object_with_object_function():
    cpg = build_cpg("""
var x = {
 key1: value(),
 ["foo()"]: 1,
 foo() {}
}
""")
    mblock = _only(Q(cpg).method().name_exact(":program")
                   .ast_children().is_block())
    assignment = _only(_at(cpg, mblock).ast_children().is_call())
    block = _only(_at(cpg, assignment).ast_children().is_block())
    # key1: value()
    a1 = _only(_at(cpg, block).ast_children().is_call()
               .code_exact("_tmp_0.key1 = value()"))
    assert a1.name == "<operator>.assignment"
    # computed string key → indexAccess
    idx = [n for n in _at(cpg, block).ast_children().is_call().l()
           if n.name == "<operator>.assignment" and '["foo()"]' in n.code]
    assert len(idx) == 1
    # foo() {} → member assignment whose RHS is the method reference
    am = [n for n in _at(cpg, block).ast_children().is_call().l()
          if n.name == "<operator>.assignment" and ".foo =" in n.code]
    assert len(am) == 1
    refs = _at(cpg, am[0]).ast_children().is_method_ref().l()
    assert len(refs) == 1


# SimpleAstCreationPassTests.scala:331-355 (tagged runtime node with
# complex tag expression)
def test_tagged_template_complex_tag_ast():
    cpg = build_cpg(r"String.raw`../${42}\..`", "code.js")
    mblock = _only(Q(cpg).method().name_exact(":program")
                   .ast_children().is_block())
    raw = _only(_at(cpg, mblock).ast_children().is_call())
    assert raw.dispatch_type == "DYNAMIC_DISPATCH"
    assert raw.name == "raw"
    rcv = _at(cpg, raw).receiver().is_call().l()
    assert [n.code for n in rcv] == ["String.raw"]
    assert raw.code == "String.raw`../${42}\\..`"
    arg1 = _only(_at(cpg, raw).ast_children().is_block())
    assert arg1.argument_index == 1
    child_codes = [n.code for n in _at(cpg, arg1).ast_children().l()]
    assert child_codes == [
        "_tmp_0", "_tmp_0 = __ecma.Array.factory()",
        '_tmp_0.push("../")', '_tmp_0.push("\\..")', "_tmp_0"]
    arg2 = _only(_at(cpg, raw).ast_children().is_literal().code_exact("42"))
    assert arg2.argument_index == 2


# SimpleAstCreationPassTests.scala:557-585 (objects with computed object
# method names → synthesized _computed_object_method_N)
def test_computed_object_method_names():
    cpg = build_cpg("""
const obj = {
  ["someNameComputation()"](node: Node) {
    foo(node);
  },
  ["someOtherNameComputation()"](node: Node) {
    bar(node);
  }
};""", "obj.ts")
    mblock = _only(Q(cpg).method().name_exact(":program")
                   .ast_children().is_block())
    assignment = _only(_at(cpg, mblock).ast_children().is_call())
    block = _only(_at(cpg, assignment).ast_children().is_block())
    # methodRefWithName(_computed_object_method_N).referencedMethod.fullName
    for n in (0, 1):
        name = f"_computed_object_method_{n}"
        full = f"obj.ts::program:{name}"
        (ref,) = [x for x in cpg.nodes
                  if x.label == "METHOD_REF" and x.code == name]
        assert ref.method_full_name == full
        (meth,) = [m for m in cpg.methods() if m.full_name == full]
        assert meth.name == name
    # checkObjectInitializationIndex: _tmp_0["<key>"] = _computed_object_method_N
    for key, val in ((' "someNameComputation()"', "_computed_object_method_0"),
                     ('"someOtherNameComputation()"', "_computed_object_method_1")):
        key = key.strip()
        assigns = [x for x in _at(cpg, block).ast_children().is_call().l()
                   if x.name == "<operator>.assignment"
                   and x.code.endswith(f" = {val}") and f"[{key}]" in x.code]
        assert len(assigns) == 1, \
            [x.code for x in _at(cpg, block).ast_children().is_call().l()]
        (ia,) = [x for x in _at(cpg, assigns[0]).ast_children().is_call().l()
                 if x.name == "<operator>.indexAccess"]
        assert ia.code.endswith(f"[{key}]")
