"""AST golden batch 3: SimpleAstCreationPassTests.scala 670-900 (lambda
params/rest, lambda full names, this, call shapes incl. chained calls)."""

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


def _lambda(cpg, full):
    return _only(Q(cpg).method().filter(lambda n: n.full_name == full))


# SimpleAstCreationPassTests.scala:690-710 (rest param in object pattern)
def test_lambda_object_rest_param():
    cpg = build_cpg("var x = ({x, ...rest}) => x + rest")
    lam = _lambda(cpg, f"{FN}::program:<lambda>0")
    lam_block = _only(_at(cpg, lam).ast_children().is_block())
    p1, p2 = _params(cpg, lam)
    assert (p1.index, p1.name, p1.code) == (0, "this", "this")
    assert (p2.index, p2.name, p2.code) == (1, "param1_0", "{x, ...rest}")
    assert _at(cpg, lam_block).ast_children().is_local().name_exact("x").size() == 1
    assert _at(cpg, lam_block).ast_children().is_local().name_exact("rest").size() == 1
    assert _at(cpg, lam_block).ast_children().is_call() \
        .code_exact("rest = param1_0.rest").size() == 1


# SimpleAstCreationPassTests.scala:712-732 (rest param in array pattern)
def test_lambda_array_rest_param():
    cpg = build_cpg("var x = ([x, ...rest]) => x + rest")
    lam = _lambda(cpg, f"{FN}::program:<lambda>0")
    lam_block = _only(_at(cpg, lam).ast_children().is_block())
    p1, p2 = _params(cpg, lam)
    assert (p1.index, p1.name, p1.code) == (0, "this", "this")
    assert (p2.index, p2.name, p2.code) == (1, "param1_0", "[x, ...rest]")
    assert _at(cpg, lam_block).ast_children().is_local().name_exact("x").size() == 1
    assert _at(cpg, lam_block).ast_children().is_local().name_exact("rest").size() == 1
    assert _at(cpg, lam_block).ast_children().is_call() \
        .code_exact("rest = param1_0.rest").size() == 1


# SimpleAstCreationPassTests.scala:734-757 (two lambdas, distinct full names)
def test_two_lambdas_distinct_full_names():
    cpg = build_cpg("""
var x = (a) => a;
var y = (b) => b;""")
    l1 = f"{FN}::program:<lambda>0"
    l2 = f"{FN}::program:<lambda>1"
    assert Q(cpg).method().filter(lambda n: n.full_name == l1).size() == 1
    assert Q(cpg).method().filter(lambda n: n.full_name == l2).size() == 1
    block = _only(Q(cpg).method().name_exact(":program").ast_children().is_block())
    a1 = _only(_at(cpg, block).ast_children().is_call().order(1))
    assert a1.name == "<operator>.assignment"
    ref1 = _only(_at(cpg, a1).ast_children().is_method_ref())
    assert ref1.method_full_name == l1
    a2 = _only(_at(cpg, block).ast_children().is_call().order(2))
    assert a2.name == "<operator>.assignment"
    ref2 = _only(_at(cpg, a2).ast_children().is_method_ref())
    assert ref2.method_full_name == l2


# SimpleAstCreationPassTests.scala:759-771 (lambdas returning lambdas)
def test_lambdas_returning_lambdas():
    cpg = build_cpg("() => async () => { }")
    fulls = sorted(n.full_name for n in Q(cpg).method().l()
                   if not n.name.startswith("<operator>"))
    assert fulls == [
        f"{FN}::program",
        f"{FN}::program:<lambda>0",
        f"{FN}::program:<lambda>0:<lambda>1",
    ]
    lam0 = _lambda(cpg, f"{FN}::program:<lambda>0")
    ret = _only(_at(cpg, lam0).ast_children().is_block()
                .ast_children().is_return())
    assert ret.code == "async () => { }"
    ref = _only(_at(cpg, ret).ast_children().is_method_ref())
    assert ref.method_full_name == f"{FN}::program:<lambda>0:<lambda>1"


# SimpleAstCreationPassTests.scala:773-789 (ThisExpression)
def test_this_expression():
    cpg = build_cpg("function foo() { this.bar = 1 }")
    this_ids = (Q(cpg).field_access().ast_children().is_identifier().l())
    (this_id,) = this_ids
    assert this_id.name == "this"
    assert this_id.code == "this"
    assert this_id.argument_index == 1
    this_params = [p for p in _params(
        cpg, _only(Q(cpg).method().name_exact("foo"))) if p.name == "this"]
    assert [(p.name, p.code) for p in this_params] == [("this", "this")]
    # referencing identifiers of foo's this = the fieldAccess base
    refs = [e.src for e in cpg.edges
            if e.label == "REF" and e.dst is this_params[0]
            and e.src.label == "IDENTIFIER"]
    assert refs == [this_id]


# SimpleAstCreationPassTests.scala:791-813 (call expression shape)
def test_call_expression_shape():
    cpg = build_cpg("""
function method(x) {
  foo(x);
}
""")
    method = _only(Q(cpg).method().name_exact("method"))
    block = _only(_at(cpg, method).ast_children().is_block())
    foo_call = _only(_at(cpg, block).ast_children().is_call())
    assert foo_call.code == "foo(x)"
    assert foo_call.name == "foo"
    assert foo_call.dispatch_type == "DYNAMIC_DISPATCH"
    receiver = _only(_at(cpg, foo_call).receiver().is_identifier())
    assert receiver.name == "foo"
    assert receiver.argument_index == -1
    arg_this = _only(_at(cpg, foo_call).ast_children().is_identifier()
                     .name_exact("this"))
    assert arg_this.argument_index == 0
    arg1 = _only(_at(cpg, foo_call).ast_children().is_identifier()
                 .name_exact("x"))
    assert arg1.argument_index == 1


# SimpleAstCreationPassTests.scala:815-853 (chained calls AST)
def test_chained_calls_ast():
    cpg = build_cpg("x.foo(y).bar(z)")
    block = _only(Q(cpg).method().name_exact(":program")
                  .ast_children().is_block())
    bar_call = _only(_at(cpg, block).ast_children().is_call())
    assert bar_call.code == "x.foo(y).bar(z)"
    assert bar_call.name == "bar"
    receiver = _only(_at(cpg, bar_call).receiver().is_call())
    receiver_via_ast = _only(_at(cpg, bar_call).ast_children().is_call())
    assert receiver is receiver_via_ast
    assert receiver.code == "(_tmp_0 = x.foo(y)).bar"
    assert receiver.name == "<operator>.fieldAccess"
    assert receiver.argument_index == -1
    bar_fi = _only(_at(cpg, receiver).ast_children().is_field_identifier())
    assert bar_fi.canonical_name == "bar"
    assert bar_fi.argument_index == 2
    tmp_assign = _only(_at(cpg, receiver).ast_children().is_call())
    assert tmp_assign.code == "(_tmp_0 = x.foo(y))"
    assert tmp_assign.name == "<operator>.assignment"
    tmp_id = _only(_at(cpg, tmp_assign).ast_children().is_identifier())
    assert tmp_id.name == "_tmp_0"
    assert tmp_id.argument_index == 1
    bar_base = _only(_at(cpg, tmp_assign).ast_children().is_call())
    assert bar_base.code == "x.foo(y)"
    assert bar_base.name == "foo"
    assert bar_base.argument_index == 2
    this_arg = _only(_at(cpg, bar_call).ast_children().is_identifier()
                     .argument_index(0))
    assert this_arg.name == "_tmp_0"
    z_arg = _only(_at(cpg, bar_call).ast_children().is_identifier()
                  .argument_index(1))
    assert z_arg.name == "z"


# SimpleAstCreationPassTests.scala:855-877 (call on object)
def test_call_on_object():
    cpg = build_cpg("""
function method(x) {
  x.foo();
}
""")
    method = _only(Q(cpg).method().name_exact("method"))
    block = _only(_at(cpg, method).ast_children().is_block())
    foo_call = _only(_at(cpg, block).ast_children().is_call())
    assert foo_call.code == "x.foo()"
    assert foo_call.name == "foo"
    assert foo_call.dispatch_type == "DYNAMIC_DISPATCH"
    receiver = _only(_at(cpg, foo_call).ast_children().is_call())
    assert receiver.code == "x.foo"
    assert receiver.method_full_name == "<operator>.fieldAccess"
    base = _only(_at(cpg, receiver).ast_children().is_identifier()
                 .argument_index(1))
    assert base.name == "x"
    fi = _only(_at(cpg, receiver).ast_children().is_field_identifier()
               .argument_index(2))
    assert fi.canonical_name == "foo"


# SimpleAstCreationPassTests.scala:879-905 (call on object with argument)
def test_call_on_object_with_argument():
    cpg = build_cpg("""
function method(x) {
  a.b(x);
}
""")
    method = _only(Q(cpg).method().name_exact("method"))
    block = _only(_at(cpg, method).ast_children().is_block())
    call = _only(_at(cpg, block).ast_children().is_call())
    assert call.code == "a.b(x)"
    assert call.name == "b"
    assert call.dispatch_type == "DYNAMIC_DISPATCH"
    receiver = _only(_at(cpg, call).receiver().is_call())
    assert receiver.code == "a.b"
    assert receiver.method_full_name == "<operator>.fieldAccess"
    base = _only(_at(cpg, receiver).ast_children().is_identifier()
                 .argument_index(1))
    assert base.name == "a"
