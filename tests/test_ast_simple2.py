"""AST golden batch 2: SimpleAstCreationPassTests.scala 383-660 (try AST,
object initializers incl. spread/computed/quoted keys, conditional, file +
namespace wiring, nested methods, lambda destructured params)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q

FN = "script.js"  # reference fixture: Test0.js


def _only(steps):
    xs = steps.l()
    assert len(xs) == 1, [("{}:{}".format(n.label, n.code)) for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


def _program_block(cpg):
    return _only(Q(cpg).method().name_exact(":program").ast_children().is_block())


def _obj_block(cpg):
    """block under the single `var x = {...}` assignment + the x identifier
    REF check the reference repeats in each object test."""
    mblock = _program_block(cpg)
    local_x = _only(_at(cpg, mblock).ast_children().is_local().name_exact("x"))
    assignment = _only(_at(cpg, mblock).ast_children().is_call())
    ident_x = _only(_at(cpg, assignment).ast_children().is_identifier())
    refs = [e.dst for e in cpg.out(ident_x, "REF")]
    assert refs == [local_x]
    return _only(_at(cpg, assignment).ast_children().is_block())


def _check_member(cpg, block, key, value_code):
    """checkObjectInitializationMember: `_tmp_N.key = value` assignment with
    fieldAccess(_tmp_N, key)."""
    assigns = [n for n in _at(cpg, block).ast_children().is_call().l()
               if n.name == "<operator>.assignment"
               and n.code.endswith(f" = {value_code}")
               and f".{key} =" in n.code]
    assert len(assigns) == 1, [n.code for n in
                               _at(cpg, block).ast_children().is_call().l()]
    (fa,) = _at(cpg, assigns[0]).ast_children().is_call() \
        .name_exact("<operator>.fieldAccess").l()
    fi = [n for n in _at(cpg, fa).ast_children().is_field_identifier().l()]
    assert [n.code for n in fi] == [key]


def _check_index(cpg, block, key_code, value_code):
    """checkObjectInitializationIndex: computed key → indexAccess form."""
    assigns = [n for n in _at(cpg, block).ast_children().is_call().l()
               if n.name == "<operator>.assignment"
               and n.code.endswith(f" = {value_code}")
               and f"[{key_code}]" in n.code]
    assert len(assigns) == 1, [n.code for n in
                               _at(cpg, block).ast_children().is_call().l()]
    (ia,) = _at(cpg, assigns[0]).ast_children().is_call() \
        .name_exact("<operator>.indexAccess").l()
    assert ia.code.endswith(f"[{key_code}]")


# SimpleAstCreationPassTests.scala:383-410 (try AST structure)
def test_try_ast_structure():
    cpg = build_cpg("""
try {
 open()
} catch(err) {
 handle()
} finally {
 close()
}
""")
    mblock = _program_block(cpg)
    trystmt = _only(_at(cpg, mblock).ast_children().is_control_structure())
    assert trystmt.control_structure_type == "TRY"
    try_block = _only(_at(cpg, trystmt).ast_children().is_block().order(1))
    assert _at(cpg, try_block).ast().is_call().code_exact("open()").size() == 1
    catch_blocks = [n for n in _at(cpg, trystmt).ast_children()
                    .is_control_structure().l()
                    if n.control_structure_type == "CATCH"]
    assert len(catch_blocks) == 1 and catch_blocks[0].order == 2
    assert _at(cpg, catch_blocks[0]).ast().is_call() \
        .code_exact("handle()").size() == 1
    fin = [n for n in _at(cpg, trystmt).ast_children()
           .is_control_structure().l() if n.control_structure_type == "FINALLY"]
    assert len(fin) == 1 and fin[0].order == 3
    assert _at(cpg, fin[0]).ast().is_call().code_exact("close()").size() == 1


# SimpleAstCreationPassTests.scala:412-436 (try with empty catch/finally)
def test_try_empty_catch_finally_ast():
    cpg = build_cpg("""
try {
 open()
} catch(err) {}
finally {}
""")
    mblock = _program_block(cpg)
    trystmt = _only(_at(cpg, mblock).ast_children().is_control_structure())
    try_block = _only(_at(cpg, trystmt).ast_children().is_block().order(1))
    assert _at(cpg, try_block).ast().is_call().code_exact("open()").size() == 1
    catch_blocks = [n for n in _at(cpg, trystmt).ast_children()
                    .is_control_structure().l()
                    if n.control_structure_type == "CATCH"]
    assert len(catch_blocks) == 1 and catch_blocks[0].order == 2
    assert [n.code for n in _at(cpg, catch_blocks[0]).ast_children()
            .ast_children().l()] == ["err"]
    fin = [n for n in _at(cpg, trystmt).ast_children()
           .is_control_structure().l() if n.control_structure_type == "FINALLY"]
    assert len(fin) == 1 and fin[0].order == 3
    assert _at(cpg, fin[0]).ast_children().ast_children().l() == []


# SimpleAstCreationPassTests.scala:438-470 (object with simple values + rest)
def test_object_with_spread_rest():
    cpg = build_cpg("""
var x = {
 key1: "value",
 key2: 2,
 ...rest
}
""")
    block = _obj_block(cpg)
    _check_member(cpg, block, "key1", '"value"')
    _check_member(cpg, block, "key2", "2")
    spread = _only(_at(cpg, block).ast_children().is_call()
                   .name_exact("<operator>.spread"))
    assert spread.code == "...rest"
    tmp_arg, rest_arg = _at(cpg, spread).argument().is_identifier().l()
    assert (tmp_arg.code, tmp_arg.name, tmp_arg.argument_index) == \
        ("_tmp_0", "_tmp_0", 1)
    assert (rest_arg.code, rest_arg.name, rest_arg.argument_index) == \
        ("rest", "rest", 2)


# SimpleAstCreationPassTests.scala:472-500 (object with complex rest)
def test_object_with_complex_rest():
    cpg = build_cpg("""
var x = {
 key1: "value",
 key2: 2,
 ...x.foo()
}
""")
    block = _obj_block(cpg)
    _check_member(cpg, block, "key1", '"value"')
    _check_member(cpg, block, "key2", "2")
    spread = _only(_at(cpg, block).ast_children().is_call()
                   .name_exact("<operator>.spread"))
    assert spread.code == "...x.foo()"
    (tmp_arg,) = _at(cpg, spread).argument().is_identifier().l()
    assert (tmp_arg.code, tmp_arg.name, tmp_arg.argument_index) == \
        ("_tmp_0", "_tmp_0", 1)
    (rest_arg,) = _at(cpg, spread).argument().is_call().l()
    assert (rest_arg.code, rest_arg.argument_index) == ("x.foo()", 2)


# SimpleAstCreationPassTests.scala:502-517 (object with computed values)
def test_object_with_computed_values():
    cpg = build_cpg("""
var x = {
 key1: value(),
 key2: foo.compute()
}
""")
    block = _obj_block(cpg)
    _check_member(cpg, block, "key1", "value()")
    _check_member(cpg, block, "key2", "foo.compute()")


# SimpleAstCreationPassTests.scala:540-555 (computed property name)
def test_object_with_computed_property_name():
    cpg = build_cpg("""
var x = {
 [ 1 + 1 ]: value()
}""")
    block = _obj_block(cpg)
    _check_index(cpg, block, "1 + 1", "value()")


# SimpleAstCreationPassTests.scala:586-601 (property names with quotes)
def test_object_property_names_with_quotes():
    cpg = build_cpg("""var x = {
 "a": 1,
 'b': 2
}""")
    block = _obj_block(cpg)
    _check_member(cpg, block, "a", "1")
    _check_member(cpg, block, "b", "2")


# SimpleAstCreationPassTests.scala:603-616 (conditional expression)
def test_conditional_expression_ast():
    cpg = build_cpg("x ? y : z;")
    block = _program_block(cpg)
    call = _only(_at(cpg, block).ast_children().is_call())
    assert call.code == "x ? y : z"
    assert call.method_full_name == "<operator>.conditional"
    x, y, z = _at(cpg, call).ast_children().is_identifier().l()
    assert (x.name, y.name, z.name) == ("x", "y", "z")


# SimpleAstCreationPassTests.scala:618-622 (file name)
def test_file_name_nonempty_file():
    cpg = build_cpg("function method(x) {}")
    (f,) = Q(cpg).file().l()
    assert f.name.endswith(FN)


# SimpleAstCreationPassTests.scala:624-634 (namespace block for empty file)
def test_namespace_block_empty_file():
    cpg = build_cpg("")
    (f,) = Q(cpg).file().l()
    (ns,) = Q(cpg).namespace_block().l()
    assert ns.name == "<global>"
    assert ns.full_name.endswith(f"{FN}:<global>")
    assert ns.order == 1
    assert ns.filename == f.name


# SimpleAstCreationPassTests.scala:636-646 (:program attached to namespace)
def test_program_attached_to_namespace():
    cpg = build_cpg("")
    (ns,) = Q(cpg).namespace_block().l()
    tds = [e.dst for e in cpg.out(ns, "AST") if e.dst.label == "TYPE_DECL"
           and e.dst.name == ":program"]
    assert len(tds) == 1
    methods = [e.dst for e in cpg.out(tds[0], "AST") if e.dst.label == "METHOD"]
    assert [m.name for m in methods] == [":program"]


# SimpleAstCreationPassTests.scala:648-668 (empty nested method)
def test_empty_method_nested_in_program():
    cpg = build_cpg("function method(x) {}")
    q = Q(cpg)
    program = _only(q.method().name_exact(":program"))
    (mm,) = _at(cpg, program).ast_children().is_method().l()
    mods = [e.dst for e in cpg.out(mm, "AST") if e.dst.label == "MODIFIER"]
    assert [m.modifier_type for m in mods] == ["VIRTUAL"]
    block = _only(_at(cpg, program).ast_children().is_block())
    assignment = _only(_at(cpg, block).ast_children().is_call())
    assert assignment.name == "<operator>.assignment"
    local_m = _only(_at(cpg, block).ast_children().is_local())
    assert local_m.name == "method"
    mid = _only(_at(cpg, assignment).ast_children().is_identifier()
                .argument_index(1))
    assert mid.name == "method"
    assert [e.dst for e in cpg.out(mid, "REF")] == [local_m]


# SimpleAstCreationPassTests.scala:670-688 (lambda with ignored param)
def test_lambda_ignored_param():
    cpg = build_cpg("var x = ([, param]) => param")
    lam = _only(Q(cpg).method().filter(
        lambda n: n.full_name == f"{FN}::program:<lambda>0"))
    lam_block = _only(_at(cpg, lam).ast_children().is_block())
    params = sorted([e.dst for e in cpg.out(lam, "AST")
                     if e.dst.label == "METHOD_PARAMETER_IN"],
                    key=lambda p: p.index)
    assert [(p.index, p.name, p.code) for p in params] == [
        (0, "this", "this"), (1, "param1_0", "[, param]")]
    assert _at(cpg, lam_block).ast_children().is_local() \
        .name_exact("param").size() == 1
    assert _at(cpg, lam_block).ast_children().is_call() \
        .code_exact("param = param1_0.param").size() == 1
