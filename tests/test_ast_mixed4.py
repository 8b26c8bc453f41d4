"""AST golden batch 13: MixedAstCreationPassTests.scala 973-1260 (array
destructuring AST shapes, spread arguments, await/instanceof/delete)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q


def _only(xs):
    xs = list(xs)
    assert len(xs) == 1, [repr(n) for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


def _destruction_block(cpg):
    program = _only(Q(cpg).method().name_exact(":program").l())
    pblock = _only(_at(cpg, program).ast_children().is_block().l())
    return _only(_at(cpg, pblock).ast_children().is_block().l())


def _check_index_member(cpg, dblock, nm, idx):
    assign = _only(_at(cpg, dblock).ast_children().is_call()
                   .code_exact(f"{nm} = _tmp_0[{idx}]").l())
    assert _at(cpg, assign).ast_children().is_identifier().size() == 1
    ia = _only(_at(cpg, assign).ast_children().is_call()
               .code_exact(f"_tmp_0[{idx}]").l())
    assert ia.name == "<operator>.indexAccess"
    assert _at(cpg, ia).ast_children().is_identifier().name_exact("_tmp_0").size() == 1
    assert _at(cpg, ia).ast_children().is_literal().code_exact(str(idx)).size() == 1


# MixedAstCreationPassTests.scala:973-1004 / 1006-1036 (decl / no decl)
import pytest


@pytest.mark.parametrize("src", ["var [a, b] = x;", "[a, b] = x;"])
def test_array_destructure_ast(src):
    cpg = build_cpg(src)
    assert Q(cpg).local().name_exact("a").size() == 1
    assert Q(cpg).local().name_exact("b").size() == 1
    dblock = _destruction_block(cpg)
    assert _at(cpg, dblock).ast_children().is_local().name_exact("_tmp_0").size() == 1
    assert _at(cpg, dblock).ast_children().is_call().code_exact("_tmp_0 = x").size() == 1
    _check_index_member(cpg, dblock, "a", 0)
    _check_index_member(cpg, dblock, "b", 1)
    assert _only(_at(cpg, dblock).ast_children().is_identifier().l()).name == "_tmp_0"


# MixedAstCreationPassTests.scala:1038-1090 (array destructure defaults)
def test_array_destructure_defaults_ast():
    cpg = build_cpg("var [a = 1, b = 2] = x;")
    dblock = _destruction_block(cpg)
    for nm, idx, dflt in (("a", 0, "1"), ("b", 1, "2")):
        assign = _only(_at(cpg, dblock).ast_children().is_call().code_exact(
            f"{nm} = _tmp_0[{idx}] === void 0 ? {dflt} : _tmp_0[{idx}]").l())
        cond = _only(_at(cpg, assign).ast_children().is_call().code_exact(
            f"_tmp_0[{idx}] === void 0 ? {dflt} : _tmp_0[{idx}]").l())
        assert cond.name == "<operator>.conditional"
        test = _only(_at(cpg, cond).ast_children().is_call().code_exact(
            f"_tmp_0[{idx}] === void 0").l())
        assert test.name == "<operator>.equals"
        ia = _only(_at(cpg, test).ast_children().is_call()
                   .code_exact(f"_tmp_0[{idx}]").l())
        assert ia.name == "<operator>.indexAccess"
        assert _at(cpg, test).ast_children().is_call().code_exact("void 0").size() == 1
        assert _at(cpg, cond).ast_children().is_literal().code_exact(dflt).size() == 1
        fb = _only(_at(cpg, cond).ast_children().is_call()
                   .code_exact(f"_tmp_0[{idx}]").l())
        assert fb.name == "<operator>.indexAccess"
    assert _only(_at(cpg, dblock).ast_children().is_identifier().l()).name == "_tmp_0"


# MixedAstCreationPassTests.scala:1290-1310-ish (ignores)
def test_array_destructure_ignores_ast():
    cpg = build_cpg("var [a, , b] = x;")
    assert Q(cpg).local().name_exact("a").size() == 1
    assert Q(cpg).local().name_exact("b").size() == 1
    dblock = _destruction_block(cpg)
    _check_index_member(cpg, dblock, "a", 0)
    _check_index_member(cpg, dblock, "b", 2)  # ignored slot skips index 1
    assert _only(_at(cpg, dblock).ast_children().is_identifier().l()).name == "_tmp_0"


# MixedAstCreationPassTests.scala:1121-1155 (array destructure with rest)
def test_array_destructure_rest_ast():
    cpg = build_cpg("var [a, ...rest] = x;")
    dblock = _destruction_block(cpg)
    _check_index_member(cpg, dblock, "a", 0)
    rest_call = _only(_at(cpg, dblock).ast_children().is_call()
                      .name_exact("<operator>.spread").l())
    assert rest_call.code == "...rest"
    tmp_arg = _only(_at(cpg, rest_call).argument(1).is_call().l())
    assert (tmp_arg.code, tmp_arg.name) == ("_tmp_0[1]", "<operator>.indexAccess")
    assert _at(cpg, tmp_arg).ast_children().is_identifier().name_exact("_tmp_0").size() == 1
    assert _at(cpg, tmp_arg).ast_children().is_literal().code_exact("1").size() == 1
    rest_arg = _only(_at(cpg, rest_call).argument(2).is_identifier().l())
    assert rest_arg.code == "rest"
    assert _only(_at(cpg, dblock).ast_children().is_identifier().l()).name == "_tmp_0"


# MixedAstCreationPassTests.scala:1156-1168 (array destructure as parameter)
def test_array_destructure_as_parameter_ast():
    cpg = build_cpg("""
function userId([id]) {
  return id;
}
""")
    user_id = _only(Q(cpg).method().name_exact("userId").l())
    params = [e.dst for e in cpg.out(user_id, "AST")
              if e.dst.label == "METHOD_PARAMETER_IN" and e.dst.name == "param1_0"]
    assert len(params) == 1
    ub = _only(_at(cpg, user_id).ast_children().is_block().l())
    assert _at(cpg, ub).ast_children().is_local().name_exact("id").size() == 1
    assert _at(cpg, ub).ast_children().is_call() \
        .code_exact("id = param1_0.id").size() == 1


# MixedAstCreationPassTests.scala:1169-1187 (spread argument)
def test_spread_argument_ast():
    cpg = build_cpg("foo(...args)")
    foo_call = _only(Q(cpg).call().code_exact("foo(...args)").l())
    assert foo_call.name == "foo"
    assert foo_call.dispatch_type == "DYNAMIC_DISPATCH"
    receiver = _only(_at(cpg, foo_call).receiver().is_identifier().l())
    assert (receiver.name, receiver.argument_index) == ("foo", -1)
    arg_this = _only(_at(cpg, foo_call).ast_children().is_identifier()
                     .name_exact("this").l())
    assert arg_this.argument_index == 0
    spread = _only(_at(cpg, foo_call).ast_children().is_call()
                   .name_exact("<operator>.spread").l())
    assert (spread.argument_index, spread.code) == (1, "...args")
    assert _only(_at(cpg, spread).argument(1).l()).code == "args"


# MixedAstCreationPassTests.scala:1189-1210 (complex spread argument)
def test_complex_spread_argument_ast():
    cpg = build_cpg("foo(...x.bar());")
    foo_call = _only(Q(cpg).call().code_exact("foo(...x.bar())").l())
    assert foo_call.name == "foo"
    assert foo_call.dispatch_type == "DYNAMIC_DISPATCH"
    receiver = _only(_at(cpg, foo_call).receiver().is_identifier().l())
    assert (receiver.name, receiver.argument_index) == ("foo", -1)
    spread = _only(_at(cpg, foo_call).ast_children().is_call()
                   .name_exact("<operator>.spread").l())
    assert (spread.argument_index, spread.code) == (1, "...x.bar()")
    arg = _only(_at(cpg, spread).argument().is_call().l())
    assert (arg.code, arg.argument_index) == ("x.bar()", 1)


# MixedAstCreationPassTests.scala:1212-1221 (await/async AST)
def test_await_async_ast():
    cpg = build_cpg("async function x(foo) { await foo() }")
    m = _only(Q(cpg).method().name_exact("x").l())
    await_call = _only(_at(cpg, m).ast_children().is_block()
                       .ast_children().is_call().l())
    assert await_call.code == "await foo()"
    assert await_call.dispatch_type == "STATIC_DISPATCH"
    assert await_call.method_full_name == "<operator>.await"
    assert _at(cpg, await_call).ast_children().is_call() \
        .code_exact("foo()").size() == 1


# MixedAstCreationPassTests.scala:1223-1241 (instanceof AST)
def test_instanceof_ast():
    cpg = build_cpg("x instanceof Foo;")
    program = _only(Q(cpg).method().name_exact(":program").l())
    inst = _only(_at(cpg, program).ast_children().is_block()
                 .ast_children().is_call().code_exact("x instanceof Foo").l())
    assert inst.name == "<operator>.instanceOf"
    lhs = _only(_at(cpg, inst).ast_children().is_identifier().name_exact("x").l())
    assert lhs.code == "x"
    assert _only(_at(cpg, inst).argument().is_identifier()
                 .name_exact("x").l()).code == "x"
    rhs = _only(_at(cpg, inst).ast_children().is_identifier().name_exact("Foo").l())
    assert rhs.code == "Foo"


# MixedAstCreationPassTests.scala:1243-1254 (delete AST)
def test_delete_ast():
    cpg = build_cpg("delete foo.x;")
    program = _only(Q(cpg).method().name_exact(":program").l())
    dele = _only(_at(cpg, program).ast_children().is_block()
                 .ast_children().is_call().code_exact("delete foo.x").l())
    assert dele.name == "<operator>.delete"
    rhs = _only([n for n in _at(cpg, dele).ast_children().is_call().l()
                 if n.name == "<operator>.fieldAccess"])
    assert rhs.code == "foo.x"


# MixedAstCreationPassTests.scala:1361-1368 (cpg.imports for import stmt)
def test_imports_for_import_statement():
    cpg = build_cpg('import {x} from "foo";')
    imps = [n for n in cpg.nodes if n.label == "IMPORT"]
    assert len(imps) == 1
    imp = imps[0]
    assert imp.code == 'import {x} from "foo"'
    assert imp.imported_entity == "foo:x"
    assert imp.imported_as == "x"


# MixedAstCreationPassTests.scala:1370-1377 (dependency → import traversal)
def test_dependency_to_import_for_import_statement():
    cpg = build_cpg('import {x} from "foo";')
    (imp,) = [n for n in cpg.nodes if n.label == "IMPORT"]
    (dep,) = [n for n in cpg.nodes if n.label == "DEPENDENCY"]
    via = [e.src for e in cpg.inn(dep, "IMPORTS")]
    assert via == [imp]


# MixedAstCreationPassTests.scala:1379-1384 (cpg.imports for require)
def test_imports_for_require():
    cpg = build_cpg('const x = require("foo");')
    imps = [n for n in cpg.nodes if n.label == "IMPORT"
            and n.code == 'x = require("foo")']
    assert len(imps) == 1
    assert imps[0].imported_entity == "foo"
    assert imps[0].imported_as == "x"


# MixedAstCreationPassTests.scala:1386-1392 (dependency → import for require)
def test_dependency_to_import_for_require():
    cpg = build_cpg('const x = require("foo");')
    (imp,) = [n for n in cpg.nodes if n.label == "IMPORT"]
    (dep,) = [n for n in cpg.nodes if n.label == "DEPENDENCY"]
    assert [e.src for e in cpg.inn(dep, "IMPORTS")] == [imp]


# MixedAstCreationPassTests.scala:213-227 (closure binding, argument to call)
def test_closure_binding_argument_to_call():
    from joern_spark.cpg.build import build_cpg_frontend

    cpg = build_cpg_frontend("""
const opts: RequestInit = {
  method: "GET",
  headers,
};

const fetchCookies = () => {
  fetch(`/api/echo/${inputString}`, opts)
};""", "code.ts")
    opts = [n for n in cpg.nodes if n.label == "LOCAL" and n.name == "opts"]
    ids = [loc.closure_binding_id for loc in opts if loc.closure_binding_id]
    assert ids == ["code.ts::program:<lambda>0:opts"]


# MixedAstCreationPassTests.scala:955-971 (object destructuring as parameter)
def test_object_destructuring_assignment_as_parameter():
    cpg = build_cpg("""
function userId({id}) {
  return id;
}
""")
    user_id = _only(Q(cpg).method().name_exact("userId").l())
    block = _only([c for c in cpg.ast_children(user_id) if c.label == "BLOCK"])
    locals_ = [c for c in cpg.ast_children(block)
               if c.label == "LOCAL" and c.name == "id"]
    assert len(locals_) == 1
    assign = _only([c for c in cpg.ast_children(block)
                    if c.label == "CALL" and c.code == "id = param1_0.id"])
    assert len([c for c in cpg.ast_children(assign)
                if c.label == "IDENTIFIER"]) == 1
    access = _only([c for c in cpg.ast_children(assign)
                    if c.label == "CALL" and c.code == "param1_0.id"])
    assert len([c for c in cpg.ast_children(access)
                if c.label == "IDENTIFIER" and c.name == "param1_0"]) == 1
    assert len([c for c in cpg.ast_children(access)
                if c.label == "FIELD_IDENTIFIER"
                and c.canonical_name == "id"]) == 1


def _check_default_param(cpg, block, name, default):
    assign = _only([c for c in cpg.ast_children(block) if c.label == "CALL"
                    and c.code == f"{name} = {name} === void 0 ? {default} : {name}"])
    assert len([c for c in cpg.ast_children(assign)
                if c.label == "IDENTIFIER" and c.name == name]) == 1
    ternary = _only([c for c in cpg.ast_children(assign)
                     if c.label == "CALL" and c.name == "<operator>.conditional"])
    test = _only([c for c in cpg.ast_children(ternary)
                  if c.label == "CALL" and c.name == "<operator>.equals"])
    assert len([c for c in cpg.ast_children(test)
                if c.label == "IDENTIFIER" and c.name == name]) == 1
    assert len([c for c in cpg.ast_children(test)
                if c.label == "CALL" and c.name == "<operator>.void"]) == 1
    assert len([c for c in cpg.ast_children(ternary)
                if c.label == "LITERAL" and c.code == str(default)]) == 1
    assert len([c for c in cpg.ast_children(ternary)
                if c.label == "IDENTIFIER" and c.name == name]) == 1


def _param_indexes(cpg, method):
    return {p.name: p.index for e in cpg.out(method, "AST")
            for p in [e.dst] if p.label == "METHOD_PARAMETER_IN"}


# MixedAstCreationPassTests.scala:1272-1303
def test_multiple_default_params():
    cpg = build_cpg("function foo(a = 1, b = 2) {}")
    foo = _only(Q(cpg).method().name_exact("foo").l())
    idx = _param_indexes(cpg, foo)
    assert idx["a"] == 1 and idx["b"] == 2
    block = _only([c for c in cpg.ast_children(foo) if c.label == "BLOCK"])
    _check_default_param(cpg, block, "a", 1)
    _check_default_param(cpg, block, "b", 2)


# MixedAstCreationPassTests.scala:1305-1324
def test_mixed_default_params():
    cpg = build_cpg("function foo(a, b = 1) {}")
    foo = _only(Q(cpg).method().name_exact("foo").l())
    idx = _param_indexes(cpg, foo)
    assert idx["a"] == 1 and idx["b"] == 2
    block = _only([c for c in cpg.ast_children(foo) if c.label == "BLOCK"])
    _check_default_param(cpg, block, "b", 1)


# MixedAstCreationPassTests.scala:1326-1357
def test_multiple_mixed_default_params():
    cpg = build_cpg("function foo(a, b = 1, c = 2) {}")
    foo = _only(Q(cpg).method().name_exact("foo").l())
    idx = _param_indexes(cpg, foo)
    assert idx["a"] == 1 and idx["b"] == 2 and idx["c"] == 3
    block = _only([c for c in cpg.ast_children(foo) if c.label == "BLOCK"])
    _check_default_param(cpg, block, "b", 1)
    _check_default_param(cpg, block, "c", 2)
