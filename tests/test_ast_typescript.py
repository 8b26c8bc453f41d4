"""AST golden batch 17: TsAstCreationPassTests.scala — the TypeScript
syntax subset (annotations, as/satisfies/type-assertion pass-throughs,
declare functions, TS modules, import-equals)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q

FN = "script.js"  # reference fixture: Test0.ts


def _only(xs):
    xs = list(xs)
    assert len(xs) == 1, [repr(n) for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


def _assigns(cpg):
    return [n.code for n in cpg.nodes
            if n.label == "CALL" and n.name == "<operator>.assignment"]


# TsAstCreationPassTests.scala:13-23 / 25-35 (member-target for-of / for-in)
import pytest


@pytest.mark.parametrize("kw", ["of", "in"])
def test_member_target_for_loops(kw):
    cpg = build_cpg(f"""
for(foo().x {kw} arr) {{
  bar();
}}
""")
    m = _only(Q(cpg).method().name_exact(":program").l())
    mblock = _only(_at(cpg, m).ast_children().is_block().l())
    loop_block = _only(_at(cpg, mblock).ast_children().is_block().l())
    assert _at(cpg, loop_block).ast_children().is_call() \
        .code_exact("_iterator_0 = <operator>.iterator(arr)").size() == 1
    loop = _only(_at(cpg, loop_block).ast_children().is_control_structure().l())
    assert loop.control_structure_type == "WHILE"
    wblock = _only(_at(cpg, loop).ast_children().is_block().l())
    assign = _only(_at(cpg, wblock).ast_children().is_call()
                   .code_exact("foo().x = _result_0.value").l())
    assert assign.name == "<operator>.assignment"
    foo_fa = _only(_at(cpg, assign).argument(1).l())
    assert foo_fa.code == "foo().x"
    assert foo_fa.name == "<operator>.fieldAccess"
    bar = _only(_at(cpg, wblock).ast_children().is_block()
                .ast_children().is_call().code_exact("bar()").l())
    assert bar.name == "bar"


# TsAstCreationPassTests.scala:37-50 (module with exported array declaration)
def test_ts_module_exported_array_declaration():
    cpg = build_cpg("""
module M {
  export var [a, b] = [1, 2];
}
""")
    assert _assigns(cpg) == [
        "_tmp_1 = [1, 2]", "_tmp_0 = __ecma.Array.factory()",
        "a = _tmp_1[0]", "b = _tmp_1[1]", "exports.a = a", "exports.b = b"]


# TsAstCreationPassTests.scala:52-63 (binding pattern with computed default)
def test_ts_binding_pattern():
    cpg = build_cpg('''
const a = (): string | undefined => undefined;
(({ [a() ?? "d"]: c = "" }) => {})();
''')
    names = sorted(n.name for n in Q(cpg).method().l()
                   if not n.name.startswith("<operator>") and not n.is_external)
    assert names == [":program", "<lambda>0", "<lambda>1"]
    lam1 = _only(Q(cpg).method().filter(
        lambda n: n.full_name == f"{FN}::program:<lambda>1").l())
    params = sorted([e.dst for e in cpg.out(lam1, "AST")
                     if e.dst.label == "METHOD_PARAMETER_IN"],
                    key=lambda p: p.index)
    assert [p.code for p in params] == ["this", '{ [a() ?? "d"]: c = "" }']
    assert [p.name for p in params] == ["this", "param1_0"]


# TsAstCreationPassTests.scala:65-77 (const exports with as-casts)
def test_ts_const_export_with_cast():
    cpg = build_cpg("export const getApiA = (req: Request) => "
                    "{ const user = req.user as UserDocument; }")
    names = sorted(n.name for n in Q(cpg).method().l()
                   if not n.name.startswith("<operator>") and not n.is_external)
    assert names == [":program", "<lambda>0"]
    assert _assigns(cpg) == [
        "const user = req.user as UserDocument",
        "const getApiA = (req: Request) => "
        "{ const user = req.user as UserDocument; }",
        "exports.getApiA = getApiA"]
    lam = _only(Q(cpg).method().name_exact("<lambda>0").l())
    assert lam.full_name == f"{FN}::program:<lambda>0"
    ids = [n.name for n in cpg.ast_subtree(lam) if n.label == "IDENTIFIER"]
    assert ids == ["user", "req"]


# TsAstCreationPassTests.scala:79-99 (import assignments)
def test_ts_import_assignments():
    cpg = build_cpg("""
import fs = require('fs');
import models = require('../models/index');
""")
    assert _assigns(cpg) == ['var fs = require("fs")',
                             'var models = require("../models/index")']
    assert [n.code for n in Q(cpg).local().l()] == ["fs", "models"]
    deps = [n for n in cpg.nodes if n.label == "DEPENDENCY"]
    assert [(d.name, d.dependency_group_id) for d in deps] == [
        ("fs", "fs"), ("models", "../models/index")]
    imps = [n for n in cpg.nodes if n.label == "IMPORT"]
    assert [(i.imported_entity, i.imported_as) for i in imps] == [
        ("fs", "fs"), ("../models/index", "models")]


# TsAstCreationPassTests.scala:100-114 (declared functions)
def test_ts_declared_function():
    cpg = build_cpg("declare function foo(arg: string): string")
    m = _only(Q(cpg).method().name_exact("foo").l())
    assert m.code == "declare function foo(arg: string): string"
    assert m.full_name == f"{FN}::program:foo"
    params = sorted([e.dst for e in cpg.out(m, "AST")
                     if e.dst.label == "METHOD_PARAMETER_IN"],
                    key=lambda p: p.index)
    arg = params[1]
    assert (arg.name, arg.type_full_name, arg.code, arg.index) == \
        ("arg", "__ecma.String", "arg: string", 1)


# TsAstCreationPassTests.scala:116-119 (type assertion)
def test_ts_type_assertion():
    cpg = build_cpg("let emptyArray = <VNode[]>[];")
    assert _assigns(cpg)[0] == "let emptyArray = <VNode[]>[]"


# TsAstCreationPassTests.scala:121-128 (satisfies expressions)
def test_ts_satisfies():
    cpg = build_cpg("let x = y satisfies T;")
    assign = _only([n for n in cpg.nodes
                    if n.label == "CALL" and n.name == "<operator>.assignment"])
    assert assign.code == "let x = y satisfies T"
    x, y = _at(cpg, assign).argument().l()
    assert (x.code, y.code) == ("x", "y")
