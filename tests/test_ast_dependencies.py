"""AST golden batch 15: DependencyAstCreationPassTests.scala (global
builtins dictionary, IMPORT/DEPENDENCY shapes for imports and requires)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q

FN = "script.js"


def _only(xs):
    xs = list(xs)
    assert len(xs) == 1, [repr(n) for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


def _deps(cpg):
    return [n for n in cpg.nodes if n.label == "DEPENDENCY"]


def _imports(cpg):
    return [n for n in cpg.nodes if n.label == "IMPORT"]


# DependencyAstCreationPassTests.scala:11-24 (JSON.parse)
def test_json_parse_static_builtin():
    cpg = build_cpg('JSON.parse("foo");')
    program = _only(Q(cpg).method().name_exact(":program").l())
    block = _only(_at(cpg, program).ast_children().is_block().l())
    call = _only(_at(cpg, block).ast_children().is_call().l())
    assert call.name == "parse"
    assert call.method_full_name == "JSON.parse"
    assert call.code == 'JSON.parse("foo")'
    assert call.dispatch_type == "STATIC_DISPATCH"
    arg = _only(_at(cpg, call).ast_children().is_literal()
                .code_exact('"foo"').l())
    assert (arg.order, arg.argument_index) == (1, 1)


# DependencyAstCreationPassTests.scala:26-40 (JSON.stringify)
def test_json_stringify_static_builtin():
    cpg = build_cpg("JSON.stringify(foo);")
    program = _only(Q(cpg).method().name_exact(":program").l())
    block = _only(_at(cpg, program).ast_children().is_block().l())
    call = _only(_at(cpg, block).ast_children().is_call().l())
    assert call.name == "stringify"
    assert call.method_full_name == "JSON.stringify"
    assert call.code == "JSON.stringify(foo)"
    assert call.dispatch_type == "STATIC_DISPATCH"
    arg = _only(_at(cpg, call).ast_children().is_identifier()
                .name_exact("foo").l())
    assert (arg.code, arg.order, arg.argument_index) == ("foo", 1, 1)


# DependencyAstCreationPassTests.scala:42-48 (non-exact dictionary match)
def test_non_exact_builtin_is_dynamic():
    cpg = build_cpg('JSON.parse.apply("foo");')
    program = _only(Q(cpg).method().name_exact(":program").l())
    block = _only(_at(cpg, program).ast_children().is_block().l())
    call = _only(_at(cpg, block).ast_children().is_call().l())
    assert call.dispatch_type == "DYNAMIC_DISPATCH"


# DependencyAstCreationPassTests.scala:51-56 (export references)
def test_export_reference_identifiers():
    cpg = build_cpg("export const foo = bar();")
    (local,) = Q(cpg).local().name_exact("foo").l()
    refs = [e.src for e in cpg.edges if e.label == "REF" and e.dst is local]
    assert len(refs) == 2
    assert Q(cpg).identifier().name_exact("foo").size() == 2


# DependencyAstCreationPassTests.scala:58-61 (no dependencies)
def test_no_dependencies():
    cpg = build_cpg("var x = 1;")
    assert _deps(cpg) == []


# DependencyAstCreationPassTests.scala:63-77 (import dependencies)
def test_import_dependencies():
    cpg = build_cpg('''
import {a} from "depA";
import {b} from "depB";
''')
    dep_a, dep_b = _deps(cpg)
    assert (dep_a.name, dep_a.version, dep_a.dependency_group_id) == \
        ("a", "import", "depA")
    assert (dep_b.name, dep_b.version, dep_b.dependency_group_id) == \
        ("b", "import", "depB")


# DependencyAstCreationPassTests.scala:79-90 (import-equals require)
def test_import_equals_require():
    cpg = build_cpg("import path = require('path')")
    (local,) = Q(cpg).local().name_exact("path").l()
    refs = [e.src.name for e in cpg.edges
            if e.label == "REF" and e.dst is local and e.src.label == "IDENTIFIER"]
    assert refs and refs[0] == "path"
    req = _only(Q(cpg).call().code_exact('require("path")').l())
    assert req.dispatch_type == "DYNAMIC_DISPATCH"
    rcv = _only(_at(cpg, req).receiver().l())
    assert rcv.code == "require"
    arg = _only(_at(cpg, req).argument(1).l())
    assert arg.code == '"path"'


# DependencyAstCreationPassTests.scala:92-116 (import node shapes)
def test_import_node_shapes():
    cpg = build_cpg('''
import {a} from "depA";
import {b} from "depB";
import {c} from "";
import * as d from "depD";
''')
    a, b, c, d = _imports(cpg)
    assert (a.code, a.imported_entity, a.imported_as) == \
        ('import {a} from "depA"', "depA:a", "a")
    assert (b.code, b.imported_entity, b.imported_as) == \
        ('import {b} from "depB"', "depB:b", "b")
    assert (c.code, c.imported_entity, c.imported_as) == \
        ('import {c} from ""', ":c", "c")
    assert (d.code, d.imported_entity, d.imported_as) == \
        ('import * as d from "depD"', "depD:d", "d")


# DependencyAstCreationPassTests.scala:118-132 (require dependencies)
def test_require_dependencies():
    cpg = build_cpg('''
const a = require("depA");
const b = require("depB");
''')
    dep_a, dep_b = _deps(cpg)
    assert (dep_a.name, dep_a.dependency_group_id, dep_a.version) == \
        ("a", "depA", "require")
    assert (dep_b.name, dep_b.dependency_group_id, dep_b.version) == \
        ("b", "depB", "require")


# DependencyAstCreationPassTests.scala:134-176 (strange requires)
def test_strange_require_dependencies():
    cpg = build_cpg('''
var _ = require("depA");
var b = require("depB").some.strange().call().here;
var { c } = require('depC');
var { d, e } = require('depD');
var [ f, g ] = require('depE');
''')
    got = [(n.name, n.dependency_group_id, n.version) for n in _deps(cpg)]
    assert got == [
        ("_", "depA", "require"),
        ("b", "depB", "require"),
        ("c", "depC", "require"),
        ("d", "depD", "require"),
        ("e", "depD", "require"),
        ("f", "depE", "require"),
        ("g", "depE", "require"),
    ]


# DependencyAstCreationPassTests.scala:178-192 (mixed)
def test_mixed_dependencies():
    cpg = build_cpg('''
import {a} from "depA";
const b = require("depB");
''')
    dep_a, dep_b = _deps(cpg)
    assert (dep_a.name, dep_a.dependency_group_id, dep_a.version) == \
        ("a", "depA", "import")
    assert (dep_b.name, dep_b.dependency_group_id, dep_b.version) == \
        ("b", "depB", "require")


# DependencyAstCreationPassTests.scala:210-312 (import variations)
def test_import_variations():
    cpg = build_cpg('''
import name from "module-name";
import * as otherName from "module-name";
import { member1 } from "module-name";
import { member2 as alias1 } from "module-name";
import { member3 , member4 } from "module-name";
import { member5 , member6 as alias2 } from "module-name";
import defaultMember1, * as alias3 from "module-name";
import defaultMember2 from "module-name";
import "module-name";
''')
    assert [n.code for n in Q(cpg).local().l()] == [
        "name", "otherName", "member1", "alias1", "member3", "member4",
        "member5", "alias2", "defaultMember1", "alias3", "defaultMember2",
        "module-name"]
    assigns = [n.code for n in cpg.nodes
               if n.label == "CALL" and n.name == "<operator>.assignment"]
    assert assigns == [
        'var name = require("module-name")',
        'var otherName = require("module-name")',
        'var member1 = require("module-name").member1',
        'var alias1 = require("module-name").member2',
        'var member3 = require("module-name").member3',
        'var member4 = require("module-name").member4',
        'var member5 = require("module-name").member5',
        'var alias2 = require("module-name").member6',
        'var defaultMember1 = require("module-name")',
        'var alias3 = require("module-name")',
        'var defaultMember2 = require("module-name")',
        'var module-name = require("module-name")']
    deps = [(n.name, n.dependency_group_id, n.version) for n in _deps(cpg)]
    assert deps == [(nm, "module-name", "import") for nm in (
        "name", "otherName", "member1", "alias1", "member3", "member4",
        "member5", "alias2", "defaultMember1", "alias3", "defaultMember2",
        "module-name")]


def _assigns(cpg):
    return [n.code for n in cpg.nodes
            if n.label == "CALL" and n.name == "<operator>.assignment"]


# DependencyAstCreationPassTests.scala:317-355 (export names/aliases)
def test_export_names_and_aliases():
    cpg = build_cpg('''
var name1, name2, name3, name6;
var variable4, variable5;
export { name1, name2, name3 };
export { variable4 as name4, variable5 as name5, name6 };
export let name7, name8, name9;
export let name10 = "10", name11 = "11", name12;
''')
    assert sorted(n.code for n in Q(cpg).local().l()) == [
        "name1", "name10", "name11", "name12", "name2", "name3", "name6",
        "name7", "name8", "name9", "variable4", "variable5"]
    assert sorted(_assigns(cpg)) == [
        "exports.name1 = name1", "exports.name10 = name10",
        "exports.name11 = name11", "exports.name12 = name12",
        "exports.name2 = name2", "exports.name3 = name3",
        "exports.name4 = variable4", "exports.name5 = variable5",
        "exports.name6 = name6", "exports.name7 = name7",
        "exports.name8 = name8", "exports.name9 = name9",
        'let name10 = "10"', 'let name11 = "11"']


# DependencyAstCreationPassTests.scala:357-380 (export assignments)
def test_export_assignments():
    cpg = build_cpg('''
var foo = 1;
var bar = 2;
export = foo;
export = bar;
export = function func(param) {};
export = function () {};
export = class ClassA {};
''')
    assert [n.code for n in Q(cpg).local().l()] == [
        "foo", "bar", "func", "<lambda>0", "ClassA"]
    tds = {n.name for n in Q(cpg).type_decl().l()}
    assert {"func", "ClassA"} <= tds
    assert _assigns(cpg) == [
        "var foo = 1", "var bar = 2", "exports.foo = foo",
        "exports.bar = bar", "function func = function func(param) {}",
        "exports.func = func", "function <lambda>0 = function () {}",
        "exports.<lambda>0 = <lambda>0", "exports.ClassA = ClassA"]


# DependencyAstCreationPassTests.scala:382-397 (export defaults)
def test_export_defaults():
    cpg = build_cpg('''
var name1;
export { name1 as default };
export default name2 = "2";
export default function foo(param) {};
''')
    assert [n.code for n in Q(cpg).local().l()] == ["name1", "foo", "name2"]
    assert _assigns(cpg) == [
        'exports["default"] = name1', 'name2 = "2"',
        'exports["default"] = name2', "function foo = function foo(param) {}",
        'exports["default"] = foo']
    assert [m.code for m in Q(cpg).method().name_exact("foo").l()] == \
        ["function foo(param) {}"]


# DependencyAstCreationPassTests.scala:399-409 (export from with path)
def test_export_from_with_path():
    cpg = build_cpg('export { def as Header } from "./path/to/header";\n')
    (dep,) = _deps(cpg)
    assert (dep.name, dep.dependency_group_id, dep.version) == \
        ("Header", "./path/to/header", "require")
    assert _assigns(cpg) == [
        'var _header = require("./path/to/header")',
        "exports.Header = _header.def"]


# DependencyAstCreationPassTests.scala:411-443 (export from clause)
def test_export_from_clause():
    cpg = build_cpg('''
export { import1 as name1, import2 as name2, name3 } from "Foo";
export bar from "Bar";
''')
    deps = [(n.name, n.dependency_group_id, n.version) for n in _deps(cpg)]
    assert deps == [("name1", "Foo", "require"), ("name2", "Foo", "require"),
                    ("name3", "Foo", "require"), ("bar", "Bar", "require")]
    assert _assigns(cpg) == [
        'var _Foo = require("Foo")', "exports.name1 = _Foo.import1",
        "exports.name2 = _Foo.import2", "exports.name3 = _Foo.name3",
        'var _Bar = require("Bar")', "exports.bar = _Bar.bar"]


# DependencyAstCreationPassTests.scala:445-473 (export all with from)
def test_export_all_from():
    cpg = build_cpg('''
export * from "Foo";
export * as B from "Bar";
export * from "./some/ModuleA";
export * from './some/ModuleB';
''')
    deps = [(n.name, n.dependency_group_id, n.version) for n in _deps(cpg)]
    assert deps == [("Foo", "Foo", "require"), ("B", "Bar", "require"),
                    ("ModuleA", "./some/ModuleA", "require"),
                    ("ModuleB", "./some/ModuleB", "require")]


# DependencyAstCreationPassTests.scala:190-208 (multi-file imports)
def test_import_with_multiple_files():
    from joern_spark.cpg.build import build_cpg_files

    cpg = build_cpg_files([
        ("Test0.js", '\nimport {a} from "depA";\n'),
        ("Test1.js", '\nimport {b} from "depB";\n'),
    ], post_process=False)
    imports = [n for n in cpg.nodes if n.label == "IMPORT"]
    assert len(imports) == 2
    a, b = imports

    def file_of(imp):
        prog = cpg.ast_parent(imp)
        return prog.full_name.split("::")[0]

    assert (a.imported_entity, file_of(a)) == ("depA:a", "Test0.js")
    assert (b.imported_entity, file_of(b)) == ("depB:b", "Test1.js")
