"""AST golden batch 15: DependencyAstCreationPassTests.scala (global
builtins dictionary, IMPORT/DEPENDENCY shapes for imports and requires)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg
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
