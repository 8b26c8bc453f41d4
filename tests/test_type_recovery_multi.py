"""Ported reference goldens: the multi-file (`code(...).moreCode(...)`)
suites of jssrc2cpg TypeRecoveryPassTests.scala, over build_cpg_files."""

from __future__ import annotations

import pytest

from joern_spark.cpg.build import build_cpg_files
from joern_spark.cpg.typerec import (
    ResolvedMember, ResolvedMethod, UnknownMethod, UnknownTypeDecl,
)


def _ids_in_file(cpg, fname, name):
    out = []
    for n in cpg.nodes:
        if n.label == "IDENTIFIER" and n.name == name:
            m = cpg.method_of(n)
            if m is not None and m.full_name.startswith(fname + "::"):
                out.append(n)
    return out


def _calls_in_file(cpg, fname, name):
    out = []
    for n in cpg.nodes:
        if n.label == "CALL" and n.name == name:
            m = cpg.method_of(n)
            if m is not None and m.full_name.startswith(fname + "::"):
                out.append(n)
    return out


def _records(cpg):
    return [r for rs in cpg.evaluated_imports.values() for r in rs]


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:119-204 "recovering module members across modules"
# --------------------------------------------------------------------------
class TestModuleMembersAcrossModules:
    @pytest.fixture(scope="class")
    def cpg(self):
        return build_cpg_files([
            ("Foo.ts", """
import { SQLAlchemy } from "flask_sqlalchemy";

export const x = 1;
export const y = "test";
export const db = new SQLAlchemy();
"""),
            ("Bar.ts", """
import { x, y, db } from './Foo';

let z = x;
z = y;

let d = db;

d.createTable()

db.deleteTable();
"""),
        ])

    def test_imports_evaluated(self, cpg):
        recs = _records(cpg)
        members = {(r.base_path, r.member_name) for r in recs
                   if isinstance(r, ResolvedMember)}
        assert members == {("Foo.ts::program", "x"), ("Foo.ts::program", "y"),
                           ("Foo.ts::program", "db")}
        unknown = {r.full_name for r in recs
                   if isinstance(r, (UnknownMethod, UnknownTypeDecl))}
        assert "flask_sqlalchemy:SQLAlchemy" in unknown

    def test_x_y_locally_under_foo(self, cpg):
        for x in _ids_in_file(cpg, "Foo.ts", "x"):
            assert x.type_full_name == "__ecma.Number"
        for y in _ids_in_file(cpg, "Foo.ts", "y"):
            assert y.type_full_name == "__ecma.String"
        for db in _ids_in_file(cpg, "Foo.ts", "db"):
            assert db.type_full_name == "flask_sqlalchemy:SQLAlchemy"

    def test_z_primitive_union_in_bar(self, cpg):
        zs = _ids_in_file(cpg, "Bar.ts", "z")
        assert len(zs) == 2
        for z in zs:
            assert z.type_full_name == "ANY"
            assert set(z.dynamic_type_hint_full_name) == {"__ecma.Number",
                                                          "__ecma.String"}

    def test_d_object_type_in_bar(self, cpg):
        ds = _ids_in_file(cpg, "Bar.ts", "d")
        assert len(ds) >= 2
        for d in ds:
            assert d.type_full_name == "flask_sqlalchemy:SQLAlchemy"
            assert d.dynamic_type_hint_full_name == ()

    def test_create_table_indirect(self, cpg):
        calls = _calls_in_file(cpg, "Bar.ts", "createTable")
        assert len(calls) == 1
        assert calls[0].method_full_name == "flask_sqlalchemy:SQLAlchemy:createTable"
        targets = [e.dst for e in cpg.out(calls[0], "CALL")]
        assert targets and all(t.is_external for t in targets)

    def test_delete_table_direct(self, cpg):
        calls = _calls_in_file(cpg, "Bar.ts", "deleteTable")
        assert len(calls) == 1
        assert calls[0].method_full_name == "flask_sqlalchemy:SQLAlchemy:deleteTable"
        targets = [e.dst for e in cpg.out(calls[0], "CALL")]
        assert targets and all(t.is_external for t in targets)


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:206-255 "Importing an anonymous function"
# --------------------------------------------------------------------------
class TestImportingAnonymousFunction:
    @pytest.fixture(scope="class")
    def cpg(self):
        return build_cpg_files([
            ("util.js", """
var refThis = this;

exports.getIncrementalInteger = (function() {
	var count = 0;
	return function() {
		count++;
		return count;
	};
})();

refThis.getIncrementalInteger();
"""),
            ("foo.js", """
var util = require("./util.js");

util.getIncrementalInteger()
"""),
        ])

    def test_imports_evaluated(self, cpg):
        resolved = [r for r in _records(cpg) if isinstance(r, ResolvedMethod)]
        assert any(r.full_name == "util.js::program:getIncrementalInteger"
                   for r in resolved)

    def test_resolved_off_aliased_this(self, cpg):
        calls = _calls_in_file(cpg, "util.js", "getIncrementalInteger")
        assert len(calls) == 1
        assert calls[0].method_full_name == "util.js::program:getIncrementalInteger"

    def test_resolved_off_imported_util(self, cpg):
        calls = _calls_in_file(cpg, "foo.js", "getIncrementalInteger")
        assert len(calls) == 1
        assert calls[0].method_full_name == "util.js::program:getIncrementalInteger"

    def test_currying_closure_full_name(self, cpg):
        calls = [n for n in cpg.nodes if n.label == "CALL"
                 and n.name == "<lambda>0"]
        assert calls
        assert calls[0].method_full_name == "util.js::program:<lambda>0"


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:354-404 "Recovered values returned in methods"
# --------------------------------------------------------------------------
class TestRecoveredReturnValues:
    @pytest.fixture(scope="class")
    def cpg(self):
        return build_cpg_files([
            ("foo.js", """
const axios = require("axios");

exports.literalFunction = function() { return 2; };

const axiosInstance = axios.create({
  baseURL: 'https://api.example.com',
  timeout: 5000,
  headers: {  'Content-Type': 'application/json' }
});

exports.get = (url: string, config?: any) => {
  return axiosInstance.get(url, config);
};
"""),
            ("bar.js", """
const foo = require("./foo");

const x = foo.literalFunction();
const y = foo.get();
"""),
        ])

    def test_literal_types_propagate_to_return(self, cpg):
        lits = [m for m in cpg.methods() if m.name == "literalFunction"]
        assert len(lits) == 1
        assert cpg.method_return(lits[0]).type_full_name == "__ecma.Number"
        xs = _ids_in_file(cpg, "bar.js", "x")
        assert len(xs) == 1
        assert xs[0].type_full_name == "__ecma.Number"
        calls = [n for n in cpg.nodes if n.label == "CALL"
                 and n.name == "literalFunction"]
        assert len(calls) == 1
        assert calls[0].type_full_name == "__ecma.Number"

    def test_complex_types_propagate_to_return(self, cpg):
        gets = [m for m in cpg.methods() if m.name == "get"
                and m.full_name.startswith("foo.js::")]
        assert len(gets) == 1
        assert cpg.method_return(gets[0]).type_full_name == \
            "axios:create:<returnValue>:get:<returnValue>"
        ys = _ids_in_file(cpg, "bar.js", "y")
        assert len(ys) == 1
        assert ys[0].type_full_name == "axios:create:<returnValue>:get:<returnValue>"
