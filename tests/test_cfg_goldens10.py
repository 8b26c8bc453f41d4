"""Tenth CFG golden batch — the remaining MixedCfgCreationPassTests.scala
transcriptions (cited per test; successor codes, edge kinds ignored as the
reference fixture's expected() does)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from tests.cfg_helpers import succ_codes as succ


# MixedCfgCreationPassTests.scala:161-176 (computed property name)
def test_obj_destruct_computed_property():
    cpg = build_cpg("var {[propName]: n} = x")
    assert succ(cpg, ":program") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0") == {"x"}
    assert succ(cpg, "x") == {"_tmp_0 = x"}
    assert succ(cpg, "_tmp_0 = x") == {"n"}
    assert succ(cpg, "n") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 1) == {"propName"}
    assert succ(cpg, "propName") == {"_tmp_0.propName"}
    assert succ(cpg, "_tmp_0.propName") == {"n = _tmp_0.propName"}
    assert succ(cpg, "n = _tmp_0.propName") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 2) == {"var {[propName]: n} = x"}
    assert succ(cpg, "var {[propName]: n} = x") == {"RET"}


# MixedCfgCreationPassTests.scala:178-228 (nested obj destruct w/ defaults
# as parameter)
def test_obj_destruct_nested_defaults_param():
    cpg = build_cpg("""
function userId({id = {}, b} = {}) {
  return id
}""")
    assert succ(cpg, "userId", 0, "METHOD") == {"_tmp_1"}
    assert succ(cpg, "_tmp_1") == {"param1_0"}
    assert succ(cpg, "param1_0") == {"void 0"}
    assert succ(cpg, "void 0") == {"param1_0 === void 0"}
    assert succ(cpg, "param1_0 === void 0") == {"_tmp_0", "param1_0"}
    assert succ(cpg, "param1_0", 1) == {"param1_0 === void 0 ? {} : param1_0"}
    assert succ(cpg, "_tmp_0") == {"param1_0 === void 0 ? {} : param1_0"}
    assert succ(cpg, "param1_0 === void 0 ? {} : param1_0") == {
        "_tmp_1 = param1_0 === void 0 ? {} : param1_0"}
    assert succ(cpg, "_tmp_1 = param1_0 === void 0 ? {} : param1_0") == {"id"}
    assert succ(cpg, "id") == {"_tmp_1"}
    assert succ(cpg, "_tmp_1", 1) == {"id"}
    assert succ(cpg, "id", 1) == {"_tmp_1.id"}
    assert succ(cpg, "_tmp_1.id") == {"void 0"}
    assert succ(cpg, "void 0", 1) == {"_tmp_1.id === void 0"}
    assert succ(cpg, "_tmp_1.id === void 0") == {"_tmp_2", "_tmp_1"}
    assert succ(cpg, "_tmp_2") == {"_tmp_1.id === void 0 ? {} : _tmp_1.id"}
    assert succ(cpg, "_tmp_1", 2) == {"id"}
    assert succ(cpg, "_tmp_1.id === void 0 ? {} : _tmp_1.id") == {
        "id = _tmp_1.id === void 0 ? {} : _tmp_1.id"}
    assert succ(cpg, "id", 2) == {"_tmp_1.id"}
    assert succ(cpg, "id = _tmp_1.id === void 0 ? {} : _tmp_1.id") == {"b"}
    assert succ(cpg, "b") == {"_tmp_1"}
    assert succ(cpg, "_tmp_1", 3) == {"b"}
    assert succ(cpg, "b", 1) == {"_tmp_1.b"}
    assert succ(cpg, "_tmp_1.b") == {"b = _tmp_1.b"}
    assert succ(cpg, "b = _tmp_1.b") == {"_tmp_1"}
    assert succ(cpg, "_tmp_1", 4) == {"{id = {}, b} = {}"}
    assert succ(cpg, "{id = {}, b} = {}", 1) == {"id"}


# MixedCfgCreationPassTests.scala:230-243 (obj destruct as parameter)
def test_obj_destruct_as_param():
    cpg = build_cpg("""
function userId({id}) {
  return id
}""")
    assert succ(cpg, "userId", 0, "METHOD") == {"id"}
    assert succ(cpg, "id") == {"param1_0"}
    assert succ(cpg, "param1_0") == {"id"}
    assert succ(cpg, "id", 1) == {"param1_0.id"}
    assert succ(cpg, "param1_0.id") == {"id = param1_0.id"}
    assert succ(cpg, "id = param1_0.id") == {"id"}
    assert succ(cpg, "id", 2) == {"return id"}
    assert succ(cpg, "return id") == {"RET"}


# MixedCfgCreationPassTests.scala:394-408 (array destruct as parameter)
def test_array_destruct_as_param():
    cpg = build_cpg("""
function userId([id]) {
  return id
}
""")
    assert succ(cpg, "userId", 0, "METHOD") == {"id"}
    assert succ(cpg, "id") == {"param1_0"}
    assert succ(cpg, "param1_0") == {"id"}
    assert succ(cpg, "id", 1) == {"param1_0.id"}
    assert succ(cpg, "param1_0.id") == {"id = param1_0.id"}
    assert succ(cpg, "id = param1_0.id") == {"id"}
    assert succ(cpg, "id", 2) == {"return id"}
    assert succ(cpg, "return id") == {"RET"}


# MixedCfgCreationPassTests.scala:411-422 (method spread argument)
def test_spread_argument():
    cpg = build_cpg("foo(...args)")
    assert succ(cpg, ":program") == {"foo"}
    assert succ(cpg, "foo") == {"this"}
    assert succ(cpg, "this", 0, "IDENTIFIER") == {"args"}
    assert succ(cpg, "args") == {"...args"}
    assert succ(cpg, "...args") == {"foo(...args)"}
    assert succ(cpg, "foo(...args)") == {"RET"}


# MixedCfgCreationPassTests.scala:425-433 (await/async)
def test_await_async():
    cpg = build_cpg("async function x(foo) { await foo() }")
    assert succ(cpg, "x", 0, "METHOD") == {"foo"}
    assert succ(cpg, "foo", 0, "IDENTIFIER") == {"this"}
    assert succ(cpg, "this", 0, "IDENTIFIER") == {"foo()"}
    assert succ(cpg, "foo()") == {"await foo()"}
    assert succ(cpg, "await foo()") == {"RET"}


# MixedCfgCreationPassTests.scala:436-442 (instanceof)
def test_instanceof():
    cpg = build_cpg("x instanceof Foo")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"Foo"}
    assert succ(cpg, "Foo") == {"x instanceof Foo"}
    assert succ(cpg, "x instanceof Foo", 0, "CALL") == {"RET"}


# MixedCfgCreationPassTests.scala:444-452 (delete)
def test_delete():
    cpg = build_cpg("delete foo.x")
    assert succ(cpg, ":program") == {"foo"}
    assert succ(cpg, "foo") == {"x"}
    assert succ(cpg, "x") == {"foo.x"}
    assert succ(cpg, "foo.x") == {"delete foo.x"}
    assert succ(cpg, "delete foo.x", 0, "CALL") == {"RET"}


def _param_codes(cpg, method_name):
    m = [n for n in cpg.nodes if n.label == "METHOD" and n.name == method_name][0]
    return sorted(p.code for p in (e.dst for e in cpg.out(m, "AST"))
                  if p.label == "METHOD_PARAMETER_IN")


# MixedCfgCreationPassTests.scala:455-468 (parameter with default)
def test_param_with_default():
    cpg = build_cpg("function foo(a = 1) { }")
    assert _param_codes(cpg, "foo") == ["a = 1", "this"]
    assert succ(cpg, "foo", 0, "METHOD") == {"a"}
    assert succ(cpg, "a", 0, "IDENTIFIER") == {"a"}
    assert succ(cpg, "a", 1) == {"void 0"}
    assert succ(cpg, "void 0") == {"a === void 0"}
    assert succ(cpg, "a === void 0") == {"1", "a"}
    assert succ(cpg, "1") == {"a === void 0 ? 1 : a"}
    assert succ(cpg, "a", 2) == {"a === void 0 ? 1 : a"}
    assert succ(cpg, "a === void 0 ? 1 : a") == {"a = a === void 0 ? 1 : a"}
    assert succ(cpg, "a = a === void 0 ? 1 : a") == {"RET"}


# MixedCfgCreationPassTests.scala:470-492 (multiple parameters with default)
def test_multiple_params_with_default():
    cpg = build_cpg("function foo(a = 1, b = 2) { }")
    assert _param_codes(cpg, "foo") == ["a = 1", "b = 2", "this"]
    assert succ(cpg, "foo", 0, "METHOD") == {"a"}
    assert succ(cpg, "a", 0, "IDENTIFIER") == {"a"}
    assert succ(cpg, "a", 1) == {"void 0"}
    assert succ(cpg, "void 0") == {"a === void 0"}
    assert succ(cpg, "a === void 0") == {"1", "a"}
    assert succ(cpg, "1") == {"a === void 0 ? 1 : a"}
    assert succ(cpg, "a", 2) == {"a === void 0 ? 1 : a"}
    assert succ(cpg, "a === void 0 ? 1 : a") == {"a = a === void 0 ? 1 : a"}
    assert succ(cpg, "a = a === void 0 ? 1 : a") == {"b"}
    assert succ(cpg, "b", 0, "IDENTIFIER") == {"b"}
    assert succ(cpg, "b", 1) == {"void 0"}
    assert succ(cpg, "void 0", 1) == {"b === void 0"}
    assert succ(cpg, "b === void 0") == {"2", "b"}
    assert succ(cpg, "2") == {"b === void 0 ? 2 : b"}
    assert succ(cpg, "b", 2) == {"b === void 0 ? 2 : b"}
    assert succ(cpg, "b === void 0 ? 2 : b") == {"b = b === void 0 ? 2 : b"}
    assert succ(cpg, "b = b === void 0 ? 2 : b") == {"RET"}


# MixedCfgCreationPassTests.scala:494-507 (mixed parameters with default)
def test_mixed_params_with_default():
    cpg = build_cpg("function foo(a, b = 1) { }")
    assert _param_codes(cpg, "foo") == ["a", "b = 1", "this"]
    assert succ(cpg, "foo", 0, "METHOD") == {"b"}
    assert succ(cpg, "b") == {"b"}
    assert succ(cpg, "b", 1) == {"void 0"}
    assert succ(cpg, "void 0") == {"b === void 0"}
    assert succ(cpg, "b === void 0") == {"1", "b"}
    assert succ(cpg, "1") == {"b === void 0 ? 1 : b"}
    assert succ(cpg, "b", 2) == {"b === void 0 ? 1 : b"}
    assert succ(cpg, "b === void 0 ? 1 : b") == {"b = b === void 0 ? 1 : b"}
    assert succ(cpg, "b = b === void 0 ? 1 : b") == {"RET"}


# MixedCfgCreationPassTests.scala:509-533 (multiple mixed params w/ default)
def test_multiple_mixed_params_with_default():
    cpg = build_cpg("function foo(x, a = 1, b = 2) { }")
    assert _param_codes(cpg, "foo") == ["a = 1", "b = 2", "this", "x"]
    assert succ(cpg, "foo", 0, "METHOD") == {"a"}
    assert succ(cpg, "a") == {"a"}
    assert succ(cpg, "a", 1) == {"void 0"}
    assert succ(cpg, "void 0") == {"a === void 0"}
    assert succ(cpg, "a === void 0") == {"1", "a"}
    assert succ(cpg, "1") == {"a === void 0 ? 1 : a"}
    assert succ(cpg, "a", 2) == {"a === void 0 ? 1 : a"}
    assert succ(cpg, "a === void 0 ? 1 : a") == {"a = a === void 0 ? 1 : a"}
    assert succ(cpg, "a = a === void 0 ? 1 : a") == {"b"}
    assert succ(cpg, "b") == {"b"}
    assert succ(cpg, "b", 1) == {"void 0"}
    assert succ(cpg, "void 0", 1) == {"b === void 0"}
    assert succ(cpg, "b === void 0") == {"2", "b"}
    assert succ(cpg, "2") == {"b === void 0 ? 2 : b"}
    assert succ(cpg, "b", 2) == {"b === void 0 ? 2 : b"}
    assert succ(cpg, "b === void 0 ? 2 : b") == {"b = b === void 0 ? 2 : b"}
    assert succ(cpg, "b = b === void 0 ? 2 : b") == {"RET"}
