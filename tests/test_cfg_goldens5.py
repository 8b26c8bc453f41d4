"""Fifth CFG golden batch: constructors and classes, transcribed from
JsClassesCfgCreationPassTests.scala (cited per test)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from tests.cfg_helpers import succ_codes as succ


# JsClassesCfgCreationPassTests.scala:12-23
def test_simple_new():
    cpg = build_cpg("new MyClass()")
    assert succ(cpg, ":program") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0") == {".alloc"}
    assert succ(cpg, ".alloc") == {"_tmp_0 = .alloc"}
    assert succ(cpg, "_tmp_0 = .alloc") == {"MyClass"}
    assert succ(cpg, "MyClass") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 1) == {"new MyClass()"}
    assert succ(cpg, "new MyClass()", 0, "CALL") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 2) == {"new MyClass()"}
    assert succ(cpg, "new MyClass()", 0, "BLOCK") == {"RET"}


# JsClassesCfgCreationPassTests.scala:26-40
def test_new_with_arguments():
    cpg = build_cpg("new MyClass(arg1, arg2)")
    assert succ(cpg, "_tmp_0 = .alloc") == {"MyClass"}
    assert succ(cpg, "MyClass") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 1) == {"arg1"}
    assert succ(cpg, "arg1") == {"arg2"}
    assert succ(cpg, "arg2") == {"new MyClass(arg1, arg2)"}


# JsClassesCfgCreationPassTests.scala:63-75
def test_throw_new():
    cpg = build_cpg("function foo() { throw new Foo() }")
    m = [n for n in cpg.nodes if n.label == "METHOD" and n.name == "foo"][0]
    assert {e.dst.code for e in cpg.out(m, "CFG")} == {"_tmp_0"}
    assert succ(cpg, "_tmp_0") == {".alloc"}
    assert succ(cpg, "_tmp_0", 2) == {"throw new Foo()"}
    assert succ(cpg, "throw new Foo()") == {"RET"}


# JsClassesCfgCreationPassTests.scala:78-91
def test_class_method_cfg():
    cpg = build_cpg("""
class ClassA {
  foo() {
    bar()
  }
}
""")
    m = [n for n in cpg.nodes if n.label == "METHOD" and n.name == "foo"][0]
    assert {e.dst.code for e in cpg.out(m, "CFG")} == {"bar"}
    assert succ(cpg, "bar") == {"this"}
    assert succ(cpg, "this", 0, "IDENTIFIER") == {"bar()"}
    assert succ(cpg, "bar()") == {"RET"}


# JsClassesCfgCreationPassTests.scala:105-111
def test_anonymous_class_assignment():
    cpg = build_cpg("var a = class {}")
    assert succ(cpg, ":program") == {"a"}
    assert succ(cpg, "a") == {"class <anon-class>0"}
    assert succ(cpg, "class <anon-class>0") == {"var a = class {}"}
    assert succ(cpg, "var a = class {}") == {"RET"}
