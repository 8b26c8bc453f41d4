"""Eleventh CFG golden batch — remaining JsClassesCfgCreationPassTests.scala
and all DependencyCfgCreationPassTests.scala transcriptions."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from tests.cfg_helpers import succ_codes as succ


# JsClassesCfgCreationPassTests.scala:42-59 (new with access path)
def test_new_with_access_path():
    cpg = build_cpg("new foo.bar.MyClass()")
    assert succ(cpg, ":program") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0") == {".alloc"}
    assert succ(cpg, ".alloc") == {"_tmp_0 = .alloc"}
    assert succ(cpg, "_tmp_0 = .alloc") == {"foo"}
    assert succ(cpg, "foo") == {"bar"}
    assert succ(cpg, "bar") == {"foo.bar"}
    assert succ(cpg, "foo.bar") == {"MyClass"}
    assert succ(cpg, "MyClass") == {"foo.bar.MyClass"}
    assert succ(cpg, "foo.bar.MyClass") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 1) == {"new foo.bar.MyClass()"}
    assert succ(cpg, "new foo.bar.MyClass()", 0, "CALL") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 2) == {"new foo.bar.MyClass()"}
    assert succ(cpg, "new foo.bar.MyClass()") == {"RET"}


# JsClassesCfgCreationPassTests.scala:90-101 (class methods w/ assignment)
def test_class_methods_with_assignment():
    cpg = build_cpg("""
var a = class ClassA {
  foo() {
    bar()
  }
}
""")
    assert succ(cpg, ":program") == {"a"}
    # call to constructor of ClassA
    assert succ(cpg, "a") == {"class ClassA"}


# DependencyCfgCreationPassTests.scala:11-16 (JSON.parse)
def test_json_parse():
    cpg = build_cpg('JSON.parse("foo");')
    assert succ(cpg, ":program") == {'"foo"'}
    assert succ(cpg, '"foo"') == {'JSON.parse("foo")'}
    assert succ(cpg, 'JSON.parse("foo")') == {"RET"}


# DependencyCfgCreationPassTests.scala:18-23 (JSON.stringify)
def test_json_stringify():
    cpg = build_cpg("JSON.stringify(foo);")
    assert succ(cpg, ":program") == {"foo"}
    assert succ(cpg, "foo") == {"JSON.stringify(foo)"}
    assert succ(cpg, "JSON.stringify(foo)") == {"RET"}


# SimpleCfgCreationPassTests.scala:304-352 (labeled expressions with continue)
def test_labeled_expressions_with_continue():
    src = '''
var i, j;
loop1: for (i = 0; i < 3; i++) {
   loop2: for (j = 0; j < 3; j++) {
      if (i === 1 && j === 1) {
         continue loop1;
      }
      console.log("");
   }
}
'''
    cpg = build_cpg(src)
    # full labeled-statement block codes, as the reference reads them from
    # the CPG (cpg.method.ast.code(".*loop1:.*") / isBlock.code("loop2: for.*"))
    code_str = next(n.code for n in cpg.nodes
                    if n.label == "BLOCK" and n.code.startswith("loop1:"))
    code2 = next(n.code for n in cpg.nodes
                 if n.label == "BLOCK" and n.code.startswith("loop2: for"))
    assert succ(cpg, ":program") == {"var i, j;"}
    assert succ(cpg, "loop1:") == {"i"}
    assert succ(cpg, "i") == {"0"}
    assert succ(cpg, "0") == {"i = 0"}
    assert succ(cpg, "i = 0") == {"i"}
    assert succ(cpg, "i", 1) == {"3"}
    assert succ(cpg, "3") == {"i < 3"}
    assert succ(cpg, "i < 3") == {"loop2:", code_str}
    assert succ(cpg, code_str) == {"RET"}
    assert succ(cpg, "loop2:") == {"j"}
    assert succ(cpg, "j") == {"0"}
    assert succ(cpg, "0", 1) == {"j = 0"}
    assert succ(cpg, "j = 0") == {"j"}
    assert succ(cpg, "j", 1) == {"3"}
    assert succ(cpg, "3", 1) == {"j < 3"}
    assert succ(cpg, "j < 3") == {code2, "i"}
    assert succ(cpg, code2) == {"i"}
    assert succ(cpg, "i", 2) == {"i++"}
    assert succ(cpg, "i++") == {"i"}
    assert succ(cpg, "i", 3) == {"1"}
    assert succ(cpg, "1") == {"i === 1"}
    assert succ(cpg, "i === 1") == {"j", "i === 1 && j === 1"}
    assert succ(cpg, "i === 1 && j === 1") == {"continue loop1;", "console"}
    assert succ(cpg, "continue loop1;") == {"loop1:"}
    assert succ(cpg, "console") == {"log"}
    assert succ(cpg, "log") == {"console.log"}
