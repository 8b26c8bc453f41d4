"""CFG golden parity tests — successor sets with edge kinds, transcribed
from the reference suite (jssrc2cpg passes/cfg/MixedCfgCreationPassTests.scala,
cited per test) in the style of `succOf(code) shouldBe ((code, EdgeKind))`.
"""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg


from tests.cfg_helpers import succ_pairs as succ_of  # noqa: E402


# MixedCfgCreationPassTests.scala:15-35
def test_object_destructuring_cfg():
    cpg = build_cpg("var {a, b} = x")
    assert succ_of(cpg, ":program") == {("_tmp_0", "AlwaysEdge")}
    assert succ_of(cpg, "_tmp_0") == {("x", "AlwaysEdge")}
    assert succ_of(cpg, "x") == {("_tmp_0 = x", "AlwaysEdge")}
    assert succ_of(cpg, "_tmp_0 = x") == {("a", "AlwaysEdge")}
    assert succ_of(cpg, "a") == {("_tmp_0", "AlwaysEdge")}
    assert succ_of(cpg, "_tmp_0", 1) == {("a", "AlwaysEdge")}
    assert succ_of(cpg, "a", 1) == {("_tmp_0.a", "AlwaysEdge")}
    assert succ_of(cpg, "_tmp_0.a") == {("a = _tmp_0.a", "AlwaysEdge")}
    assert succ_of(cpg, "a = _tmp_0.a") == {("b", "AlwaysEdge")}
    assert succ_of(cpg, "b") == {("_tmp_0", "AlwaysEdge")}
    assert succ_of(cpg, "_tmp_0", 2) == {("b", "AlwaysEdge")}
    assert succ_of(cpg, "b", 1) == {("_tmp_0.b", "AlwaysEdge")}
    assert succ_of(cpg, "_tmp_0.b") == {("b = _tmp_0.b", "AlwaysEdge")}
    assert succ_of(cpg, "b = _tmp_0.b") == {("_tmp_0", "AlwaysEdge")}
    assert succ_of(cpg, "_tmp_0", 3) == {("var {a, b} = x", "AlwaysEdge")}
    assert succ_of(cpg, "var {a, b} = x") == {("RET", "AlwaysEdge")}


# MixedCfgCreationPassTests.scala:37-66
def test_destructuring_with_ternary_init():
    cpg = build_cpg("const { a, b } = test() ? foo() : bar()")
    assert succ_of(cpg, ":program") == {("_tmp_0", "AlwaysEdge")}
    assert succ_of(cpg, "_tmp_0") == {("test", "AlwaysEdge")}
    assert succ_of(cpg, "test") == {("this", "AlwaysEdge")}
    assert succ_of(cpg, "this", 0, "IDENTIFIER") == {("test()", "AlwaysEdge")}
    assert succ_of(cpg, "test()") == {("foo", "TrueEdge"), ("bar", "FalseEdge")}
    assert succ_of(cpg, "foo") == {("this", "AlwaysEdge")}
    assert succ_of(cpg, "this", 1, "IDENTIFIER") == {("foo()", "AlwaysEdge")}
    assert succ_of(cpg, "bar()") == {("test() ? foo() : bar()", "AlwaysEdge")}
    assert succ_of(cpg, "foo()") == {("test() ? foo() : bar()", "AlwaysEdge")}
    assert succ_of(cpg, "test() ? foo() : bar()") == {
        ("_tmp_0 = test() ? foo() : bar()", "AlwaysEdge")}
    assert succ_of(cpg, "const { a, b } = test() ? foo() : bar()") == {("RET", "AlwaysEdge")}


# MixedCfgCreationPassTests.scala:68-88
def test_destructuring_with_reassignment():
    cpg = build_cpg("var {a: n, b: m} = x")
    assert succ_of(cpg, "_tmp_0 = x") == {("n", "AlwaysEdge")}
    assert succ_of(cpg, "n") == {("_tmp_0", "AlwaysEdge")}
    assert succ_of(cpg, "_tmp_0", 1) == {("a", "AlwaysEdge")}
    assert succ_of(cpg, "a") == {("_tmp_0.a", "AlwaysEdge")}
    assert succ_of(cpg, "_tmp_0.a") == {("n = _tmp_0.a", "AlwaysEdge")}
    assert succ_of(cpg, "n = _tmp_0.a") == {("m", "AlwaysEdge")}
    assert succ_of(cpg, "var {a: n, b: m} = x") == {("RET", "AlwaysEdge")}


def codes(pairs):
    # the reference fixture compares successor CODES only (the CFG spec has
    # no edge kinds on stored edges — CfgTestFixture.expected discards them)
    return {c for c, _k in pairs}


def test_if_else_cfg():
    cpg = build_cpg("""
function f(a) {
  var x = 0;
  if (a > 1) { x = 2; } else { x = 3; }
  use(x);
}""")
    # both branch entries are `x` identifiers (then/else assignment LHS)
    assert codes(succ_of(cpg, "a > 1")) == {"x"}
    assert codes(succ_of(cpg, "x = 2")) == {"use"}
    assert codes(succ_of(cpg, "x = 3")) == {"use"}


def test_while_cfg():
    # mirrors SimpleCfgCreationPassTests.scala:354-364 shape
    cpg = build_cpg("""
function f(n) {
  while (n > 0) { n--; }
  done(n);
}""")
    assert codes(succ_of(cpg, "n > 0")) == {"n", "done"}
    assert codes(succ_of(cpg, "n--")) == {"n"}  # loop back to condition entry


def test_logical_and_short_circuit():
    cpg = build_cpg("var r = a() && b();")
    # a()'s fringe goes to b's entry with TrueEdge (CfgCreator.scala:332-343)
    assert ("b", "TrueEdge") in succ_of(cpg, "a()")
    assert ("a() && b()", "AlwaysEdge") in succ_of(cpg, "b()")
