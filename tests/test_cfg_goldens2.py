"""More CFG golden parity cases, transcribed from the reference
(jssrc2cpg passes/cfg/SimpleCfgCreationPassTests.scala — cited per test).
The reference fixture compares successor CODES (edge kinds are not stored
on CFG edges), so these assert code sets.
"""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg


from tests.cfg_helpers import succ_codes as succ  # noqa: E402


# SimpleCfgCreationPassTests.scala:26-31 (empty array literal)
def test_empty_array_literal():
    cpg = build_cpg("var x = []")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"__ecma.Array.factory()"}
    assert succ(cpg, "__ecma.Array.factory()") == {"var x = []"}


# SimpleCfgCreationPassTests.scala:33-59 (array literal with values)
def test_array_literal_with_values():
    cpg = build_cpg("var x = [1, 2]")
    assert succ(cpg, "x") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0") == {"__ecma.Array.factory()"}
    assert succ(cpg, "__ecma.Array.factory()") == {"_tmp_0 = __ecma.Array.factory()"}
    assert succ(cpg, "_tmp_0 = __ecma.Array.factory()") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 1) == {"push"}
    assert succ(cpg, "push") == {"_tmp_0.push"}
    assert succ(cpg, "_tmp_0.push") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 2) == {"1"}
    assert succ(cpg, "1") == {"_tmp_0.push(1)"}
    assert succ(cpg, "_tmp_0.push(1)") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0.push(2)") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 5) == {"[1, 2]"}
    assert succ(cpg, "[1, 2]") == {"var x = [1, 2]"}
    assert succ(cpg, "var x = [1, 2]") == {"RET"}


# SimpleCfgCreationPassTests.scala:61-76 (template literal in call)
def test_template_literal_in_call():
    cpg = build_cpg("foo(`Hello ${world}!`)")
    assert succ(cpg, "foo") == {"this"}
    assert succ(cpg, "this", 0, "IDENTIFIER") == {'"Hello "'}
    assert succ(cpg, '"Hello "') == {"world"}
    assert succ(cpg, "world") == {'"!"'}
    assert succ(cpg, '"!"') == {'<operator>.formatString("Hello ", world, "!")'}
    assert succ(cpg, '<operator>.formatString("Hello ", world, "!")') == {
        "foo(`Hello ${world}!`)"}
    assert succ(cpg, "foo(`Hello ${world}!`)") == {"RET"}


# SimpleCfgCreationPassTests.scala:78-92 (bare template literal)
def test_bare_template_literal():
    cpg = build_cpg("`${x + 1}`")
    assert succ(cpg, ":program") == {'""'}
    assert succ(cpg, '""') == {"x"}
    assert succ(cpg, "x") == {"1"}
    assert succ(cpg, "1") == {"x + 1"}
    assert succ(cpg, "x + 1") == {'""'}
    assert succ(cpg, '""', 1) == {'<operator>.formatString("", x + 1, "")'}
    assert succ(cpg, '<operator>.formatString("", x + 1, "")') == {"RET"}


# SimpleCfgCreationPassTests.scala:139-160 (try/catch/finally)
def test_try_catch_finally():
    cpg = build_cpg("""
try {
 open()
} catch(err) {
 handle()
} finally {
 close()
}
""")
    assert succ(cpg, ":program") == {"open"}
    assert succ(cpg, "open") == {"this"}
    assert succ(cpg, "this", 0, "IDENTIFIER") == {"open()"}
    assert succ(cpg, "open()") == {"err", "close"}
    assert succ(cpg, "err") == {"handle"}
    assert succ(cpg, "handle()") == {"close"}
    assert succ(cpg, "close()") == {"RET"}


# do-while shape (reference has equivalents in loop sections)
def test_do_while():
    cpg = build_cpg("do { work(); } while (x < 1)")
    assert succ(cpg, ":program") == {"work"}
    assert succ(cpg, "x < 1") == {"work", "RET"}
    assert succ(cpg, "work()") == {"x"}


# switch with default
def test_switch_default():
    cpg = build_cpg("""
switch (y) {
  case 1: a = 1; break;
  default: a = 2;
}
done();
""")
    # discriminant fans out to case labels
    s = succ(cpg, "y")
    assert "case 1:" in s and "default:" in s
    # break jumps past the switch
    assert succ(cpg, "break;") == {"done"}


# labeled break
def test_labeled_break():
    cpg = build_cpg("""
outer: while (a) {
  while (b) {
    break outer;
  }
}
after();
""")
    # labeled break's CFG edge goes to the jump target
    assert succ(cpg, "break outer;") == {"outer:"}
