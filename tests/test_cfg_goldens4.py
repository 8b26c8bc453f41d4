"""Fourth CFG golden batch: loops with break/continue nesting, do-while,
switch fall-through — transcribed from SimpleCfgCreationPassTests.scala
(cited per test; successor codes as the reference fixture compares)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from tests.cfg_helpers import succ_codes as succ


# SimpleCfgCreationPassTests.scala:403-411
def test_nested_while_with_breaks():
    cpg = build_cpg("while (x) { while(y) { break; z;} a; break; b; } c;")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"y", "c"}
    assert succ(cpg, "y") == {"break;", "a"}
    assert succ(cpg, "break;") == {"a"}
    assert succ(cpg, "a") == {"break;"}
    assert succ(cpg, "break;", 1) == {"c"}
    assert succ(cpg, "c") == {"RET"}


# SimpleCfgCreationPassTests.scala:413-431
def test_nested_while_conditional_break():
    cpg = build_cpg("""
while (x) {
  if (y) {
    break;
  }
  while (z) {
    break;
  }
}
""")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"y", "RET"}
    assert succ(cpg, "y") == {"break;", "z"}
    assert succ(cpg, "break;") == {"RET"}
    assert succ(cpg, "break;", 1) == {"x"}
    assert succ(cpg, "z") == {"break;", "x"}


# SimpleCfgCreationPassTests.scala:434-443
def test_plain_do_while():
    cpg = build_cpg("do { y = 2; } while (x < 1);")
    assert succ(cpg, ":program") == {"y"}
    assert succ(cpg, "y") == {"2"}
    assert succ(cpg, "2") == {"y = 2"}
    assert succ(cpg, "y = 2") == {"x"}
    assert succ(cpg, "x") == {"1"}
    assert succ(cpg, "1") == {"x < 1"}
    assert succ(cpg, "x < 1") == {"y", "RET"}


# SimpleCfgCreationPassTests.scala:445-453
def test_do_while_with_break():
    cpg = build_cpg("do { break; y; } while (x < 1);")
    assert succ(cpg, ":program") == {"break;"}
    assert succ(cpg, "break;") == {"RET"}
    assert succ(cpg, "y") == {"x"}
    assert succ(cpg, "x < 1") == {"break;", "RET"}


# SimpleCfgCreationPassTests.scala:455-463
def test_do_while_with_continue():
    cpg = build_cpg("do { continue; y; } while (x < 1);")
    assert succ(cpg, ":program") == {"continue;"}
    assert succ(cpg, "continue;") == {"x"}
    assert succ(cpg, "y") == {"x"}
    assert succ(cpg, "x < 1") == {"continue;", "RET"}


# SimpleCfgCreationPassTests.scala:465-471
def test_nested_do_while():
    cpg = build_cpg("do { do { x; } while (y); } while (z);")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"y"}
    assert succ(cpg, "y") == {"x", "z"}
    assert succ(cpg, "z") == {"x", "RET"}


# SimpleCfgCreationPassTests.scala:648-655
def test_switch_single_case():
    cpg = build_cpg("switch (x) { case 1: y;}")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"case 1:", "RET"}
    assert succ(cpg, "case 1:") == {"1"}
    assert succ(cpg, "1") == {"y"}
    assert succ(cpg, "y") == {"RET"}


# SimpleCfgCreationPassTests.scala:657-671 (fall-through)
def test_switch_multiple_cases():
    cpg = build_cpg("switch (x) { case 1: y; case 2: z;}")
    assert succ(cpg, "x") == {"case 1:", "case 2:", "RET"}
    assert succ(cpg, "case 1:") == {"1"}
    assert succ(cpg, "1") == {"y"}
    assert succ(cpg, "y") == {"case 2:"}
    assert succ(cpg, "case 2:") == {"2"}
    assert succ(cpg, "2") == {"z"}
    assert succ(cpg, "z") == {"RET"}


# SimpleCfgCreationPassTests.scala:673-686
def test_switch_cases_same_spot():
    cpg = build_cpg("switch (x) { case 1: case 2: y; }")
    assert succ(cpg, "x") == {"case 1:", "case 2:", "RET"}
    assert succ(cpg, "case 1:") == {"1"}
    assert succ(cpg, "1") == {"case 2:"}
    assert succ(cpg, "case 2:") == {"2"}
    assert succ(cpg, "2") == {"y"}


# SimpleCfgCreationPassTests.scala:688-693
def test_switch_default_only():
    cpg = build_cpg("switch (x) { default: y; }")
    assert succ(cpg, "x") == {"default:"}
    assert succ(cpg, "default:") == {"y"}
    assert succ(cpg, "y") == {"RET"}
