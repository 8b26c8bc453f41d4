"""Eighth CFG golden batch: chained member calls (tmp lowering) and
if/else-if chains — SimpleCfgCreationPassTests.scala:270-287, 613-645."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from tests.cfg_helpers import succ_codes as succ


# SimpleCfgCreationPassTests.scala:270-287
def test_chained_calls():
    cpg = build_cpg("x.foo(y).bar(z)")
    assert succ(cpg, ":program") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0") == {"x"}
    assert succ(cpg, "x") == {"foo"}
    assert succ(cpg, "foo") == {"x.foo"}
    assert succ(cpg, "x.foo") == {"x"}
    assert succ(cpg, "x", 1) == {"y"}
    assert succ(cpg, "y") == {"x.foo(y)"}
    assert succ(cpg, "x.foo(y)") == {"(_tmp_0 = x.foo(y))"}
    assert succ(cpg, "(_tmp_0 = x.foo(y))") == {"bar"}
    assert succ(cpg, "bar") == {"(_tmp_0 = x.foo(y)).bar"}
    assert succ(cpg, "(_tmp_0 = x.foo(y)).bar") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 1) == {"z"}
    assert succ(cpg, "z") == {"x.foo(y).bar(z)"}
    assert succ(cpg, "x.foo(y).bar(z)") == {"RET"}


# SimpleCfgCreationPassTests.scala:614-619
def test_simple_if():
    cpg = build_cpg("if (x) { y; }")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"y", "RET"}
    assert succ(cpg, "y") == {"RET"}


# SimpleCfgCreationPassTests.scala:621-628
def test_if_else():
    cpg = build_cpg("if (x) { y; } else { z; }")
    assert succ(cpg, "x") == {"y", "z"}
    assert succ(cpg, "y") == {"RET"}
    assert succ(cpg, "z") == {"RET"}


# SimpleCfgCreationPassTests.scala:630-636
def test_nested_if():
    cpg = build_cpg("if (x) { if (y) { z; } }")
    assert succ(cpg, "x") == {"y", "RET"}
    assert succ(cpg, "y") == {"z", "RET"}
    assert succ(cpg, "z") == {"RET"}


# SimpleCfgCreationPassTests.scala:638-645
def test_else_if_chain():
    cpg = build_cpg("if (a) { b; } else if (c) { d;} else { e; }")
    assert succ(cpg, ":program") == {"a"}
    assert succ(cpg, "a") == {"b", "c"}
    assert succ(cpg, "b") == {"RET"}
    assert succ(cpg, "c") == {"d", "e"}
    assert succ(cpg, "d") == {"RET"}
    assert succ(cpg, "e") == {"RET"}
