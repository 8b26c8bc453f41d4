"""Seventh CFG golden batch: array destructuring holes/rest/defaults —
MixedCfgCreationPassTests.scala:282-400."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from tests.cfg_helpers import succ_codes as succ


# MixedCfgCreationPassTests.scala:349-371 (array hole)
def test_array_destructuring_with_holes():
    cpg = build_cpg("var [a, , b] = x")
    assert succ(cpg, "_tmp_0 = x") == {"a"}
    assert succ(cpg, "a") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 1) == {"0"}
    assert succ(cpg, "a = _tmp_0[0]") == {"b"}
    # hole skipped: second extracted index is 2
    assert succ(cpg, "_tmp_0", 2) == {"2"}
    assert succ(cpg, "2") == {"_tmp_0[2]"}
    assert succ(cpg, "_tmp_0[2]") == {"b = _tmp_0[2]"}
    assert succ(cpg, "var [a, , b] = x") == {"RET"}


# MixedCfgCreationPassTests.scala:373-395 (array rest)
def test_array_destructuring_with_rest():
    cpg = build_cpg("var [a, ...rest] = x")
    assert succ(cpg, "_tmp_0 = x") == {"a"}
    assert succ(cpg, "a = _tmp_0[0]") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 2) == {"1"}
    assert succ(cpg, "1") == {"_tmp_0[1]"}
    assert succ(cpg, "_tmp_0[1]") == {"rest"}
    assert succ(cpg, "rest") == {"...rest"}
    assert succ(cpg, "...rest") == {"_tmp_0"}
    assert succ(cpg, "var [a, ...rest] = x") == {"RET"}


# MixedCfgCreationPassTests.scala:282-347 (array defaults)
def test_array_destructuring_with_defaults():
    cpg = build_cpg("var [a = 1, b = 2] = x")
    assert succ(cpg, "_tmp_0 = x") == {"a"}
    assert succ(cpg, "_tmp_0[0]") == {"void 0"}
    assert succ(cpg, "void 0") == {"_tmp_0[0] === void 0"}
    s = succ(cpg, "_tmp_0[0] === void 0")
    assert "1" in s and "_tmp_0" in s
    assert succ(cpg, "_tmp_0[0] === void 0 ? 1 : _tmp_0[0]") == {
        "a = _tmp_0[0] === void 0 ? 1 : _tmp_0[0]"}
    assert succ(cpg, "a = _tmp_0[0] === void 0 ? 1 : _tmp_0[0]") == {"b"}
    assert succ(cpg, "var [a = 1, b = 2] = x") == {"RET"}
