"""Third CFG golden batch: destructuring variants, transcribed from
MixedCfgCreationPassTests.scala (successor codes; reference fixture
discards edge kinds)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg


from tests.cfg_helpers import succ_codes as succ  # noqa: E402


# MixedCfgCreationPassTests.scala:140-158 (rest element)
def test_object_destructuring_with_rest():
    cpg = build_cpg("var {a, ...rest} = x")
    assert succ(cpg, "_tmp_0 = x") == {"a"}
    assert succ(cpg, "a = _tmp_0.a") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 2) == {"rest"}
    assert succ(cpg, "rest") == {"...rest"}
    assert succ(cpg, "...rest") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 3) == {"var {a, ...rest} = x"}
    assert succ(cpg, "var {a, ...rest} = x") == {"RET"}


# MixedCfgCreationPassTests.scala:225-238 (destructured parameter)
def test_destructured_parameter():
    cpg = build_cpg("""
function userId({id}) {
  return id
}""")
    method = [n for n in cpg.nodes if n.label == "METHOD" and n.name == "userId"][0]
    assert {(e.dst.code) for e in cpg.out(method, "CFG")} == {"id"}
    assert succ(cpg, "id") == {"param1_0"}
    assert succ(cpg, "param1_0") == {"id"}
    assert succ(cpg, "id", 1) == {"param1_0.id"}
    assert succ(cpg, "param1_0.id") == {"id = param1_0.id"}
    assert succ(cpg, "id = param1_0.id") == {"id"}
    assert succ(cpg, "id", 2) == {"return id"}
    assert succ(cpg, "return id") == {"RET"}


# MixedCfgCreationPassTests.scala:240-259 (array destructuring, declaration)
def test_array_destructuring_with_declaration():
    cpg = build_cpg("var [a, b] = x")
    assert succ(cpg, ":program") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0") == {"x"}
    assert succ(cpg, "x") == {"_tmp_0 = x"}
    assert succ(cpg, "_tmp_0 = x") == {"a"}
    assert succ(cpg, "a") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 1) == {"0"}
    assert succ(cpg, "0") == {"_tmp_0[0]"}
    assert succ(cpg, "_tmp_0[0]") == {"a = _tmp_0[0]"}
    assert succ(cpg, "a = _tmp_0[0]") == {"b"}
    assert succ(cpg, "_tmp_0", 2) == {"1"}
    assert succ(cpg, "1") == {"_tmp_0[1]"}
    assert succ(cpg, "_tmp_0[1]") == {"b = _tmp_0[1]"}
    assert succ(cpg, "b = _tmp_0[1]") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 3) == {"var [a, b] = x"}
    assert succ(cpg, "var [a, b] = x") == {"RET"}


# MixedCfgCreationPassTests.scala:261-280 (array destructuring, no decl)
def test_array_destructuring_without_declaration():
    cpg = build_cpg("[a, b] = x")
    assert succ(cpg, ":program") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0 = x") == {"a"}
    assert succ(cpg, "_tmp_0[1]") == {"b = _tmp_0[1]"}
    assert succ(cpg, "[a, b] = x") == {"RET"}


# MixedCfgCreationPassTests.scala:90-138 shape (defaults)
def test_object_destructuring_with_defaults():
    cpg = build_cpg("var {a: n = 1, b: m = 2} = x")
    assert succ(cpg, "_tmp_0 = x") == {"n"}
    # test expression: _tmp_0.a === void 0
    assert succ(cpg, "_tmp_0.a") == {"void 0"}
    assert succ(cpg, "void 0") == {"_tmp_0.a === void 0"}
    # ternary branches: TrueEdge to default literal, FalseEdge back into access
    s = succ(cpg, "_tmp_0.a === void 0")
    assert "1" in s and "_tmp_0" in s
    assert succ(cpg, "var {a: n = 1, b: m = 2} = x") == {"RET"}
