"""Sixth CFG golden batch: for-loops (plain/break/continue) and mixed
while/do-while nesting — SimpleCfgCreationPassTests.scala:472-560."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from tests.cfg_helpers import succ_codes as succ


# SimpleCfgCreationPassTests.scala:501-517
def test_plain_for_loop():
    cpg = build_cpg("for (x = 0; y < 1; z += 2) { a = 3; }")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"0"}
    assert succ(cpg, "0") == {"x = 0"}
    assert succ(cpg, "x = 0") == {"y"}
    assert succ(cpg, "y") == {"1"}
    assert succ(cpg, "1") == {"y < 1"}
    assert succ(cpg, "y < 1") == {"a", "RET"}
    assert succ(cpg, "a") == {"3"}
    assert succ(cpg, "3") == {"a = 3"}
    assert succ(cpg, "a = 3") == {"z"}
    assert succ(cpg, "z") == {"2"}
    assert succ(cpg, "2") == {"z += 2"}
    assert succ(cpg, "z += 2") == {"y"}


# SimpleCfgCreationPassTests.scala:519-535
def test_for_loop_with_break():
    cpg = build_cpg("for (x = 0; y < 1; z += 2) { break; a = 3; }")
    assert succ(cpg, "y < 1") == {"break;", "RET"}
    assert succ(cpg, "break;") == {"RET"}
    assert succ(cpg, "a = 3") == {"z"}
    assert succ(cpg, "z += 2") == {"y"}


# SimpleCfgCreationPassTests.scala:537-553
def test_for_loop_with_continue():
    cpg = build_cpg("for (x = 0; y < 1; z += 2) { continue; a = 3; }")
    assert succ(cpg, "y < 1") == {"continue;", "RET"}
    assert succ(cpg, "continue;") == {"z"}
    assert succ(cpg, "a = 3") == {"z"}
    assert succ(cpg, "z += 2") == {"y"}


# SimpleCfgCreationPassTests.scala:472-483
def test_while_do_while_break():
    cpg = build_cpg("while (x) { do { while(y) { break; a; } z; } while (x < 1); } c;")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"y", "c"}
    assert succ(cpg, "y") == {"break;", "z"}
    assert succ(cpg, "break;") == {"z"}
    assert succ(cpg, "z") == {"x"}
    assert succ(cpg, "x", 1) == {"1"}
    assert succ(cpg, "x < 1") == {"y", "x"}
    assert succ(cpg, "c") == {"RET"}


# SimpleCfgCreationPassTests.scala:485-492
def test_do_while_inside_while_with_break():
    cpg = build_cpg("while(x) { do { break; } while (y) } o;")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"break;", "o"}
    assert succ(cpg, "break;") == {"x"}
    assert succ(cpg, "o") == {"RET"}


# SimpleCfgCreationPassTests.scala:494-500
def test_two_nested_while_inner_break():
    cpg = build_cpg("while(y) { while(z) { break; x; } }")
    assert succ(cpg, ":program") == {"y"}
    assert succ(cpg, "y") == {"z", "RET"}
    assert succ(cpg, "z") == {"break;", "y"}
    assert succ(cpg, "break;") == {"y"}


# SimpleCfgCreationPassTests.scala:729-774 (for-in/of iterator desugaring)
def test_for_in_desugared_chain():
    cpg = build_cpg("for (var i in arr) { foo(i) }")
    assert succ(cpg, ":program") == {"_iterator_0"}
    assert succ(cpg, "_iterator_0") == {"arr"}
    assert succ(cpg, "arr") == {"<operator>.iterator(arr)"}
    assert succ(cpg, "<operator>.iterator(arr)") == {"_iterator_0 = <operator>.iterator(arr)"}
    assert succ(cpg, "_iterator_0 = <operator>.iterator(arr)") == {"_result_0"}
    assert succ(cpg, "_result_0") == {"i"}
    assert succ(cpg, "i") == {"_result_0"}
    assert succ(cpg, "_result_0", 1) == {"_iterator_0"}
    assert succ(cpg, "_iterator_0", 1) == {"next"}
    assert succ(cpg, "next") == {"_iterator_0.next"}
    assert succ(cpg, "_iterator_0.next") == {"_iterator_0"}
    assert succ(cpg, "_iterator_0", 2) == {"_iterator_0.next()"}
    assert succ(cpg, "_iterator_0.next()") == {"(_result_0 = _iterator_0.next())"}
    assert succ(cpg, "(_result_0 = _iterator_0.next())") == {"done"}
    assert succ(cpg, "done") == {"(_result_0 = _iterator_0.next()).done"}
    assert succ(cpg, "(_result_0 = _iterator_0.next()).done") == {
        "!(_result_0 = _iterator_0.next()).done"}
    # loop test fans to loop var assignment (True) / outer block (False)
    s = succ(cpg, "!(_result_0 = _iterator_0.next()).done")
    assert "i" in s and any(c.startswith("for (var i") for c in s)
    assert succ(cpg, "i", 1) == {"_result_0"}
    assert succ(cpg, "_result_0", 2) == {"value"}
    assert succ(cpg, "value") == {"_result_0.value"}
    assert succ(cpg, "_result_0.value") == {"i = _result_0.value"}
    assert succ(cpg, "i = _result_0.value") == {"foo"}
    assert succ(cpg, "foo") == {"this"}
    assert succ(cpg, "this", 1) == {"i"}  # this(0) is the :program parameter
    assert succ(cpg, "i", 2) == {"foo(i)"}
    assert succ(cpg, "foo(i)") == {"{ foo(i) }"}
    assert succ(cpg, "{ foo(i) }") == {"_result_0"}
