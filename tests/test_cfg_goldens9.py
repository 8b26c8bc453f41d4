"""Ninth CFG golden batch — the remaining SimpleCfgCreationPassTests.scala
transcriptions (cited per test; successor codes as the reference fixture
compares — `expected()` ignores edge kinds, codes only)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from tests.cfg_helpers import succ_codes as succ


# SimpleCfgCreationPassTests.scala:12-24 (block expression)
def test_block_expression():
    cpg = build_cpg("let x = (class Foo {}, bar())")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"class Foo"}
    assert succ(cpg, "class Foo") == {"bar"}
    assert succ(cpg, "bar") == {"this"}
    assert succ(cpg, "this", 0, "IDENTIFIER") == {"bar()"}
    assert succ(cpg, "bar()") == {"class Foo {}, bar()"}
    assert succ(cpg, "class Foo {}, bar()") == {"let x = (class Foo {}, bar())"}
    assert succ(cpg, "let x = (class Foo {}, bar())") == {"RET"}


# SimpleCfgCreationPassTests.scala:93-121 (tagged runtime node)
def test_tagged_template():
    cpg = build_cpg("String.raw`../${42}\\..`")
    assert succ(cpg, ":program") == {"String"}
    assert succ(cpg, "String") == {"raw"}
    assert succ(cpg, "raw") == {"String.raw"}
    assert succ(cpg, "String.raw") == {"String"}
    assert succ(cpg, "String", 1) == {"_tmp_0"}
    assert succ(cpg, "_tmp_0") == {"__ecma.Array.factory()"}
    assert succ(cpg, "__ecma.Array.factory()") == {"_tmp_0 = __ecma.Array.factory()"}
    assert succ(cpg, "_tmp_0 = __ecma.Array.factory()") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 1) == {"push"}
    assert succ(cpg, "push") == {"_tmp_0.push"}
    assert succ(cpg, "_tmp_0.push") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 2) == {'"../"'}
    assert succ(cpg, '"../"') == {'_tmp_0.push("../")'}
    assert succ(cpg, '_tmp_0.push("../")') == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 3) == {"push"}
    assert succ(cpg, "push", 1) == {"_tmp_0.push"}
    assert succ(cpg, "_tmp_0.push", 1) == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 4) == {'"\\.."'}
    assert succ(cpg, '"\\.."') == {'_tmp_0.push("\\..")'}
    assert succ(cpg, '_tmp_0.push("\\..")') == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 5) == {"`../${42}\\..`"}
    assert succ(cpg, "`../${42}\\..`") == {"42"}
    assert succ(cpg, "42") == {"String.raw`../${42}\\..`"}
    assert succ(cpg, "String.raw`../${42}\\..`") == {"RET"}


# SimpleCfgCreationPassTests.scala:142-164 (try with multiple exits)
def test_try_multiple_exit_nodes():
    cpg = build_cpg("""
try {
 if (true) {
   doA()
 } else {
   doB()
 }
} catch(err) {
 handle()
} finally {
 close()
}
""")
    assert succ(cpg, ":program") == {"true"}
    assert succ(cpg, "true") == {"doA", "doB"}
    assert succ(cpg, "doA()") == {"err", "close"}
    assert succ(cpg, "err") == {"handle"}
    assert succ(cpg, "doB()") == {"err", "close"}
    assert succ(cpg, "handle()") == {"close"}
    assert succ(cpg, "close()") == {"RET"}


# SimpleCfgCreationPassTests.scala:166-192 (1 object with simple values)
def test_object_with_simple_values():
    cpg = build_cpg("""
var x = {
 key1: "value",
 key2: 2
}
""")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0") == {"key1"}
    assert succ(cpg, "key1") == {"_tmp_0.key1"}
    assert succ(cpg, "_tmp_0.key1") == {'"value"'}
    assert succ(cpg, '"value"') == {'_tmp_0.key1 = "value"'}
    assert succ(cpg, '_tmp_0.key1 = "value"') == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 1) == {"key2"}
    assert succ(cpg, "key2") == {"_tmp_0.key2"}
    assert succ(cpg, "_tmp_0.key2") == {"2"}
    assert succ(cpg, "2") == {"_tmp_0.key2 = 2"}
    assert succ(cpg, "_tmp_0.key2 = 2") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 2) == {'{\n key1: "value",\n key2: 2\n}'}
    assert succ(cpg, '{\n key1: "value",\n key2: 2\n}') == {
        'var x = {\n key1: "value",\n key2: 2\n}'}
    assert succ(cpg, 'var x = {\n key1: "value",\n key2: 2\n}') == {"RET"}


# SimpleCfgCreationPassTests.scala:194-204 (chained member access assignment)
def test_member_access_chained_assignment():
    cpg = build_cpg("a.b = c.z;")
    assert succ(cpg, ":program") == {"a"}
    assert succ(cpg, "a") == {"b"}
    assert succ(cpg, "b") == {"a.b"}
    assert succ(cpg, "a.b") == {"c"}
    assert succ(cpg, "c") == {"z"}
    assert succ(cpg, "z") == {"c.z"}
    assert succ(cpg, "c.z") == {"a.b = c.z"}
    assert succ(cpg, "a.b = c.z") == {"RET"}


# SimpleCfgCreationPassTests.scala:206-212 (decl statement with assignment)
def test_decl_statement_with_assignment():
    cpg = build_cpg("var x = 1;")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"1"}
    assert succ(cpg, "1") == {"var x = 1"}
    assert succ(cpg, "var x = 1") == {"RET"}


# SimpleCfgCreationPassTests.scala:214-222 (nested expression)
def test_nested_expression():
    cpg = build_cpg("x = y + 1;")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"y"}
    assert succ(cpg, "y") == {"1"}
    assert succ(cpg, "1") == {"y + 1"}
    assert succ(cpg, "y + 1") == {"x = y + 1"}
    assert succ(cpg, "x = y + 1") == {"RET"}


# SimpleCfgCreationPassTests.scala:224-229 (return statement)
def test_return_statement():
    cpg = build_cpg("function foo(x) { return x; }")
    assert succ(cpg, "foo", 0, "METHOD") == {"x"}
    assert succ(cpg, "x", 0, "IDENTIFIER") == {"return x"}
    assert succ(cpg, "return x") == {"RET"}


# SimpleCfgCreationPassTests.scala:231-238 (consecutive return statements)
def test_consecutive_returns():
    cpg = build_cpg("function foo(x, y) { return x; return y; }")
    assert succ(cpg, "foo", 0, "METHOD") == {"x"}
    assert succ(cpg, "x", 0, "IDENTIFIER") == {"return x"}
    assert succ(cpg, "y", 0, "IDENTIFIER") == {"return y"}
    assert succ(cpg, "return x") == {"RET"}
    assert succ(cpg, "return y") == {"RET"}


# SimpleCfgCreationPassTests.scala:240-250 (outer program declares foo)
def test_outer_program_declares_foo():
    cpg = build_cpg("function foo(x, y) { return; }")
    assert succ(cpg, ":program", 0, "METHOD") == {"foo"}
    assert succ(cpg, "foo", 0, "IDENTIFIER") == {"foo"}
    assert succ(cpg, "foo", 0, "METHOD_REF") == {
        "function foo = function foo(x, y) { return; }"}
    assert succ(cpg, "function foo = function foo(x, y) { return; }") == {"RET"}


# SimpleCfgCreationPassTests.scala:252-256 (void return statement)
def test_void_return():
    cpg = build_cpg("function foo() { return; }")
    assert succ(cpg, "foo", 0, "METHOD") == {"return"}
    assert succ(cpg, "return") == {"RET"}


# SimpleCfgCreationPassTests.scala:258-268 (call expression)
def test_call_expression():
    cpg = build_cpg("foo(a + 1, b);")
    assert succ(cpg, ":program") == {"foo"}
    assert succ(cpg, "foo") == {"this"}
    assert succ(cpg, "this", 0, "IDENTIFIER") == {"a"}
    assert succ(cpg, "a") == {"1"}
    assert succ(cpg, "1") == {"a + 1"}
    assert succ(cpg, "a + 1") == {"b"}
    assert succ(cpg, "b") == {"foo(a + 1, b)"}
    assert succ(cpg, "foo(a + 1, b)") == {"RET"}


# SimpleCfgCreationPassTests.scala:288-293 (unary '++')
def test_unary_postincrement():
    cpg = build_cpg("x++")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"x++"}
    assert succ(cpg, "x++") == {"RET"}


# SimpleCfgCreationPassTests.scala:295-302 (conditional expression)
def test_conditional_expression_cfg():
    cpg = build_cpg("x ? y : z;")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"y", "z"}
    assert succ(cpg, "y") == {"x ? y : z"}
    assert succ(cpg, "z") == {"x ? y : z"}
    assert succ(cpg, "x ? y : z") == {"RET"}


# SimpleCfgCreationPassTests.scala:366-374 (while loop with break)
def test_while_with_break():
    cpg = build_cpg("while (x < 1) { break; y; }")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"1"}
    assert succ(cpg, "1") == {"x < 1"}
    assert succ(cpg, "x < 1") == {"break;", "RET"}
    assert succ(cpg, "break;") == {"RET"}
    assert succ(cpg, "y") == {"x"}


# SimpleCfgCreationPassTests.scala:376-384 (while loop with continue)
def test_while_with_continue():
    cpg = build_cpg("while (x < 1) { continue; y; }")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"1"}
    assert succ(cpg, "1") == {"x < 1"}
    assert succ(cpg, "x < 1") == {"continue;", "RET"}
    assert succ(cpg, "continue;") == {"x"}
    assert succ(cpg, "y") == {"x"}


# SimpleCfgCreationPassTests.scala:386-391 (nested while loop)
def test_nested_while():
    cpg = build_cpg("while (x) {while(y) {z;}}")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"y", "RET"}
    assert succ(cpg, "y") == {"z", "x"}


# SimpleCfgCreationPassTests.scala:393-400 (nested while with break)
def test_nested_while_break_outer_stmt():
    cpg = build_cpg("while (x) { while(y) { break; z;} a;} b;")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"y", "b"}
    assert succ(cpg, "y") == {"break;", "a"}
    assert succ(cpg, "a") == {"x"}
    assert succ(cpg, "b") == {"RET"}


# SimpleCfgCreationPassTests.scala:559-562 (for-of runs the same
# testForInOrOf() helper as for-in, :729-774)
def test_for_of_desugared_chain():
    cpg = build_cpg("for (var i of arr) { foo(i) }")
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
    s = succ(cpg, "!(_result_0 = _iterator_0.next()).done")
    assert "i" in s and any(c.startswith("for (var i") for c in s)
    assert succ(cpg, "i", 1) == {"_result_0"}
    assert succ(cpg, "_result_0", 2) == {"value"}
    assert succ(cpg, "value") == {"_result_0.value"}
    assert succ(cpg, "_result_0.value") == {"i = _result_0.value"}
    assert succ(cpg, "i = _result_0.value") == {"foo"}
    assert succ(cpg, "foo") == {"this"}
    assert succ(cpg, "this", 1) == {"i"}
    assert succ(cpg, "i", 2) == {"foo(i)"}
    assert succ(cpg, "foo(i)") == {"{ foo(i) }"}
    assert succ(cpg, "{ foo(i) }") == {"_result_0"}


# SimpleCfgCreationPassTests.scala:564-574 (nested for-loop)
def test_nested_for():
    cpg = build_cpg("for (x; y; z) { for (a; b; c) { u; } }")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"y"}
    assert succ(cpg, "y") == {"a", "RET"}
    assert succ(cpg, "z") == {"y"}
    assert succ(cpg, "a") == {"b"}
    assert succ(cpg, "b") == {"u", "z"}
    assert succ(cpg, "c") == {"b"}
    assert succ(cpg, "u") == {"c"}


# SimpleCfgCreationPassTests.scala:576-583 (for-loop with empty condition)
def test_for_empty_condition():
    cpg = build_cpg("for (;;) { a = 1; }")
    assert succ(cpg, ":program") == {"true"}
    assert succ(cpg, "true") == {"a", "RET"}
    assert succ(cpg, "a") == {"1"}
    assert succ(cpg, "1") == {"a = 1"}
    assert succ(cpg, "a = 1") == {"true"}


# SimpleCfgCreationPassTests.scala:585-590 (empty condition + break)
def test_for_empty_condition_break():
    cpg = build_cpg("for (;;) { break; }")
    assert succ(cpg, ":program") == {"true"}
    assert succ(cpg, "true") == {"break;", "RET"}
    assert succ(cpg, "break;") == {"RET"}


# SimpleCfgCreationPassTests.scala:592-598 (empty condition + continue)
def test_for_empty_condition_continue():
    cpg = build_cpg("for (;;) { continue; }")
    assert succ(cpg, ":program") == {"true"}
    assert succ(cpg, "true") == {"continue;", "RET"}
    assert succ(cpg, "continue;") == {"true"}


# SimpleCfgCreationPassTests.scala:600-606 (nested empty for-loop)
def test_nested_empty_for():
    cpg = build_cpg("for (;;) { for (;;) { x; } }")
    assert succ(cpg, ":program") == {"true"}
    assert succ(cpg, "true") == {"true", "RET"}
    assert succ(cpg, "true", 1) == {"x", "true"}
    assert succ(cpg, "x") == {"true"}


# SimpleCfgCreationPassTests.scala:608-612 (for-loop with empty block)
def test_for_empty_block():
    cpg = build_cpg("for (;;) ;")
    assert succ(cpg, ":program") == {"true"}
    assert succ(cpg, "true") == {"true", "RET"}


# SimpleCfgCreationPassTests.scala:695-705 (switch cases + default)
def test_switch_case_and_default_combined():
    cpg = build_cpg("switch (x) { case 1: y; break; default: z;}")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"case 1:", "default:"}
    assert succ(cpg, "case 1:") == {"1"}
    assert succ(cpg, "1") == {"y"}
    assert succ(cpg, "y") == {"break;"}
    assert succ(cpg, "break;") == {"RET"}
    assert succ(cpg, "default:") == {"z"}
    assert succ(cpg, "z") == {"RET"}


# SimpleCfgCreationPassTests.scala:707-727 (constructor call with new)
def test_constructor_call_with_new():
    cpg = build_cpg("var x = new MyClass(arg1, arg2)")
    assert succ(cpg, ":program") == {"x"}
    assert succ(cpg, "x") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0") == {".alloc"}
    assert succ(cpg, ".alloc") == {"_tmp_0 = .alloc"}
    assert succ(cpg, "_tmp_0 = .alloc") == {"MyClass"}
    assert succ(cpg, "MyClass") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 1) == {"arg1"}
    assert succ(cpg, "arg1") == {"arg2"}
    assert succ(cpg, "arg2") == {"new MyClass(arg1, arg2)"}
    assert succ(cpg, "new MyClass(arg1, arg2)", 0, "CALL") == {"_tmp_0"}
    assert succ(cpg, "_tmp_0", 2) == {"new MyClass(arg1, arg2)"}
    # occurrence 0 unfiltered is the BLOCK wrapper (fixture order) → assignment
    assert succ(cpg, "new MyClass(arg1, arg2)") == {"var x = new MyClass(arg1, arg2)"}
    assert succ(cpg, "var x = new MyClass(arg1, arg2)") == {"RET"}
