"""AST golden batch 1: jssrc2cpg passes/ast/SimpleAstCreationPassTests.scala
(cited per test).  Filename differs by fixture convention only: the
reference test harness names the file Test0.js, ours script.js."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q

FN = "script.js"  # reference fixture: Test0.js


def _strip_quotes(s: str) -> str:
    """semanticcpg Literal.strippedCode: strip ONE matching outer pair."""
    if len(s) >= 2 and s[0] == s[-1] and s[0] in ('"', "'", "`"):
        return s[1:-1]
    return s


# SimpleAstCreationPassTests.scala:16-21 (correct file nodes)
def test_file_nodes():
    cpg = build_cpg("")
    (file_node,) = Q(cpg).file().l()
    assert file_node.name == FN
    assert file_node.order == 0


# SimpleAstCreationPassTests.scala:23-33 (with statement with block)
def test_with_statement_with_block():
    cpg = build_cpg("""
with(foo()) {
  bar();
}
""")
    q = Q(cpg)
    (method,) = q.method().name_exact(":program").l()
    (mblock,) = q.method().name_exact(":program").ast_children().is_block().l()
    (wblock,) = Q(cpg).all().filter(lambda n: n is mblock).ast_children().is_block().l()
    s = Q(cpg)
    inner_calls = [n.code for n in s.all().filter(lambda n: n is wblock)
                   .ast_children().is_call().l()]
    assert inner_calls == ["foo()", "bar()"]


# SimpleAstCreationPassTests.scala:35-46 (with statement without block)
def test_with_statement_without_block():
    cpg = build_cpg("""
with(foo())
  bar();
baz();
""")
    q = Q(cpg)
    (mblock,) = q.method().name_exact(":program").ast_children().is_block().l()
    mb = Q(cpg).all().filter(lambda n: n is mblock)
    assert [n.code for n in mb.ast_children().is_call().l()] == ["baz()"]
    (wblock,) = mb.ast_children().is_block().l()
    wcalls = [n.code for n in Q(cpg).all().filter(lambda n: n is wblock)
              .ast_children().is_call().l()]
    assert wcalls == ["foo()", "bar()"]


# SimpleAstCreationPassTests.scala:48-52 (long numeric literal)
def test_long_numeric_literal():
    cpg = build_cpg("console.log(1e20)")
    (lit,) = Q(cpg).literal().l()
    assert lit.code == "1e20"


# SimpleAstCreationPassTests.scala:54-60 (non null expression)
def test_non_null_expression():
    cpg = build_cpg("const foo = bar!")
    (nn,) = Q(cpg).call().name_exact("<operator>.notNullAssert").l()
    (arg,) = Q(cpg).all().filter(lambda n: n is nn).argument().is_identifier().l()
    assert arg.name == "bar"
    assert arg.code == "bar"


# SimpleAstCreationPassTests.scala:62-68 (return node for arrow functions)
def test_arrow_function_return_node():
    cpg = build_cpg("const foo = () => 42;")
    q = Q(cpg)
    lit = (q.method("<lambda>0").ast_children().is_block()
           .ast_children().is_return().ast_children().is_literal().l())
    assert [n.code for n in lit] == ["42"]


# SimpleAstCreationPassTests.scala:70-73 (only 1 block for arrow functions)
def test_arrow_function_single_block():
    cpg = build_cpg("const foo = () => {return 42;}")
    assert Q(cpg).method("<lambda>0").ast().is_block().size() == 1


# SimpleAstCreationPassTests.scala:75-84 (FILENAME property)
def test_filename_property():
    cpg = build_cpg("let x = 1;")
    nbs = [n for n in Q(cpg).namespace_block().l() if n.filename == FN]
    assert len(nbs) == 1
    (program,) = Q(cpg).method().name_exact(":program").l()
    assert program.filename == FN
    (td,) = Q(cpg).type_decl().name_exact(":program").l()
    assert td.filename == FN


# SimpleAstCreationPassTests.scala:86-92 (correct type for literals)
def test_literal_types():
    cpg = build_cpg("let x = 1; let y = 'y'; let z = false;")
    x, y, z = Q(cpg).literal().l()
    assert x.type_full_name == "__ecma.Number"
    assert y.type_full_name == "__ecma.String"
    assert z.type_full_name == "__ecma.Boolean"


# SimpleAstCreationPassTests.scala:94-123 (inner text for string literals)
def test_string_literal_inner_text():
    cpg = build_cpg('''
let a = "abc";
let b = "\\"abc";
let c = "abc\\"";
let d = 'abc';
let e = '\\'abc';
let f = 'abc\\'';
let g = "'abc'";
let h = '"abc"';
let i = '\\'abc\\'';
let j = `abc
def
`
''')
    got = [_strip_quotes(n.code) for n in Q(cpg).literal().l()]
    assert got == [
        "abc", '"abc', 'abc"', "abc", "'abc", "abc'",
        "'abc'", '"abc"', "'abc'", "abc\ndef\n",
    ]


# SimpleAstCreationPassTests.scala:125-135 (multiple declarators)
def test_multiple_declarators():
    cpg = build_cpg("let x = 1, y = 2, z = 3;")
    calls = sorted(Q(cpg).call().l(), key=lambda n: n.code)
    assert [c.code for c in calls] == ["let x = 1", "let y = 2", "let z = 3"]
    prog_calls = sorted(
        Q(cpg).method().name_exact(":program").ast().is_call().l(),
        key=lambda n: n.code)
    assert prog_calls == calls


# SimpleAstCreationPassTests.scala:137-146 (call on require)
def test_call_on_require():
    cpg = build_cpg('var x = require("foo").bar;')
    calls = sorted(Q(cpg).call().l(), key=lambda n: n.code)
    assert [c.code for c in calls] == [
        'require("foo")', 'require("foo").bar', 'var x = require("foo").bar']
    prog_calls = sorted(
        Q(cpg).method().name_exact(":program").ast().is_call().l(),
        key=lambda n: n.code)
    assert prog_calls == calls


# SimpleAstCreationPassTests.scala:148-172 (block expression)
def test_block_expression_structure():
    cpg = build_cpg("let x = (class Foo {}, bar())")
    q = Q(cpg)
    (td,) = q.type_decl().name_exact("Foo").l()
    assert td.full_name == f"{FN}::program:Foo"
    ctor = (q.type_decl().name_exact("Foo").ast_children().is_method()
            .name_exact("<init>").l())
    assert [m.code for m in ctor] == ["constructor() {}"]
    (pb,) = q.method().name_exact(":program").ast_children().is_block().l()
    pbs = Q(cpg).all().filter(lambda n: n is pb)
    (assign,) = pbs.ast_children().is_call().l()
    assert assign.name == "<operator>.assignment"
    (comma,) = (Q(cpg).all().filter(lambda n: n is assign)
                .ast_children().is_block().l())
    cs = Q(cpg).all().filter(lambda n: n is comma)
    assert [n.code for n in cs.ast_children().is_type_ref().l()] == ["class Foo"]
    assert [n.code for n in cs.ast_children().is_call().l()] == ["bar()"]


# SimpleAstCreationPassTests.scala:174-183 (index access)
def test_index_access():
    cpg = build_cpg("if(d = decorators[i]) foo();")
    (ia,) = Q(cpg).call().name_exact("<operator>.indexAccess").l()
    assert ia.code == "decorators[i]"
    base, idx = (Q(cpg).all().filter(lambda n: n is ia)
                 .argument().is_identifier().l())
    assert (base.name, base.argument_index) == ("decorators", 1)
    assert (idx.name, idx.argument_index) == ("i", 2)


# SimpleAstCreationPassTests.scala:185-197 (empty array literal)
def test_empty_array_literal_ast():
    cpg = build_cpg("var x = []")
    q = Q(cpg)
    (mblock,) = q.method().name_exact(":program").ast_children().is_block().l()
    (assign,) = (Q(cpg).all().filter(lambda n: n is mblock)
                 .ast_children().is_call().l())
    assert assign.name == "<operator>.assignment"
    (arr,) = (Q(cpg).all().filter(lambda n: n is assign)
              .ast_children().is_call().l())
    assert arr.name == "__ecma.Array.factory"
    assert arr.code == "__ecma.Array.factory()"
    assert arr.dispatch_type == "STATIC_DISPATCH"


def _push_block(cpg):
    q = Q(cpg)
    (mblock,) = q.method().name_exact(":program").ast_children().is_block().l()
    (assign,) = (Q(cpg).all().filter(lambda n: n is mblock)
                 .ast_children().is_call().l())
    assert assign.name == "<operator>.assignment"
    (pb,) = (Q(cpg).all().filter(lambda n: n is assign)
             .ast_children().is_block().l())
    return pb


def _check_push_literal(cpg, pb, value):
    pushes = (Q(cpg).all().filter(lambda n: n is pb).ast_children()
              .is_call().code_exact(f"_tmp_0.push({value})").l())
    assert len(pushes) == 1
    lits = (Q(cpg).all().filter(lambda n: n is pushes[0])
            .ast_children().is_literal().l())
    assert [n.code for n in lits] == [str(value)]


# SimpleAstCreationPassTests.scala:199-226 (array literal with values)
def test_array_literal_with_values_ast():
    cpg = build_cpg("var x = [1, 2]")
    pb = _push_block(cpg)
    pbs = lambda: Q(cpg).all().filter(lambda n: n is pb)  # noqa: E731
    (tmp_local,) = pbs().ast_children().is_local().l()
    assert tmp_local.name == "_tmp_0"
    (tmp_assign,) = (pbs().ast_children().is_call()
                     .code_exact("_tmp_0 = __ecma.Array.factory()").l())
    assert tmp_assign.name == "<operator>.assignment"
    (arr,) = (Q(cpg).all().filter(lambda n: n is tmp_assign)
              .ast_children().is_call().l())
    assert arr.name == "__ecma.Array.factory"
    assert arr.dispatch_type == "STATIC_DISPATCH"
    _check_push_literal(cpg, pb, 1)
    _check_push_literal(cpg, pb, 2)
    (tmp_ret,) = pbs().ast_children().is_identifier().l()
    assert tmp_ret.name == "_tmp_0"


# SimpleAstCreationPassTests.scala:228-258 (array literal, too many values)
def test_array_literal_too_many_values():
    cpg = build_cpg("var x = [1, 2, " + ",".join(["n"] * 1500) + "]")
    pb = _push_block(cpg)
    pbs = lambda: Q(cpg).all().filter(lambda n: n is pb)  # noqa: E731
    (tmp_local,) = pbs().ast_children().is_local().l()
    assert tmp_local.name == "_tmp_0"
    _check_push_literal(cpg, pb, 1)
    _check_push_literal(cpg, pb, 2)
    # all other elements truncated
    (ph,) = pbs().ast_children().is_literal().l()
    assert ph.code == "<too-many-initializers>"
    assert ph.order == 1002
    (tmp_ret,) = pbs().ast_children().is_identifier().l()
    assert tmp_ret.name == "_tmp_0"


# SimpleAstCreationPassTests.scala:260-285 (untagged runtime node in call)
def test_untagged_template_in_call_ast():
    cpg = build_cpg("foo(`Hello ${world}!`)")
    q = Q(cpg)
    (mblock,) = q.method().name_exact(":program").ast_children().is_block().l()
    (foo_call,) = (Q(cpg).all().filter(lambda n: n is mblock)
                   .ast_children().is_call().l())
    assert foo_call.code == "foo(`Hello ${world}!`)"
    (fmt,) = (Q(cpg).all().filter(lambda n: n is foo_call)
              .ast_children().is_call().l())
    assert fmt.name == "<operator>.formatString"
    assert fmt.code == '<operator>.formatString("Hello ", world, "!")'
    fs = lambda: Q(cpg).all().filter(lambda n: n is fmt)  # noqa: E731
    (a1,) = fs().ast_children().is_literal().order(1).l()
    assert (a1.argument_index, a1.code) == (1, '"Hello "')
    (a2,) = fs().ast_children().is_identifier().order(2).l()
    assert (a2.argument_index, a2.name, a2.code) == (2, "world", "world")
    (a3,) = fs().ast_children().is_literal().order(3).l()
    assert (a3.argument_index, a3.code) == (3, '"!"')


# SimpleAstCreationPassTests.scala:287-309 (untagged runtime node)
def test_untagged_template_ast():
    cpg = build_cpg("`${x + 1}`")
    q = Q(cpg)
    (mblock,) = q.method().name_exact(":program").ast_children().is_block().l()
    (fmt,) = (Q(cpg).all().filter(lambda n: n is mblock)
              .ast_children().is_call().l())
    assert fmt.name == "<operator>.formatString"
    assert fmt.code == '<operator>.formatString("", x + 1, "")'
    fs = lambda: Q(cpg).all().filter(lambda n: n is fmt)  # noqa: E731
    (a1,) = fs().ast_children().is_literal().order(1).l()
    assert (a1.argument_index, a1.code) == (1, '""')
    (a2,) = fs().ast_children().is_call().order(2).l()
    assert (a2.argument_index, a2.code) == (2, "x + 1")
    (a3,) = fs().ast_children().is_literal().order(3).l()
    assert (a3.argument_index, a3.code) == (3, '""')


# SimpleAstCreationPassTests.scala:311-334 (tagged template, simple tag)
def test_tagged_template_simple_tag_ast():
    cpg = build_cpg("x`a ${1+1} b`")
    q = Q(cpg)
    (mblock,) = q.method().name_exact(":program").ast_children().is_block().l()
    (raw,) = (Q(cpg).all().filter(lambda n: n is mblock)
              .ast_children().is_call().l())
    assert raw.dispatch_type == "DYNAMIC_DISPATCH"
    assert raw.name == "x"
    rcv = Q(cpg).all().filter(lambda n: n is raw).receiver().is_identifier().l()
    assert [n.code for n in rcv] == ["x"]
    assert raw.code == "x`a ${1+1} b`"
    (arg1,) = Q(cpg).all().filter(lambda n: n is raw).ast_children().is_block().l()
    assert arg1.argument_index == 1
    child_codes = [n.code for n in
                   Q(cpg).all().filter(lambda n: n is arg1).ast_children().l()]
    assert child_codes == [
        "_tmp_0", "_tmp_0 = __ecma.Array.factory()",
        '_tmp_0.push("a ")', '_tmp_0.push(" b")', "_tmp_0"]
    (arg2,) = (Q(cpg).all().filter(lambda n: n is raw)
               .ast_children().is_call().code_exact("1+1").l())
    assert arg2.argument_index == 2


# SimpleAstCreationPassTests.scala:356-381 (different string literals)
def test_different_string_literals():
    cpg = build_cpg("""
var keyA = "AAA";
var keyB = 'BBB';
var keyC = `CCC`;
var keyD = `DDD"`;
var keyE = "EE EE E";
var keyF = "F-FF-F";
""")
    assert [n.code for n in Q(cpg).literal().l()] == [
        '"AAA"', '"BBB"', '"CCC"', '"DDD""', '"EE EE E"', '"F-FF-F"']
    assert [n.code for n in Q(cpg).call().l()] == [
        'var keyA = "AAA"', "var keyB = 'BBB'", "var keyC = `CCC`",
        'var keyD = `DDD"`', 'var keyE = "EE EE E"', 'var keyF = "F-FF-F"']
