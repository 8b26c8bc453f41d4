"""AST golden batch 11: MixedAstCreationPassTests.scala 450-650 (anon
captures, scoped lambda full names, mixed fragments, object destructuring
AST shapes)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q

FN = "script.js"


def _only(xs):
    xs = list(xs)
    assert len(xs) == 1, [repr(n) for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


# MixedAstCreationPassTests.scala:450-480 (same var captured by two lambdas)
def test_capture_by_two_anonymous_functions():
    cpg = build_cpg("""
function foo() {
  x = 1;
  var anon1 = y => 2 * x;
  var anon2 = y => 2 * x;
}
""")
    foo = _only(Q(cpg).method().name_exact("foo").l())
    foo_block = _only(_at(cpg, foo).ast_children().is_block().l())
    foo_local_x = _only(_at(cpg, foo_block).ast_children().is_local()
                        .name_exact("x").l())
    for lam in ("<lambda>0", "<lambda>1"):
        full = f"{FN}::program:foo:{lam}"
        ref = _only([n for n in _at(cpg, foo_block).ast_children().is_call()
                     .ast_children().is_method_ref().l()
                     if n.method_full_name == full])
        binding = _only([e.dst for e in cpg.out(ref, "CAPTURE")])
        assert binding.closure_binding_id == f"{full}:x"
        assert [e.dst for e in cpg.out(binding, "REF")] == [foo_local_x]
        assert binding.evaluation_strategy == "BY_REFERENCE"


# MixedAstCreationPassTests.scala:509-521 (scoped anon full names)
def test_scoped_anonymous_full_names():
    cpg = build_cpg("""
var anon1 = x => {
  var anon2 = y => {};
}
var anon3 = x => {
  var anon4 = y => {};
}""")
    by_line = {}
    for m in Q(cpg).method().l():
        if m.name.startswith("<lambda>"):
            by_line[m.line] = m.full_name
    assert by_line[2] == f"{FN}::program:<lambda>0"
    assert by_line[3] == f"{FN}::program:<lambda>0:<lambda>1"
    assert by_line[5] == f"{FN}::program:<lambda>2"
    assert by_line[6] == f"{FN}::program:<lambda>2:<lambda>3"


# MixedAstCreationPassTests.scala:525-556 (simple fragment with call)
def test_simple_fragment_with_call():
    cpg = build_cpg("""
function source(a) { return a; }
var l = source(3);
""")
    program = _only(Q(cpg).method().name_exact(":program").l())
    method = _only(Q(cpg).method().name_exact("source").l())
    pblock = _only(_at(cpg, program).ast_children().is_block().l())
    mblock = _only(_at(cpg, method).ast_children().is_block().l())
    params = [e.dst for e in cpg.out(method, "AST")
              if e.dst.label == "METHOD_PARAMETER_IN"]
    assert len(params) == 2
    local_source, local_l = _at(cpg, pblock).ast_children().is_local().l()
    assert local_source.name == "source"
    assert local_source.type_full_name == f"{FN}::program:source"
    assert local_l.name == "l"
    call_to_source = _only(_at(cpg, pblock).ast_children().is_call()
                           .code_exact("var l = source(3)").l())
    ident_l = _only(_at(cpg, call_to_source).ast_children().is_identifier().l())
    assert ident_l.name == "l"
    call = _only(_at(cpg, call_to_source).ast_children().is_call().l())
    assert _at(cpg, call).ast_children().is_literal().code_exact("3").size() == 1
    ret = _only(_at(cpg, mblock).ast_children().is_return().l())
    assert _at(cpg, ret).ast_children().is_identifier().name_exact("a").size() == 1


# MixedAstCreationPassTests.scala:558-570 (array access fragment)
def test_simple_fragment_array_access():
    cpg = build_cpg("result = rows[0].solution;")
    program = _only(Q(cpg).method().name_exact(":program").l())
    pblock = _only(_at(cpg, program).ast_children().is_block().l())
    call = _only(_at(cpg, pblock).ast_children().is_call().l())
    rows_call = _only(_at(cpg, call).ast_children().is_call().l())
    assert _at(cpg, rows_call).ast_children().is_field_identifier() \
        .canonical_name("solution").size() == 1
    rows_left = _only(_at(cpg, rows_call).ast_children().is_call().l())
    assert _at(cpg, rows_left).ast_children().is_literal().code_exact("0").size() == 1
    assert _at(cpg, rows_left).ast_children().is_identifier() \
        .name_exact("rows").size() == 1
    assert _at(cpg, call).ast_children().is_identifier() \
        .name_exact("result").size() == 1


def _check_object_destructure_block(cpg, init_code):
    program = _only(Q(cpg).method().name_exact(":program").l())
    pblock = _only(_at(cpg, program).ast_children().is_block().l())
    assert Q(cpg).local().name_exact("a").size() == 1
    assert Q(cpg).local().name_exact("b").size() == 1
    dblock = _only(_at(cpg, pblock).ast_children().is_block().l())
    assert _at(cpg, dblock).ast_children().is_local().name_exact("_tmp_0").size() == 1
    assert _at(cpg, dblock).ast_children().is_call() \
        .code_exact(f"_tmp_0 = {init_code}").size() == 1
    for nm in ("a", "b"):
        assign = _only(_at(cpg, dblock).ast_children().is_call()
                       .code_exact(f"{nm} = _tmp_0.{nm}").l())
        assert _at(cpg, assign).ast_children().is_identifier().size() == 1
        fa = _only(_at(cpg, assign).ast_children().is_call()
                   .code_exact(f"_tmp_0.{nm}").l())
        assert fa.name == "<operator>.fieldAccess"
        assert _at(cpg, fa).ast_children().is_identifier() \
            .name_exact("_tmp_0").size() == 1
        assert _at(cpg, fa).ast_children().is_field_identifier() \
            .canonical_name(nm).size() == 1
    tmp_ret = _only(_at(cpg, dblock).ast_children().is_identifier().l())
    assert tmp_ret.name == "_tmp_0"
    return dblock


# MixedAstCreationPassTests.scala:574-608 (obj destructure w/ declaration)
def test_object_destructure_with_declaration_ast():
    cpg = build_cpg("var {a, b} = x;")
    for nm in ("a", "b"):
        local = _only(Q(cpg).local().name_exact(nm).l())
        refs = [e.src for e in cpg.edges
                if e.label == "REF" and e.dst is local]
        assert refs and refs[0].name == nm
    dblock = _check_object_destructure_block(cpg, "x")
    assert dblock.code == "var {a, b} = x"


# MixedAstCreationPassTests.scala:610-637 (ternary init)
def test_object_destructure_ternary_init_ast():
    cpg = build_cpg("const { a, b } = test() ? foo() : bar();")
    _check_object_destructure_block(cpg, "test() ? foo() : bar()")


# MixedAstCreationPassTests.scala:639-668 (without declaration)
def test_object_destructure_without_declaration_ast():
    cpg = build_cpg("({a, b} = x);")
    _check_object_destructure_block(cpg, "x")
