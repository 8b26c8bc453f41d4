"""AST golden batch 12: MixedAstCreationPassTests.scala 668-905
(destructuring defaults / reassignment / rest / computed / in params and
call arguments)."""

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


def _destruction_block(cpg, parent=None):
    if parent is None:
        program = _only(Q(cpg).method().name_exact(":program").l())
        parent = _only(_at(cpg, program).ast_children().is_block().l())
    return _only(_at(cpg, parent).ast_children().is_block().l())


def _check_default_member(cpg, dblock, nm, key, dflt):
    assign = _only(_at(cpg, dblock).ast_children().is_call().code_exact(
        f"{nm} = _tmp_0.{key} === void 0 ? {dflt} : _tmp_0.{key}").l())
    assert _at(cpg, assign).ast_children().is_identifier().size() == 1
    cond = _only(_at(cpg, assign).ast_children().is_call().code_exact(
        f"_tmp_0.{key} === void 0 ? {dflt} : _tmp_0.{key}").l())
    assert cond.name == "<operator>.conditional"
    test = _only(_at(cpg, cond).ast_children().is_call().code_exact(
        f"_tmp_0.{key} === void 0").l())
    assert test.name == "<operator>.equals"
    fa = _only(_at(cpg, test).ast_children().is_call()
               .code_exact(f"_tmp_0.{key}").l())
    assert fa.name == "<operator>.fieldAccess"
    assert _at(cpg, test).ast_children().is_call().code_exact("void 0").size() == 1
    assert _at(cpg, cond).ast_children().is_literal().code_exact(dflt).size() == 1
    false_b = _only(_at(cpg, cond).ast_children().is_call()
                    .code_exact(f"_tmp_0.{key}").l())
    assert false_b.name == "<operator>.fieldAccess"


# MixedAstCreationPassTests.scala:668-720 (defaults)
def test_object_destructure_with_defaults_ast():
    cpg = build_cpg("var {a = 1, b = 2} = x;")
    program = _only(Q(cpg).method().name_exact(":program").l())
    pblock = _only(_at(cpg, program).ast_children().is_block().l())
    assert _at(cpg, pblock).ast_children().is_local().name_exact("a").size() == 1
    assert _at(cpg, pblock).ast_children().is_local().name_exact("b").size() == 1
    dblock = _destruction_block(cpg, pblock)
    assert _at(cpg, dblock).ast_children().is_local().name_exact("_tmp_0").size() == 1
    assert _at(cpg, dblock).ast_children().is_call().code_exact("_tmp_0 = x").size() == 1
    _check_default_member(cpg, dblock, "a", "a", "1")
    _check_default_member(cpg, dblock, "b", "b", "2")
    assert _only(_at(cpg, dblock).ast_children().is_identifier().l()).name == "_tmp_0"


def _check_renamed_member(cpg, dblock, nm, key):
    assign = _only(_at(cpg, dblock).ast_children().is_call()
                   .code_exact(f"{nm} = _tmp_0.{key}").l())
    assert _at(cpg, assign).ast_children().is_identifier().size() == 1
    fa = _only(_at(cpg, assign).ast_children().is_call()
               .code_exact(f"_tmp_0.{key}").l())
    assert fa.name == "<operator>.fieldAccess"
    assert _at(cpg, fa).ast_children().is_identifier().name_exact("_tmp_0").size() == 1
    assert _at(cpg, fa).ast_children().is_field_identifier() \
        .canonical_name(key).size() == 1


# MixedAstCreationPassTests.scala:721-752 (reassignment)
def test_object_destructure_reassignment_ast():
    cpg = build_cpg("var {a: n, b: m} = x;")
    assert Q(cpg).local().name_exact("n").size() == 1
    assert Q(cpg).local().name_exact("m").size() == 1
    dblock = _destruction_block(cpg)
    assert _at(cpg, dblock).ast_children().is_call().code_exact("_tmp_0 = x").size() == 1
    _check_renamed_member(cpg, dblock, "n", "a")
    _check_renamed_member(cpg, dblock, "m", "b")
    assert _only(_at(cpg, dblock).ast_children().is_identifier().l()).name == "_tmp_0"


# MixedAstCreationPassTests.scala:753-805 (reassignment + defaults)
def test_object_destructure_reassignment_defaults_ast():
    cpg = build_cpg("var {a: n = 1, b: m = 2} = x;")
    program = _only(Q(cpg).method().name_exact(":program").l())
    pblock = _only(_at(cpg, program).ast_children().is_block().l())
    assert _at(cpg, pblock).ast_children().is_local().name_exact("n").size() == 1
    assert _at(cpg, pblock).ast_children().is_local().name_exact("m").size() == 1
    dblock = _destruction_block(cpg, pblock)
    _check_default_member(cpg, dblock, "n", "a", "1")
    _check_default_member(cpg, dblock, "m", "b", "2")
    assert _only(_at(cpg, dblock).ast_children().is_identifier().l()).name == "_tmp_0"


# MixedAstCreationPassTests.scala:823-835 (object deconstruction in params)
def test_object_deconstruction_in_function_parameter():
    cpg = build_cpg("function foo({ a }, b) {};")
    program = _only(Q(cpg).method().name_exact(":program").l())
    foo = _only(_at(cpg, program).ast_children().is_method()
                .name_exact("foo").l())
    params = {p.name: p for e in cpg.out(foo, "AST")
              for p in [e.dst] if p.label == "METHOD_PARAMETER_IN"}
    a = params["param1_0"]
    assert (a.code, a.index) == ("{ a }", 1)
    b = params["b"]
    assert (b.code, b.index) == ("b", 2)


# MixedAstCreationPassTests.scala:837-866 (destructure in call argument)
def test_object_destructure_in_call_argument():
    cpg = build_cpg("foo({a, b} = x);")
    program = _only(Q(cpg).method().name_exact(":program").l())
    pblock = _only(_at(cpg, program).ast_children().is_block().l())
    assert Q(cpg).local().name_exact("a").size() == 1
    assert Q(cpg).local().name_exact("b").size() == 1
    foo_call = _only(_at(cpg, pblock).ast_children().is_call().l())
    dblock = _only(_at(cpg, foo_call).ast_children().is_block().l())
    assert _at(cpg, dblock).ast_children().is_local().name_exact("_tmp_0").size() == 1
    assert _at(cpg, dblock).ast_children().is_call().code_exact("_tmp_0 = x").size() == 1
    _check_renamed_member(cpg, dblock, "a", "a")
    _check_renamed_member(cpg, dblock, "b", "b")
    assert _only(_at(cpg, dblock).ast_children().is_identifier().l()).name == "_tmp_0"


# MixedAstCreationPassTests.scala:868-899 (destructure with rest)
def test_object_destructure_with_rest_ast():
    cpg = build_cpg("var {a, ...rest} = x;")
    assert Q(cpg).local().name_exact("a").size() == 1
    assert Q(cpg).local().name_exact("rest").size() == 1
    dblock = _destruction_block(cpg)
    assert _at(cpg, dblock).ast_children().is_local().name_exact("_tmp_0").size() == 1
    assert _at(cpg, dblock).ast_children().is_call().code_exact("_tmp_0 = x").size() == 1
    _check_renamed_member(cpg, dblock, "a", "a")
    rest_call = _only(_at(cpg, dblock).ast_children().is_call()
                      .name_exact("<operator>.spread").l())
    assert rest_call.code == "...rest"
    tmp_arg, rest_arg = _at(cpg, rest_call).argument().is_identifier().l()
    assert (tmp_arg.code, tmp_arg.name, tmp_arg.argument_index) == \
        ("_tmp_0", "_tmp_0", 1)
    assert (rest_arg.code, rest_arg.argument_index) == ("rest", 2)
    assert _only(_at(cpg, dblock).ast_children().is_identifier().l()).name == "_tmp_0"


# MixedAstCreationPassTests.scala:901-925 (computed property name)
def test_object_destructure_computed_property_ast():
    cpg = build_cpg("var {[propName]: n} = x;")
    assert Q(cpg).local().name_exact("n").size() == 1
    dblock = _destruction_block(cpg)
    assert _at(cpg, dblock).ast_children().is_call().code_exact("_tmp_0 = x").size() == 1
    assign = _only(_at(cpg, dblock).ast_children().is_call()
                   .code_exact("n = _tmp_0.propName").l())
    assert _at(cpg, assign).ast_children().is_identifier().size() == 1
