"""AST golden batch 9: MixedAstCreationPassTests.scala 12-200 (method full
names + variable scoping/REF linking)."""

from __future__ import annotations

import pytest

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q

FN = "script.js"  # reference fixture: Test0.js


def _only(steps):
    xs = steps.l()
    assert len(xs) == 1, [f"{n.label}:{n.code}" for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


def _ref(cpg, ident):
    return [e.dst for e in cpg.out(ident, "REF")]


# MixedAstCreationPassTests.scala:12-41 (method full names)
@pytest.mark.parametrize("src,expected", [
    ("var func = (x) => x;", f"{FN}::program:<lambda>0"),
    ("this.func = (x) => x;", f"{FN}::program:<lambda>0"),
    ("var func = function (x) {x};", f"{FN}::program:<lambda>0"),
    ("this.func = function (x) {x};", f"{FN}::program:<lambda>0"),
    ("class X { constructor(){} }", f"{FN}::program:X:<init>"),
    ("var x = class { constructor(y) {} };",
     f"{FN}::program:<anon-class>0:<init>"),
])
def test_method_full_names(src, expected):
    cpg = build_cpg(src)
    assert expected in {n.full_name for n in Q(cpg).method().l()}


def _check_single_ref(cpg, local_block_sel, assign_block_sel):
    """local under local_block, assignment under assign_block; identifier
    REFs the local."""
    method = _only(Q(cpg).method().name_exact(":program"))
    mblock = _only(_at(cpg, method).ast_children().is_block())
    local_block = local_block_sel(cpg, mblock)
    local_x = _only(_at(cpg, local_block).ast_children().is_local())
    assign_block = assign_block_sel(cpg, mblock)
    assignment = _only(_at(cpg, assign_block).ast_children().is_call())
    ident = _only(_at(cpg, assignment).ast_children().is_identifier())
    assert _ref(cpg, ident) == [local_x]


def _self(cpg, mblock):
    return mblock


def _nested(cpg, mblock):
    return _only(_at(cpg, mblock).ast_children().is_block())


# MixedAstCreationPassTests.scala:44-56 / 58-70 (var / let)
@pytest.mark.parametrize("src", ["\nvar x;\nx = 1;\n", "\nlet x;\nx = 1;\n"])
def test_refs_single_local(src):
    _check_single_ref(build_cpg(src), _self, _self)


# MixedAstCreationPassTests.scala:72-81 (undeclared local)
def test_refs_undeclared_local():
    _check_single_ref(build_cpg("x = 1;"), _self, _self)


# MixedAstCreationPassTests.scala:83-100 (undeclared, 2 refs)
def test_refs_undeclared_two_refs():
    cpg = build_cpg("\nx = 1;\nx = 2;\n")
    method = _only(Q(cpg).method().name_exact(":program"))
    mblock = _only(_at(cpg, method).ast_children().is_block())
    local_x = _only(_at(cpg, mblock).ast_children().is_local())
    for order in (1, 2):
        a = _only(_at(cpg, mblock).ast_children().is_call().order(order))
        ident = _only(_at(cpg, a).ast_children().is_identifier())
        assert _ref(cpg, ident) == [local_x]


# MixedAstCreationPassTests.scala:102-113 (undeclared local in block —
# local hoists to the method block)
def test_refs_undeclared_in_block():
    _check_single_ref(build_cpg("{ x = 1; }"), _self, _nested)


# MixedAstCreationPassTests.scala:115-129 (var declared in nested block,
# used outside — var function-hoisting: local stays at declaration block,
# outer use refs it)
def test_refs_var_in_block_used_outside():
    _check_single_ref(build_cpg("\n{ var x; }\nx = 1;\n"), _nested, _self)


# MixedAstCreationPassTests.scala:131-143 (post-declared var)
def test_refs_post_declared_var():
    _check_single_ref(build_cpg("\nx = 1;\nvar x;\n"), _self, _self)


# MixedAstCreationPassTests.scala:145-158 (post-declared var in block)
def test_refs_post_declared_var_in_block():
    _check_single_ref(build_cpg("\nx = 1;\n{ var x; }\n"), _nested, _self)


# MixedAstCreationPassTests.scala:160-173 (nested access to let)
def test_refs_nested_access_to_let():
    _check_single_ref(build_cpg("\nlet x;\n{ x = 1; }\n"), _self, _nested)


# MixedAstCreationPassTests.scala:175-199 (shadowing let)
def test_refs_shadowing_let():
    cpg = build_cpg("""
let x;
{
  let x;
  x = 1;
}
x = 1;
""")
    method = _only(Q(cpg).method().name_exact(":program"))
    mblock = _only(_at(cpg, method).ast_children().is_block())
    outer_local = _only(_at(cpg, mblock).ast_children().is_local())
    nested = _only(_at(cpg, mblock).ast_children().is_block())
    inner_local = _only(_at(cpg, nested).ast_children().is_local())
    inner_assign = _only(_at(cpg, nested).ast_children().is_call())
    inner_ident = _only(_at(cpg, inner_assign).ast_children().is_identifier())
    assert _ref(cpg, inner_ident) == [inner_local]
    outer_assign = _only(_at(cpg, mblock).ast_children().is_call())
    outer_ident = _only(_at(cpg, outer_assign).ast_children().is_identifier())
    assert _ref(cpg, outer_ident) == [outer_local]
