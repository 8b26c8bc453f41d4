"""AST golden batch 10: MixedAstCreationPassTests.scala 238-460 closure
bindings — CLOSURE_BINDING chains, shadow locals with closureBindingId,
CAPTURE edges from METHOD_REFs (VariableScopeManager semantics)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q

FN = "script.js"  # reference fixture: Test0.js


def _only(xs):
    xs = list(xs)
    assert len(xs) == 1, [f"{getattr(n, 'label', n)}" for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


def _capture_out(cpg, ref):
    return [e.dst for e in cpg.out(ref, "CAPTURE")]


def _ref_out(cpg, node):
    return [e.dst for e in cpg.out(node, "REF")]


def _block_of(cpg, method):
    return _only(_at(cpg, method).ast_children().is_block().l())


# MixedAstCreationPassTests.scala:253-278 (single variable)
def test_closure_binding_single_variable():
    cpg = build_cpg("""
function foo() {
  x = 1;
  function bar() {
    x = 2;
  }
}
""")
    foo = _only(Q(cpg).method().name_exact("foo").l())
    foo_block = _block_of(cpg, foo)
    foo_local_x = _only(_at(cpg, foo_block).ast_children().is_local()
                        .name_exact("x").l())
    bar_ref = _only(_at(cpg, foo_block).ast_children().is_call()
                    .ast_children().is_method_ref().l())
    binding = _only(_capture_out(cpg, bar_ref))
    assert _ref_out(cpg, binding) == [foo_local_x]
    assert binding.closure_binding_id == f"{FN}::program:foo:bar:x"
    assert binding.evaluation_strategy == "BY_REFERENCE"

    bar = _only(Q(cpg).method().name_exact("bar").l())
    bar_block = _block_of(cpg, bar)
    bar_local = _only(_at(cpg, bar_block).ast_children().is_local().l())
    assert bar_local.closure_binding_id == f"{FN}::program:foo:bar:x"
    ident_x = _only(_at(cpg, bar_block).ast_children().is_call()
                    .ast_children().is_identifier().name_exact("x").l())
    assert _ref_out(cpg, ident_x) == [bar_local]


# MixedAstCreationPassTests.scala:280-321 (two variables)
def test_closure_binding_two_variables():
    cpg = build_cpg("""
function foo() {
  x = 1;
  y = 1;
  function bar() {
    x = 2;
    y = 2;
  }
}
""")
    foo = _only(Q(cpg).method().name_exact("foo").l())
    foo_block = _block_of(cpg, foo)
    foo_local_x = _only(_at(cpg, foo_block).ast_children().is_local()
                        .name_exact("x").l())
    foo_local_y = _only(_at(cpg, foo_block).ast_children().is_local()
                        .name_exact("y").l())
    bar_ref = _only(_at(cpg, foo_block).ast_children().is_call()
                    .ast_children().is_method_ref().l())
    bindings = {b.closure_binding_id: b for b in _capture_out(cpg, bar_ref)}
    bx = bindings[f"{FN}::program:foo:bar:x"]
    by = bindings[f"{FN}::program:foo:bar:y"]
    assert _ref_out(cpg, bx) == [foo_local_x]
    assert bx.evaluation_strategy == "BY_REFERENCE"
    assert _ref_out(cpg, by) == [foo_local_y]
    assert by.evaluation_strategy == "BY_REFERENCE"

    bar = _only(Q(cpg).method().name_exact("bar").l())
    bar_block = _block_of(cpg, bar)
    shadows = {n.name: n for n in
               _at(cpg, bar_block).ast_children().is_local().l()}
    assert shadows["x"].closure_binding_id == f"{FN}::program:foo:bar:x"
    assert shadows["y"].closure_binding_id == f"{FN}::program:foo:bar:y"
    ix = _only(_at(cpg, bar_block).ast_children().is_call()
               .ast_children().is_identifier().name_exact("x").l())
    assert _ref_out(cpg, ix) == [shadows["x"]]
    iy = _only(_at(cpg, bar_block).ast_children().is_call()
               .ast_children().is_identifier().name_exact("y").l())
    assert _ref_out(cpg, iy) == [shadows["y"]]


def _check_two_level_chain(cpg, bar_inner_sel=None, baz_ident_sel=None):
    foo = _only(Q(cpg).method().name_exact("foo").l())
    foo_block = _block_of(cpg, foo)
    foo_local_x = _only(_at(cpg, foo_block).ast_children().is_local()
                        .name_exact("x").l())
    bar_ref = _only(_at(cpg, foo_block).ast_children().is_call()
                    .ast_children().is_method_ref().l())
    b_foo = _only(_capture_out(cpg, bar_ref))
    assert b_foo.closure_binding_id == f"{FN}::program:foo:bar:x"
    assert _ref_out(cpg, b_foo) == [foo_local_x]
    assert b_foo.evaluation_strategy == "BY_REFERENCE"

    bar = _only(Q(cpg).method().name_exact("bar").l())
    bar_block = _block_of(cpg, bar)
    bar_local_x = _only(_at(cpg, bar_block).ast_children().is_local()
                        .name_exact("x").l())
    assert bar_local_x.closure_binding_id == f"{FN}::program:foo:bar:x"

    ref_scope = (bar_inner_sel(cpg, bar_block) if bar_inner_sel
                 else bar_block)
    baz_ref = _only(_at(cpg, ref_scope).ast_children().is_call()
                    .ast_children().is_method_ref().l())
    b_bar = _only(_capture_out(cpg, baz_ref))
    assert b_bar.closure_binding_id == f"{FN}::program:foo:bar:baz:x"
    assert _ref_out(cpg, b_bar) == [bar_local_x]
    assert b_bar.evaluation_strategy == "BY_REFERENCE"

    baz = _only(Q(cpg).method().name_exact("baz").l())
    baz_block = _block_of(cpg, baz)
    baz_local_x = _only(_at(cpg, baz_block).ast_children().is_local()
                        .name_exact("x").l())
    assert baz_local_x.closure_binding_id == f"{FN}::program:foo:bar:baz:x"
    if baz_ident_sel is not None:
        ident = baz_ident_sel(cpg, baz_block)
        assert _ref_out(cpg, ident) == [baz_local_x]
    return baz_block, baz_local_x


# MixedAstCreationPassTests.scala:323-358 (capturing over 2 levels)
def test_closure_binding_two_levels():
    cpg = build_cpg("""
function foo() {
  x = 1;
  function bar() {
    x = 2;
    function baz() {
      x = 3;
    }
  }
}
""")
    baz_block, baz_local = _check_two_level_chain(cpg)
    ident = _only(_at(cpg, baz_block).ast_children().is_call()
                  .ast_children().is_identifier().name_exact("x").l())
    assert _ref_out(cpg, ident) == [baz_local]


# MixedAstCreationPassTests.scala:360-412 (2 levels, intermediate blocks)
def test_closure_binding_two_levels_with_blocks():
    cpg = build_cpg("""
function foo() {
  x = 1;
  function bar() {
    x = 2;
    {
      function baz() {
        {
          x = 3;
        }
      }
    }
  }
}
""")
    def inner_block(cpg_, bar_block):
        return _only(_at(cpg_, bar_block).ast_children().is_block().l())

    baz_block, baz_local = _check_two_level_chain(cpg, bar_inner_sel=inner_block)
    inner = _only(_at(cpg, baz_block).ast_children().is_block().l())
    ident = _only(_at(cpg, inner).ast_children().is_call()
                  .ast_children().is_identifier().name_exact("x").l())
    assert _ref_out(cpg, ident) == [baz_local]


# MixedAstCreationPassTests.scala:414-460 (2 levels, no intermediate use)
def test_closure_binding_two_levels_no_intermediate_use():
    cpg = build_cpg("""
function foo() {
  x = 1;
  function bar() {
    function baz() {
      x = 3;
    }
  }
}
""")
    baz_block, baz_local = _check_two_level_chain(cpg)
    ident = _only(_at(cpg, baz_block).ast_children().is_call()
                  .ast_children().is_identifier().name_exact("x").l())
    assert _ref_out(cpg, ident) == [baz_local]


# MixedAstCreationPassTests.scala:229-237 (destructuring assignment)
def test_closure_binding_destructuring_assignment():
    cpg = build_cpg("""
const {closureA} = null;
const [closureB] = null;
let f = function() {
  console.log(closureA);
  console.log(closureB);
}
""")
    ids_a = [n.closure_binding_id for n in Q(cpg).local().name_exact("closureA").l()
             if n.closure_binding_id]
    assert ids_a == [f"{FN}::program:<lambda>0:closureA"]
    ids_b = [n.closure_binding_id for n in Q(cpg).local().name_exact("closureB").l()
             if n.closure_binding_id]
    assert ids_b == [f"{FN}::program:<lambda>0:closureB"]
