"""CPGQL step-by-step coverage tests (SURVEY.md §2B): every traversal step
family exercised on a known program."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg
from joern_spark.query.cpgql import Q

SRC = """
function calc(a, b) {
  var total = 0;
  if (a > b) {
    total = a * 2;
  } else {
    total = b + 1;
  }
  while (total < 100) {
    total = total + a;
  }
  log(total);
  return total;
}
calc(1, 2);
"""


def build():
    cpg = build_cpg(SRC)
    return cpg, Q(cpg)


def test_control_structure_parts():
    cpg, q = build()
    ifs = q.all().is_control_structure().is_if()
    assert ifs.size() == 1
    assert {n.code for n in ifs.condition().l()} == {"a > b"}
    assert ifs.when_true().size() == 1
    assert ifs.when_false().size() == 1
    whiles = q.all().is_control_structure().is_while()
    assert {n.code for n in whiles.condition().l()} == {"total < 100"}


def test_operator_views():
    cpg, q = build()
    assigns = q.call().assignment()
    assert assigns.size() >= 4
    targets = {n.name for n in assigns.target().is_identifier().l()}
    assert "total" in targets
    arith = q.call().arithmetic()
    assert {n.code for n in arith.l()} == {"a * 2", "b + 1", "total + a"}


def test_method_structure():
    cpg, q = build()
    m = q.method("calc")
    assert m.internal().size() == 1
    assert m.body().size() == 1
    # `log` is an undeclared callee inside calc: VariableScopeManager
    # creates a method-scope local for unresolved references
    assert {n.name for n in m.local().l()} == {"total", "log"}
    assert m.is_stub().size() == 0
    nl = m.number_of_lines()
    assert nl and nl[0] >= 10
    # operator calls resolve to external stub methods (MethodStubCreator);
    # dynamic calls with unknown full names (like `log`) get none — exactly
    # the reference behavior (stubs only for non-unknown methodFullName)
    stubs = {n.name for n in q.method().is_stub().l()}
    assert "<operator>.assignment" in stubs
    assert "log" not in stubs
    assert q.method().external().size() == len(stubs)


def test_ast_navigation():
    cpg, q = build()
    cond = q.call().code_exact("a > b")
    assert cond.parent_block().size() == 1
    sibs = cond.ast_siblings()
    assert sibs.size() >= 1
    assert q.method("calc").depth() > 4
    assert q.method("calc").contains_call_to(r"log\(.*").size() == 1
    assert q.method("calc").ast_minus_root().size() > 10


def test_repeat_emit_until():
    cpg, q = build()
    # repeat(astChildren) emit-all == ast()
    via_repeat = q.method("calc").repeat(lambda s: s.ast_children())
    via_ast = q.method("calc").ast()
    assert {n.id for n in via_repeat.l()} == {n.id for n in via_ast.l()}
    # until: stop at control structures — no nodes below them
    bounded = q.method("calc").repeat(
        lambda s: s.ast_children(),
        until=lambda s: s.is_control_structure())
    assert all(n.code != "a * 2" for n in bounded.l())


def test_types_and_location_and_json():
    cpg, q = build()
    lits = q.literal().typ()
    assert {n.full_name for n in lits.l()} == {"__ecma.Number"}
    locs = q.call().code_exact("a > b").location()
    assert locs == [("script.js", "calc", 4)]
    import json
    parsed = json.loads(q.call().code_exact("a > b").to_json())
    assert parsed[0]["code"] == "a > b"


def test_cfg_hops_and_tags():
    cpg, q = build()
    # parameters are not CFG nodes (CfgCreator skips MethodParameterIn);
    # walk from the method entry instead
    two = q.method("calc").cfg_first().cfg_next_n(2)
    assert two.size() >= 1
    last = q.method("calc").cfg_last()
    assert last.size() >= 1
    tagged = q.call().code_exact("log(total)").new_tag_node("sink")
    assert {t.name for t in tagged.tag().l()} == {"sink"}
