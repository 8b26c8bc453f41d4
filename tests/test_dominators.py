"""Dominator / post-dominator / CDG tests (A12/A13): structural properties
the reference passes guarantee, checked on small programs."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q


SRC = """
function f(a) {
  var x = 0;
  if (a > 1) {
    x = 2;
  } else {
    x = 3;
  }
  use(x);
}"""


def _node(cpg, code, label=None, occ=0):
    ns = [n for n in cpg.nodes if n.code == code and (label is None or n.label == label)]
    ns.sort(key=lambda n: n.id)
    return ns[occ]


def test_branch_controls_both_assignments():
    cpg = build_cpg(SRC)
    q = Q(cpg)
    cond = q.call().code_exact("a > 1")
    controlled = {n.code for n in cond.controls().l()}
    assert "x = 2" in controlled
    assert "x = 3" in controlled
    # the join point after the if is NOT controlled by the branch
    assert "use(a, x)" not in controlled


def test_controlled_by_inverse():
    cpg = build_cpg(SRC)
    q = Q(cpg)
    assign = q.call().code_exact("x = 2")
    controllers = {n.code for n in assign.controlled_by().l()}
    assert "a > 1" in controllers


def test_dominance_chain():
    cpg = build_cpg(SRC)
    q = Q(cpg)
    # the condition dominates both branch assignments
    cond = q.call().code_exact("a > 1")
    dominated = {n.code for n in cond.dominates().l()}
    assert "x = 2" in dominated and "x = 3" in dominated
    # neither branch assignment dominates the post-join call
    a2 = q.call().code_exact("x = 2")
    assert "use(x)" not in {n.code for n in a2.dominates().l()}


def test_post_dominance():
    cpg = build_cpg(SRC)
    q = Q(cpg)
    # use(x)'s call (after the join) post-dominates the branch condition
    use_call = q.call().code("use.*")
    pdom = {n.code for n in use_call.post_dominates().l()}
    assert "a > 1" in pdom


def test_loop_cdg():
    cpg = build_cpg("""
function g(n) {
  while (n > 0) {
    n = n - 1;
  }
  done(n);
}""")
    q = Q(cpg)
    cond = q.call().code_exact("n > 0")
    controlled = {n.code for n in cond.controls().l()}
    assert "n = n - 1" in controlled
    assert "done(n)" not in controlled


def test_data_flow_slice():
    from joern_spark.dataflow.slicing import slice_for_call

    cpg = build_cpg("""
function flows1(fd, mode) {
  var sz = 0;
  if (mode == 1) sz = 20;
  read(fd, buff, sz);
}""")
    call = [n for n in cpg.nodes if n.label == "CALL" and n.code.startswith("read")][0]
    nodes, edges = slice_for_call(cpg, call)
    codes = {n.code for n in nodes}
    # seeds (args incl. base) + their backward-visible definitions
    assert {"fd", "buff", "sz", "this"} <= codes
    assert {"0", "20"} <= codes  # both sz definitions' sources
    assert edges, "slice must include induced REACHING_DEF edges"
