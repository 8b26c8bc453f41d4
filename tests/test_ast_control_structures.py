"""AST golden batch: jssrc2cpg passes/ast/ControlStructureTests.scala
(all 9 tests) — typed CONDITION/TRUE_BODY/FALSE_BODY/DO_BODY/FOR_*/
TRY_*/CATCH/FINALLY edge structure."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from tests.ast_helpers import (
    ast_children, child_codes, condition_codes, control_structures, out_nodes,
)


# ControlStructureTests.scala:10-27
def test_if_else_true_false_body_edges():
    cpg = build_cpg("""
function method(x) {
  if (x > 0) {
    y = 0;
  } else {
    y = 1;
  }
}
""")
    (if_node,) = control_structures(cpg, "IF")
    assert condition_codes(cpg, if_node) == ["x > 0"]
    (tb,) = out_nodes(cpg, if_node, "TRUE_BODY")
    assert child_codes(cpg, tb) == ["y = 0"]
    (fb,) = out_nodes(cpg, if_node, "FALSE_BODY")
    assert child_codes(cpg, fb) == ["y = 1"]


# ControlStructureTests.scala:29-53
def test_if_elseif_else_chains():
    cpg = build_cpg("""
function method(c) {
  if (c > 10) {
    c -= 10;
  } else if (c < 10) {
    c += 10;
  } else {
    c = 10;
  }
}
""")
    if_one, if_two = control_structures(cpg, "IF")
    assert condition_codes(cpg, if_one) == ["c > 10"]
    (tb1,) = out_nodes(cpg, if_one, "TRUE_BODY")
    assert child_codes(cpg, tb1) == ["c -= 10"]
    assert out_nodes(cpg, if_one, "FALSE_BODY") == [if_two]
    assert condition_codes(cpg, if_two) == ["c < 10"]
    (tb2,) = out_nodes(cpg, if_two, "TRUE_BODY")
    assert child_codes(cpg, tb2) == ["c += 10"]
    (fb2,) = out_nodes(cpg, if_two, "FALSE_BODY")
    assert child_codes(cpg, fb2) == ["c = 10"]


# ControlStructureTests.scala:55-69
def test_if_without_else_has_no_false_body():
    cpg = build_cpg("""
function method(x) {
  if (x > 0) {
    y = 0;
  }
}
""")
    (if_node,) = control_structures(cpg, "IF")
    (tb,) = out_nodes(cpg, if_node, "TRUE_BODY")
    assert child_codes(cpg, tb) == ["y = 0"]
    assert out_nodes(cpg, if_node, "FALSE_BODY") == []


# ControlStructureTests.scala:71-84
def test_do_while_do_body_edge():
    cpg = build_cpg("""
function method(c) {
  do {
    c += 1;
  } while (c < 10);
}
""")
    (do_node,) = control_structures(cpg, "DO")
    assert condition_codes(cpg, do_node) == ["c < 10"]
    (db,) = out_nodes(cpg, do_node, "DO_BODY")
    assert child_codes(cpg, db) == ["c += 1"]


# ControlStructureTests.scala:86-101
def test_for_loop_dedicated_edges():
    cpg = build_cpg("""
function method(c) {
  for (var i = 0; i < c; i++) {
    sink(i);
  }
}
""")
    (for_node,) = control_structures(cpg, "FOR")
    assert [n.code for n in out_nodes(cpg, for_node, "FOR_INIT")] == ["var i = 0"]
    assert condition_codes(cpg, for_node) == ["i < c"]
    assert [n.code for n in out_nodes(cpg, for_node, "FOR_UPDATE")] == ["i++"]
    (body,) = out_nodes(cpg, for_node, "FOR_BODY")
    assert child_codes(cpg, body) == ["sink(i)"]


# ControlStructureTests.scala:103-114 (empty init/test/update → empty blocks)
def test_for_loop_empty_clauses():
    """Reference asserts forInitOut/condition/forUpdateOut `.isBlock
    .astChildren` are empty — i.e. no non-empty BLOCK hangs off those
    edges (init/update are absent; the condition is the synthetic `true`
    literal, per astForForStatement:145-147)."""
    cpg = build_cpg("for(;;){ sink(); }")
    (for_node,) = control_structures(cpg, "FOR")

    def block_children(edge):
        return [c for n in out_nodes(cpg, for_node, edge)
                if n.label == "BLOCK" for c in ast_children(cpg, n)]

    assert block_children("FOR_INIT") == []
    assert block_children("CONDITION") == []
    assert block_children("FOR_UPDATE") == []
    assert condition_codes(cpg, for_node) == ["true"]
    (body,) = out_nodes(cpg, for_node, "FOR_BODY")
    assert child_codes(cpg, body) == ["sink()"]


# ControlStructureTests.scala:116-141
def test_try_catch_finally_edges():
    cpg = build_cpg("""
function method(c) {
  try {
    sink(c);
  } catch (e) {
    sinkCatch(e);
  } finally {
    sinkFinally();
  }
}
""")
    (try_node,) = control_structures(cpg, "TRY")
    (tb,) = out_nodes(cpg, try_node, "TRY_BODY")
    assert child_codes(cpg, tb) == ["sink(c)"]
    (catch_node,) = out_nodes(cpg, try_node, "CATCH_BODY")
    assert catch_node.control_structure_type == "CATCH"
    catch_blocks = [c for c in ast_children(cpg, catch_node) if c.label == "BLOCK"]
    assert [cc.code for b in catch_blocks for cc in ast_children(cpg, b)] \
        == ["e", "sinkCatch(e)"]
    (fin_node,) = out_nodes(cpg, try_node, "FINALLY_BODY")
    assert fin_node.control_structure_type == "FINALLY"
    fin_blocks = [c for c in ast_children(cpg, fin_node) if c.label == "BLOCK"]
    assert [cc.code for b in fin_blocks for cc in ast_children(cpg, b)] \
        == ["sinkFinally()"]


# ControlStructureTests.scala:143-160
def test_try_finally_without_catch():
    cpg = build_cpg("""
function method() {
  try {
    sink();
  } finally {
    sinkFinally();
  }
}
""")
    (try_node,) = control_structures(cpg, "TRY")
    (tb,) = out_nodes(cpg, try_node, "TRY_BODY")
    assert child_codes(cpg, tb) == ["sink()"]
    assert out_nodes(cpg, try_node, "CATCH_BODY") == []
    (fin_node,) = out_nodes(cpg, try_node, "FINALLY_BODY")
    fin_blocks = [c for c in ast_children(cpg, fin_node) if c.label == "BLOCK"]
    assert [cc.code for b in fin_blocks for cc in ast_children(cpg, b)] \
        == ["sinkFinally()"]


# ControlStructureTests.scala:162-175
def test_while_without_body():
    cpg = build_cpg("""
function method() {
  while (true);
  foo();
}
""")
    (while_node,) = control_structures(cpg, "WHILE")
    assert condition_codes(cpg, while_node) == ["true"]
    bodies = out_nodes(cpg, while_node, "TRUE_BODY")
    assert all(n.label == "BLOCK" and ast_children(cpg, n) == [] for n in bodies)
