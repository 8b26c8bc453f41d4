"""AST golden batch 6: SimpleAstCreationPassTests.scala 1320-1560 (labeled
statements + switch AST shapes/orders)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q


def _only(steps):
    xs = steps.l()
    assert len(xs) == 1, [f"{n.label}:{n.code}" for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


def _switch_in_program(cpg):
    program = _only(Q(cpg).method().name_exact(":program"))
    pblock = _only(_at(cpg, program).ast_children().is_block())
    sw = _only(_at(cpg, pblock).ast_children().is_control_structure())
    assert sw.control_structure_type == "SWITCH"
    expr = _only(_at(cpg, sw).ast_children().is_identifier().name_exact("x"))
    assert (expr.order, expr.code) == (1, "x")
    sblock = _only(_at(cpg, sw).ast_children().is_block())
    return pblock, sw, sblock


def _jump_target(cpg, block, code):
    return _only(_at(cpg, block).ast_children().is_jump_target()
                 .code_exact(code))


# SimpleAstCreationPassTests.scala:1322-1347 (labeled continue AST)
def test_labeled_continue_ast():
    cpg = build_cpg('''
var i, j;
loop1: for (i = 0; i < 3; i++) {
   loop2: for (j = 0; j < 3; j++) {
      if (i === 1 && j === 1) {
         continue loop1;
      }
      console.log("i = " + i + ", j = " + j);
   }
}
''')
    jts = sorted(Q(cpg).all().is_jump_target().l(), key=lambda n: n.code)
    assert [n.code for n in jts] == ["loop1:", "loop2:"]
    cont = _only(Q(cpg).control_structure().code("continue.*"))
    assert cont.code == "continue loop1;"
    assert cont.control_structure_type == "CONTINUE"


# SimpleAstCreationPassTests.scala:1350-1370 (switch with one case)
def test_switch_one_case_ast():
    cpg = build_cpg("switch (x) { case 1: y; }")
    _pb, _sw, sblock = _switch_in_program(cpg)
    assert _jump_target(cpg, sblock, "case 1:").order == 1
    assert _only(_at(cpg, sblock).ast_children().is_literal()
                 .code_exact("1")).order == 2
    assert _only(_at(cpg, sblock).ast_children().is_identifier()
                 .code_exact("y")).order == 3


# SimpleAstCreationPassTests.scala:1372-1400 (multiple cases)
def test_switch_multiple_cases_ast():
    cpg = build_cpg("switch (x) { case 1: y; case 2: z; }")
    _pb, _sw, sblock = _switch_in_program(cpg)
    assert _jump_target(cpg, sblock, "case 1:").order == 1
    assert _only(_at(cpg, sblock).ast_children().is_literal()
                 .code_exact("1")).order == 2
    assert _only(_at(cpg, sblock).ast_children().is_identifier()
                 .code_exact("y")).order == 3
    assert _jump_target(cpg, sblock, "case 2:").order == 4
    assert _only(_at(cpg, sblock).ast_children().is_literal()
                 .code_exact("2")).order == 5
    assert _only(_at(cpg, sblock).ast_children().is_identifier()
                 .code_exact("z")).order == 6


# SimpleAstCreationPassTests.scala:1402-1430 (cases on same spot)
def test_switch_cases_same_spot_ast():
    cpg = build_cpg("switch (x) { case 1: case 2: y; }")
    _pb, _sw, sblock = _switch_in_program(cpg)
    assert _jump_target(cpg, sblock, "case 1:").order == 1
    assert _only(_at(cpg, sblock).ast_children().is_literal()
                 .code_exact("1")).order == 2
    assert _jump_target(cpg, sblock, "case 2:").order == 3
    assert _only(_at(cpg, sblock).ast_children().is_literal()
                 .code_exact("2")).order == 4
    assert _only(_at(cpg, sblock).ast_children().is_identifier()
                 .code_exact("y")).order == 5


# SimpleAstCreationPassTests.scala:1432-1470 (multiple + same spot)
def test_switch_multiple_and_same_spot_ast():
    cpg = build_cpg("switch (x) { case 1: case 2: y; case 3: z; }")
    _pb, _sw, sblock = _switch_in_program(cpg)
    orders = {
        ("jt", "case 1:"): 1, ("lit", "1"): 2, ("jt", "case 2:"): 3,
        ("lit", "2"): 4, ("id", "y"): 5, ("jt", "case 3:"): 6,
        ("lit", "3"): 7, ("id", "z"): 8,
    }
    for (kind, code), order in orders.items():
        if kind == "jt":
            assert _jump_target(cpg, sblock, code).order == order, code
        elif kind == "lit":
            assert _only(_at(cpg, sblock).ast_children().is_literal()
                         .code_exact(code)).order == order, code
        else:
            assert _only(_at(cpg, sblock).ast_children().is_identifier()
                         .code_exact(code)).order == order, code


# SimpleAstCreationPassTests.scala:1472-1491 (default case)
def test_switch_default_ast():
    cpg = build_cpg("switch (x) { default: y; }")
    pblock, _sw, sblock = _switch_in_program(cpg)
    assert _at(cpg, pblock).ast_children().is_literal().size() == 0
    assert _jump_target(cpg, sblock, "default:").order == 1
    assert _only(_at(cpg, sblock).ast_children().is_identifier()
                 .name_exact("y")).order == 2


# SimpleAstCreationPassTests.scala:1493-1525 (case + default combined)
def test_switch_case_default_combined_ast():
    cpg = build_cpg("switch (x) { case 1: y; break; default: z; }")
    _pb, _sw, sblock = _switch_in_program(cpg)
    assert _jump_target(cpg, sblock, "case 1:").order == 1
    assert _only(_at(cpg, sblock).ast_children().is_literal()
                 .code_exact("1")).order == 2
    assert _only(_at(cpg, sblock).ast_children().is_identifier()
                 .name_exact("y")).order == 3
    brk = [n for n in _at(cpg, sblock).ast_children()
           .is_control_structure().l() if n.control_structure_type == "BREAK"]
    assert [b.order for b in brk] == [4]
    assert _jump_target(cpg, sblock, "default:").order == 5
    assert _only(_at(cpg, sblock).ast_children().is_identifier()
                 .name_exact("z")).order == 6


# SimpleAstCreationPassTests.scala:1527-1557 (nested switch)
def test_switch_nested_ast():
    cpg = build_cpg("switch (x) { default: switch(y) { default: z; } }")
    _pb, _top, top_block = _switch_in_program(cpg)
    assert _jump_target(cpg, top_block, "default:").order == 1
    nested = _only(_at(cpg, top_block).ast_children().is_control_structure())
    assert nested.control_structure_type == "SWITCH"
    ne = _only(_at(cpg, nested).ast_children().is_identifier().name_exact("y"))
    assert (ne.order, ne.code) == (1, "y")
    nblock = _only(_at(cpg, nested).ast_children().is_block())
    assert _jump_target(cpg, nblock, "default:").order == 1
    assert _only(_at(cpg, nblock).ast_children().is_identifier()
                 .name_exact("z")).order == 2
