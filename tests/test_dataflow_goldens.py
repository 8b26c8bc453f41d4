"""Golden dataflow parity tests — expectations transcribed verbatim from
the reference suite (jssrc2cpg dataflow/DataflowTests.scala, cited per
test).  Each test builds the per-document CPG through the full pipeline
and asserts the exact flow set / count the reference asserts.
"""

from __future__ import annotations

import pytest

from joern_spark.cpg.build import build_cpg
from joern_spark.dataflow.engine import (
    reachable_by,
    reachable_by_count,
    reachable_by_flows,
    result_pairs,
)
from joern_spark.fixtures import SNIPPETS
from joern_spark.query.cpgql import Q


def flows_set(cpg, sinks, sources):
    return {tuple(result_pairs(cpg, f)) for f in reachable_by_flows(cpg, sinks, sources)}


def build(name):
    cpg = build_cpg(SNIPPETS[name])
    return cpg, Q(cpg)


# DataflowTests.scala:12-44
def test_flows1():
    cpg, q = build("flows1")
    got = flows_set(cpg, q.call().code("read.*").l(), q.identifier("sz").l())
    assert got == {
        (("read(fd, buff, sz)", 11),),
        (("var sz = 0", 5), ("read(fd, buff, sz)", 11)),
        (("sz = 20", 6), ("read(fd, buff, sz)", 11)),
        (("sz = 200", 7), ("read(fd, buff, sz)", 11)),
        (("sz = 41", 8), ("read(fd, buff, sz)", 11)),
        (("sz = -5", 9), ("read(fd, buff, sz)", 11)),
    }


# DataflowTests.scala:46-61
def test_argflow_count():
    cpg, q = build("argflow")
    sinks = q.call().code("foo.*").argument().l()
    flows = reachable_by_flows(cpg, sinks, q.identifier("a").l())
    assert len(flows) == 6


# DataflowTests.scala:63-84
def test_chain():
    cpg, q = build("chain")
    got = flows_set(cpg, q.identifier("x").l(), q.identifier("a").l())
    assert got == {
        (("var a = 0x37", 3), ("var b = a", 4), ("b + c", 6), ("var z = b + c", 6),
         ("z++", 7), ("var x = z", 9)),
        (("var b = a", 4), ("b + c", 6), ("var z = b + c", 6), ("z++", 7),
         ("var x = z", 9)),
    }


# DataflowTests.scala:86-101
def test_method_return():
    cpg, q = build("ret")
    sinks = q.method(".*flow").ast().is_return().l()
    got = flows_set(cpg, sinks, q.identifier("a").l())
    assert got == {(("var z = a", 3), ("var b = z", 4), ("return b", 6))}


# DataflowTests.scala:103-126
def test_nested_from_condition():
    cpg, q = build("nested")
    sources = q.call().code("a < 10").argument().code("a").l()
    sinks = q.method(".*nested").ast().is_return().l()
    got = flows_set(cpg, sinks, sources)
    assert got == {
        (("a < 10", 5), ("a < 5", 6), ("a < 2", 7), ("x = a", 8), ("return x", 14)),
    }


# DataflowTests.scala:128-156
def test_nested_from_x():
    cpg, q = build("nested")
    sinks = q.method(".*nested").ast().is_return().l()
    got = flows_set(cpg, sinks, q.identifier("x").l())
    assert got == {
        (("return x", 14),),
        (("x = z", 12), ("return x", 14)),
        (("var x = 0", 3), ("return x", 14)),
        (("x = a", 8), ("return x", 14)),
    }


# DataflowTests.scala:158-172
def test_param_chain_count():
    cpg, q = build("paramchain")
    sinks = q.call().code("foo.*").argument().l()
    flows = reachable_by_flows(cpg, sinks, q.identifier("a").l())
    assert len(flows) == 4


# DataflowTests.scala:174-188
def test_param_no_foo():
    cpg, q = build("paramnofoo")
    sinks = q.call().code("foo.*").argument(1).l()
    got = flows_set(cpg, sinks, q.identifier("a").l())
    assert got == {
        (("var a = x", 3), ("var b = a", 4), ("foo(b)", 5)),
        (("var b = a", 4), ("foo(b)", 5)),
    }


# DataflowTests.scala:190-212
def test_member_access():
    cpg, q = build("member")
    sinks = q.call().code("node.value2").l()
    got = flows_set(cpg, sinks, q.identifier("x").l())
    assert got == {
        (("node.value1 = x", 9), ("node.value2 = node.value1", 10)),
        (("var x = 10", 8), ("node.value1 = x", 9), ("node.value2 = node.value1", 10)),
    }


# DataflowTests.scala:214-232
def test_literal_37():
    cpg, q = build("lit37")
    got = flows_set(cpg, q.identifier("x").l(), q.literal("37").l())
    assert got == {
        (("var a = 37", 3), ("var b = a", 4), ("b + c", 6), ("var z = b + c", 6),
         ("z++", 7), ("var x = z", 9)),
    }


# DataflowTests.scala:234-249
def test_shorthand_assignment():
    cpg, q = build("shorthand")
    sources = q.call().code(r"var a = 37").argument(2).l()
    sinks = q.call().code(r"z \+= a").argument(1).l()
    got = flows_set(cpg, sinks, sources)
    assert got == {
        (("var a = 37", 3), ("var b = a", 4), ("var z = b", 5), ("z += a", 6)),
    }


# DataflowTests.scala:251-267
def test_after_shorthand():
    cpg, q = build("shorthand2")
    sources = q.call().code(r"var a = 37").argument(1).l()
    got = flows_set(cpg, q.identifier("w").l(), sources)
    assert got == {
        (("var a = 37", 3), ("var b = a", 4), ("var z = b", 5), ("z += a", 6),
         ("var w = z", 7)),
    }


# DataflowTests.scala:269-287
def test_array_param():
    cpg, q = build("arrayparam")
    sources = q.method(".*main").parameter().l()
    got = flows_set(cpg, q.identifier("y").l(), sources)
    assert got == {
        (("main(this, argc, argv)", 2), ("var x = argv[1]", 3), ("var y = x", 4),
         ("var z = y", 5)),
        (("main(this, argc, argv)", 2), ("var x = argv[1]", 3), ("var y = x", 4)),
    }


# DataflowTests.scala:289-303
def test_conditional_expr():
    cpg, q = build("conditional")
    sources = q.method().parameter().name("y").l()
    got = flows_set(cpg, q.identifier("z").l(), sources)
    assert got == {
        (("foo(this, x, y)", 2), ("f(y)", 3), ("x ? f(y) : g(y)", 3),
         ("var z =  x ? f(y) : g(y)", 3)),
    }


# DataflowTests.scala:305-323
def test_source_in_caller():
    cpg, q = build("sourcecaller")
    sinks = q.call().code("sink.*").argument().l()
    got = flows_set(cpg, sinks, q.call().code("source.*").l())
    assert got == {
        (("source()", 3), ("var x = source()", 3), ("foo(x)", 4), ("foo(this, y)", 7),
         ("sink(y)", 8)),
    }


# DataflowTests.scala:325-345
def test_source_in_callee():
    cpg, q = build("sourcecallee")
    sinks = q.call().code("sink.*").argument(1).l()
    got = flows_set(cpg, sinks, q.call().code("source.*").l())
    assert got == {
        (("source()", 3), ("return source()", 3), ("RET", 2), ("bar()", 9),
         ("var y = bar()", 9), ("sink(y)", 10)),
    }


# DataflowTests.scala:347-375
def test_formal_param_sink():
    cpg, q = build("sourcecallee")
    sinks = q.method(".*sink").parameter().index(1).l()
    got = flows_set(cpg, sinks, q.call().code("source.*").l())
    assert got == {
        (("source()", 3), ("return source()", 3), ("RET", 2), ("bar()", 9),
         ("var y = bar()", 9), ("sink(y)", 10), ("sink(this, param)", 6)),
    }


# DataflowTests.scala:377-407
def test_struct_data():
    cpg, q = build("structdata")
    sinks = q.call().code("sink.*").argument().l()
    got = flows_set(cpg, sinks, q.call().code("source.*").l())
    assert got == {
        (("source()", 16), ("var k = source()", 16), ("point.x = k", 17),
         ("sink(point.x)", 19)),
    }


# DataflowTests.scala:409-424
def test_object_element_access():
    cpg, q = build("objelem")
    sinks = q.call().code("sink.*").argument().l()
    got = flows_set(cpg, sinks, q.call().code("source.*").l())
    assert got == {
        (("source()", 5), ("arg.field = source()", 5), ("sink(arg.field)", 6)),
    }


# DataflowTests.scala:426-438
def test_object_element_to_source():
    cpg, q = build("objelemsource")
    sources = q.call().code("source.*").argument().l()
    sinks = q.call().code("sink.*").argument().l()
    got = flows_set(cpg, sinks, sources)
    assert got == {(("source(a.b)", 3), ("sink(a.b)", 4))}


# DataflowTests.scala:440-453
def test_statements_to_method_return():
    cpg, q = build("methodreturn")
    sources = q.call().code("free.*").argument(1).l()
    sinks = q.method(".*foo").method_return().l()
    got = flows_set(cpg, sinks, sources)
    assert got == {
        (("free(y)", 3), ("RET", 2)),
        (("free(x)", 4), ("RET", 2)),
    }


# DataflowTests.scala:455-465
def test_call_to_ret_once():
    cpg, q = build("callretonce")
    calls = q.call().code("bar.*").l()
    ret = q.ret().l()
    count = 0
    for c in calls:
        for e in cpg.out(c, "REACHING_DEF"):
            if ret and e.dst.id == ret[0].id:
                count += 1
    assert count == 1


# DataflowTests.scala:467-482
def test_outer_params_to_inner():
    cpg, q = build("outerinner")
    sources = q.method(".*f").parameter().l()
    sinks = q.call().code("g.*").argument().l()
    assert len(sinks) == 3
    assert len(sources) == 3
    got = flows_set(cpg, sinks, sources)
    assert got == {(("f(this, x, y)", 2), ("g(x, y)", 3))}


# DataflowTests.scala:518-524
def test_receiver_to_closure_params():
    cpg, q = build("closureparams")
    sinks = q.call("sink1").argument(1).l()
    sources = q.identifier("foo").l()
    assert len(reachable_by(cpg, sinks, sources)) == 1


# DataflowTests.scala:526-532
def test_flow_through_constructor():
    cpg, q = build("ctor")
    sinks = q.identifier("x").l()
    sources = q.identifier("y").l()
    assert len(reachable_by(cpg, sinks, sources)) == 1


# DataflowTests.scala:534-540
def test_flow_through_constructor_object():
    cpg, q = build("ctorobj")
    sinks = q.identifier("x").l()
    sources = q.identifier("y").l()
    assert len(reachable_by(cpg, sinks, sources)) == 1


# DataflowTests.scala:542-550
def test_field_via_object_notation():
    cpg, q = build("fieldobj")
    sinks = q.identifier("x").l()
    sources = q.field_access().where(
        lambda s: s.field_identifier().canonical_name("y")).l()
    assert len(sources) == 1
    assert len(sinks) == 1
    assert len(reachable_by(cpg, sinks, sources)) == 1


# DataflowTests.scala:552-562
def test_object_notation_to_arg():
    cpg, q = build("objnotation")
    sinks = q.call().name_exact("fn").l()
    sources = q.literal().code_exact("47").l()
    assert reachable_by_count(cpg, sinks, sources, dedup=True) == 1


# DataflowTests.scala:564-577
def test_lambda_const():
    cpg, q = build("lambdaconst")
    sinks = q.call("sink").l()
    sources = q.literal().code_exact("1").l()
    assert len(sinks) == 1
    assert len(sources) == 1
    assert len(reachable_by(cpg, sinks, sources)) == 1


# DataflowTests.scala:579-590
def test_irrelevant_not_reached():
    cpg, q = build("irrelevant")
    sinks = q.call("sink").l()
    sources = q.literal().code_exact('"irrelevant"').l()
    assert len(sinks) == 1
    assert len(sources) == 1
    assert len(reachable_by(cpg, sinks, sources)) == 0


# DataflowTests.scala:592-607
def test_for_in():
    cpg, q = build("forin")
    sinks = q.identifier("elem").l()
    src1 = q.method("foo").parameter().order(1).l()
    src2 = q.identifier("x").l()
    assert len(reachable_by(cpg, sinks, src1)) == 2
    assert len(reachable_by(cpg, sinks, src2)) == 2


# DataflowTests.scala:609-620
def test_for_each_lambda():
    cpg, q = build("foreachlambda")
    sinks = q.identifier("elem").l()
    src1 = q.method("foo").parameter().order(1).l()
    src2 = q.identifier("x").l()
    assert len(reachable_by(cpg, sinks, src1)) == 1
    assert len(reachable_by(cpg, sinks, src2)) == 1


# DataflowTests.scala:622-653
def test_parent_to_child_scope():
    cpg, q = build("parentchild")
    sink1 = q.call("log").l()
    sink2 = q.call("debug").l()
    assert len(sink1) == 1
    assert len(sink2) == 1
    i_src = q.method("foo").ast().is_identifier().name("x").line_number(4).l()
    assert len(i_src) == 1
    assert reachable_by_count(cpg, sink1, i_src, dedup=True) == 1
    l_src = q.method("foo").ast().is_literal().code("1").line_number(4).l()
    assert len(l_src) == 1
    assert len(reachable_by(cpg, sink1, l_src)) == 1
    p_src = q.method("foo").parameter().name_exact("u").l()
    assert len(p_src) == 1
    assert len(reachable_by(cpg, sink2, p_src)) == 1


# DataflowTests.scala:655-664
def test_multiple_assignment():
    cpg, q = build("multiassign")
    sources = q.call("source").l()
    sinks = q.identifier("sink").l()
    assert len(reachable_by_flows(cpg, sinks, sources)) == 1


# DataflowTests.scala:666-697
@pytest.mark.parametrize("which", ["literal", "ident5", "ident8"])
def test_module_literal_closure(which):
    cpg, q = build("modulelit")
    sinks = q.call().code(r"axios.post\(.*").l()
    if which == "literal":
        sources = q.literal().code_exact('"https://test-api-service.com"').l()
        assert len(sources) == 1
        assert reachable_by_count(cpg, sinks, sources, dedup=True) == 1
    elif which == "ident5":
        sources = q.identifier().name_exact("API_Endpoint").line_number(5).l()
        assert len(sources) == 1
        assert reachable_by_count(cpg, sinks, sources, dedup=True) == 1
    else:
        sources = q.identifier().name_exact("API_Endpoint").line_number(8).l()
        assert len(sources) == 1
        assert len(reachable_by(cpg, sinks, sources)) == 1


# DataflowTests.scala:484-499 "Flow from non-static member to sink"
def test_nonstatic_member_to_sink():
    cpg = build_cpg('''
class Foo {
  x = "foo";
  func() {
    sink(x);
  }
}
''')
    q = Q(cpg)
    sinks = q.call("sink").argument(1).l()
    sources = q.member().name("x").l()
    assert len(sinks) == 1
    assert len(sources) == 1
    assert len(reachable_by(cpg, sinks, sources)) == 1


# DataflowTests.scala:501-516 "Flow from static member to sink"
def test_static_member_to_sink():
    cpg = build_cpg('''
class Foo {
  static x = "foo";
  func() {
    sink(x);
  }
}
''')
    q = Q(cpg)
    sinks = q.call("sink").argument(1).l()
    sources = q.member().name("x").l()
    assert len(sinks) == 1
    assert len(sources) == 1
    assert len(reachable_by(cpg, sinks, sources)) == 1


# DataflowTests.scala:704-716 "Field access on TemplatedDom directly" /
# "Not throw error and get handled it gracefully"
def test_templated_dom_field_access_graceful():
    cpg = build_cpg('''
import { useRouter } from "next/router";
const tabComponentType = (<Tab title={"typeComponent"} />).type;
''')
    ids = Q(cpg).identifier("tabComponentType").l()
    assert len(ids) == 1
    assert ids[0].line == 3
