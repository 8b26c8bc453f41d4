"""`.sem` semantics loader tests: grammar parsing (Semantics.g4:1-13) and
an end-to-end check that a custom taint model changes a flow result."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg
from joern_spark.cpg.semantics import (
    PASSTHROUGH, Semantics, c_flows, operator_flows,
)
from joern_spark.cpg.semloader import parse_semantics, semantics_from_file
from joern_spark.dataflow.engine import reachable_by_flows
from joern_spark.query.cpgql import Q


def test_parse_basic_mappings():
    sems = parse_semantics('"foo" 1->1 2->3\n"bar" PASSTHROUGH\n')
    assert [s.method_full_name for s in sems] == ["foo", "bar"]
    assert sems[0].mappings == [(1, 1), (2, 3)]
    assert sems[1].mappings == [PASSTHROUGH]


def test_parse_named_args_negative_and_comments():
    text = '''
# a comment line
"requests.get" 1 "url" -> -1   # trailing comment
"<operator>.myOp" -1 -> -1 PASSTHROUGH
'''
    sems = parse_semantics(text)
    assert sems[0].mappings == [(1, -1)]
    assert sems[0].arg_names == {("src", 0): "url"}
    assert sems[1].mappings == [(-1, -1), PASSTHROUGH]


def test_parse_empty_and_no_mappings():
    assert parse_semantics("") == []
    sems = parse_semantics('"noflow"\n"other" 1->1\n')
    assert sems[0].method_full_name == "noflow"
    assert sems[0].mappings == []
    assert sems[1].mappings == [(1, 1)]


def _flows(code, sem=None):
    cpg = build_cpg(code)
    q = Q(cpg)
    sinks = q.call().code("sink.*").argument().l()
    sources = q.call().code("source.*").l()
    return len(reachable_by_flows(cpg, sinks, sources, semantics=sem))


def test_custom_operator_semantic_cuts_flow():
    """Overriding <operator>.addition to not flow to its return value makes
    the taint through `a + 1` disappear (reference: custom .sem entries win
    over DefaultSemantics by method full name)."""
    code = "var a = source();\nvar b = a + 1;\nsink(b);\n"
    assert _flows(code) > 0
    custom = parse_semantics('"<operator>.addition" 1->1 2->2\n')
    sem = Semantics(operator_flows() + c_flows() + custom)
    assert _flows(code, sem) == 0


def test_custom_internal_method_semantic(tmp_path):
    """A .sem file entry for an INTERNAL method replaces descending into its
    body: `encrypt` returns its argument (flow by default), the custom model
    declares no flow to the return value."""
    code = ("function encrypt(x) { return x; }\n"
            "var a = source();\nvar b = encrypt(a);\nsink(b);\n")
    assert _flows(code) > 0
    cpg = build_cpg(code)
    full = next(n.full_name for n in cpg.nodes
                if n.label == "METHOD" and n.name == "encrypt")
    p = tmp_path / "custom.sem"
    p.write_text(f'# block taint through encrypt\n"{full}" 1->1\n')
    sem = semantics_from_file(str(p))
    assert _flows(code, sem) == 0
