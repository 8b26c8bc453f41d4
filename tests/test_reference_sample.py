"""Integration test on the reference repo's own sample program
(/root/reference/tests/code/jssrc/simple.js — the joern smoke-test input):
the canonical user-input→SQL-concat taint flow must be found end-to-end."""

from __future__ import annotations

import os

import pytest

from joern_spark.cpg.build import build_cpg
from joern_spark.dataflow.engine import reachable_by_flows, result_pairs
from joern_spark.query.cpgql import Q

SAMPLE = os.path.join(os.path.dirname(__file__), "data", "reference_simple.js")
# verbatim copy of the reference smoke-test input (tests/code/jssrc/
# simple.js) so the repo stays standalone


@pytest.mark.skipif(not os.path.exists(SAMPLE), reason="reference sample missing")
def test_sql_injection_flow_on_reference_sample():
    cpg = build_cpg(open(SAMPLE).read(), "simple.js")
    q = Q(cpg)
    assert {m.name for m in cpg.methods() if not m.is_external} == {
        ":program", "<lambda>0", "getUserInput", "lookForProperty", "queryDatabase"}
    sources = q.call().name_exact("getUserInput").l()
    sinks = q.call().name_exact("query").argument(1).l()
    flows = reachable_by_flows(cpg, sinks, sources)
    assert len(flows) == 1
    assert result_pairs(cpg, flows[0]) == [
        ("getUserInput()", 25),
        ("var input = getUserInput()", 25),
        ("lookForProperty(input)", 26),
        ("lookForProperty(this, property)", 11),
        ("var query = property", 12),
        ("queryDatabase(query)", 13),
        ("queryDatabase(this, sql)", 16),
        ('"SELECT * from " + sql', 18),
    ]
