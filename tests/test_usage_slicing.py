"""Usage-slicing goldens on the reference's own JS sample
(dataflowengineoss slicing/UsageSlicing.scala:34-220; sample:
reference tests/code/jssrc/simple.js) — VERDICT r1 item 9's done bar:
defined-by / invoked-calls per object match the reference shape."""

from __future__ import annotations

import json

from joern_spark.cpg.build import build_cpg
from joern_spark.dataflow.slicing import usage_slice

import os

SRC = open(os.path.join(os.path.dirname(__file__), "data",
                "reference_simple.js")).read()  # verbatim copy of the
# reference smoke-test input (tests/code/jssrc/simple.js) so the repo
# stays standalone


def _slices():
    cpg = build_cpg(SRC, "simple.js")
    out = {}
    prog = usage_slice(cpg)
    for ms in prog["objectSlices"]:
        for sl in ms["slices"]:
            out[(ms["fullName"], sl["targetObj"]["name"])] = sl
    return prog, out


def test_connection_slice():
    """`connection` is defined by mysql.createConnection() and receives
    connect / query / end member invocations."""
    _, by_obj = _slices()
    sl = by_obj[("simple.js::program", "connection")]
    assert sl["definedBy"]["label"] == "CALL"
    assert sl["definedBy"]["name"] == "createConnection"
    # require-typing resolves the module method (XTypeRecovery subset)
    assert sl["definedBy"]["resolvedMethod"] == "mysql:createConnection"
    # the :program-level connection sees its direct uses; the `query`
    # invocation inside queryDatabase belongs to the CAPTURED shadow local
    # (closure-binding semantics split usages per method, as the reference
    # slicer does over reference CPGs)
    assert {c["callName"] for c in sl["invokedCalls"]} == {"connect", "end"}
    shadow = by_obj[("simple.js::program:queryDatabase", "connection")]
    assert shadow["targetObj"]["label"] == "LOCAL"
    q = next(c for c in shadow["invokedCalls"] if c["callName"] == "query")
    # query("SELECT..." + sql, function(...){}) → [string-ish, LAMBDA]
    assert q["paramTypes"][-1] == "LAMBDA"


def test_param_and_local_slices():
    _, by_obj = _slices()
    # param `sql` flows into the string concatenation at position 2
    sql = by_obj[("simple.js::program:queryDatabase", "sql")]
    assert sql["targetObj"]["label"] == "PARAM"
    assert [(c["callName"], c["position"]) for c in sql["argToCalls"]] == [
        ("<operator>.addition", 2)]
    # local `query` defined by param `property`, arg 1 of queryDatabase
    q = by_obj[("simple.js::program:lookForProperty", "query")]
    assert [(c["callName"], c["position"]) for c in q["argToCalls"]] == [
        ("queryDatabase", 1)]
    assert q["argToCalls"][0]["resolvedMethod"] == \
        "simple.js::program:queryDatabase"


def test_require_target_excluded_and_tmp_filtered():
    """Locals defined by require/import are skipped (TrackUsageTask case 1
    guard), as are _tmp_* temporaries and this/self."""
    _, by_obj = _slices()
    names = {name for (_m, name) in by_obj}
    assert "mysql" not in names
    assert not any(n.startswith("_tmp_") for n in names)
    assert "this" not in names


def test_json_serializable_program_slice():
    prog, _ = _slices()
    s = json.dumps(prog, sort_keys=True)
    assert '"objectSlices"' in s and '"userDefinedTypes"' in s


def test_user_defined_types():
    cpg = build_cpg("""
class Point {
  x = 0;
  len() { return 0; }
}
var p = new Point();
p.len();
""")
    prog = usage_slice(cpg)
    udt = next(u for u in prog["userDefinedTypes"]
               if u["name"].endswith(":Point"))
    assert [f["name"] for f in udt["fields"]] == ["x"]
    # typeDecl.method includes the (default) constructor, as in the
    # reference's userDefinedTypes
    assert sorted(p["callName"] for p in udt["procedures"]) == ["<init>", "len"]
    # and the object slice tracks the constructor + invocation
    sl = next(s for ms in prog["objectSlices"] for s in ms["slices"]
              if s["targetObj"]["name"] == "p")
    assert sl["definedBy"]["label"] == "CALL"
    # the constructor involvement is an invoked call, as the reference's
    # partitionInvolvementInCalls does (JsUsageSliceTests "Car"/"Foo")
    assert {c["callName"] for c in sl["invokedCalls"]} == {"Point", "len"}
