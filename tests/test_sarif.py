"""Ported reference goldens: semanticcpg SarifTests.scala against
query/sarif.py (Finding → SARIF v2.1.0).

Deviations (documented): tool.driver identifies this engine
("joern-spark") instead of the reference's product strings, and the
byte-exact pretty-JSON comparison is asserted structurally (key-by-key)
rather than as one string."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg
from joern_spark.cpg.core import Cpg, Node
from joern_spark.query.sarif import (
    Finding, cvss_to_level, document_findings, findings_to_sarif,
)


def _valid_finding(cpg):
    """createValidFindingNode: a method `foo` in Bar.java at line 2 with
    code `public foo()` as evidence; name f1, title Rule 1, score 8."""
    m = cpg.add_node(Node("METHOD", name="foo", filename="Bar.java",
                          line=2, code="public foo()"))
    return Finding(name="f1", title="Rule 1",
                   description="something `bad` happened", score=8.0,
                   evidence=[m])


# SarifTests.scala:13-28 (empty results)
def test_empty_sarif():
    cpg = Cpg()
    sarif = findings_to_sarif(cpg, [])
    assert sarif["version"] == "2.1.0"
    assert sarif["$schema"] == ("https://docs.oasis-open.org/sarif/sarif/"
                                "v2.1.0/errata01/os/schemas/"
                                "sarif-schema-2.1.0.json")
    assert len(sarif["runs"]) == 1
    run = sarif["runs"][0]
    assert run["results"] == []
    tool = run["tool"]["driver"]
    assert tool["name"]
    assert tool["fullName"]
    assert tool["organization"]


# SarifTests.scala:31-69 (single finding with all expected properties)
def test_valid_finding_result():
    cpg = Cpg()
    f = _valid_finding(cpg)
    sarif = findings_to_sarif(cpg, [f])
    run = sarif["runs"][0]

    (rule,) = run["tool"]["driver"]["rules"]
    assert rule["id"] == "f1"
    assert rule["name"] == "Rule 1"
    assert "shortDescription" not in rule
    # markdown backticks stripped from the plain text (:47-52)
    assert rule["fullDescription"]["text"] == "something bad happened"
    assert rule["fullDescription"]["markdown"] == "something `bad` happened"
    assert "helpUri" not in rule

    (result,) = run["results"]
    assert result["ruleId"] == "f1"
    assert result["message"]["text"] == "Rule 1"
    assert result["level"] == "error"

    region = result["locations"][0]["physicalLocation"]["region"]
    assert region["startLine"] == 2
    assert region["snippet"]["text"] == "public foo()"

    artifact = result["locations"][0]["physicalLocation"]["artifactLocation"]
    assert artifact["uri"] == "Bar.java"
    assert artifact["uriBaseId"] == "PROJECT_ROOT"

    assert len(result["codeFlows"]) == 1
    (flow,) = result["codeFlows"]
    assert "message" not in flow
    (thread,) = flow["threadFlows"]
    (loc,) = thread["locations"]
    assert loc["location"]["physicalLocation"]["artifactLocation"]["uri"] \
        == "Bar.java"

    assert run["originalUriBaseIds"] == {"PROJECT_ROOT":
                                         {"uriBaseId": "<empty>"}}


# SarifTests.scala:176-199 (finding with missing properties)
def test_invalid_finding_defaults():
    cpg = Cpg()
    m = cpg.add_node(Node("METHOD", name="foo", filename="Bar.java",
                          line=2, code="public foo()"))
    f = Finding(name="f1", description="something bad happened",
                score=5.0, evidence=[m])  # no title → "<empty>"
    sarif = findings_to_sarif(cpg, [f])
    run = sarif["runs"][0]
    (rule,) = run["tool"]["driver"]["rules"]
    assert rule["id"] == "f1"
    assert rule["name"] == "<empty>"
    assert rule["fullDescription"]["text"] == "something bad happened"
    (result,) = run["results"]
    assert result["message"]["text"] == "<empty>"
    assert result["level"] == "warning"


# SarifSchema.scala:331-341 (cvssToLevel)
def test_cvss_to_level():
    assert cvss_to_level(0.0) == "none"
    assert cvss_to_level(3.9) == "note"
    assert cvss_to_level(6.9) == "warning"
    assert cvss_to_level(10.0) == "error"
    assert cvss_to_level(-1.0) == "warning"
    assert cvss_to_level(11.0) == "warning"


# end-to-end: the scan bundle yields evidence-grade findings whose SARIF
# carries real locations and code flows
def test_document_findings_end_to_end():
    cpg = build_cpg("var x = source(); sink(x); eval('1');", "page.js")
    findings = document_findings(cpg)
    names = {f.name for f in findings}
    assert "source-to-sink" in names
    assert "eval-like-call" in names
    sarif = findings_to_sarif(cpg, findings)
    results = sarif["runs"][0]["results"]
    taint = next(r for r in results if r["ruleId"] == "source-to-sink")
    # sink is the result location, the flow walks source → sink
    flow_locs = taint["codeFlows"][0]["threadFlows"][0]["locations"]
    assert len(flow_locs) >= 2
    assert taint["level"] == "error"
    ev = next(r for r in results if r["ruleId"] == "eval-like-call")
    snippet = ev["locations"][0]["physicalLocation"]["region"]["snippet"]
    assert "eval" in snippet["text"]


def test_scan_evidence_sarif_spark():
    """Distributed evidence SARIF: one mapInPandas pass builds+scans+
    converts per document; the driver merges runs."""
    import pytest
    spark = pytest.importorskip("pyspark.sql").SparkSession.getActiveSession()
    if spark is None:
        from joern_spark.session import get_spark
        spark = get_spark(app_name="sarif-test", master="local[2]",
                          shuffle_partitions=2)
    from joern_spark.query.sarif import scan_evidence_sarif
    from joern_spark.sources.corpus import make_pages

    pages = make_pages(spark, n_docs=32, n_partitions=2)
    doc = scan_evidence_sarif(pages)
    assert doc["version"] == "2.1.0"
    results = doc["runs"][0]["results"]
    assert len(results) > 0
    # every result carries a real location with the page url as uri
    with_loc = [r for r in results if r["locations"]]
    assert with_loc
    uri = with_loc[0]["locations"][0]["physicalLocation"][
        "artifactLocation"]["uri"]
    assert uri.startswith("https://")
    rule_ids = {r["id"] for r in doc["runs"][0]["tool"]["driver"]["rules"]}
    assert {r["ruleId"] for r in results} <= rule_ids
