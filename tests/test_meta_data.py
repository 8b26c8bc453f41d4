"""Ported reference goldens: jssrc2cpg JsMetaDataPassTests.scala
(JavaScriptMetaDataPass over an empty CPG)."""

from __future__ import annotations

from joern_spark.cpg.core import Cpg
from joern_spark.cpg.passes import create_meta_data


def _build():
    cpg = Cpg()
    create_meta_data(cpg, "somehash", "")
    return cpg


# JsMetaDataPassTests.scala:19-21 (create exactly 1 node)
def test_exactly_one_node():
    assert len(_build().nodes) == 1


# JsMetaDataPassTests.scala:23-25 (create no edges)
def test_no_edges():
    assert len(_build().edges) == 0


# JsMetaDataPassTests.scala:27-29 (correct language)
def test_language():
    assert [n.language for n in _build().nodes_by_label("META_DATA")] \
        == ["JSSRC"]


# JsMetaDataPassTests.scala:31-33 (correct hash)
def test_hash():
    assert [n.hash for n in _build().nodes_by_label("META_DATA")] \
        == ["somehash"]
