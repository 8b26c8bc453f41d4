"""Full per-document CPG pipeline: parse → AST lowering → base passes →
call graph → CFG → reaching-def/DDG.

Mirrors X2Cpg.defaultOverlayCreators() order (X2Cpg.scala:374-385:
Base, ControlFlow, TypeRelations, CallGraph) + OssDataFlow
(OssDataFlow.scala:8-26), collapsed into one function that the Spark
`applyInPandas` build UDF calls once per document.
"""

from __future__ import annotations

import sys

from joern_spark.cpg.astlower import lower_js
from joern_spark.cpg.cfg import add_cfg
from joern_spark.cpg.core import Cpg
from joern_spark.cpg.dominators import add_cdg, add_dominators
from joern_spark.cpg.passes import (
    create_method_stubs, create_namespaces, link_calls, link_dynamic_calls,
    recover_types,
)
from joern_spark.cpg.reachingdef import add_reaching_defs
from joern_spark.cpg.semantics import Semantics, default_semantics

_SEMANTICS = default_semantics()


def build_cpg(src: str, filename: str = "script.js",
              semantics: Semantics | None = None) -> Cpg:
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    cpg = lower_js(src, filename)
    create_namespaces(cpg)   # NamespaceCreator (A5, Base overlay)
    create_method_stubs(cpg)
    recover_types(cpg)       # XTypeRecovery subset (A19)
    link_dynamic_calls(cpg)  # CHA (DynamicCallLinker, A15)
    link_calls(cpg)          # static + naive/closure fallback (skips linked)
    add_cfg(cpg)
    ipdoms = add_dominators(cpg)
    add_cdg(cpg, ipdoms)
    add_reaching_defs(cpg, semantics or _SEMANTICS)
    return cpg
