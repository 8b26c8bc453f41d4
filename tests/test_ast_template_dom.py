"""AST golden batch 16: TemplateDomAstCreationPassTests.scala — TEMPLATE_DOM
nodes for JSX (JSXElement / JSXExpressionContainer parent chains)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg


def _parent_dom(cpg, n):
    cur = cpg.ast_parent(n)
    while cur is not None and cur.label != "TEMPLATE_DOM":
        cur = cpg.ast_parent(cur)
    return cur


# TemplateDomAstCreationPassTests.scala:11-36 (simple JSX)
def test_simple_jsx_template_dom():
    cpg = build_cpg("""
const element = (
  <div>
    <h1>Hello!</h1>
    <h2>Good to see you here.</h2>
  </div>
);

function getGreeting(user) {
  if (user) {
    return <h1>Hello, {formatName(user)}!</h1>;
  }
  return <h1>Hello, Stranger.</h1>;
}
""")
    calls = [n for n in cpg.nodes if n.label == "CALL"
             and n.code.startswith("formatName")]
    assert len(calls) == 1
    container = _parent_dom(cpg, calls[0])
    assert container.code == "{formatName(user)}"
    assert container.name == "JSXExpressionContainer"
    elem = _parent_dom(cpg, container)
    assert elem.code == "<h1>Hello, {formatName(user)}!</h1>"
    assert elem.name == "JSXElement"
