"""AST golden batch 19: TsDecoratorAstCreationPassTests.scala subset —
ANNOTATION nodes for method and parameter decorators.  (The __decorate
class-decorator lowering remains TS-frontend scope.)"""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q


def _annotations(cpg, node):
    return sorted((e.dst for e in cpg.out(node, "AST")
                   if e.dst.label == "ANNOTATION"), key=lambda a: a.order)


# TsDecoratorAstCreationPassTests.scala:13-47 (method annotations)
def test_method_annotations():
    cpg = build_cpg("""
class Greeter {
  @a(false)
  @b(foo)
  @c(foo=false)
  @d()
  greet() {
    return "Hello";
  }
}""")
    m = next(iter(Q(cpg).method().name_exact("greet").l()))
    assert [n for n in cpg.ast_subtree(m) if n.label == "CALL"] == []
    anns = _annotations(cpg, m)
    assert [(a.code, a.name, a.full_name, a.order) for a in anns] == [
        ("@a(false)", "a", "a", 1),
        ("@b(foo)", "b", "b", 2),
        ("@c(foo=false)", "c", "c", 3),
        ("@d()", "d", "d", 4),
    ]


# TsDecoratorAstCreationPassTests.scala:49-62 (parameter annotations)
def test_parameter_annotations():
    cpg = build_cpg("""
class Greeter {
  greet(@c(foo=false) x: number) {
    return "Hello";
  }
}""")
    m = next(iter(Q(cpg).method().name_exact("greet").l()))
    x = next(e.dst for e in cpg.out(m, "AST")
             if e.dst.label == "METHOD_PARAMETER_IN" and e.dst.name == "x")
    (c,) = _annotations(cpg, x)
    assert (c.code, c.name, c.full_name, c.order) == \
        ("@c(foo=false)", "c", "c", 1)


# TsDecoratorAstCreationPassTests.scala:64-87 (dotted full names)
def test_annotation_full_names():
    cpg = build_cpg("""
class Foo {
  foo(@a.b.c(foo=false) x: number) {
    return "Hello";
  }
  bar(@a.b.c x: number) {
    return "Hello";
  }
}""")
    for mn, code in (("foo", "@a.b.c(foo=false)"), ("bar", "@a.b.c")):
        m = next(iter(Q(cpg).method().name_exact(mn).l()))
        x = next(e.dst for e in cpg.out(m, "AST")
                 if e.dst.label == "METHOD_PARAMETER_IN" and e.dst.name == "x")
        (c,) = _annotations(cpg, x)
        assert (c.code, c.name, c.full_name, c.order) == (code, "c", "a.b.c", 1)
