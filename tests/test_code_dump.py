"""Ported reference goldens: jssrc2cpg CodeDumperFromContentTests.scala
(Method.content, TypeDecl.content, dumpRaw over File.contents)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg
from joern_spark.query.dump import dump_raw, node_content


def _method(cpg, name):
    (m,) = [x for x in cpg.methods() if x.name == name]
    return m


def _typedecl(cpg, name):
    (t,) = [x for x in cpg.nodes_by_label("TYPE_DECL") if x.name == name]
    return t


# CodeDumperFromContentTests.scala:12-34 (dumpRaw)
def test_dump_raw_method():
    cpg = build_cpg("""
// A comment
function my_func(param1)
{
   var x = foo(param1);
}""", "index.js")
    content = dump_raw(cpg, _method(cpg, "my_func"))
    assert [ln.strip() for ln in content.split("\n")] == [
        "function my_func(param1) /* <=== index.js::program:my_func */",
        "{",
        "var x = foo(param1);",
        "}",
    ]


# CodeDumperFromContentTests.scala:36-59 (Method.content + :program)
def test_method_content():
    my_func_content = "function my_func(param1)\n{\n  var x = foo(param1);\n}"
    full_code = f"\n// A comment\n{my_func_content}\n"
    cpg = build_cpg(full_code, "index.js")
    assert node_content(cpg, _method(cpg, "my_func")) == my_func_content
    assert node_content(cpg, _method(cpg, ":program")) == full_code


# CodeDumperFromContentTests.scala:61-85 (TypeDecl.content + <init>)
def test_typedecl_and_init_content():
    my_class_content = "class Foo\n{\n  x = 'foo';\n}"
    cpg = build_cpg(f"\n// A comment\n{my_class_content}\n", "index.js")
    assert node_content(cpg, _typedecl(cpg, "Foo")) == my_class_content
    assert node_content(cpg, _method(cpg, "<init>")) == my_class_content


# CodeDumperFromContentTests.scala:87-102 (UTF8 content)
def test_utf8_content():
    my_class_content = ("class Foo {\n"
                        "  // ✅ This is a comment with UTF8.\n"
                        "  x = 'foo';\n"
                        "}")
    cpg = build_cpg(f"\n// A comment\n{my_class_content}\n", "code.js")
    assert node_content(cpg, _typedecl(cpg, "Foo")) == my_class_content
