"""Ported reference goldens: TsDecoratorAstCreationPassTests.scala — the
class / member / accessor / property / method __decorate suites (the
method/parameter/full-name annotation tests live in test_ast_decorators.py).
Frontend fixture (JsSrc2CpgSuite)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg


def _annotations(cpg, node):
    return [a for a in cpg.ast_children(node) if a.label == "ANNOTATION"]


def _typedecl(cpg, name):
    return next(n for n in cpg.nodes if n.label == "TYPE_DECL" and n.name == name)


def _member(cpg, td, name):
    return next(m for m in cpg.ast_children(td)
                if m.label == "MEMBER" and m.name == name)


def _check_abcd(anns):
    assert [(a.code, a.name, a.full_name, a.order) for a in anns] == [
        ("@a(false)", "a", "a", 1),
        ("@b(foo)", "b", "b", 2),
        ("@c(foo=false)", "c", "c", 3),
        ("@d()", "d", "d", 4),
    ]


# TsDecoratorAstCreationPassTests.scala:88-135
def test_annotations_for_classes():
    cpg = build_cpg("""
@a(false)
@b(foo)
@c(foo=false)
@d()
class Greeter {}
""", "Test0.ts")
    dec = next(n for n in cpg.nodes if n.label == "CALL" and n.name == "__decorate")
    codes = [n.code for n in cpg.ast_subtree(dec) if n.label == "CALL"]
    assert codes == [
        "__decorate([a(false),b(foo),c(foo=false),d()], Greeter)",
        "_tmp_0 = __ecma.Array.factory()",
        "__ecma.Array.factory()",
        "_tmp_0.push(a(false))",
        "_tmp_0.push",
        "a(false)",
        "_tmp_0.push(b(foo))",
        "_tmp_0.push",
        "b(foo)",
        "_tmp_0.push(c(foo=false))",
        "_tmp_0.push",
        "c(foo=false)",
        "foo=false",
        "_tmp_0.push(d())",
        "_tmp_0.push",
        "d()",
    ]
    _check_abcd(_annotations(cpg, _typedecl(cpg, "Greeter")))


# TsDecoratorAstCreationPassTests.scala:137-171
def test_annotations_for_class_members():
    cpg = build_cpg("""
class Greeter {
  @a(false)
  @b(foo)
  @c(foo=false)
  @d()
  greeting: string;
}
""", "Test0.ts")
    mem = _member(cpg, _typedecl(cpg, "Greeter"), "greeting")
    _check_abcd(_annotations(cpg, mem))


# TsDecoratorAstCreationPassTests.scala:173-186
def test_annotations_with_literals_for_class_members():
    cpg = build_cpg("""
class Foo {
  @a('lit')
  public x: number;
}
""", "Test0.ts")
    anns = _annotations(cpg, _member(cpg, _typedecl(cpg, "Foo"), "x"))
    assert [(a.code, a.name, a.full_name, a.order) for a in anns] == [
        ("@a('lit')", "a", "a", 1)]


# TsDecoratorAstCreationPassTests.scala:188-222
def test_annotations_for_class_accessors():
    cpg = build_cpg("""
class Foo {
  private _x: number;

  @a(false)
  @b(foo)
  @c(foo=false)
  @d()
  get x() {
    return this._x;
  }
}
""", "Test0.ts")
    meth = next(m for m in cpg.methods() if m.name == "x")
    body_calls = [n.code for n in cpg.ast_subtree(meth) if n.label == "CALL"]
    assert body_calls == ["this._x"]
    _check_abcd(_annotations(cpg, meth))


# TsDecoratorAstCreationPassTests.scala:224-263 (lambda decorator argument)
def test_annotations_with_lambda_argument():
    cpg = build_cpg("""
import { NgModule } from '@angular/core';

@NgModule(() => { })
export class MyClass { }
""", "Test0.ts")
    mrefs = [n for n in cpg.nodes if n.label == "METHOD_REF"]
    by_fn = {m.method_full_name for m in mrefs}
    assert "Test0.ts::program:MyClass:<init>" in by_fn
    assert "Test0.ts::program:<lambda>0" in by_fn

    assign = next(n for n in cpg.nodes if n.label == "CALL"
                  and n.code == "MyClass = __decorate([NgModule(() => { })], MyClass)")
    my_class_ref = cpg.argument(assign, 1)
    assert my_class_ref.label == "IDENTIFIER" and my_class_ref.name == "MyClass"
    assert my_class_ref.dynamic_type_hint_full_name == \
        ("Test0.ts::program:MyClass:<init>",)
    dec_call = cpg.argument(assign, 2)
    assert dec_call.label == "CALL" and dec_call.name == "__decorate"
    rec = cpg.receiver(dec_call)
    assert rec.label == "IDENTIFIER" and rec.name == "__decorate" \
        and rec.code == "__decorate"
    my_class_ref2 = cpg.argument(dec_call, 2)
    assert my_class_ref2.name == "MyClass"
    assert my_class_ref2.dynamic_type_hint_full_name == \
        ("Test0.ts::program:MyClass:<init>",)
    arg1 = cpg.argument(dec_call, 1)
    arg1_calls = [n.code for n in cpg.ast_subtree(arg1) if n.label == "CALL"]
    assert arg1_calls == [
        "_tmp_0 = __ecma.Array.factory()",
        "__ecma.Array.factory()",
        "_tmp_0.push(NgModule(() => { }))",
        "_tmp_0.push",
        "NgModule(() => { })",
    ]


# TsDecoratorAstCreationPassTests.scala:265-346 (class properties)
def test_annotations_for_class_properties():
    cpg = build_cpg("""
class Foo {
  @format("a, %s")
  a: string;

  @format("b, %s")
  @validate("isString")
  b: string;
}
""", "Test0.ts")
    td = _typedecl(cpg, "Foo")
    a_anns = _annotations(cpg, _member(cpg, td, "a"))
    assert [(x.code, x.name, x.order) for x in a_anns] == [
        ('@format("a, %s")', "format", 1)]
    b_anns = _annotations(cpg, _member(cpg, td, "b"))
    assert [(x.code, x.name, x.order) for x in b_anns] == [
        ('@format("b, %s")', "format", 1), ('@validate("isString")', "validate", 2)]

    dec_a, dec_b = [n for n in cpg.nodes if n.label == "CALL"
                    and n.name == "__decorate"]
    assert dec_a.code == "__decorate([format(\"a, %s\")], Foo.prototype, 'a', void 0)"
    assert dec_b.code == ("__decorate([format(\"b, %s\"),validate(\"isString\")], "
                          "Foo.prototype, 'b', void 0)")
    for dec in (dec_a, dec_b):
        rec = cpg.receiver(dec)
        assert rec.name == "__decorate" and rec.code == "__decorate"
        proto = cpg.argument(dec, 2)
        assert proto.label == "CALL" and proto.name == "<operator>.fieldAccess" \
            and proto.code == "Foo.prototype"
        base = cpg.argument(proto, 1)
        assert base.label == "IDENTIFIER" and base.name == "Foo"
        fi = cpg.argument(proto, 2)
        assert fi.label == "FIELD_IDENTIFIER" and fi.code == "prototype"
        void = cpg.argument(dec, 4)
        assert void.label == "CALL" and void.name == "<operator>.void"
    assert cpg.argument(dec_a, 3).code == "'a'"
    assert cpg.argument(dec_b, 3).code == "'b'"

    a1 = [n.code for n in cpg.ast_subtree(cpg.argument(dec_a, 1)) if n.label == "CALL"]
    assert a1 == [
        "_tmp_0 = __ecma.Array.factory()",
        "__ecma.Array.factory()",
        '_tmp_0.push(format("a, %s"))',
        "_tmp_0.push",
        'format("a, %s")',
    ]
    b1 = [n.code for n in cpg.ast_subtree(cpg.argument(dec_b, 1)) if n.label == "CALL"]
    assert b1 == [
        "_tmp_1 = __ecma.Array.factory()",
        "__ecma.Array.factory()",
        '_tmp_1.push(format("b, %s"))',
        "_tmp_1.push",
        'format("b, %s")',
        '_tmp_1.push(validate("isString"))',
        "_tmp_1.push",
        'validate("isString")',
    ]


# TsDecoratorAstCreationPassTests.scala:348-475 (class methods, 5-arg form)
def test_annotations_for_class_methods():
    cpg = build_cpg("""
class Foo {
  @Get("argA")
  reqA(@Req("reqAParam") request: Request): string {
    return foo();
  }
  @Get("argB")
  @Put("argC")
  reqB(@Req("reqBParam1") request1: Request, @Req("reqBParam2") request2: Request): number {
    return bar();
  }
}
""", "Test0.ts")
    req_a = next(m for m in cpg.methods() if m.name == "reqA")
    a_anns = _annotations(cpg, req_a)
    assert [(x.code, x.name, x.order) for x in a_anns] == [('@Get("argA")', "Get", 1)]
    req_b = next(m for m in cpg.methods() if m.name == "reqB")
    b_anns = _annotations(cpg, req_b)
    assert [(x.code, x.name, x.order) for x in b_anns] == [
        ('@Get("argB")', "Get", 1), ('@Put("argC")', "Put", 2)]

    dec_a, dec_b = [n for n in cpg.nodes if n.label == "CALL"
                    and n.name == "__decorate"]
    assert dec_a.code == ('__decorate([Get("argA"), __param(0, Req("reqAParam")), '
                          '__metadata("design:type", Function), '
                          '__metadata("design:paramtypes", [Object]), '
                          '__metadata("design:type", String)], '
                          "Foo.prototype, 'reqA', null)")
    assert dec_b.code == ('__decorate([Get("argB"),Put("argC"), '
                          '__param(0, Req("reqBParam1")),__param(1, Req("reqBParam2")), '
                          '__metadata("design:type", Function), '
                          '__metadata("design:paramtypes", [Object,Object]), '
                          '__metadata("design:type", Number)], '
                          "Foo.prototype, 'reqB', null)")
    for dec, nm in ((dec_a, "'reqA'"), (dec_b, "'reqB'")):
        rec = cpg.receiver(dec)
        assert rec.name == "__decorate" and rec.code == "__decorate"
        proto = cpg.argument(dec, 2)
        assert proto.code == "Foo.prototype" and proto.name == "<operator>.fieldAccess"
        assert cpg.argument(proto, 1).name == "Foo"
        assert cpg.argument(proto, 2).code == "prototype"
        name_lit = cpg.argument(dec, 3)
        assert name_lit.label == "LITERAL" and name_lit.code == nm
        assert name_lit.type_full_name == "__ecma.String"
        null_lit = cpg.argument(dec, 4)
        assert null_lit.label == "LITERAL" and null_lit.code == "null"
        assert null_lit.type_full_name == "__ecma.Null"

    a1 = [n.code for n in cpg.ast_subtree(cpg.argument(dec_a, 1)) if n.label == "CALL"]
    assert a1 == [
        "_tmp_1 = __ecma.Array.factory()",
        "__ecma.Array.factory()",
        '_tmp_1.push(Get("argA"))',
        "_tmp_1.push",
        'Get("argA")',
        '_tmp_1.push(__param(0, Req("reqAParam")))',
        "_tmp_1.push",
        '__param(0, Req("reqAParam"))',
        'Req("reqAParam")',
        '_tmp_1.push(__metadata("design:type", Function))',
        "_tmp_1.push",
        '__metadata("design:type", Function)',
        '_tmp_1.push(__metadata("design:paramtypes", [Object]))',
        "_tmp_1.push",
        '__metadata("design:paramtypes", [Object])',
        "_tmp_0 = __ecma.Array.factory()",
        "__ecma.Array.factory()",
        "_tmp_0.push(Object)",
        "_tmp_0.push",
        '_tmp_1.push(__metadata("design:type", String))',
        "_tmp_1.push",
        '__metadata("design:type", String)',
    ]
    b1 = [n.code for n in cpg.ast_subtree(cpg.argument(dec_b, 1)) if n.label == "CALL"]
    assert b1 == [
        "_tmp_3 = __ecma.Array.factory()",
        "__ecma.Array.factory()",
        '_tmp_3.push(Get("argB"))',
        "_tmp_3.push",
        'Get("argB")',
        '_tmp_3.push(Put("argC"))',
        "_tmp_3.push",
        'Put("argC")',
        '_tmp_3.push(__param(0, Req("reqBParam1")))',
        "_tmp_3.push",
        '__param(0, Req("reqBParam1"))',
        'Req("reqBParam1")',
        '_tmp_3.push(__param(1, Req("reqBParam2")))',
        "_tmp_3.push",
        '__param(1, Req("reqBParam2"))',
        'Req("reqBParam2")',
        '_tmp_3.push(__metadata("design:type", Function))',
        "_tmp_3.push",
        '__metadata("design:type", Function)',
        '_tmp_3.push(__metadata("design:paramtypes", [Object,Object]))',
        "_tmp_3.push",
        '__metadata("design:paramtypes", [Object,Object])',
        "_tmp_2 = __ecma.Array.factory()",
        "__ecma.Array.factory()",
        "_tmp_2.push(Object)",
        "_tmp_2.push",
        "_tmp_2.push(Object)",
        "_tmp_2.push",
        '_tmp_3.push(__metadata("design:type", Number))',
        "_tmp_3.push",
        '__metadata("design:type", Number)',
    ]


# TsDecoratorAstCreationPassTests.scala:477-487
def test_no_identifier_reuse_on_multi_decorated_params():
    cpg = build_cpg("""
export class Component {
  constructor(
    @Optional() @Inject(FOO) data: Data
  ) {}
}
""", "Test0.ts")
    for n in cpg.nodes:
        if n.label == "IDENTIFIER":
            parents = [e for e in cpg.inn(n, "AST")]
            assert len(parents) == 1, (n.name, n.code, len(parents))
