"""AST golden batch 14: JsClassesAstCreationPassTests.scala (class type
decls, constructors, static members/initializers, new-expressions)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q

FN = "script.js"


def _only(xs):
    xs = list(xs)
    assert len(xs) == 1, [repr(n) for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


def _mods(cpg, n):
    return [e.dst.modifier_type for e in cpg.out(n, "AST")
            if e.dst.label == "MODIFIER"]


def _td_methods(cpg, td):
    return [e.dst for e in cpg.out(td, "AST") if e.dst.label == "METHOD"]


def _td_members(cpg, td):
    return [e.dst for e in cpg.out(td, "AST") if e.dst.label == "MEMBER"]


# JsClassesAstCreationPassTests.scala:13-34 (ast parent blocks for locals)
def test_class_locals_have_parent_blocks():
    cpg = build_cpg("""
var x = source();

class Foo {
  func() {
    sink(x);
  }
}

function source() {
  return 1;
}

function sink(par1) {}
""")
    xs = Q(cpg).local().name_exact("x").l()
    assert len(xs) == 2  # program local + captured shadow in func
    for x in xs:
        parents = [e.src for e in cpg.inn(x, "AST")]
        assert parents and parents[0].label == "BLOCK"
        refs = [e.src.name for e in cpg.edges
                if e.label == "REF" and e.dst is x and e.src.label == "IDENTIFIER"]
        assert refs == ["x"]


# JsClassesAstCreationPassTests.scala:36-39 (TYPE_DECL for ClassA)
def test_type_decl_for_class_expression():
    cpg = build_cpg("var x = class ClassA {}")
    tds = [n for n in Q(cpg).type_decl().name_exact("ClassA").l()
           if n.full_name == f"{FN}::program:ClassA"]
    assert len(tds) == 1


# JsClassesAstCreationPassTests.scala:41-52 (synthetic assignment)
def test_synthetic_assignment_for_class_declaration():
    cpg = build_cpg("class ClassA {}")
    tds = [n for n in Q(cpg).type_decl().name_exact("ClassA").l()
           if n.full_name == f"{FN}::program:ClassA"]
    assert len(tds) == 1
    assign = _only(Q(cpg).call().name_exact("<operator>.assignment").l())
    ident = _only(_at(cpg, assign).ast_children().is_identifier().l())
    assert ident.name == "ClassA"
    ref = _only(_at(cpg, assign).ast_children().is_method_ref().l())
    ctor_full = f"{FN}::program:ClassA:<init>"
    assert ref.code == "constructor() {}"
    assert ref.type_full_name == ctor_full
    assert ref.method_full_name == ctor_full


# JsClassesAstCreationPassTests.scala:54-66 (class locals + closure binding)
def test_class_local_closure_binding():
    cpg = build_cpg("""
class A {}
function b() {
  new A();
}""")
    program = _only(Q(cpg).method().name_exact(":program").l())
    prog_locals = [n for n in Q(cpg).local().name_exact("A").l()
                   if not n.closure_binding_id]
    assert [n.code for n in prog_locals] == ["A"]
    func_locals = [n for n in Q(cpg).local().name_exact("A").l()
                   if n.closure_binding_id]
    assert [n.closure_binding_id for n in func_locals] == [f"{FN}::program:b:A"]


# JsClassesAstCreationPassTests.scala:68-81 (static method modifiers)
def test_static_method_in_type_decl():
    cpg = build_cpg("""
var x = class ClassA {
  static staticFoo() {}
}""")
    td = _only(Q(cpg).type_decl().name_exact("ClassA").l())
    methods = {m.name: m for m in _td_methods(cpg, td)}
    ctor = methods["<init>"]
    assert ctor.full_name == f"{FN}::program:ClassA:<init>"
    assert ctor.code == "constructor() {}"
    assert _mods(cpg, ctor) == ["VIRTUAL", "CONSTRUCTOR"]
    sf = methods["staticFoo"]
    assert sf.full_name == f"{FN}::program:ClassA:staticFoo"
    assert sf.code == "static staticFoo() {}"
    assert _mods(cpg, sf) == ["VIRTUAL", "STATIC"]


# JsClassesAstCreationPassTests.scala:83-101 (non-static methods)
def test_non_static_methods_in_type_decl():
    cpg = build_cpg("""
class ClassA {
  foo() {}
  [Symbol.iterator]() {}
}""")
    td = _only(Q(cpg).type_decl().name_exact("ClassA").l())
    methods = {m.name: m for m in _td_methods(cpg, td)}
    assert methods["<init>"].code == "constructor() {}"
    foo = methods["foo"]
    assert foo.full_name == f"{FN}::program:ClassA:foo"
    assert foo.code == "foo() {}"
    assert _mods(cpg, foo) == ["VIRTUAL"]
    it = methods["Symbol.iterator"]
    assert it.full_name == f"{FN}::program:ClassA:Symbol.iterator"
    assert it.code == "[Symbol.iterator]() {}"
    assert _mods(cpg, it) == ["VIRTUAL"]


# JsClassesAstCreationPassTests.scala:103-157 (members with initialization)
def test_members_with_initialization():
    cpg = build_cpg("""
class ClassA {
  a = 1
  b = "foo"
  static c = true
  static d
  static {
    this.d = false
  }
  constructor(param1, param2) {
    this.e = param1;
    this.f = param2;
    this.f.g = param2;
  }
}""")
    td = _only(Q(cpg).type_decl().name_exact("ClassA").l())
    non_static = [m for m in _td_members(cpg, td) if "STATIC" not in _mods(cpg, m)]
    a, b, e, f = non_static
    assert (a.name, a.code, a.line, a.column) == ("a", "a = 1", 3, 2)
    assert (b.name, b.code, b.line, b.column) == ("b", 'b = "foo"', 4, 2)
    assert (e.name, e.code) == ("e", "this.e = param1;")
    assert (f.name, f.code) == ("f", "this.f = param2;")
    static_m = [m for m in _td_members(cpg, td) if "STATIC" in _mods(cpg, m)]
    c, d = static_m
    assert (c.name, c.code) == ("c", "static c = true")
    assert (d.name, d.code) == ("d", "static d")

    methods = {m.name: m for m in _td_methods(cpg, td)}
    clinit = methods["<clinit>"]
    cl_block = _only(_at(cpg, clinit).ast_children().is_block().l())
    assigns = [n for n in _at(cpg, cl_block).ast_children().is_call().l()
               if n.name == "<operator>.assignment"]
    assert [n.code for n in assigns] == ["static c = true", "this.d = false"]

    ctor = methods["<init>"]
    ctor_block = _only(_at(cpg, ctor).ast_children().is_block().l())
    ctor_assigns = [n for n in _at(cpg, ctor_block).ast_children().is_call().l()
                    if n.name == "<operator>.assignment"]
    assert [n.code for n in ctor_assigns] == [
        "a = 1", 'b = "foo"', "this.e = param1", "this.f = param2",
        "this.f.g = param2"]


# JsClassesAstCreationPassTests.scala:159-168 (non-static method AST)
def test_non_static_method_ast():
    cpg = build_cpg("""
var x = class ClassA {
  foo() {}
}""")
    td = _only(Q(cpg).type_decl().name_exact("ClassA").l())
    foo = _only([m for m in _td_methods(cpg, td) if m.name == "foo"])
    assert foo.full_name == f"{FN}::program:ClassA:foo"
    assert foo.code == "foo() {}"


# JsClassesAstCreationPassTests.scala:170-178 (TYPE_REF to ClassA)
def test_type_ref_to_class_expression():
    cpg = build_cpg("var x = class ClassA {}")
    program = _only(Q(cpg).method().name_exact(":program").l())
    pblock = _only(_at(cpg, program).ast_children().is_block().l())
    assign = _only(_at(cpg, pblock).ast_children().is_call().l())
    refs = _at(cpg, assign).ast_children().is_type_ref().l()
    assert [r.type_full_name for r in refs] == [f"{FN}::program:ClassA"]


# JsClassesAstCreationPassTests.scala:180-184 (extends)
def test_class_extends_inherits():
    cpg = build_cpg("class ClassA extends Base {}")
    td = _only(Q(cpg).type_decl().name_exact("ClassA").l())
    supers = [e.dst.name for e in cpg.out(td, "INHERITS_FROM")]
    assert supers == ["Base"]


def _new_block_checks(cpg, block_code, ctor_args=()):
    """Shared structure of the `new X(...)` lowering block
    (JsClassesAstCreationPassTests.scala:187-272)."""
    block = next(n for n in cpg.nodes if n.label == "BLOCK" and n.code == block_code)
    kids = cpg.ast_children(block)
    locals_ = [k for k in kids if k.label == "LOCAL"]
    assert [loc.name for loc in locals_] == ["_tmp_0"]
    tmp_assign = next(k for k in kids if k.label == "CALL"
                      and k.code == "_tmp_0 = .alloc")
    assert tmp_assign.name == "<operator>.assignment"
    ta_kids = cpg.ast_children(tmp_assign)
    tmp_ids = [k for k in ta_kids if k.label == "IDENTIFIER"]
    assert [t.name for t in tmp_ids] == ["_tmp_0"]
    alloc = next(k for k in ta_kids if k.label == "CALL")
    assert (alloc.name, alloc.code) == ("<operator>.alloc", ".alloc")
    ctor = next(k for k in kids if k.label == "CALL" and k.code == block_code)
    assert ctor.name == "<operator>.new"
    ctor_kids = cpg.ast_children(ctor)
    tmp0 = [k for k in ctor_kids if k.label == "IDENTIFIER" and k.name == "_tmp_0"]
    assert len(tmp0) == 1 and tmp0[0].argument_index == 0
    args = {a.name: a for a in cpg.arguments(ctor) if a.label == "IDENTIFIER"}
    assert args["_tmp_0"].argument_index == 0
    for i, name in enumerate(ctor_args, start=1):
        assert args[name].argument_index == i
    ret = [k for k in kids if k.label == "IDENTIFIER"]
    assert [r.name for r in ret] == ["_tmp_0"]
    return ctor


# JsClassesAstCreationPassTests.scala:187-222 (simple new)
def test_new_simple_structure():
    cpg = build_cpg("new MyClass();")
    ctor = _new_block_checks(cpg, "new MyClass()")
    recv = cpg.receiver(ctor)
    assert recv.label == "IDENTIFIER" and recv.name == "MyClass"
    assert recv.argument_index == -1
    named = [k for k in cpg.ast_children(ctor)
             if k.label == "IDENTIFIER" and k.name == "MyClass"]
    assert len(named) == 1


# JsClassesAstCreationPassTests.scala:224-271 (new with arguments)
def test_new_with_arguments_structure():
    cpg = build_cpg("new MyClass(arg1, arg2);")
    ctor = _new_block_checks(cpg, "new MyClass(arg1, arg2)",
                             ctor_args=("arg1", "arg2"))
    recv = cpg.receiver(ctor)
    assert recv.name == "MyClass" and recv.argument_index == -1


# JsClassesAstCreationPassTests.scala:273-312 (new with access path)
def test_new_with_access_path_structure():
    cpg = build_cpg("new foo.bar.MyClass();")
    ctor = _new_block_checks(cpg, "new foo.bar.MyClass()")
    path = next(k for k in cpg.ast_children(ctor)
                if k.label == "CALL" and k.code == "foo.bar.MyClass")
    assert path.name == "<operator>.fieldAccess"
    recv = cpg.receiver(ctor)
    assert recv.label == "CALL" and recv.code == "foo.bar.MyClass"
    assert recv.name == "<operator>.fieldAccess" and recv.argument_index == -1


# JsClassesAstCreationPassTests.scala:314-352 (throw new)
def test_throw_new_structure():
    cpg = build_cpg("function foo() { throw new Foo(); }")
    foo = next(m for m in cpg.nodes if m.label == "METHOD" and m.name == "foo")
    foo_block = next(k for k in cpg.ast_children(foo) if k.label == "BLOCK")
    throw = next(k for k in cpg.ast_children(foo_block)
                 if k.label == "CONTROL_STRUCTURE"
                 and k.code == "throw new Foo();")
    assert throw.control_structure_type == "THROW"
    throw_kids = cpg.ast_children(throw)
    new_block = next(k for k in throw_kids if k.label == "BLOCK"
                     and k.code == "new Foo()")
    assert [e.dst for e in cpg.out(throw, "ARGUMENT")] == [new_block]
    ctor = _new_block_checks(cpg, "new Foo()")
    recv = cpg.receiver(ctor)
    assert recv.name == "Foo" and recv.argument_index == -1
