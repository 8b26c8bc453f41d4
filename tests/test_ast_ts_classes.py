"""AST golden batch 18: TsClassesAstCreationPassTests.scala subset —
parameter properties, enums, abstract classes, member modifiers, declared
classes.  (Interfaces + decorators remain TypeScript-frontend scope.)"""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg_frontend as build_cpg
from joern_spark.query.cpgql import Q

FN = "script.js"  # reference fixture: Test0.ts


def _only(xs):
    xs = list(xs)
    assert len(xs) == 1, [repr(n) for n in xs]
    return xs[0]


def _at(cpg, node):
    return Q(cpg).all().filter(lambda n: n is node)


def _mods(cpg, n):
    return [e.dst.modifier_type for e in cpg.out(n, "AST")
            if e.dst.label == "MODIFIER"]


def _members(cpg, td):
    return [e.dst for e in cpg.out(td, "AST") if e.dst.label == "MEMBER"]


def _methods(cpg, td):
    return [e.dst for e in cpg.out(td, "AST") if e.dst.label == "METHOD"]


def _block_calls(cpg, method):
    blk = _only(_at(cpg, method).ast_children().is_block().l())
    return [n for n in _at(cpg, blk).ast_children().is_call().l()]


# TsClassesAstCreationPassTests.scala:13-37 (parameter properties)
def test_parameter_properties():
    cpg = build_cpg("""
class Params {
  constructor(
    public readonly x: number,
    protected y: number,
    private z: number
  ) {}
}
""")
    td = _only(Q(cpg).type_decl().name_exact("Params").l())
    x, y, z = _members(cpg, td)
    assert (x.name, x.type_full_name) == ("x", "__ecma.Number")
    assert _mods(cpg, x) == ["READONLY", "PUBLIC"]
    assert (y.name, y.type_full_name) == ("y", "__ecma.Number")
    assert _mods(cpg, y) == ["PROTECTED"]
    assert (z.name, z.type_full_name) == ("z", "__ecma.Number")
    assert _mods(cpg, z) == ["PRIVATE"]
    ctor = _only([m for m in _methods(cpg, td) if m.name == "<init>"])
    params = sorted([e.dst for e in cpg.out(ctor, "AST")
                     if e.dst.label == "METHOD_PARAMETER_IN"],
                    key=lambda p: p.index)
    assert [p.name for p in params] == ["this", "x", "y", "z"]
    assert [c.code for c in _block_calls(cpg, ctor)
            if c.name == "<operator>.assignment"] == \
        ["this.x = x", "this.y = y", "this.z = z"]


# TsClassesAstCreationPassTests.scala:39-50 (ctor parameter assignment)
def test_constructor_parameter_assignment():
    cpg = build_cpg("""
class D {
  readonly noWiden = 1
  constructor(readonly widen = 2) {
    this.noWiden = 5;
    this.widen = 6;
  }
}
new D(7);
""")
    td = _only(Q(cpg).type_decl().name_exact("D").l())
    ctor = _only([m for m in _methods(cpg, td) if m.name == "<init>"])
    params = sorted([e.dst for e in cpg.out(ctor, "AST")
                     if e.dst.label == "METHOD_PARAMETER_IN"],
                    key=lambda p: p.index)
    assert [p.name for p in params] == ["this", "widen"]


# TsClassesAstCreationPassTests.scala:52-70 (no dangling locals, class)
def test_no_dangling_locals_from_members():
    cpg = build_cpg("""
class Foo {
  a = 1
  static b = 2
}
""")
    # every local is reachable to a method (no danglers)
    for local in Q(cpg).local().l():
        cur = local
        while cur is not None and cur.label != "METHOD":
            cur = cpg.ast_parent(cur)
        assert cur is not None, local
    td = _only(Q(cpg).type_decl().name_exact("Foo").l())
    init = _only([m for m in _methods(cpg, td) if m.name == "<init>"])
    assert _mods(cpg, init) == ["VIRTUAL", "CONSTRUCTOR"]
    assert [c.code for c in _block_calls(cpg, init)] == ["a = 1"]
    clinit = _only([m for m in _methods(cpg, td) if m.name == "<clinit>"])
    assert _mods(cpg, clinit) == ["STATIC", "CONSTRUCTOR"]
    assert [c.code for c in _block_calls(cpg, clinit)] == ["static b = 2"]


# TsClassesAstCreationPassTests.scala:72-87 (enum members, no danglers)
def test_enum_static_init():
    cpg = build_cpg("""
export enum Foo {
  A = '1',
  B = '2',
  C = '3',
}
""")
    td = _only(Q(cpg).type_decl().name_exact("Foo").l())
    clinit = _only([m for m in _methods(cpg, td) if m.name == "<clinit>"])
    assert _mods(cpg, clinit) == ["STATIC", "CONSTRUCTOR"]
    assert [c.code for c in _block_calls(cpg, clinit)] == [
        "A = '1'", "B = '2'", "C = '3'"]


# TsClassesAstCreationPassTests.scala:89-117 (simple enum)
def test_simple_enum():
    cpg = build_cpg("""
enum Direction {
  Up = 1,
  Down,
  Left,
  Right,
}
""")
    td = _only(Q(cpg).type_decl().name_exact("Direction").l())
    assert td.code == "enum Direction"
    assert td.full_name == f"{FN}::program:Direction"
    clinit = _only([m for m in _methods(cpg, td) if m.name == "<clinit>"])
    assert [c.code for c in _block_calls(cpg, clinit)][0] == "Up = 1"
    up, down, left, right = _members(cpg, td)
    assert (up.name, up.code) == ("Up", "Up = 1")
    assert (down.name, down.code) == ("Down", "Down")
    assert (left.name, left.code) == ("Left", "Left")
    assert (right.name, right.code) == ("Right", "Right")


# TsClassesAstCreationPassTests.scala:119-156 (abstract functions)
def test_abstract_class_functions():
    cpg = build_cpg("""
export abstract class Foo {
    x: number;
    y: number;
    public abstract foo(): void;
    public abstract bar(): void;
}
""")
    td = _only(Q(cpg).type_decl().name_exact("Foo").l())
    assert _mods(cpg, td) == ["ABSTRACT"]
    x, y, foo_m, bar_m = _members(cpg, td)
    assert (x.name, x.code, x.type_full_name) == ("x", "x: number;", "__ecma.Number")
    assert (y.name, y.code, y.type_full_name) == ("y", "y: number;", "__ecma.Number")
    assert (foo_m.name, foo_m.code) == ("foo", "public abstract foo(): void;")
    assert (bar_m.name, bar_m.code) == ("bar", "public abstract bar(): void;")
    methods = {m.name: m for m in _methods(cpg, td)}
    ctor = methods["<init>"]
    assert ctor.full_name == f"{FN}::program:Foo:<init>"
    assert _mods(cpg, ctor) == ["VIRTUAL", "CONSTRUCTOR"]
    for nm in ("foo", "bar"):
        m = methods[nm]
        assert m.full_name == f"{FN}::program:Foo:{nm}"
        assert _mods(cpg, m) == ["VIRTUAL", "ABSTRACT", "PUBLIC"]


# TsClassesAstCreationPassTests.scala:158-184 (simple classes)
def test_ts_simple_class():
    cpg = build_cpg("""
class Greeter {
  greeting: string;
  greet() {
    return "Hello, " + this.greeting;
  }
}
""")
    td = _only(Q(cpg).type_decl().name_exact("Greeter").l())
    assert td.code == "class Greeter"
    assert td.full_name == f"{FN}::program:Greeter"
    ctor = _only([m for m in _methods(cpg, td) if m.name == "<init>"])
    assert ctor.full_name == f"{FN}::program:Greeter:<init>"
    greeting, greet = _members(cpg, td)
    assert (greeting.name, greeting.code) == ("greeting", "greeting: string;")
    assert greet.name == "greet"


# TsClassesAstCreationPassTests.scala:186-207 (declared classes)
def test_declared_class_with_empty_constructor():
    cpg = build_cpg("""
declare class Greeter {
  greeting: string;
  constructor(arg: string);
}
""")
    td = _only(Q(cpg).type_decl().name_exact("Greeter").l())
    assert td.code == "class Greeter"
    assert td.full_name == f"{FN}::program:Greeter"
    ctor = _only([m for m in _methods(cpg, td) if m.name == "<init>"])
    assert ctor.full_name == f"{FN}::program:Greeter:<init>"
    (greeting,) = _members(cpg, td)
    assert (greeting.name, greeting.code) == ("greeting", "greeting: string;")


# TsClassesAstCreationPassTests.scala:209-228 (member access modifiers)
def test_member_access_modifiers():
    cpg = build_cpg("""
abstract class Greeter {
  static a: string;
  private b: string;
  public c: string;
  protected d: string;
  #e: string; // also private
}
""")
    td = _only(Q(cpg).type_decl().name_exact("Greeter").l())
    assert "ABSTRACT" in _mods(cpg, td)
    by_name = {m.name: _mods(cpg, m) for m in _members(cpg, td)}
    assert "STATIC" in by_name["a"]
    assert "PRIVATE" in by_name["b"]
    assert "PUBLIC" in by_name["c"]
    assert "PROTECTED" in by_name["d"]
    assert "PRIVATE" in by_name["e"]


# TsClassesAstCreationPassTests.scala:230-240 (empty interfaces)
def test_empty_interfaces():
    cpg = build_cpg("""
interface A {};
interface B {};
""")
    fulls = sorted(m.full_name for m in Q(cpg).method().l()
                   if not m.name.startswith("<operator>") and not m.is_external)
    assert fulls == [
        f"{FN}::program",
        f"{FN}::program:A:<init>",
        f"{FN}::program:B:<init>",
    ]


# TsClassesAstCreationPassTests.scala:242-290 (simple interfaces)
def test_simple_interface():
    cpg = build_cpg("""
interface Greeter {
  greeting: string;
  name?: string;
  [propName: string]: any;
  "foo": string;
  (source: string, subString: string): boolean;
  toString(): string;
}
""")
    td = _only(Q(cpg).type_decl().name_exact("Greeter").l())
    assert td.code == "interface Greeter"
    assert td.full_name == f"{FN}::program:Greeter"
    init, greeting, name, prop_name, foo, anon, to_string = _members(cpg, td)
    assert init.name == "<init>"
    assert init.type_full_name == f"{FN}::program:Greeter"
    assert (greeting.name, greeting.code) == ("greeting", "greeting: string;")
    assert (name.name, name.code) == ("name", "name?: string;")
    assert (prop_name.name, prop_name.code) == \
        ("propName", "[propName: string]: any;")
    assert (foo.name, foo.code) == ("foo", '"foo": string;')
    assert (anon.name, anon.code) == \
        ("<lambda>0", "(source: string, subString: string): boolean;")
    assert (to_string.name, to_string.code) == ("toString", "toString(): string;")
    methods = {m.name: m for m in _methods(cpg, td)}
    ctor = methods["<init>"]
    assert ctor.full_name == f"{FN}::program:Greeter:<init>"
    assert ctor.code == "new: Greeter"
    anon_m = methods["<lambda>0"]
    assert anon_m.full_name == f"{FN}::program:Greeter:<lambda>0"
    assert anon_m.code == "(source: string, subString: string): boolean;"
    params = sorted([e.dst for e in cpg.out(anon_m, "AST")
                     if e.dst.label == "METHOD_PARAMETER_IN"],
                    key=lambda p: p.index)
    assert [p.name for p in params] == ["this", "source", "subString"]
    assert [p.code for p in params] == \
        ["this", "source: string", "subString: string"]
    assert methods["toString"].code == "toString(): string;"


# TsClassesAstCreationPassTests.scala:291-311 (interface constructor)
def test_interface_constructor():
    cpg = build_cpg("""
interface Greeter {
  new (param: string) : Greeter
}
""")
    td = _only(Q(cpg).type_decl().name_exact("Greeter").l())
    assert td.code == "interface Greeter"
    (ctor,) = _methods(cpg, td)
    assert ctor.name == "<init>"
    assert ctor.full_name == f"{FN}::program:Greeter:<init>"
    assert ctor.code == "new (param: string) : Greeter"
    params = sorted([e.dst for e in cpg.out(ctor, "AST")
                     if e.dst.label == "METHOD_PARAMETER_IN"],
                    key=lambda p: p.index)
    assert [p.name for p in params] == ["this", "param"]
    assert [p.code for p in params] == ["this", "param: string"]
    assert "CONSTRUCTOR" in _mods(cpg, ctor)


def _ns(cpg, name):
    return _only([n for n in cpg.nodes
                  if n.label == "NAMESPACE_BLOCK" and n.name == name])


# TsClassesAstCreationPassTests.scala:313-324 (simple namespace)
def test_simple_namespace():
    cpg = build_cpg("""
namespace A {
  class Foo {};
}
""")
    a = _ns(cpg, "A")
    assert a.code.startswith("namespace A")
    assert a.full_name == f"{FN}::program:A"
    foo = _only(Q(cpg).type_decl().name_exact("Foo").l())
    assert foo.full_name == f"{FN}::program:A:Foo"


# TsClassesAstCreationPassTests.scala:326-352 (nested namespaces)
def test_nested_namespaces():
    cpg = build_cpg("""
namespace A {
  namespace B {
    namespace C {
      class Foo {};
    }
  }
}
""")
    a, b, c = _ns(cpg, "A"), _ns(cpg, "B"), _ns(cpg, "C")
    assert a.code.startswith("namespace A")
    assert a.full_name == f"{FN}::program:A"
    # A → body block → B
    grandkids = [g.dst for e in cpg.out(a, "AST")
                 for g in cpg.out(e.dst, "AST")]
    assert b in grandkids
    assert b.code.startswith("namespace B")
    assert b.full_name == f"{FN}::program:A:B"
    assert c.code.startswith("namespace C")
    assert c.full_name == f"{FN}::program:A:B:C"
    foo = _only(Q(cpg).type_decl().name_exact("Foo").l())
    assert foo.full_name == f"{FN}::program:A:B:C:Foo"


# TsClassesAstCreationPassTests.scala:354-376 (dotted namespace path)
def test_dotted_namespace_path():
    cpg = build_cpg("""
namespace A.B.C {
  class Foo {};
}
""")
    a, b, c = _ns(cpg, "A"), _ns(cpg, "B"), _ns(cpg, "C")
    assert a.code.startswith("namespace A")
    assert a.full_name == f"{FN}::program:A"
    assert b in [e.dst for e in cpg.out(a, "AST")]
    assert b.code.startswith("B.C")
    assert b.full_name == f"{FN}::program:A:B"
    assert c in [e.dst for e in cpg.out(b, "AST")]
    assert c.code.startswith("C")
    assert c.full_name == f"{FN}::program:A:B:C"
    foo = _only(Q(cpg).type_decl().name_exact("Foo").l())
    assert foo.full_name == f"{FN}::program:A:B:C:Foo"


# TsClassesAstCreationPassTests.scala:378-390 (object type alias)
def test_object_type_alias():
    cpg = build_cpg("""
export type User = {
    email: string;
    organizationIds: string[];
    username: string;
    name: string;
    gender: string;
}
""")
    td = _only(Q(cpg).type_decl().name_exact("User").l())
    members = _members(cpg, td)
    assert [m.name for m in members] == [
        "email", "organizationIds", "username", "name", "gender"]
    assert {m.type_full_name for m in members} == \
        {"__ecma.String", "__ecma.Array"}


# TsClassesAstCreationPassTests.scala:436-463 (stable global type order)
def test_stable_order_for_global_types():
    cpg = build_cpg("""
class FirstClass {}

declare class DeclaredClass { constructor(); }

interface FirstInterface {}

enum FirstEnum { A }

type FirstAlias = {}

namespace N {
  class NsClass {}
  interface NsInterface {}
  enum NsEnum { B }
  type NsAlias = {}
}
""")
    prog = _only(Q(cpg).method().name_exact(":program").l())
    blk = _only(_at(cpg, prog).ast_children().is_block().l())
    orders = sorted(e.dst.order for e in cpg.out(blk, "AST")
                    if e.dst.label != "LOCAL")
    assert orders == [1, 2, 3, 4, 5, 6]
    ns = _ns(cpg, "N")
    nblk = _only([e.dst for e in cpg.out(ns, "AST") if e.dst.label == "BLOCK"])
    inner = sorted(e.dst.order for e in cpg.out(nblk, "AST")
                   if e.dst.label != "LOCAL")
    assert inner == [1, 2, 3, 4]


# TsClassesAstCreationPassTests.scala:391-411 (dynamically defined param type)
def test_anon_class_for_inline_object_type_param():
    cpg = build_cpg("""
class Test {
    run(credentials: { username: string; password: string; }): string {
        console.log(credentials);
        return ``;
    }
}
""")
    td = _only(Q(cpg).type_decl().name_exact("<anon-class>0").l())
    assert td.full_name == f"{FN}::program:Test:run:<anon-class>0"
    members = _members(cpg, td)
    assert [m.name for m in members] == ["username", "password"]
    assert {m.type_full_name for m in members} == {"__ecma.String"}
    param = _only([n for n in cpg.nodes if n.label == "METHOD_PARAMETER_IN"
                   and n.name == "credentials"])
    assert param.type_full_name == f"{FN}::program:Test:run:<anon-class>0"
    # no assignment calls directly under typedecls
    for n in cpg.nodes:
        if n.label == "CALL" and n.name == "<operator>.assignment":
            parent = cpg.ast_parent(n)
            assert parent is None or parent.label != "TYPE_DECL"


# TsClassesAstCreationPassTests.scala:413-433 (destructured param type)
def test_anon_class_for_destructured_param():
    cpg = build_cpg("""
function apiCall({ username, password }) {
    log(`${username}: ${password}`);
}
""")
    td = _only(Q(cpg).type_decl().name_exact("<anon-class>0").l())
    assert td.full_name == f"{FN}::program:apiCall:<anon-class>0"
    members = _members(cpg, td)
    assert [m.name for m in members] == ["username", "password"]
    assert {m.type_full_name for m in members} == {"ANY"}
    param = _only([n for n in cpg.nodes if n.label == "METHOD_PARAMETER_IN"
                   and n.name == "param1_0"])
    assert param.type_full_name == f"{FN}::program:apiCall:<anon-class>0"
