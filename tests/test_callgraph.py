"""Type recovery (XTypeRecovery subset) + CHA dynamic call linking goldens
(x2cpg DynamicCallLinker.scala:19-120; XTypeRecovery assignment core)."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg


def _call(cpg, code):
    return next(n for n in cpg.nodes if n.label == "CALL" and n.code == code)


def _targets(cpg, call):
    return {e.dst.full_name for e in cpg.out(call, "CALL")
            if e.dst.label == "METHOD"}


def test_override_dispatch_resolves_to_subclass():
    """`b.f()` with b = new B() resolves to B.f, NOT A.f (the VERDICT r1
    item 10 golden: receiver type + validM, not name matching)."""
    cpg = build_cpg("""
class A { f() { return 1; } }
class B extends A { f() { return 2; } }
var b = new B();
b.f();
""")
    call = _call(cpg, "b.f()")
    assert call.method_full_name == "script.js::program:B:f"
    assert _targets(cpg, call) == {"script.js::program:B:f"}


def test_inherited_method_resolves_through_superclass():
    """`b.g()` where only A defines g: super-class walk finds A.g."""
    cpg = build_cpg("""
class A { g() { return 1; } }
class B extends A { }
var b = new B();
b.g();
""")
    call = _call(cpg, "b.g()")
    assert call.method_full_name == "script.js::program:B:g"
    assert _targets(cpg, call) == {"script.js::program:A:g"}


def test_base_typed_receiver_cha_over_approximates():
    """`a.f()` with a : A links both A.f and the B.f override (CHA valid
    targets = type + all subclasses, SAFEDISPATCH semantics)."""
    cpg = build_cpg("""
class A { f() { return 1; } }
class B extends A { f() { return 2; } }
var a = new A();
a.f();
""")
    call = _call(cpg, "a.f()")
    assert _targets(cpg, call) == {
        "script.js::program:A:f", "script.js::program:B:f"}


def test_receiver_typed_flow_through_method():
    """Member-method taint now flows via the CHA-resolved call edge:
    source() → this-less method argument → sink inside the resolved body."""
    from joern_spark.dataflow.engine import reachable_by
    from joern_spark.query.cpgql import Q

    cpg = build_cpg("""
class W {
  id(x) { return x; }
}
var w = new W();
var a = source();
var b = w.id(a);
sink(b);
""")
    q = Q(cpg)
    sinks = q.call().code("sink.*").argument().l()
    sources = q.call().code("source.*").l()
    assert len(reachable_by(cpg, sinks, sources)) >= 1


def test_require_module_typing():
    """`const m = require("crypto"); m.hash(x)` gets methodFullName
    crypto:hash and an external stub (XTypeRecovery require-typing)."""
    cpg = build_cpg("""
const m = require("crypto");
m.hash(42);
""")
    call = _call(cpg, "m.hash(42)")
    assert call.method_full_name == "crypto:hash"
    stubs = [n for n in cpg.nodes if n.label == "METHOD"
             and n.full_name == "crypto:hash"]
    assert len(stubs) == 1 and stubs[0].is_external


# passes/base/NamespaceCreator.scala:18-26
def test_namespace_aggregation_nodes():
    """One NAMESPACE node per distinct NAMESPACE_BLOCK name; each block
    REFs its namespace (NamespaceCreator.scala:18-26)."""
    from joern_spark.cpg.build import build_cpg

    cpg = build_cpg(
        "namespace A { let x = 1; } namespace B { let y = 2; } "
        "namespace A { let z = 3; }", "f.ts")
    blocks = [n for n in cpg.nodes if n.label == "NAMESPACE_BLOCK"]
    spaces = {n.name: n for n in cpg.nodes if n.label == "NAMESPACE"}
    # dedup: two `namespace A` blocks, ONE NAMESPACE named A
    assert sorted(spaces) == ["<global>", "A", "B"]
    for b in blocks:
        refs = [e.dst for e in cpg.out(b, "REF")]
        assert refs == [spaces[b.name]], b.name


def test_alias_linker_pass():
    """AliasLinkerPass (x2cpg passes/typerelations/AliasLinkerPass.scala):
    `type Alias = Pt` carries aliasTypeFullName and links ALIAS_OF to the
    aliased TYPE."""
    from joern_spark.cpg.build import build_cpg
    from joern_spark.query.cpgql import Q

    cpg = build_cpg("class Pt { }\ntype Alias = Pt;\nvar p = new Pt();",
                    "t.ts")
    (td,) = [n for n in cpg.nodes_by_label("TYPE_DECL") if n.name == "Alias"]
    assert td.alias_type_full_name == "Pt"
    (aliased,) = Q(cpg).type_decl("Alias").alias_of().l()
    assert aliased.label == "TYPE" and aliased.name == "Pt"


def test_field_access_linker_pass():
    """FieldAccessLinkerPass (x2cpg passes/typerelations/
    FieldAccessLinkerPass.scala): `u.name` REF-links to the MEMBER of the
    base's recovered type — cpg.fieldAccess.referencedMember."""
    from joern_spark.cpg.build import build_cpg
    from joern_spark.query.cpgql import Q

    cpg = build_cpg("""
class User {
  name: string = "n";
}
var u = new User();
var z = u.name;
""", "t.ts")
    members = (Q(cpg).field_access().code("u\\.name")
               .referenced_member().l())
    assert [m.name for m in members] == ["name"]
