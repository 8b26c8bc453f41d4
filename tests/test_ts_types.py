"""Ported reference goldens: jssrc2cpg types/TSTypesTests.scala (subset).

The reference obtains these types from the TypeScript compiler
(`Config().withTsTypes(true)` routes astgen through the TS checker); this
engine recovers them with the XTypeRecovery port instead.  Documented
deviations, each strictly more precise than the reference:

- where the reference leaves `typeFullName = ANY` and records the class in
  `possibleTypes` (TSTypesTests "identifiers from class", "parameters"),
  our recovery assigns the resolved class full name directly;
- the arrow in `const foo = () => 42` is renamed to `foo` by the
  ConstClosurePass before this check, so the method is addressed by that
  name rather than `<lambda>0`; the reference's `() => __ecma.Number`
  function-type string for `foo.possibleTypes` is not synthesized.
"""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg


def _idents(cpg, name):
    return [n for n in cpg.nodes_by_label("IDENTIFIER") if n.name == name]


def _method(cpg, name):
    (m,) = [x for x in cpg.methods() if x.name == name]
    return m


def _params(cpg, m):
    return [p for p in cpg.ast_children(m)
            if p.label == "METHOD_PARAMETER_IN"]


# TSTypesTests.scala:11-16 (this without proper surrounding type)
def test_this_hint_module_level():
    cpg = build_cpg("exports.isAuthorized = function() { this.publicKey }",
                    "Test0.js")
    (t,) = _idents(cpg, "this")
    assert t.type_full_name == "ANY"
    assert t.dynamic_type_hint_full_name == ("Test0.js::program",)


# TSTypesTests.scala:18-27 (this with proper surrounding type)
def test_this_hint_class():
    cpg = build_cpg("""
class Foo {
  publicKey: string = ""
  isAuthorized() { return () => { return this.publicKey } }
}
""", "Test0.js")
    (t,) = _idents(cpg, "this")
    assert t.dynamic_type_hint_full_name == ("Test0.js::program:Foo",)


# TSTypesTests.scala:29-46 (empty method with rest parameter)
def test_rest_parameter():
    cpg = build_cpg("function method(x, ...args) {}", "Test0.js")
    m = _method(cpg, "method")
    assert cpg.method_return(m).type_full_name == "ANY"
    t, x, args = _params(cpg, m)
    assert (t.index, t.name, t.type_full_name) == (0, "this", "ANY")
    assert (x.index, x.name, x.type_full_name) == (1, "x", "ANY")
    assert (args.index, args.name, args.code, args.is_variadic,
            args.type_full_name) == (2, "args", "...args", True,
                                     "__ecma.Array")


# TSTypesTests.scala:48-55 (return types for arrow functions; see module
# docstring for the rename + possibleTypes deviations)
def test_arrow_return_type():
    cpg = build_cpg("const foo = () => 42;", "Test0.js")
    ret = cpg.method_return(_method(cpg, "foo"))
    assert ret.type_full_name == "__ecma.Number"


# TSTypesTests.scala:57-61 (empty method)
def test_empty_method_return():
    cpg = build_cpg("function method(x) {}", "Test0.js")
    assert cpg.method_return(_method(cpg, "method")).type_full_name == "ANY"


# TSTypesTests.scala:63-71 (identifiers with type inference)
def test_identifier_inference():
    cpg = build_cpg('let x = "test";\nvar y = x;\n', "Test0.js")
    (y,) = _idents(cpg, "y")
    assert y.type_full_name == "__ecma.String"


# TSTypesTests.scala:73-81 (identifiers from class; deviation: direct type)
def test_identifier_from_class():
    cpg = build_cpg("class Foo {};\nvar y = new Foo();\n", "Test0.js")
    (y,) = _idents(cpg, "y")
    assert y.type_full_name == "Test0.js::program:Foo"


# TSTypesTests.scala:83-106 (typed parameters; deviation: direct return)
def test_typed_parameters():
    cpg = build_cpg("""
class Foo {};
let y = new Foo();
function bar(p1: number, p2: string) {
  return y;
}
""", "Test0.ts")
    m = _method(cpg, "bar")
    by_name = {p.name: p for p in _params(cpg, m)}
    assert by_name["p1"].type_full_name == "__ecma.Number"
    assert by_name["p2"].type_full_name == "__ecma.String"
    assert cpg.method_return(m).type_full_name == "Test0.ts::program:Foo"
