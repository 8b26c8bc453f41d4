"""Ported reference goldens: the semanticcpg structure suites over the
MockCpg fixture port — MemberTests, FileTests, NamespaceTests,
MethodParameterTests, MethodTests
(semanticcpg/src/test/.../language/types/structure/*.scala)."""

from __future__ import annotations

from joern_spark.query.cpgql import Q

from tests.mock_cpg import MockCpg


# ---------------------------------------------------------------------------
# MemberTests.scala
# ---------------------------------------------------------------------------

def _member_cpg():
    return MockCpg().with_type_decl("foo").cpg


def test_member_find():
    cpg = _member_cpg()
    assert {n.name for n in Q(cpg).member().l()} == {"amember"}


def test_member_filter_by_modifier():
    cpg = _member_cpg()
    assert {n.name for n in Q(cpg).member().has_modifier("STATIC").l()} \
        == {"amember"}


# ---------------------------------------------------------------------------
# FileTests.scala
# ---------------------------------------------------------------------------

FILE_NAME = "io/shiftleft/testcode/file/FileTest.java"


def _file_cpg():
    return (MockCpg()
            .with_file(FILE_NAME)
            .with_namespace("io.shiftleft.testcode.file", in_file=FILE_NAME)
            .with_type_decl("FileTest", in_file=FILE_NAME,
                            in_namespace="io.shiftleft.testcode.file")
            .with_method("method", in_type_decl="FileTest")
            .cpg)


def test_file_found():
    cpg = _file_cpg()
    assert FILE_NAME in [n.name for n in Q(cpg).file().l()]


def test_file_expand_to_type_decl():
    cpg = _file_cpg()
    (td,) = Q(cpg).file().name_exact(FILE_NAME).contained_type_decls().l()
    assert td.name == "FileTest"


def test_file_expand_to_namespace():
    cpg = _file_cpg()
    (ns,) = Q(cpg).file().name_exact(FILE_NAME).namespace().l()
    assert ns.name == "io.shiftleft.testcode.file"


def test_method_return_file():
    cpg = _file_cpg()
    # the method has no SOURCE_FILE of its own; its return resolves
    # through the defining type decl's file
    (f,) = (Q(cpg).method().name("method").method_return().file()
            .dedup().l())
    assert f.name == FILE_NAME


# ---------------------------------------------------------------------------
# NamespaceTests.scala
# ---------------------------------------------------------------------------

def _ns_cpg():
    return (MockCpg()
            .with_file("filename.c")
            .with_namespace("io.shiftleft.testcode.namespace",
                            in_file="filename.c")
            .with_type_decl("NamespaceTest",
                            in_namespace="io.shiftleft.testcode.namespace")
            .cpg)


def test_namespace_found():
    cpg = _ns_cpg()
    assert "io.shiftleft.testcode.namespace" in \
        [n.name for n in Q(cpg).namespace().l()]


def test_namespace_block_found():
    cpg = _ns_cpg()
    assert "io.shiftleft.testcode.namespace" in \
        [n.name for n in Q(cpg).namespace_block().l()]


def test_namespace_block_to_type_decl():
    cpg = _ns_cpg()
    tds = (Q(cpg).namespace_block()
           .name_exact("io.shiftleft.testcode.namespace")
           .contained_type_decls().l())
    assert "NamespaceTest" in [n.name for n in tds]


def test_namespace_to_type_decl():
    cpg = _ns_cpg()
    tds = (Q(cpg).namespace("io.shiftleft.testcode.namespace")
           .contained_type_decls().l())
    assert len(tds) == 1
    assert tds[0].name == "NamespaceTest"


def test_namespace_to_file():
    cpg = _ns_cpg()
    # namespace → its REF-in blocks → SOURCE_FILE
    (ns,) = Q(cpg).namespace("io.shiftleft.testcode.namespace").l()
    blocks = [e.src for e in cpg.inn(ns, "REF")]
    files = [e.dst for b in blocks for e in cpg.out(b, "SOURCE_FILE")]
    assert [f.name for f in files] == ["filename.c"]


# ---------------------------------------------------------------------------
# MethodParameterTests.scala
# ---------------------------------------------------------------------------

def _param_cpg():
    return MockCpg().with_method("foo").cpg


def test_all_parameters():
    cpg = _param_cpg()
    args = Q(cpg).method().name("foo").parameter().l()
    assert len(args) == 1
    s = Q(cpg).method().name("foo").parameter()
    assert [t.name for t in s.typ().l()] == ["paramtype"]


def test_parameter_filter_by_name():
    cpg = _param_cpg()
    assert Q(cpg).method().parameter().name(".*").size() == 1


def test_parameter_by_index():
    cpg = _param_cpg()
    s = Q(cpg).method().name("foo").parameter()
    assert [t.name for t in s.index(1).typ().l()] == ["paramtype"]
    assert {t.name for t in s.index_from(1).typ().l()} == {"paramtype"}
    assert {t.name for t in s.index_to(2).typ().l()} == {"paramtype"}


def test_parameter_to_method():
    cpg = _param_cpg()
    methods = Q(cpg).method().name("foo").parameter().index(1).method().l()
    assert len(methods) == 1
    assert methods[0].name == "foo"


# ---------------------------------------------------------------------------
# MethodTests.scala
# ---------------------------------------------------------------------------

def _method_cpg():
    def add_cfg(cpg):
        (method,) = [n for n in cpg.methods() if n.name == "foo"]
        (call,) = [n for n in cpg.nodes_by_label("CALL") if n.name == "call"]
        ret = cpg.method_return(method)
        cpg.add_edge(method, call, "CFG")
        cpg.add_edge(call, ret, "CFG")

    return (MockCpg()
            .with_namespace("namespace")
            .with_file("someFile", content="aaaCONTENTbbb")
            .with_type_decl("TypeDecl", in_namespace="namespace")
            .with_method("foo", in_type_decl="TypeDecl",
                         file_name="someFile", offset=3, offset_end=10)
            .with_method("bar", in_type_decl="TypeDecl", external=True)
            .with_call_in_method("foo", "call")
            .with_call_in_method("foo", "call2")
            .with_literal_argument("call", "literal")
            .with_custom(add_cfg)
            .cpg)


def test_method_defining_type_decl():
    cpg = _method_cpg()
    (td,) = Q(cpg).method().name("foo").defining_type_decl().l()
    assert td.name == "TypeDecl"


def test_method_literal():
    cpg = _method_cpg()
    (lit,) = Q(cpg).method().name("foo").literal_in().l()
    assert lit.code == "literal"


def test_method_namespace():
    cpg = _method_cpg()
    assert {n.name for n in Q(cpg).method().name("foo").namespace().l()} \
        == {"namespace"}


def test_method_filter_by_name():
    cpg = _method_cpg()
    for rx in ("foo", ".*foo.*"):
        (m,) = Q(cpg).method().name(rx).l()
        assert (m.name, m.full_name) == ("foo", "foo")


def test_method_top_level_expressions():
    cpg = _method_cpg()
    exprs = Q(cpg).method().name("foo").top_level_expressions().l()
    assert {e.code for e in exprs} == {"call", "call2"}


def test_method_cfg_first_last():
    cpg = _method_cpg()
    (first,) = Q(cpg).method().name("foo").cfg_first().l()
    assert first.code == "call"
    (last,) = Q(cpg).method().name("foo").cfg_last().l()
    assert last.code == "call"


def test_method_external_internal():
    cpg = _method_cpg()
    externals = [m.full_name for m in Q(cpg).method().external().l()]
    internals = [m.full_name for m in Q(cpg).method().internal().l()]
    assert "bar" in externals
    assert "bar" not in internals
    assert "foo" in internals
    (bar,) = Q(cpg).method().name("bar").l()
    assert bar.is_external is True
    (foo,) = Q(cpg).method().name("foo").l()
    assert foo.is_external is False


def test_method_has_modifier():
    cpg = _method_cpg()
    assert Q(cpg).method().name("foo").has_modifier("modifiertype").size() == 1


def test_method_content():
    cpg = _method_cpg()
    assert Q(cpg).method().name("foo").content() == ["CONTENT"]
    assert Q(cpg).method().name("bar").content() == []


# ---------------------------------------------------------------------------
# ControlStructureTraversalTests.scala (TRUE_BODY/FALSE_BODY preferred
# over AST child order)
# ---------------------------------------------------------------------------

def test_when_true_false_prefer_typed_edges():
    from joern_spark.cpg.core import Node

    def wire(cpg):
        (method,) = [n for n in cpg.methods() if n.name == "f"]
        (block,) = [c for c in cpg.ast_children(method)
                    if c.label == "BLOCK"]
        cs = cpg.add_node(Node("CONTROL_STRUCTURE",
                               control_structure_type="IF", order=1))
        cond = cpg.add_node(Node("LITERAL", code="cond", order=1))
        # intentionally inverted: order(2) carries "legacy-true" and
        # order(3) "legacy-false" so the typed edges must win
        false_body = cpg.add_node(Node("BLOCK", code="legacy-true", order=2))
        true_body = cpg.add_node(Node("BLOCK", code="legacy-false", order=3))
        cpg.add_edge(block, cs, "AST")
        cpg.add_edge(cs, cond, "AST")
        cpg.add_edge(cs, false_body, "AST")
        cpg.add_edge(cs, true_body, "AST")
        cpg.add_edge(cs, cond, "CONDITION")
        cpg.add_edge(cs, true_body, "TRUE_BODY")
        cpg.add_edge(cs, false_body, "FALSE_BODY")

    cpg = MockCpg().with_method("f").with_custom(wire).cpg
    (cs,) = Q(cpg).control_structure("IF").l()
    s = Q(cpg).control_structure("IF")
    assert [n.code for n in s.when_true().l()] == ["legacy-false"]
    assert [n.code for n in s.when_false().l()] == ["legacy-true"]


# ---------------------------------------------------------------------------
# ExpressionTraversalTests.scala (cfgNext/cfgPrev over expressions)
# ---------------------------------------------------------------------------

def _cfg_cpg(n_calls=2, fork_to_return_at=None):
    from joern_spark.cpg.core import Node  # noqa: F401

    def wire(cpg):
        (method,) = [n for n in cpg.methods()
                     if n.name == "methodForCfgTest"]
        calls = {n.name: n for n in cpg.nodes_by_label("CALL")}
        chain = [method] + [calls[f"call{i}"] for i in range(1, n_calls + 1)]
        for a, b in zip(chain, chain[1:]):
            cpg.add_edge(a, b, "CFG")
        ret = cpg.method_return(method)
        src = calls[f"call{fork_to_return_at}"] if fork_to_return_at \
            else chain[-1]
        cpg.add_edge(src, ret, "CFG")

    mc = MockCpg().with_method("methodForCfgTest")
    for i in range(1, n_calls + 1):
        mc = mc.with_call_in_method("methodForCfgTest", f"call{i}")
    return mc.with_custom(wire).cpg


def test_expression_cfg_next():
    cpg = _cfg_cpg()
    (x,) = (Q(cpg).method().name("methodForCfgTest").cfg_first()
            .cfg_next().is_call().l())
    assert x.name == "call2"


def test_expression_cfg_prev_of_first_empty():
    cpg = _cfg_cpg()
    assert (Q(cpg).method().name("methodForCfgTest").cfg_first()
            .cfg_prev().is_expression().size()) == 0


def test_expression_cfg_prev():
    cpg = _cfg_cpg()
    (x,) = (Q(cpg).method().name("methodForCfgTest").cfg_last()
            .cfg_prev().is_call().l())
    assert x.name == "call1"


def test_expression_cfg_next_of_last_empty():
    cpg = _cfg_cpg()
    assert (Q(cpg).method().name("methodForCfgTest").cfg_last()
            .cfg_next().is_expression().size()) == 0


# ---------------------------------------------------------------------------
# CfgNodeTraversalTests.scala (recursive cfgNext(n)/cfgPrev(n))
# ---------------------------------------------------------------------------

def test_cfg_prev_recursive():
    cpg = _cfg_cpg(n_calls=3, fork_to_return_at=2)
    names = [n.name for n in (Q(cpg).method().calls("call3")
                              .cfg_prev_rec(2).is_call().l())]
    assert names == ["call2", "call1"]


def test_cfg_next_recursive():
    cpg = _cfg_cpg(n_calls=3, fork_to_return_at=2)
    names = [n.name for n in (Q(cpg).method().calls("call1")
                              .cfg_next_rec(2).is_call().l())]
    assert names == ["call2", "call3"]


# ---------------------------------------------------------------------------
# BindingTests.scala (binding extension steps)
# ---------------------------------------------------------------------------

def _binding_cpg():
    from joern_spark.cpg.core import Node

    def wire(cpg):
        (td,) = [n for n in cpg.nodes_by_label("TYPE_DECL")
                 if n.name == "BindingTest"]
        init = next(n for n in cpg.methods() if n.name == "<init>")
        bound = next(n for n in cpg.methods() if n.name == "boundMethod")
        b1 = cpg.add_node(Node("BINDING", name="<init>"))
        b2 = cpg.add_node(Node("BINDING", name="boundMethod"))
        cpg.add_edge(td, b1, "BINDS")
        cpg.add_edge(td, b2, "BINDS")
        cpg.add_edge(b1, init, "REF")
        cpg.add_edge(b2, bound, "REF")

    return (MockCpg()
            .with_type_decl("BindingTest")
            .with_method("<init>")
            .with_method("boundMethod")
            .with_custom(wire)
            .cpg)


def test_binding_steps():
    cpg = _binding_cpg()
    td = Q(cpg).type_decl("BindingTest")
    assert sorted(b.name for b in td.method_binding().l()) \
        == ["<init>", "boundMethod"]
    assert sorted(m.name for m in td.method_binding().bound_method().l()) \
        == ["<init>", "boundMethod"]
    assert [b.name for b in
            Q(cpg).method().name("boundMethod").referencing_binding().l()] \
        == ["boundMethod"]
    assert [t.name for t in (Q(cpg).method().name("boundMethod")
                             .referencing_binding().binding_type_decl().l())] \
        == ["BindingTest"]
    assert sorted(m.name for m in td.bound_method().l()) \
        == ["<init>", "boundMethod"]
    assert [t.name for t in
            Q(cpg).method().name("boundMethod").binding_type_decl().l()] \
        == ["BindingTest"]


# ---------------------------------------------------------------------------
# OperatorExtensionTests.scala (operator views + starters)
# ---------------------------------------------------------------------------

def _op_cpg(name, code):
    return (MockCpg()
            .with_method("method")
            .with_call_in_method("method", name, code=code)
            .cpg)


def test_operator_assignment_starter():
    cpg = _op_cpg("<operator>.assignment", "x = 10")
    (x,) = Q(cpg).assignment().l()
    assert (x.name, x.code) == ("<operator>.assignment", "x = 10")


def test_operator_arithmetic_starter():
    cpg = _op_cpg("<operator>.addition", "10 + 20")
    (x,) = Q(cpg).arithmetic().l()
    assert (x.name, x.code) == ("<operator>.addition", "10 + 20")


def test_operator_plus_equals_in_both():
    cpg = _op_cpg("<operator>.assignmentPlus", "x += 10")
    (y,) = Q(cpg).arithmetic().l()
    (x,) = Q(cpg).assignment().l()
    assert x.id == y.id
    assert (x.name, x.code) == ("<operator>.assignmentPlus", "x += 10")


def test_operator_array_access_starter():
    cpg = _op_cpg("<operator>.indexAccess", "x[i]")
    (x,) = Q(cpg).array_access().l()
    assert (x.name, x.code) == ("<operator>.indexAccess", "x[i]")


def test_operator_field_access_starter():
    cpg = _op_cpg("<operator>.fieldAccess", "x.y")
    (x,) = Q(cpg).field_access().l()
    assert (x.name, x.code) == ("<operator>.fieldAccess", "x.y")


def test_operator_method_views():
    for name, code, view in (
            ("<operator>.assignment", "x = 10", "assignment"),
            ("<operator>.addition", "10 + 20", "arithmetic"),
            ("<operator>.indexAccess", "x[i]", "array_access"),
            ("<operator>.fieldAccess", "x.y", "field_access")):
        cpg = _op_cpg(name, code)
        s = Q(cpg).method().name("method").ast()
        (x,) = getattr(s, view)().l()
        assert (x.name, x.code) == (name, code)


# ---------------------------------------------------------------------------
# TypeTests.scala (class members + type-decl / type hierarchies + content)
# ---------------------------------------------------------------------------

def _class_cpg():
    return (MockCpg()
            .with_type_decl("ClassMemberTest", is_external=False)
            .with_type_decl("Object", is_external=True)
            .cpg)


def test_type_internal_external():
    cpg = _class_cpg()
    assert Q(cpg).type_decl("ClassMemberTest").internal().size() == 1
    assert Q(cpg).type_decl("Object").external().size() == 1


def test_type_members():
    cpg = _class_cpg()
    assert (Q(cpg).type_decl("ClassMemberTest").member()
            .name_exact("amember").size()) == 1
    assert (Q(cpg).type_decl("ClassMemberTest").member()
            .name_exact("amember").is_static().size()) == 1
    assert Q(cpg).type_decl().member().name(".*").size() > 0


def _hierarchy_cpg():
    def wire(cpg):
        def decl(name):
            return next(n for n in cpg.nodes_by_label("TYPE_DECL")
                        if n.name == name)

        def typ(name):
            return next(n for n in cpg.nodes_by_label("TYPE")
                        if n.name == name)
        cpg.add_edge(decl("Derived"), typ("Base"), "INHERITS_FROM")
        cpg.add_edge(decl("DerivedFromDerived"), typ("Derived"),
                     "INHERITS_FROM")

    return (MockCpg()
            .with_type_decl("ClassMemberTest", is_external=False)
            .with_type_decl("Object", is_external=True)
            .with_type_decl("Base")
            .with_type_decl("Derived")
            .with_type_decl("DerivedFromDerived")
            .with_custom(wire)
            .cpg)


def test_type_decl_hierarchy():
    cpg = _hierarchy_cpg()
    assert (Q(cpg).type_decl(".*Derived").base_type_decl()
            .name(".*Base").size()) == 1
    assert (Q(cpg).type_decl(".*Base").derived_type_decl()
            .name(".*Derived").size()) == 1
    assert {n.name for n in (Q(cpg).type_decl(".*Base")
                             .derived_type_decl_transitive().l())} \
        == {"Derived", "DerivedFromDerived"}
    assert {n.name for n in (Q(cpg).type_decl("DerivedFromDerived")
                             .base_type_decl_transitive().l())} \
        == {"Derived", "Base"}


def test_type_hierarchy():
    cpg = _hierarchy_cpg()
    assert Q(cpg).typ(".*Derived").base_type().name(".*Base").size() == 1
    assert Q(cpg).typ(".*Base").derived_type().name(".*Derived").size() == 1
    assert {n.name for n in
            Q(cpg).typ(".*Base").derived_type_transitive().l()} \
        == {"Derived", "DerivedFromDerived"}
    assert {n.name for n in (Q(cpg).typ("DerivedFromDerived")
                             .base_type_transitive().l())} \
        == {"Derived", "Base"}


def test_type_decl_content():
    cpg = (MockCpg()
           .with_namespace("namespace")
           .with_file("someFile", content="aaaCONTENTbbb")
           .with_type_decl("foo", in_namespace="namespace",
                           in_file="someFile", offset=3, offset_end=10)
           .cpg)
    assert Q(cpg).type_decl("foo").content() == ["CONTENT"]


# ---------------------------------------------------------------------------
# StepsTest.scala (the applicable generic steps: parentBlock, toJson, ids)
# ---------------------------------------------------------------------------

def _steps_cpg():
    return (MockCpg()
            .with_file("afile.c")
            .with_namespace("anamespace")
            .with_type_decl("AClass", in_namespace="anamespace",
                            in_file="afile.c")
            .with_method("foo", in_type_decl="AClass")
            .with_method("woo", in_type_decl="AClass")
            .with_call_in_method("foo", "acall")
            .cpg)


# StepsTest.scala:95-97 (allow retrieving ids)
def test_steps_ids():
    cpg = _steps_cpg()
    assert [n.id for n in Q(cpg).method().l()]


# StepsTest.scala:100-113 (parent block for a block's AST children)
def test_steps_parent_block():
    cpg = _steps_cpg()
    (block,) = Q(cpg).method().name("foo").body().l()
    # block.ast includes the block itself (the reference's direct child)
    # and its leaf children — all resolve to the same parent block
    foo_ast = Q(cpg).method().name("foo").body().ast().l()
    first, last = foo_ast[0], foo_ast[-1]
    for node in (first, last):
        assert Q(cpg).all().filter(lambda n: n is node) \
            .parent_block().l()[0] is block
    # a method itself has no parent block
    assert Q(cpg).method().name("woo").parent_block().size() == 0


# StepsTest.scala:117-126 (toJson on stored nodes)
def test_steps_to_json():
    import json

    cpg = _steps_cpg()
    out = json.loads(Q(cpg).method().name_exact("foo").to_json())
    (entry,) = [e for e in out if e["name"] == "foo"]
    assert entry["label"] == "METHOD"
    assert isinstance(entry["id"], int)
