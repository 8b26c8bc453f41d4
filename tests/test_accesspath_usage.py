"""Ported reference goldens: dataflowengineoss AccessPathUsageTests.scala
— CPG call trees → tracked access paths
(AccessPathUsage.toTrackedBaseAndAccessPathSimple +
AccessPathHandling.memberAccessToPath)."""

from __future__ import annotations

from joern_spark.cpg.core import Cpg, Node
from joern_spark.dataflow.accesspath import (
    AccessPath, AddressOf, ConstantAccess, Elements, IndirectionAccess,
    PointerShift, VariableAccess, VariablePointerShift,
    to_tracked_base_and_access_path,
)

V = VariableAccess
I = IndirectionAccess  # noqa: E741
C = ConstantAccess
A = AddressOf
VS = VariablePointerShift
S = PointerShift


def E(*elements):
    return AccessPath(Elements.normalized(elements), ())


class G:
    """genCALL fixture (AccessPathUsageTests.scala:28-48): args are added
    REVERSED, so the last argument gets argumentIndex 1."""

    def __init__(self):
        self.cpg = Cpg()

    def call(self, op, *args):
        c = self.cpg.add_node(Node("CALL", name=op))
        for idx, arg in enumerate(reversed(args), start=1):
            arg.argument_index = idx
            self.cpg.add_edge(c, arg, "ARGUMENT")
        return c

    def lit(self, payload):
        return self.cpg.add_node(Node("LITERAL", code=payload))

    def ident(self, payload):
        return self.cpg.add_node(Node("IDENTIFIER", name=payload))

    def fid(self, payload):
        return self.cpg.add_node(Node("FIELD_IDENTIFIER",
                                      canonical_name=payload))

    def path(self, node):
        return to_tracked_base_and_access_path(self.cpg, node)[1]

    def inner(self):
        """the nested `computedMemberAccess(lit b, call foo)` every case
        uses as its base expression"""
        return self.call("<operator>.computedMemberAccess", self.lit("b"),
                         self.call("foo"))


# AccessPathUsageTests.scala:52-78 (member / indirectMember access)
def test_member_access():
    g = G()
    c = g.call("<operator>.memberAccess", g.ident("a"), g.inner())
    assert g.path(c) == E(C("b"), C("a"))
    c = g.call("<operator>.indirectMemberAccess", g.ident("a"), g.inner())
    assert g.path(c) == E(C("b"), C("a"))


# :80-104 (computedMemberAccess literal / overtaint)
def test_computed_member_access():
    g = G()
    c = g.call("<operator>.computedMemberAccess", g.lit("a"), g.inner())
    assert g.path(c) == E(C("b"), C("a"))
    c = g.call("<operator>.computedMemberAccess", g.ident("a"), g.inner())
    assert g.path(c) == E(C("b"), V)
    c = g.call("<operator>.indirectComputedMemberAccess", g.lit("a"),
               g.inner())
    assert g.path(c) == E(C("b"), C("a"))
    c = g.call("<operator>.indirectComputedMemberAccess", g.ident("a"),
               g.inner())
    assert g.path(c) == E(C("b"), V)


# :131-145 (indirection / addressOf)
def test_indirection_and_address_of():
    g = G()
    c = g.call("<operator>.indirection", g.inner())
    assert g.path(c) == E(C("b"), I)
    c = g.call("<operator>.addressOf", g.inner())
    assert g.path(c) == E(C("b"), A)


# :150-186 (fieldAccess literal / fieldIdentifier / identifier)
def test_field_access():
    g = G()
    for arg in (g.lit("a"), g.fid("a"), g.ident("a")):
        c = g.call("<operator>.fieldAccess", arg, g.inner())
        assert g.path(c) == E(C("b"), C("a"))


# :188-224 (indirectFieldAccess)
def test_indirect_field_access():
    g = G()
    for arg in (g.lit("a"), g.fid("a"), g.ident("a")):
        c = g.call("<operator>.indirectFieldAccess", arg, g.inner())
        assert g.path(c) == E(C("b"), I, C("a"))


# :226-261 (indexAccess: literal/fieldIdentifier constant, identifier
# overtaints)
def test_index_access():
    g = G()
    c = g.call("<operator>.indexAccess", g.lit("a"), g.inner())
    assert g.path(c) == E(C("b"), C("a"))
    c = g.call("<operator>.indexAccess", g.fid("a"), g.inner())
    assert g.path(c) == E(C("b"), C("a"))
    c = g.call("<operator>.indexAccess", g.ident("a"), g.inner())
    assert g.path(c) == E(C("b"), V)


# :263-310 (indirectIndexAccess incl. parse-failure overtaint)
def test_indirect_index_access():
    g = G()
    c = g.call("<operator>.indirectIndexAccess", g.lit("12"), g.inner())
    assert g.path(c) == E(C("b"), S(12), I)
    c = g.call("<operator>.indirectIndexAccess", g.fid("12"), g.inner())
    assert g.path(c) == E(C("b"), S(12), I)
    c = g.call("<operator>.indirectIndexAccess", g.ident("a"), g.inner())
    assert g.path(c) == E(C("b"), VS, I)
    c = g.call("<operator>.indirectIndexAccess", g.lit("a"), g.inner())
    assert g.path(c) == E(C("b"), VS, I)


# :312-358 (pointerShift incl. parse-failure overtaint)
def test_pointer_shift():
    g = G()
    c = g.call("<operator>.pointerShift", g.lit("12"), g.inner())
    assert g.path(c) == E(C("b"), S(12))
    c = g.call("<operator>.pointerShift", g.fid("12"), g.inner())
    assert g.path(c) == E(C("b"), S(12))
    c = g.call("<operator>.pointerShift", g.ident("a"), g.inner())
    assert g.path(c) == E(C("b"), VS)
    c = g.call("<operator>.pointerShift", g.lit("abc"), g.inner())
    assert g.path(c) == E(C("b"), VS)


# :360-401 (getElementPtr)
def test_get_element_ptr():
    g = G()
    for arg in (g.lit("a"), g.fid("a"), g.ident("a")):
        c = g.call("<operator>.getElementPtr", arg, g.inner())
        assert g.path(c) == E(C("b"), I, C("a"), A)


# :403-415 (other operators do not expand through)
def test_others_not_expanded():
    g = G()
    c = g.call("<operator>.addition", g.ident("a"), g.inner())
    assert g.path(c) == E()
