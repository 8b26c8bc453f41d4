"""Ported reference goldens: x2cpg AstTests.scala — Ast.subTreeCopy
semantics (node cloning, edge remapping, order preservation, typed
control-structure edge collections).

The reference's third group ("early AST validation") asserts
SchemaViolationException from the generated flatgraph schema validator;
this engine has no generated schema layer, so those three assertions have
no counterpart (documented deviation)."""

from __future__ import annotations

from joern_spark.cpg.core import Ast, Node


def _build_test_tree():
    foo = Node("CALL", name="foo")
    bar = Node("CALL", name="bar", order=1)
    id_name = Node("IDENTIFIER", name="idname", order=1)
    moo = Node("CALL", name="moo", order=1)
    call_in_call = Node("CALL", name="callincall", order=1)
    leaf = Node("IDENTIFIER", name="leaf", order=1)

    tree = (Ast(foo)
            .with_children([
                Ast(bar).with_child(Ast(id_name))
                        .with_arg_edges(bar, [id_name]),
                Ast(moo)
                .with_child(Ast(call_in_call).with_child(Ast(leaf))
                            .with_arg_edges(call_in_call, [leaf]))
                .with_arg_edges(moo, [call_in_call]),
            ])
            .with_arg_edges(foo, [bar, moo]))
    return tree, foo, bar, id_name, moo, call_in_call, leaf


# AstTests.scala:36-43 (copy root node correctly)
def test_copy_root():
    tree, *_, moo, call_in_call, leaf = _build_test_tree()
    copied = tree.sub_tree_copy(moo, 123)
    root = copied.root
    assert root is not moo
    assert root.name == "moo"
    assert root.argument_index == 123


# AstTests.scala:45-56 (copy AST edges correctly)
def test_copy_ast_edges():
    tree, *_, moo, call_in_call, leaf = _build_test_tree()
    copied = tree.sub_tree_copy(moo, 123)
    _, call_in_call_clone, leaf_clone = copied.nodes
    assert call_in_call_clone.order == 1
    assert leaf_clone.order == 1
    (dst,) = [d for s, d in copied.edges if s is call_in_call_clone]
    assert dst is leaf_clone
    assert dst is not leaf
    assert dst.name == "leaf"


# AstTests.scala:58-74 (copy argument edges correctly)
def test_copy_argument_edges():
    tree, *_, moo, call_in_call, leaf = _build_test_tree()
    copied = tree.sub_tree_copy(moo, 123)
    edge1, edge2 = copied.typed["argument"]
    m1, c1 = edge1
    assert m1 is not moo and c1 is not call_in_call
    assert (m1.name, c1.name) == ("moo", "callincall")
    m2, c2 = edge2
    assert (m2.name, c2.name) == ("callincall", "leaf")


# AstTests.scala:76-82 (preserve order of nodes)
def test_copy_preserves_order():
    tree, *_ = _build_test_tree()
    moo = tree.nodes[3]
    copied = tree.sub_tree_copy(moo, 123)
    assert [n.name for n in copied.nodes] == ["moo", "callincall", "leaf"]


# AstTests.scala:85-128 (control-structure edge collections preserved)
def test_control_structure_edges_preserved():
    control = Node("CALL", name="control")
    kinds = ("condition", "true_body", "false_body", "do_body", "try_body",
             "catch_body", "finally_body", "for_init", "for_update",
             "for_body")
    tree = Ast(control)
    for kind in kinds:
        child = Node("CALL", name=kind)
        tree = tree.with_child(Ast(child)).with_typed_edge(
            kind, control, child)
    copied = tree.sub_tree_copy(control)
    for kind in kinds:
        assert len(copied.typed[kind]) == 1, kind
