"""Ported reference goldens: dataflowengineoss
FullNameSemanticsParserTests.scala against cpg/semloader.parse_semantics.

Representation note: the reference keeps argument names inside
FlowMapping(1, "param1", 2); our FlowSemantic normalizes mappings to
index pairs (JS call sites are positional) and preserves the names on
``sem.arg_names`` — asserted below."""

from __future__ import annotations

from joern_spark.cpg.semantics import PASSTHROUGH
from joern_spark.cpg.semloader import parse_semantics


# FullNameSemanticsParserTests.scala:16-19 (lone name with newline)
def test_lone_method_name_with_newline():
    assert len(parse_semantics('"foo"\n')) == 1


# :21-32 (name followed by mappings)
def test_name_with_mappings():
    (x,) = parse_semantics('"foo" 1->-1 2->3\n')
    assert x.method_full_name == "foo"
    assert x.mappings == [(1, -1), (2, 3)]


# :34-37 (multiple new lines between semantics)
def test_multiple_newlines():
    assert len(parse_semantics('"foo"\n\n\n"bar"')) == 2


# :39-42 (lone name without newline)
def test_lone_method_name_no_newline():
    assert len(parse_semantics('"foo"')) == 1


# :44-52 (skip invalid lines, keep valid ones)
def test_skip_invalid_lines():
    x, y = parse_semantics('"abc"\nfoo\n"bar"')
    assert x.method_full_name == "abc"
    assert y.method_full_name == "bar"


# :54-58 (named argument parameters)
def test_named_argument_parameters():
    (x,) = parse_semantics('"foo" 1 "param1"->2 3-> 2 "param2"')
    assert x.method_full_name == "foo"
    assert x.mappings == [(1, 2), (3, 2)]
    assert x.arg_names == {("src", 0): "param1", ("dst", 1): "param2"}


# :60-64 (passthrough mapping)
def test_passthrough_mapping():
    (x,) = parse_semantics('"foo" PASSTHROUGH 0 -> 0')
    assert x.method_full_name == "foo"
    assert x.mappings == [PASSTHROUGH, (0, 0)]
