"""Ported reference goldens: semanticcpg AccessPathTests.scala —
the access-path algebra (normalization, concatenation with invertible
elements, matchAndDiff classification, matchFull splitting)."""

from __future__ import annotations

from joern_spark.dataflow.accesspath import (
    AccessPath, AddressOf, ConstantAccess, Elements, FullMatchResult,
    IndirectionAccess, MatchResult, PointerShift, VariableAccess,
    VariablePointerShift,
)

V = VariableAccess
I = IndirectionAccess  # noqa: E741
A = AddressOf
VP = VariablePointerShift

NO_MATCH = MatchResult.NO_MATCH
EXACT_MATCH = MatchResult.EXACT_MATCH
VARIABLE_EXACT_MATCH = MatchResult.VARIABLE_EXACT_MATCH
PREFIX_MATCH = MatchResult.PREFIX_MATCH
VARIABLE_PREFIX_MATCH = MatchResult.VARIABLE_PREFIX_MATCH
EXTENDED_MATCH = MatchResult.EXTENDED_MATCH
VARIABLE_EXTENDED_MATCH = MatchResult.VARIABLE_EXTENDED_MATCH


def E(*elems):
    converted = []
    for e in elems:
        if isinstance(e, str):
            converted.append(ConstantAccess(e))
        elif isinstance(e, int):
            converted.append(PointerShift(e))
        else:
            converted.append(e)
    return Elements.normalized(converted)


def AP(elements, exclusions=()):
    return AccessPath(elements, tuple(exclusions))


# AccessPathTests.scala:61-103 (matchAndDiff)
def test_match_and_diff():
    assert AP(E("a")).match_and_diff(E("b")) == (NO_MATCH, E())
    assert AP(E("a", "b")).match_and_diff(E("b", "a")) == (NO_MATCH, E())
    assert AP(E("a", "b")).match_and_diff(E("a", "c")) == (NO_MATCH, E())
    assert AP(E("a", V)).match_and_diff(E("b", V)) == (NO_MATCH, E())
    assert AP(E("a", V)).match_and_diff(E("b")) == (NO_MATCH, E())
    assert AP(E("a")).match_and_diff(E("b", V)) == (NO_MATCH, E())
    assert AP(E("a", V, "b")).match_and_diff(E("b", V, "a")) == (NO_MATCH, E())
    assert AP(E("a", I)).match_and_diff(E(I)) == (NO_MATCH, E())
    assert AP(E("a", I)).match_and_diff(E("a", V)) == (NO_MATCH, E())

    assert AP(E("a", "b")).match_and_diff(E("a")) == (PREFIX_MATCH, E("b"))
    assert AP(E("a", V)).match_and_diff(E("a")) == (PREFIX_MATCH, E(V))

    assert AP(E(V, "a")).match_and_diff(E(V)) == (VARIABLE_PREFIX_MATCH, E("a"))

    assert AP(E("a")).match_and_diff(E("a")) == (EXACT_MATCH, E())
    assert AP(E("a", "b")).match_and_diff(E("a", "b")) == (EXACT_MATCH, E())

    assert AP(E("a")).match_and_diff(E(V)) == (VARIABLE_EXACT_MATCH, E())
    assert AP(E(V)).match_and_diff(E("a")) == (VARIABLE_EXACT_MATCH, E())
    assert AP(E("a", "b")).match_and_diff(E("a", V)) == (VARIABLE_EXACT_MATCH, E())
    assert AP(E(V, "b")).match_and_diff(E(V, "b")) == (VARIABLE_EXACT_MATCH, E())
    assert AP(E("a", V)).match_and_diff(E(V, V)) == (VARIABLE_EXACT_MATCH, E())
    assert AP(E(V, "a")).match_and_diff(E(V, V)) == (VARIABLE_EXACT_MATCH, E())
    assert AP(E(V, V)).match_and_diff(E("a", V)) == (VARIABLE_EXACT_MATCH, E())
    assert AP(E(V, V)).match_and_diff(E(V, "a")) == (VARIABLE_EXACT_MATCH, E())

    assert AP(E()).match_and_diff(E("a")) == (EXTENDED_MATCH, E("a"))
    assert AP(E("a")).match_and_diff(E("a", "b")) == (EXTENDED_MATCH, E("b"))
    assert AP(E("a")).match_and_diff(E("a", V)) == (EXTENDED_MATCH, E(V))

    assert AP(E("a")).match_and_diff(E(V, "b")) == (VARIABLE_EXTENDED_MATCH, E("b"))

    assert AP(E("a"), [E("b")]).match_and_diff(E("a", "b", "c")) == (NO_MATCH, E())
    assert AP(E("a"), [E("b")]).match_and_diff(E("a", "b", V)) == (NO_MATCH, E())
    assert AP(E("a"), [E("b", "c")]).match_and_diff(E("a", "b")) == (EXTENDED_MATCH, E("b"))

    assert AP(E("a"), [E("b")]).match_and_diff(E("a", "b")) == (NO_MATCH, E())
    assert AP(E("a"), [E("c")]).match_and_diff(E("a", "b")) == (EXTENDED_MATCH, E("b"))
    assert AP(E(V), [E("b")]).match_and_diff(E("a", "b")) == (VARIABLE_EXTENDED_MATCH, E("b"))


# AccessPathTests.scala:104-117 (normalization and concatenation)
def test_normalization_and_concatenation():
    assert E(A, 0, I) == E()
    assert E(2, -1, "a", I, 3, -5, 2, A) == E(1, "a")
    assert (E(2).concat(E(-1)).concat(E("a")).concat(E(I)).concat(E(3))
            .concat(E(-5)).concat(E(2)).concat(E(A))) == E(1, "a")

    assert E("a", 3, A, 4, I, 4, I).concat(E(A, -4, A, -4, I, -3)) == E("a")
    assert Elements.inverted(E("a", 3, A, 4, I, 4, I).elements[1:]) \
        == E(A, -4, A, -4, I, -3)
    assert E(A, 1, VP, 2, I) == E(A, VP, I)
    assert E(I, "a", A).concat(E(I)) == E(I, "a")  # GEP


# AccessPathTests.scala:118-155 (matchAndDiff with inverses)
def test_match_and_diff_with_inverses():
    assert AP(E("a", 1, A, 2), [E("c")]).match_and_diff(E("a", 8, A, 16)) \
        == (EXACT_MATCH, E(-16, I, -7, A, 2))
    assert AP(E("a", 1, A, 2), [E("c")]).match_and_diff(E("a", 8, A, 16, I)) \
        == (EXTENDED_MATCH, E(-2, I, 7, A, 16, I))
    assert AP(E("a", 1, A, 2, I), [E("c")]).match_and_diff(E("a", 8, A, 16)) \
        == (PREFIX_MATCH, E(-16, I, -7, A, 2, I))

    assert AP(E("a", VP, A, 2), [E("c")]).match_and_diff(E("a", 8, A, 16, I)) \
        == (VARIABLE_EXTENDED_MATCH, E(14, I))
    assert AP(E("a", 1, A, 2), [E("c")]).match_and_diff(E("a", VP, A, 16, I)) \
        == (VARIABLE_EXTENDED_MATCH, E(14, I))
    assert AP(E("a", 1, A, 2), [E("c")]).match_and_diff(E("a", "b", 8, A, 16)) \
        == (EXTENDED_MATCH, E(-2, I, -1, "b", 8, A, 16))

    assert AP(E("a", 1, "b", A, 2), [E("c")]).match_and_diff(E("a", 8, A, 16)) \
        == (PREFIX_MATCH, E(-16, I, -7, "b", A, 2))
    assert AP(E("a", VP, "b", A, 2), [E("c")]).match_and_diff(E("a", 8, A, 16)) \
        == (VARIABLE_PREFIX_MATCH, E(-16, I, "b", A, 2))
    assert AP(E("a", 1, "b", A, 2), [E("c")]).match_and_diff(E("a", VP, A, 16)) \
        == (VARIABLE_PREFIX_MATCH, E(-16, I, "b", A, 2))

    assert AP(E("a", 1, A, 2), [E(-2, I)]).match_and_diff(E("a", "b", 8, A, 16)) \
        == (NO_MATCH, E())
    # suboptimal (kept as the reference does):
    assert AP(E("a", 1, A, 2), [E(-2, I)]).match_and_diff(E("a", VP, A, 16, I)) \
        == (VARIABLE_EXTENDED_MATCH, E(14, I))


# AccessPathTests.scala:157-185 (matchFull)
def test_match_full():
    # no match
    assert AP(E("a", "b"), [E("c")]).match_full(AP(E("C"))) == \
        FullMatchResult(step_over_path=AP(E("a", "b"), [E("c")]),
                        step_into_path=None, extension_diff=E())
    # prefix
    assert AP(E("a", "b"), [E("c")]).match_full(E("a")) == \
        FullMatchResult(step_over_path=None,
                        step_into_path=AP(E("b"), [E("c")]),
                        extension_diff=E())
    # extension
    assert AP(E("a", "b"), [E("c", "d")]).match_full(AP(E("a", "b", "c"))) == \
        FullMatchResult(step_over_path=AP(E("a", "b"), [E("c")]),
                        step_into_path=AP(E(), [E("d")]),
                        extension_diff=E("c"))
    # rhs has exclusions
    assert AP(E("a", "b"), [E("c")]).match_full(AP(E("a"), [E("b")])) == \
        FullMatchResult(step_over_path=AP(E("a", "b"), [E("c")]),
                        step_into_path=None, extension_diff=E())
