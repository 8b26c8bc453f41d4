"""Access-path algebra: field/pointer-sensitive tracking elements.

Behavioral port of the reference's access-path machinery (semanticcpg
accesspath/AccessElement.scala, AccessPath.scala — incl. the embedded
`Elements` object/class — and the AccessPathAlgebra.md rules):

- elements: constant member accesses, `?` variable access, `*`
  dereference, `&` address-of, `<i>` pointer shifts, `<?>` variable
  pointer shift;
- normalization: `<0>` vanishes, `<i> <j>` fuses to `<i+j>`, `<?>`
  absorbs shifts, `& *` and `* &` collapse (the latter is "WRONG but
  useful" — kept for parity, AccessPath.scala:344-347);
- concatenation collapses at the boundary with the same rules;
- ``matchAndDiff`` classifies a tracked path against an observed one
  (NO/EXACT/PREFIX/EXTENDED, each with VARIABLE_* overtaint variants)
  and returns the remainder diff, inverting invertible tails;
- ``match_full`` splits into stepOverPath / stepIntoPath /
  extensionDiff with exclusion bookkeeping.

The JS engine tracks fields through its member-flow semantics
(cpg/semantics.py); this algebra is the engine-level component the
reference uses for C-like frontends and is provided for parity and for
binary-payload analyses where pointer arithmetic appears.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum, auto
from typing import Iterable, Optional


class AccessElement:
    __slots__ = ("name", "kind")

    def __init__(self, name: str, kind: int):
        self.name = name
        self.kind = kind

    def __repr__(self):
        return self.name

    def __eq__(self, other):
        return (isinstance(other, AccessElement)
                and self.kind == other.kind and self.name == other.name)

    def __hash__(self):
        return self.kind + hash(self.name)

    def compare_to(self, other: "AccessElement") -> int:
        if self.kind != other.kind:
            return -1 if self.kind < other.kind else 1
        if self.name == other.name:
            return 0
        return -1 if self.name < other.name else 1


class ConstantAccess(AccessElement):
    __slots__ = ("constant",)

    def __init__(self, constant: str):
        super().__init__(constant, 0x01010101)
        self.constant = constant


VariableAccess = AccessElement("?", 0x02020202)
VariablePointerShift = AccessElement("<?>", 0x03030303)
IndirectionAccess = AccessElement("*", 0x04040404)
AddressOf = AccessElement("&", 0x05050505)


class PointerShift(AccessElement):
    __slots__ = ("logical_offset",)

    def __init__(self, logical_offset: int):
        super().__init__(f"<{logical_offset}>", 0x06060606)
        self.logical_offset = logical_offset


class Elements:
    """Immutable element sequence with the algebra's normalization."""

    __slots__ = ("elements",)

    def __init__(self, elements: tuple = ()):
        self.elements = tuple(elements)

    # -- factories ----------------------------------------------------------
    @staticmethod
    def empty() -> "Elements":
        return _EMPTY

    @staticmethod
    def unnormalized(elems: Iterable[AccessElement]) -> "Elements":
        t = tuple(elems)
        return Elements(t) if t else _EMPTY

    @staticmethod
    def normalized(elems: Iterable[AccessElement]) -> "Elements":
        """destructiveNormalized (AccessPath.scala:319-356)."""
        out: list[AccessElement] = []
        for e in elems:
            if isinstance(e, PointerShift) and e.logical_offset == 0:
                continue
            if not out:
                out.append(e)
                continue
            last = out[-1]
            if isinstance(last, PointerShift) and isinstance(e, PointerShift):
                new_shift = last.logical_offset + e.logical_offset
                if new_shift != 0:
                    out[-1] = PointerShift(new_shift)
                else:
                    out.pop()
            elif last is VariablePointerShift and (
                    isinstance(e, PointerShift) or e is VariablePointerShift):
                pass
            elif isinstance(last, PointerShift) and e is VariablePointerShift:
                out[-1] = VariablePointerShift
            elif last is AddressOf and e is IndirectionAccess:
                out.pop()
            elif last is IndirectionAccess and e is AddressOf:
                out.pop()  # WRONG but useful (AccessPath.scala:344-347)
            else:
                out.append(e)
        return Elements.unnormalized(out)

    @staticmethod
    def inverted(elems: Iterable[AccessElement]) -> "Elements":
        out = []
        for e in reversed(tuple(elems)):
            if e is AddressOf:
                out.append(IndirectionAccess)
            elif e is IndirectionAccess:
                out.append(AddressOf)
            elif isinstance(e, PointerShift):
                out.append(PointerShift(-e.logical_offset))
            elif e is VariablePointerShift:
                out.append(VariablePointerShift)
            else:
                raise ValueError(f"Cannot invert {list(elems)}")
        return Elements.unnormalized(out)

    # -- predicates ---------------------------------------------------------
    @property
    def is_empty(self) -> bool:
        return not self.elements

    def no_overtaint(self, start: int = 0, until: "int | None" = None) -> bool:
        until = len(self.elements) if until is None else until
        for e in self.elements[start:until]:
            if e is VariablePointerShift or e is VariableAccess:
                return False
        return True

    def invertible_tail_length(self) -> int:
        i = 0
        n = len(self.elements) - 1
        while n - i > -1:
            e = self.elements[n - i]
            if e is AddressOf or e is VariablePointerShift \
                    or isinstance(e, PointerShift):
                i += 1
            else:
                return i
        return i

    def starts_with(self, other: "Elements") -> bool:
        return self.elements[: len(other.elements)] == other.elements

    # -- algebra ------------------------------------------------------------
    def concat(self, other: "Elements") -> "Elements":
        """Elements.++ (AccessPath.scala:393-435): collapse at the
        boundary only."""
        if not self.elements:
            return other
        if not other.elements:
            return self
        left = list(self.elements)
        right = list(other.elements)
        buf: Optional[AccessElement] = None
        idx = 0
        until = min(len(left), len(right))
        while idx < until:
            a = left[len(left) - idx - 1]
            b = right[idx]
            if (a is AddressOf and b is IndirectionAccess) or \
                    (a is IndirectionAccess and b is AddressOf):
                idx += 1
                continue
            if (a is VariablePointerShift or isinstance(a, PointerShift)) \
                    and (b is VariablePointerShift
                         or isinstance(b, PointerShift)):
                if a is VariablePointerShift or b is VariablePointerShift:
                    buf = VariablePointerShift
                    idx += 1
                    break
                new_offset = a.logical_offset + b.logical_offset
                idx += 1
                if new_offset != 0:
                    buf = PointerShift(new_offset)
                    break
                continue  # shifts cancelled exactly — keep collapsing
            break
        mid = [buf] if buf is not None else []
        return Elements.unnormalized(
            left[: len(left) - idx] + mid + right[idx:])

    def compare_to(self, other: "Elements") -> int:
        for a, b in zip(self.elements, other.elements):
            c = a.compare_to(b)
            if c != 0:
                return c
        if len(self.elements) > len(other.elements):
            return 1
        if len(self.elements) < len(other.elements):
            return -1
        return 0

    def __eq__(self, other):
        return isinstance(other, Elements) and self.elements == other.elements

    def __hash__(self):
        return hash(self.elements)

    def __repr__(self):
        return f"Elements({','.join(map(repr, self.elements))})"


_EMPTY = Elements()


class MatchResult(Enum):
    NO_MATCH = auto()
    EXACT_MATCH = auto()
    VARIABLE_EXACT_MATCH = auto()
    PREFIX_MATCH = auto()
    VARIABLE_PREFIX_MATCH = auto()
    EXTENDED_MATCH = auto()
    VARIABLE_EXTENDED_MATCH = auto()


@dataclass
class FullMatchResult:
    """matchFull split (AccessPath.scala:229-256)."""
    step_over_path: "AccessPath | None"
    step_into_path: "AccessPath | None"
    extension_diff: Elements

    @property
    def has_match(self) -> bool:
        return self.step_into_path is not None


def _is_extension_excluded(exclusions, extension: Elements) -> bool:
    return any(extension.starts_with(e) for e in exclusions)


class AccessPath:
    __slots__ = ("elements", "exclusions")

    def __init__(self, elements: Elements = _EMPTY,
                 exclusions: "tuple[Elements, ...]" = ()):
        self.elements = elements
        self.exclusions = tuple(exclusions)

    def __eq__(self, other):
        return (isinstance(other, AccessPath)
                and self.elements == other.elements
                and self.exclusions == other.exclusions)

    def __hash__(self):
        return (hash(self.elements) + hash(self.exclusions)) ^ 0x404F92AB

    def __repr__(self):
        return f"AccessPath({self.elements!r}, {list(self.exclusions)!r})"

    def is_extension_excluded(self, extension: Elements) -> bool:
        return _is_extension_excluded(self.exclusions, extension)

    def extend(self, other: "Elements | AccessPath") -> "AccessPath | None":
        """`++` (AccessPath.scala:80-92)."""
        if isinstance(other, AccessPath):
            base = self.extend(other.elements)
            if base is None:
                return None
            for ex in other.exclusions:
                base = base._add_exclusion(ex)
            return base
        if self.is_extension_excluded(other):
            return None
        return AccessPath(self.elements.concat(other),
                          self._truncate_exclusions(other).exclusions)

    # -- match_and_diff (AccessPath.scala:126-196) --------------------------
    def match_and_diff(self, other: Elements) -> "tuple[MatchResult, Elements]":
        this_el = self.elements.elements
        other_el = other.elements
        this_tail = self.elements.invertible_tail_length()
        other_tail = other.invertible_tail_length()
        this_head = len(this_el) - this_tail
        other_head = len(other_el) - other_tail

        cmp_until = min(this_head, other_head)
        idx = 0
        over_tainted = False
        while idx < cmp_until:
            a, b = this_el[idx], other_el[idx]
            variable_pair = (
                (a is VariableAccess and b is VariableAccess)
                or (isinstance(a, ConstantAccess) and b is VariableAccess)
                or (a is VariableAccess and isinstance(b, ConstantAccess))
                or (a is VariablePointerShift and b is VariablePointerShift)
                or (isinstance(a, PointerShift) and b is VariablePointerShift)
                or (a is VariablePointerShift and isinstance(b, PointerShift)))
            if variable_pair:
                over_tainted = True
            elif a != b:
                return (MatchResult.NO_MATCH, _EMPTY)
            idx += 1

        # greedy matching of the invertible tails (:155-174)
        minlen = min(len(this_el), len(other_el))
        while idx < minlen:
            a, b = this_el[idx], other_el[idx]
            shiftish_a = isinstance(a, PointerShift) or a is VariablePointerShift
            shiftish_b = isinstance(b, PointerShift) or b is VariablePointerShift
            if shiftish_a and shiftish_b and (a is VariablePointerShift
                                              or b is VariablePointerShift):
                over_tainted = True
                idx += 1
            elif a == b:
                idx += 1
            else:
                break

        if this_head >= other_head:
            diff = Elements.inverted(other_el[idx:]).concat(
                Elements.unnormalized(this_el[idx:]))
            over_tainted |= not other.no_overtaint(other_head)
            if this_head == other_head:
                return ((MatchResult.VARIABLE_EXACT_MATCH if over_tainted
                         else MatchResult.EXACT_MATCH), diff)
            return ((MatchResult.VARIABLE_PREFIX_MATCH if over_tainted
                     else MatchResult.PREFIX_MATCH), diff)
        diff = Elements.inverted(this_el[idx:]).concat(
            Elements.unnormalized(other_el[idx:]))
        over_tainted |= (not self.elements.no_overtaint(this_head)
                         or not other.no_overtaint(other_head))
        if over_tainted:
            return (MatchResult.VARIABLE_EXTENDED_MATCH, diff)
        if self.is_extension_excluded(diff):
            return (MatchResult.NO_MATCH, _EMPTY)
        return (MatchResult.EXTENDED_MATCH, diff)

    # -- match_full (AccessPath.scala:94-124) -------------------------------
    def match_full(self, other: "Elements | AccessPath") -> FullMatchResult:
        if isinstance(other, AccessPath):
            res = self.match_full(other.elements)
            if (res.extension_diff.is_empty and res.step_into_path is not None
                    and other.is_extension_excluded(
                        res.step_into_path.elements)):
                return FullMatchResult(self, None, _EMPTY)
            return res
        match_res, match_diff = self.match_and_diff(other)
        M = MatchResult
        if match_res is M.NO_MATCH:
            return FullMatchResult(self, None, _EMPTY)
        if match_res in (M.PREFIX_MATCH, M.EXACT_MATCH):
            return FullMatchResult(
                None, AccessPath(match_diff, self.exclusions), _EMPTY)
        if match_res in (M.VARIABLE_PREFIX_MATCH, M.VARIABLE_EXACT_MATCH):
            return FullMatchResult(
                self, AccessPath(match_diff, self.exclusions), _EMPTY)
        if match_res is M.EXTENDED_MATCH:
            return FullMatchResult(
                self._add_exclusion(match_diff),
                AccessPath(_EMPTY, self.exclusions)
                ._truncate_exclusions(match_diff),
                match_diff)
        # VARIABLE_EXTENDED_MATCH
        return FullMatchResult(
            self,
            AccessPath(_EMPTY, self.exclusions)
            ._truncate_exclusions(match_diff),
            match_diff)

    # -- exclusions (AccessPath.scala:198-221) ------------------------------
    def _truncate_exclusions(self, compare_exclusion: Elements) -> "AccessPath":
        if not self.exclusions:
            return self
        size = len(compare_exclusion.elements)
        new_exclusions = sorted(
            (Elements.normalized(e.elements[size:])
             for e in self.exclusions if e.starts_with(compare_exclusion)),
            key=_sort_key)
        return AccessPath(self.elements, tuple(new_exclusions))

    def _add_exclusion(self, new_exclusion: Elements) -> "AccessPath":
        if not new_exclusion.no_overtaint():
            return self
        n = new_exclusion.invertible_tail_length()
        ex = Elements.unnormalized(
            new_exclusion.elements[: len(new_exclusion.elements) - n])
        if self.is_extension_excluded(ex):
            return self
        unshadowed = [e for e in self.exclusions if not e.starts_with(ex)]
        return AccessPath(self.elements,
                          tuple(sorted(unshadowed + [ex], key=_sort_key)))


import functools  # noqa: E402


def _sort_key(e: Elements):
    return functools.cmp_to_key(Elements.compare_to)(e)


# ---------------------------------------------------------------------------
# Tracked bases + CPG-to-access-path conversion (dataflowengineoss
# queryengine/AccessPathUsage.scala + semanticcpg AccessPathHandling.scala)
# ---------------------------------------------------------------------------

class _TrackedSingleton:
    __slots__ = ("name",)

    def __init__(self, name):
        self.name = name

    def __repr__(self):
        return self.name


TrackedFormalReturn = _TrackedSingleton("TrackedFormalReturn")
TrackedUnknown = _TrackedSingleton("TrackedUnknown")


@dataclass(frozen=True)
class TrackedNamedVariable:
    name: str


@dataclass(frozen=True)
class TrackedLiteral:
    node: object


@dataclass(frozen=True)
class TrackedMethod:
    node: object


@dataclass(frozen=True)
class TrackedTypeRef:
    node: object


@dataclass(frozen=True)
class TrackedReturnValue:
    call: object


_LEAF_TRACKED = {
    "METHOD_PARAMETER_IN": lambda n: TrackedNamedVariable(n.name),
    "METHOD_PARAMETER_OUT": lambda n: TrackedNamedVariable(n.name),
    "IDENTIFIER": lambda n: TrackedNamedVariable(n.name),
    "LITERAL": lambda n: TrackedLiteral(n),
    "METHOD_REF": lambda n: TrackedMethod(n),
    "TYPE_REF": lambda n: TrackedTypeRef(n),
    "RETURN": lambda n: TrackedFormalReturn,
    "METHOD_RETURN": lambda n: TrackedFormalReturn,
    "UNKNOWN": lambda n: TrackedUnknown,
    "CONTROL_STRUCTURE": lambda n: TrackedUnknown,
    # FieldIdentifiers are only fake arguments, hence not tracked
    "FIELD_IDENTIFIER": lambda n: TrackedUnknown,
}


def _string_token(arg2, allow_identifier: bool) -> AccessElement:
    if arg2 is None:
        return VariableAccess
    if arg2.label == "LITERAL":
        return ConstantAccess(arg2.code)
    if arg2.label == "FIELD_IDENTIFIER":
        return ConstantAccess(arg2.canonical_name)
    if allow_identifier and arg2.label == "IDENTIFIER":
        return ConstantAccess(arg2.name)
    return VariableAccess


def _int_token(arg2) -> AccessElement:
    text = None
    if arg2 is not None and arg2.label == "LITERAL":
        text = arg2.code
    elif arg2 is not None and arg2.label == "FIELD_IDENTIFIER":
        text = arg2.canonical_name
    if text is not None:
        try:
            return PointerShift(int(text))
        except ValueError:
            return VariablePointerShift
    return VariablePointerShift


def _member_access_to_path(cpg, call, tail: list) -> list:
    """AccessPathHandling.memberAccessToPath (reversed-list building)."""
    name = call.name
    arg2 = cpg.argument(call, 2)
    if name in ("<operator>.memberAccess", "<operator>.indirectMemberAccess"):
        if arg2 is not None and arg2.label == "LITERAL":
            el = ConstantAccess(arg2.code)
        elif arg2 is not None and arg2.label == "IDENTIFIER":
            el = ConstantAccess(arg2.name)
        elif arg2 is not None and arg2.name:
            el = ConstantAccess(arg2.name)
        else:
            el = VariableAccess
        return [el] + tail
    if name in ("<operator>.computedMemberAccess",
                "<operator>.indirectComputedMemberAccess"):
        el = (ConstantAccess(arg2.code)
              if arg2 is not None and arg2.label == "LITERAL"
              else VariableAccess)
        return [el] + tail
    if name == "<operator>.indirection":
        return [IndirectionAccess] + tail
    if name == "<operator>.addressOf":
        return [AddressOf] + tail
    if name == "<operator>.fieldAccess":
        return [_string_token(arg2, allow_identifier=True)] + tail
    if name == "<operator>.indexAccess":
        return [_string_token(arg2, allow_identifier=False)] + tail
    if name == "<operator>.indirectFieldAccess":
        return [_string_token(arg2, allow_identifier=True),
                IndirectionAccess] + tail
    if name == "<operator>.indirectIndexAccess":
        return [IndirectionAccess, _int_token(arg2)] + tail
    if name == "<operator>.pointerShift":
        return [_int_token(arg2)] + tail
    if name == "<operator>.getElementPtr":
        return [AddressOf, _string_token(arg2, allow_identifier=True),
                IndirectionAccess] + tail
    return tail


def to_tracked_base_and_access_path(cpg, node):
    """AccessPathUsage.toTrackedBaseAndAccessPathSimple."""
    from joern_spark.cpg.core import GENERIC_MEMBER_ACCESS_NAMES

    def internal(n):
        leaf = _LEAF_TRACKED.get(n.label)
        if leaf is not None:
            return leaf(n), []
        if n.label == "BLOCK":
            exprs = sorted((c for c in cpg.ast_children(n)
                            if c.is_expression and c.label not in
                            ("LOCAL", "METHOD")),
                           key=lambda c: c.order)
            if exprs:
                return internal(exprs[-1])
            return TrackedUnknown, []
        if n.label == "CALL" and n.name not in GENERIC_MEMBER_ACCESS_NAMES:
            return TrackedReturnValue(n), []
        if n.label == "CALL":
            arg1 = cpg.argument(n, 1)
            if arg1 is None:
                return TrackedUnknown, []
            base, tail = internal(arg1)
            return base, _member_access_to_path(cpg, n, tail)
        return TrackedUnknown, []

    base, rev_path = internal(node)
    return base, AccessPath(Elements.normalized(reversed(rev_path)), ())
