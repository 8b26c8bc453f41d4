"""Flow semantics: per-method taint-transfer models.

Behavioral port of the reference's semantics model
(dataflowengineoss semanticsloader/Semantics.scala:88-173 and
DefaultSemantics.scala:24-114): a FlowSemantic maps argument indices to
argument indices (−1 = return value); PASSTHROUGH means each arg taints
itself and the return, without cross-taint.

On Spark this is a broadcast dimension table; inside the per-document
engine it is a plain dict.
"""

from __future__ import annotations

PASSTHROUGH = ("PASSTHROUGH",)


class FlowSemantic:
    __slots__ = ("method_full_name", "mappings", "regex", "arg_names")

    def __init__(self, method_full_name: str, mappings, regex: bool = False):
        self.method_full_name = method_full_name
        # mappings: list of (src_idx, dst_idx) or PASSTHROUGH
        self.mappings = list(mappings)
        self.regex = regex
        # optional named-argument fidelity from the .sem loader:
        # {("src"|"dst", mapping_index): name}
        self.arg_names = {}

    def is_used(self, arg_index: int) -> bool:
        if not self.mappings:
            return False
        for m in self.mappings:
            if m == PASSTHROUGH:
                if arg_index != 0:
                    return True
            elif m[0] == arg_index:
                return True
        return False

    def is_defined(self, arg_index: int) -> bool:
        if not self.mappings:
            return False
        for m in self.mappings:
            if m == PASSTHROUGH:
                if arg_index != 0:
                    return True
            elif m[1] == arg_index:
                return True
        return False

    def has_flow(self, src_index: int, dst_index: int) -> bool:
        if not self.mappings:
            return False
        for m in self.mappings:
            if m == PASSTHROUGH:
                if src_index == dst_index:
                    return True
            elif m[0] == src_index and m[1] == dst_index:
                return True
        return False

    def flows_to_return(self) -> bool:
        for m in self.mappings:
            if m == PASSTHROUGH:
                return True
            if m[1] == -1:
                return True
        return False


def _f(name, pairs):
    return FlowSemantic(name, pairs)


def _ptf(name, pairs=()):
    return FlowSemantic(name, list(pairs) + [PASSTHROUGH])


def operator_flows() -> list[FlowSemantic]:
    """DefaultSemantics.operatorFlows (DefaultSemantics.scala:24-71)."""
    assignment_variant = [(2, 1), (1, 1), (2, -1)]
    out = [
        _f("<operator>.addition", [(1, -1), (2, -1)]),
        _f("<operator>.addressOf", [(1, -1)]),
        _f("<operator>.assignment", [(2, 1), (2, -1)]),
        _f("<operator>.cast", [(1, -1), (2, -1)]),
        _f("<operator>.computedMemberAccess", [(1, -1)]),
        _f("<operator>.conditional", [(2, -1), (3, -1)]),
        _f("<operator>.elvis", [(1, -1), (2, -1)]),
        _f("<operator>.notNullAssert", [(1, -1)]),
        _f("<operator>.fieldAccess", [(1, -1)]),
        _f("<operator>.getElementPtr", [(1, -1)]),
        _ptf("<operator>.modulo"),
        _ptf("<operator>.arrayInitializer"),
        _f("<operator>.incBy", [(1, 1), (2, 1), (3, 1), (4, 1)]),
        _f("<operator>.indexAccess", [(1, -1)]),
        _f("<operator>.indirectComputedMemberAccess", [(1, -1)]),
        _f("<operator>.indirectFieldAccess", [(1, -1)]),
        _f("<operator>.indirectIndexAccess", [(1, -1), (2, 1)]),
        _f("<operator>.indirectMemberAccess", [(1, -1)]),
        _f("<operator>.indirection", [(1, -1)]),
        _f("<operator>.memberAccess", [(1, -1)]),
        _f("<operator>.pointerShift", [(1, -1)]),
        _f("<operator>.postDecrement", [(1, 1), (1, -1)]),
        _f("<operator>.postIncrement", [(1, 1), (1, -1)]),
        _f("<operator>.preDecrement", [(1, 1), (1, -1)]),
        _f("<operator>.preIncrement", [(1, 1), (1, -1)]),
        _f("<operator>.sizeOf", []),
        _ptf("<operator>.tupleLiteral"),
        _ptf("<operator>.dictLiteral"),
        _ptf("<operator>.setLiteral"),
        _ptf("<operator>.listLiteral"),
    ]
    for name in (
        "<operator>.assignmentAnd", "<operator>.assignmentArithmeticShiftRight",
        "<operator>.assignmentDivision", "<operator>.assignmentExponentiation",
        "<operator>.assignmentLogicalShiftRight", "<operator>.assignmentMinus",
        "<operator>.assignmentModulo", "<operator>.assignmentMultiplication",
        "<operator>.assignmentOr", "<operator>.assignmentPlus",
        "<operator>.assignmentShiftLeft", "<operator>.assignmentXor",
    ):
        out.append(_f(name, assignment_variant))
    return out


def c_flows() -> list[FlowSemantic]:
    """DefaultSemantics.cFlows — common external C stdlib calls."""
    return [
        _f("abs", [(1, 1), (1, -1)]),
        _f("abort", []),
        _f("asctime", [(1, 1), (1, -1)]),
        _f("asctime_r", [(1, 1), (1, -1)]),
        _f("atof", [(1, 1), (1, -1)]),
        _f("atoi", [(1, 1), (1, -1)]),
        _f("atol", [(1, 1), (1, -1)]),
        _f("calloc", [(1, -1), (2, -1)]),
        _f("ceil", [(1, 1), (1, 1)]),
        _f("clock", []),
        _f("ctime", [(1, -1)]),
        _f("ctime64", [(1, -1)]),
        _f("ctime_r", [(1, -1)]),
        _f("ctime64_r", [(1, -1)]),
        _f("difftime", [(1, -1), (2, -1)]),
        _f("difftime64", [(1, -1), (2, -1)]),
        _ptf("div"),
        _f("exit", [(1, 1)]),
        _f("exp", [(1, -1)]),
        _f("fabs", [(1, -1)]),
        _f("fclose", [(1, 1), (1, -1)]),
        _f("fdopen", [(1, -1), (2, -1)]),
        _f("feof", [(1, 1), (1, -1)]),
        _f("ferror", [(1, 1), (1, -1)]),
        _f("fflush", [(1, 1), (1, -1)]),
        _f("fgetc", [(1, 1), (1, -1)]),
        _f("fwrite", [(1, 1), (1, -1), (2, -1), (3, -1), (4, -1)]),
        _f("free", [(1, 1)]),
        _f("getc", [(1, 1)]),
        _f("scanf", [(2, 2)]),
        _f("strcmp", [(1, 1), (1, -1), (2, 2), (2, -1)]),
        _f("strlen", [(1, 1), (1, -1)]),
        _f("strncpy", [(1, 1), (2, 2), (3, 3), (1, -1), (2, -1)]),
        _f("strncat", [(1, 1), (2, 2), (3, 3), (1, -1), (2, -1)]),
    ]


class Semantics:
    def __init__(self, flows: list[FlowSemantic]):
        self.exact = {f.method_full_name: f for f in flows if not f.regex}
        self.regexes = [f for f in flows if f.regex]
        # lookup memo incl. regex misses (None): the same full names recur
        # across every document a worker processes.  Bounded — the
        # default_semantics() instance is process-global and a long-lived
        # streaming worker sees unbounded distinct full names.
        self._memo: dict[str, FlowSemantic | None] = {}
        self._memo_cap = 16384

    def for_method_full_name(self, full_name: str):
        f = self.exact.get(full_name)
        if f is not None:
            return f
        try:
            return self._memo[full_name]
        except KeyError:
            pass
        import re
        out = None
        for r in self.regexes:
            if re.fullmatch(r.method_full_name, full_name):
                out = r
                break
        if len(self._memo) >= self._memo_cap:
            self._memo.clear()  # cheap wholesale reset beats LRU bookkeeping
        self._memo[full_name] = out
        return out


_DEFAULT: Semantics | None = None


def default_semantics() -> Semantics:
    """Shared immutable instance — Engine/scan construct one per document;
    rebuilding the ~150 FlowSemantic table each time was measurable."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = Semantics(operator_flows() + c_flows())
    return _DEFAULT
