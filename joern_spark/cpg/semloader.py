"""`.sem` semantics-file loader — hand parser for the reference's 3-rule
taint-semantics grammar (dataflowengineoss Semantics.g4:1-13, consumed by
FullNameSemanticsParser.scala:14-35), so users can supply custom taint
models as files exactly like the reference's `--semantics` flag.

Format (one semantic per method full name):

    # comment
    "<operator>.myOp" 1->-1 2->-1
    "encrypt" PASSTHROUGH
    "requests.get" 1 "url" -> -1

Named arguments (`NUMBER "name"`) are accepted and preserved on the
mapping for fidelity; the per-document engine keys on positional indices
(FlowSemantic mappings are (src_idx, dst_idx) tuples, −1 = return).
"""

from __future__ import annotations

import re

from joern_spark.cpg.semantics import (
    PASSTHROUGH, FlowSemantic, Semantics, c_flows, operator_flows,
)

_TOKEN = re.compile(
    r'"(?P<quoted>[^"\n]*)"'      # quoted method/arg name
    r'|(?P<number>-?\d+)'
    r'|(?P<passthrough>PASSTHROUGH)'
    r'|(?P<arrow>->)'
    r'|(?P<comment>#[^\n]*)'
    r'|(?P<newline>\n)'
    r'|(?P<ws>[ \t\r\f]+)'
    r'|(?P<other>.)'
)


def _tokens(text: str):
    """Newlines are TOKENS, as in the grammar (NEWLINE before WHITESPACE):
    they disambiguate a dst argName from the next method name — `1 -> -1
    \\n "next"` starts a new semantic, `1 -> -1 "kw"` names the dst arg."""
    for m in _TOKEN.finditer(text):
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind == "other":
            raise ValueError(f"unexpected character {m.group()!r} at offset {m.start()}")
        yield kind, m.group("quoted") if kind == "quoted" else m.group()


def _drop_invalid_lines(text: str) -> str:
    """The reference's ANTLR parser recovers per line — unparseable lines
    are skipped and valid ones still load (FullNameSemanticsParserTests
    "skip invalid lines and still parse valid ones")."""
    kept = []
    for line in text.split("\n"):
        try:
            list(_tokens(line))
        except ValueError:
            continue
        kept.append(line)
    return "\n".join(kept)


def parse_semantics(text: str) -> list[FlowSemantic]:
    """Parse `.sem` text → FlowSemantic list (grammar above)."""
    try:
        toks = list(_tokens(text))
    except ValueError:
        toks = list(_tokens(_drop_invalid_lines(text)))
    out: list[FlowSemantic] = []
    i = 0
    n = len(toks)

    def parse_endpoint():
        nonlocal i
        kind, val = toks[i]
        if kind != "number":
            raise ValueError(f"expected arg index, got {val!r}")
        i += 1
        idx = int(val)
        name = None
        if i < n and toks[i][0] == "quoted":
            name = toks[i][1]
            i += 1
        return idx, name

    while i < n:
        kind, val = toks[i]
        if kind == "newline":
            i += 1
            continue
        if kind != "quoted":
            raise ValueError(f"expected quoted method name, got {val!r}")
        method = val
        i += 1
        mappings = []
        arg_names = {}
        while i < n and toks[i][0] in ("passthrough", "number", "newline"):
            if toks[i][0] == "newline":
                # mappings may continue on following lines until the next
                # quoted method name (singleSemantic: methodName mapping*
                # NEWLINE*)
                i += 1
                continue
            if toks[i][0] == "passthrough":
                mappings.append(PASSTHROUGH)
                i += 1
                continue
            src_idx, src_name = parse_endpoint()
            if i >= n or toks[i][0] != "arrow":
                raise ValueError(f'expected "->" in mapping for {method!r}')
            i += 1
            dst_idx, dst_name = parse_endpoint()
            mappings.append((src_idx, dst_idx))
            if src_name is not None:
                arg_names[("src", len(mappings) - 1)] = src_name
            if dst_name is not None:
                arg_names[("dst", len(mappings) - 1)] = dst_name
        sem = FlowSemantic(method, mappings)
        sem.arg_names = arg_names  # fidelity extra; engine keys on indices
        out.append(sem)
    return out


def parse_semantics_file(path: str) -> list[FlowSemantic]:
    with open(path) as f:
        return parse_semantics(f.read())


def semantics_from_file(path: str, include_defaults: bool = True) -> Semantics:
    """Load a `.sem` file into a Semantics table, custom entries taking
    precedence over the built-in defaults (the reference merges the same
    way: DefaultSemantics ++ user file, later wins by full name)."""
    custom = parse_semantics_file(path)
    if not include_defaults:
        return Semantics(custom)
    return Semantics(operator_flows() + c_flows() + custom)
