"""Pure-Python ECMAScript-subset parser producing Babel-shaped AST dicts.

Replaces the reference's external `astgen` (Babel) subprocess
(jssrc2cpg/.../utils/AstGenRunner.scala:240-300): each node is a dict with
`type`, `start`, `end` (absolute char offsets) and Babel-compatible field
names, so the CPG lowering can follow the reference's BabelNodeInfo contract
(BabelJsonParser.scala:10-50) without a JS runtime.  Fresh implementation —
grammar coverage targets the constructs exercised by the reference's test
suites (functions, var/let/const, destructuring, classes (basic), control
flow, calls/members/ops, arrows, templates, spread/rest).

Runs inside Arrow-batched UDFs — must be dependency-free and fast enough
for ~KB-sized scripts.
"""

from __future__ import annotations

KEYWORDS = {
    "var", "let", "const", "function", "return", "if", "else", "while", "do",
    "for", "in", "of", "new", "typeof", "instanceof", "void", "delete",
    "null", "true", "false", "this", "class", "extends", "static", "super",
    "break", "continue", "switch", "case", "default", "throw", "try",
    "catch", "finally", "import", "export", "from", "as", "await", "yield",
    "with",
}

PUNCT = [
    ">>>=", "...", "===", "!==", "**=", "<<=", ">>=", ">>>", "&&=", "||=", "??=",
    "=>", "==", "!=", "<=", ">=", "&&", "||", "??", "++", "--", "+=", "-=",
    "*=", "/=", "%=", "&=", "|=", "^=", "**", "<<", ">>", "?.",
    "{", "}", "(", ")", "[", "]", ";", ",", "<", ">", "+", "-", "*", "/",
    "%", "&", "|", "^", "!", "~", "?", ":", "=", ".", "@",
]
# index by first char, longest-first (tokenizer tries only relevant ones)
_PUNCT_BY_FIRST: dict[str, list[str]] = {}
for _p in PUNCT:
    _PUNCT_BY_FIRST.setdefault(_p[0], []).append(_p)
for _lst in _PUNCT_BY_FIRST.values():
    _lst.sort(key=len, reverse=True)

ID_START = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_$")
ID_CONT = ID_START | set("0123456789")


class Token:
    __slots__ = ("kind", "value", "start", "end", "nl_before")

    def __init__(self, kind, value, start, end, nl_before):
        self.kind = kind  # id | num | str | template | regex | punct | kw | eof
        self.value = value
        self.start = start
        self.end = end
        self.nl_before = nl_before

    def __repr__(self):  # pragma: no cover
        return f"Token({self.kind},{self.value!r}@{self.start})"


class ParseError(Exception):
    pass


def tokenize(src: str) -> list[Token]:
    toks: list[Token] = []
    i = 0
    n = len(src)
    nl = False

    def prev_significant():
        return toks[-1] if toks else None

    while i < n:
        c = src[i]
        if c in " \t\r\f\v":
            i += 1
            continue
        if c == "\n":
            nl = True
            i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "/":
            j = src.find("\n", i)
            i = n if j == -1 else j
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            if "\n" in src[i : (j if j != -1 else n)]:
                nl = True
            i = n if j == -1 else j + 2
            continue
        start = i
        if c in ID_START:
            i += 1
            while i < n and src[i] in ID_CONT:
                i += 1
            word = src[start:i]
            kind = "kw" if word in KEYWORDS else "id"
            toks.append(Token(kind, word, start, i, nl))
            nl = False
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            i += 1
            if c == "0" and i < n and src[i] in "xXoObB":
                i += 1
                while i < n and (src[i] in ID_CONT):
                    i += 1
            else:
                while i < n and (src[i].isdigit() or src[i] in ".eE" or
                                 (src[i] in "+-" and src[i - 1] in "eE")):
                    i += 1
                while i < n and src[i] in ID_CONT:  # bigint suffix etc.
                    i += 1
            toks.append(Token("num", src[start:i], start, i, nl))
            nl = False
            continue
        if c in "'\"":
            quote = c
            i += 1
            while i < n and src[i] != quote:
                if src[i] == "\\":
                    i += 1
                i += 1
            i = min(i + 1, n)
            toks.append(Token("str", src[start:i], start, i, nl))
            nl = False
            continue
        if c == "`":
            # template literal: tokenized whole (with nested ${} scanning)
            i += 1
            depth = 0
            while i < n:
                if src[i] == "\\":
                    i += 2
                    continue
                if src[i] == "`" and depth == 0:
                    i += 1
                    break
                if src[i] == "$" and i + 1 < n and src[i + 1] == "{":
                    depth += 1
                    i += 2
                    continue
                if src[i] == "}" and depth > 0:
                    depth -= 1
                i += 1
            toks.append(Token("template", src[start:i], start, i, nl))
            nl = False
            continue
        if c == "/":
            # regex vs division: regex if prev token can't end an expression
            prev = prev_significant()
            regex_ok = prev is None or (
                prev.kind == "punct" and prev.value not in (")", "]", "}")
            ) or (prev.kind == "kw" and prev.value not in ("this", "null", "true", "false", "super"))
            if regex_ok:
                j = i + 1
                in_class = False
                while j < n:
                    if src[j] == "\\":
                        j += 2
                        continue
                    if src[j] == "[":
                        in_class = True
                    elif src[j] == "]":
                        in_class = False
                    elif src[j] == "/" and not in_class:
                        break
                    elif src[j] == "\n":
                        break
                    j += 1
                if j < n and src[j] == "/":
                    j += 1
                    while j < n and src[j] in ID_CONT:
                        j += 1
                    toks.append(Token("regex", src[start:j], start, j, nl))
                    nl = False
                    i = j
                    continue
        for p in _PUNCT_BY_FIRST.get(c, ()):
            if src.startswith(p, i):
                # `?.` followed by digit is `?` then `.`(decimal) — ignore edge case
                toks.append(Token("punct", p, start, i + len(p), nl))
                i += len(p)
                break
        else:
            # Unknown char: skip it
            i += 1
            continue
        nl = False
    toks.append(Token("eof", "", n, n, True))
    return toks


ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "**=", "&=", "|=", "^=",
              "<<=", ">>=", ">>>=", "&&=", "||=", "??="}

# binary operator precedence (higher binds tighter)
BIN_PREC = {
    "??": 1,
    "||": 2, "&&": 3, "|": 4, "^": 5, "&": 6,
    "==": 7, "!=": 7, "===": 7, "!==": 7,
    "<": 8, ">": 8, "<=": 8, ">=": 8, "in": 8, "instanceof": 8,
    "<<": 9, ">>": 9, ">>>": 9,
    "+": 10, "-": 10,
    "*": 11, "/": 11, "%": 11,
    "**": 12,
}


class Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = tokenize(src)
        self.pos = 0
        self.last_return_type = None  # set by parse_params
        self.last_type_members = None  # set by _opt_type_annotation

    # --- token helpers -----------------------------------------------------
    def peek(self, k=0) -> Token:
        return self.toks[min(self.pos + k, len(self.toks) - 1)]

    def at(self, value, kind=None) -> bool:
        t = self.peek()
        return t.value == value and (kind is None or t.kind == kind)

    def eat(self, value=None, kind=None) -> Token:
        t = self.peek()
        if value is not None and t.value != value:
            raise ParseError(f"expected {value!r} got {t.value!r} at {t.start}")
        if kind is not None and t.kind != kind:
            raise ParseError(f"expected {kind} got {t.kind} at {t.start}")
        self.pos += 1
        return t

    def opt(self, value) -> bool:
        if self.at(value):
            self.pos += 1
            return True
        return False

    def node(self, typ, start, end, **fields):
        d = {"type": typ, "start": start, "end": end}
        d.update(fields)
        return d

    def semicolon(self):
        """ASI: consume `;` if present; else accept `}`/EOF/newline-before."""
        if self.opt(";"):
            return
        t = self.peek()
        if t.kind == "eof" or t.value == "}" or t.nl_before:
            return
        raise ParseError(f"expected ; at {t.start} (got {t.value!r})")

    # --- entry -------------------------------------------------------------
    def parse_program(self):
        body = []
        start = self.peek().start
        while self.peek().kind != "eof":
            before = self.pos
            stmt = self.parse_statement()
            if stmt is not None:
                body.append(stmt)
            if self.pos == before:  # safety: never loop forever
                self.pos += 1
        end = self.peek().end
        return self.node("Program", start if body else 0, end, body=body)

    # --- statements --------------------------------------------------------
    def parse_statement(self):
        t = self.peek()
        v, k = t.value, t.kind
        if k == "punct" and v == "@":
            # class decorators: `@dec ... class X {}` / `@dec export class X {}`
            decorators = self._parse_decorators()
            stmt = self.parse_statement()
            target = stmt
            if target.get("type") in ("ExportNamedDeclaration",
                                      "ExportDefaultDeclaration"):
                target = target.get("declaration") or target
            if target.get("type") in ("ClassDeclaration", "ClassExpression"):
                target["decorators"] = decorators
            return stmt
        if k == "punct" and v == "{":
            return self.parse_block()
        if k == "punct" and v == ";":
            self.eat(";")
            return self.node("EmptyStatement", t.start, t.end)
        if k == "id" and v == "async" and self.peek(1).value == "function" \
                and not self.peek(1).nl_before:
            self.eat()
            return self.parse_function(is_declaration=True)
        if k == "kw":
            if v in ("var", "let", "const"):
                # `let` as identifier is ignored; fine for our corpus
                n = self.parse_variable_declaration()
                # Babel's VariableDeclaration span includes an explicit `;`
                # (visible only in the multi-declarator BLOCK code, e.g.
                # "var i, j;"; single-declarator codes use the declarator)
                semi = self.peek()
                self.semicolon()
                if semi.kind == "punct" and semi.value == ";":
                    n = dict(n)
                    n["end"] = semi.end
                return n
            if v == "function":
                return self.parse_function(is_declaration=True)
            if v == "class":
                return self.parse_class(is_declaration=True)
            if v == "if":
                return self.parse_if()
            if v == "while":
                return self.parse_while()
            if v == "do":
                return self.parse_do_while()
            if v == "for":
                return self.parse_for()
            if v == "return":
                self.eat("return")
                arg = None
                nt = self.peek()
                if not (nt.value in (";", "}") or nt.kind == "eof" or nt.nl_before):
                    arg = self.parse_expression()
                end = arg["end"] if arg else t.end
                self.semicolon()
                return self.node("ReturnStatement", t.start, end, argument=arg)
            if v == "break" or v == "continue":
                self.eat(v)
                label = None
                nt = self.peek()
                if nt.kind == "id" and not nt.nl_before:
                    label = self.parse_identifier()
                typ = "BreakStatement" if v == "break" else "ContinueStatement"
                end = label["end"] if label else t.end
                # Babel's Break/ContinueStatement span INCLUDES an explicit
                # trailing `;` (code "break;"), unlike return which strips it
                # (astForReturnStatement: ret.code.stripSuffix(";"))
                semi = self.peek()
                self.semicolon()
                if semi.kind == "punct" and semi.value == ";":
                    end = semi.end
                return self.node(typ, t.start, end, label=label)
            if v == "throw":
                self.eat("throw")
                arg = self.parse_expression()
                end = arg["end"]
                semi = self.peek()
                self.semicolon()
                if semi.kind == "punct" and semi.value == ";":
                    end = semi.end  # Babel ThrowStatement span includes `;`
                return self.node("ThrowStatement", t.start, end, argument=arg)
            if v == "switch":
                return self.parse_switch()
            if v == "try":
                return self.parse_try()
            if v == "with":
                kw = self.eat("with")
                self.eat("(")
                obj = self.parse_expression()
                self.eat(")")
                body = self.parse_statement()
                return self.node("WithStatement", kw.start, body["end"],
                                 object=obj, body=body)
            if v in ("import", "export"):
                return self.parse_module_decl()
        if (k == "id" and t.value == "interface" and self.peek(1).kind == "id"
                and self.peek(2).value == "{"):
            self.eat()
            iid = self.parse_identifier()
            members = self._parse_type_members()
            rb = self.toks[self.pos - 1]
            self.opt(";")
            return self.node("TSInterfaceDeclaration", t.start, rb.end, id=iid,
                             body=members)
        if (k == "id" and t.value == "type" and self.peek(1).kind == "id"
                and self.peek(2).value == "="):
            # TS type alias: `type X = {...}` / `type X = T`
            self.eat()
            aid = self.parse_identifier()
            self.eat("=")
            members = None
            aliased = None
            if self.at("{"):
                members = self._parse_type_members()
            else:
                t0 = self.peek().start
                self._skip_type_annotation()
                aliased = self.src[t0:self.toks[self.pos - 1].end].strip()
            end = self.toks[self.pos - 1].end
            self.semicolon()
            return self.node("TSTypeAliasDeclaration", t.start, end, id=aid,
                             body=members, aliased_type=aliased)
        if (k == "id" and t.value == "enum" and self.peek(1).kind == "id"
                and self.peek(2).value == "{"):
            self.eat()
            eid = self.parse_identifier()
            self.eat("{")
            members = []
            while not self.at("}") and self.peek().kind != "eof":
                key = self.parse_property_key()
                value = None
                end = key["end"]
                if self.opt("="):
                    value = self.parse_assignment()
                    end = value["end"]
                members.append(self.node("TSEnumMember", key["start"], end,
                                         id=key, initializer=value))
                if not self.opt(","):
                    break
            rb = self.eat("}")
            return self.node("TSEnumDeclaration", t.start, rb.end, id=eid,
                             members=members)
        if k == "id" and t.value == "abstract" and self.peek(1).value == "class":
            self.eat()
            cls = self.parse_class(is_declaration=True)
            cls = dict(cls)
            cls["abstract"] = True
            cls["start"] = t.start
            return cls
        if k == "id" and t.value == "declare" and self.peek(1).kind == "kw":
            # TS ambient declaration: `declare function/var/... X` — the
            # declaration parses normally, the span includes `declare`
            self.eat()
            if self.peek().value == "function":
                return self.parse_function(is_declaration=True, start=t.start)
            return self.parse_statement()
        if (k == "id" and t.value in ("module", "namespace")
                and self.peek(1).kind in ("id", "str")
                and self.peek(2).value in ("{", ".")):
            # TS module/namespace declaration: `namespace A[.B.C] { ... }`
            self.eat()
            parts = []
            name_tok = self.eat()
            parts.append((name_tok.value, name_tok.start))
            while self.at("."):
                self.eat(".")
                nt = self.eat()
                parts.append((nt.value, nt.start))
            body = self.parse_block()
            return self.node("TSModuleDeclaration", t.start, body["end"],
                             name=".".join(p[0] for p in parts),
                             name_parts=parts, body=body)
        if k == "id" and self.peek(1).value == ":" and self.peek(1).kind == "punct":
            label = self.parse_identifier()
            self.eat(":")
            body = self.parse_statement()
            return self.node("LabeledStatement", t.start, body["end"], label=label, body=body)
        # expression statement
        expr = self.parse_expression()
        self.semicolon()
        return self.node("ExpressionStatement", expr["start"], expr["end"], expression=expr)

    def parse_block(self):
        lb = self.eat("{")
        body = []
        while not self.at("}") and self.peek().kind != "eof":
            before = self.pos
            body.append(self.parse_statement())
            if self.pos == before:
                self.pos += 1
        rb = self.eat("}")
        return self.node("BlockStatement", lb.start, rb.end, body=body)

    def parse_variable_declaration(self):
        kw = self.eat()
        decls = []
        while True:
            decl_id = self.parse_binding_target()
            ts_type = self._opt_type_annotation()
            init = None
            if self.opt("="):
                init = self.parse_assignment()
            end = init.get("paren_end", init["end"]) if init else decl_id["end"]
            decls.append(
                self.node("VariableDeclarator", decl_id["start"], end, id=decl_id, init=init,
                          ts_type=ts_type)
            )
            if not self.opt(","):
                break
        return self.node(
            "VariableDeclaration", kw.start, decls[-1]["end"], kind=kw.value, declarations=decls
        )

    def parse_binding_target(self):
        t = self.peek()
        if t.value == "{":
            return self.parse_object_pattern()
        if t.value == "[":
            return self.parse_array_pattern()
        return self.parse_identifier()

    def parse_object_pattern(self):
        lb = self.eat("{")
        props = []
        while not self.at("}"):
            pt = self.peek()
            if pt.value == "...":
                self.eat("...")
                arg = self.parse_binding_target()
                props.append(self.node("RestElement", pt.start, arg["end"], argument=arg))
            else:
                key = self.parse_property_key()
                computed = key.get("computed_key", False)
                if self.opt(":"):
                    value = self.parse_binding_target()
                    if self.opt("="):
                        dflt = self.parse_assignment()
                        value = self.node("AssignmentPattern", value["start"], dflt["end"],
                                          left=value, right=dflt)
                elif self.opt("="):
                    dflt = self.parse_assignment()
                    value = self.node("AssignmentPattern", key["start"], dflt["end"],
                                      left=key, right=dflt)
                else:
                    value = key
                props.append(
                    self.node("ObjectProperty", key["start"], value["end"],
                              key=key, value=value, computed=computed, shorthand=value is key)
                )
            if not self.opt(","):
                break
        rb = self.eat("}")
        return self.node("ObjectPattern", lb.start, rb.end, properties=props)

    def parse_array_pattern(self):
        lb = self.eat("[")
        elems = []
        while not self.at("]"):
            if self.at(","):
                self.eat(",")
                elems.append(None)
                continue
            pt = self.peek()
            if pt.value == "...":
                self.eat("...")
                arg = self.parse_binding_target()
                elems.append(self.node("RestElement", pt.start, arg["end"], argument=arg))
            else:
                target = self.parse_binding_target()
                if self.opt("="):
                    dflt = self.parse_assignment()
                    target = self.node("AssignmentPattern", target["start"], dflt["end"],
                                       left=target, right=dflt)
                elems.append(target)
            if not self.opt(","):
                break
        rb = self.eat("]")
        return self.node("ArrayPattern", lb.start, rb.end, elements=elems)

    def parse_property_key(self):
        t = self.peek()
        if t.kind in ("str",):
            self.pos += 1
            return self.node("StringLiteral", t.start, t.end, value=_strip_str(t.value))
        if t.kind == "num":
            self.pos += 1
            return self.node("NumericLiteral", t.start, t.end, value=t.value)
        if t.value == "[":
            self.eat("[")
            e = self.parse_assignment()
            self.eat("]")
            e = dict(e)
            e["computed_key"] = True  # `[expr]:` — Babel property.computed
            return e
        tok = self.eat()
        return self.node("Identifier", tok.start, tok.end, name=tok.value)

    def parse_function(self, is_declaration: bool, start: int | None = None):
        kw = self.eat("function")
        self.opt("*")
        fid = None
        if self.peek().kind == "id":
            fid = self.parse_identifier()
        params = self.parse_params()
        return_type = self.last_return_type
        if self.at("{"):
            body = self.parse_block()
            end = body["end"]
        else:
            # TS `declare function f(...): T` has no body
            end = self.toks[self.pos - 1].end
            body = {"type": "BlockStatement", "body": [], "start": end, "end": end}
            self.semicolon()
        typ = "FunctionDeclaration" if is_declaration and fid else "FunctionExpression"
        return self.node(typ, start if start is not None else kw.start, end,
                         id=fid, params=params, body=body, return_type=return_type,
                         generator=False, **{"async": False})

    def _skip_type_annotation(self):
        """Skip a TS type annotation (token soup with bracket depth); stops
        at a depth-0 `,` `)` `]` `}` `;` `=` `=>` or `{`.  Coverage targets
        simple annotation shapes (unions, generics, qualified names)."""
        depth = 0
        expect_arrow = False  # inside a constructor/function type `new (..) => T`
        while True:
            t = self.peek()
            if t.kind == "eof":
                return
            v = t.value
            if depth == 0 and t.kind in ("id", "kw") and v == "new" \
                    and self.peek(1).value == "(":
                # TS constructor type `new (args) => T`: the arrow after the
                # parameter list belongs to the type, not the enclosing arrow
                expect_arrow = True
            if depth == 0 and t.kind == "punct" and v == "=>" and expect_arrow:
                expect_arrow = False
                self.eat()
                continue
            if depth == 0 and t.kind == "punct" and v in (",", ")", "]", "}",
                                                          ";", "=", "=>", "{"):
                return
            if v in ("(", "[") or (t.kind == "punct" and v == "<"):
                depth += 1
            elif v in (")", "]") or (t.kind == "punct" and v == ">"):
                depth -= 1
                if depth < 0:
                    return
            elif (t.kind == "punct" and v[0] == ">"
                  and v.lstrip(">") in ("", "=", "==", "===")):
                # The lexer emits `>>`, `>>>`, `>=`, `>>=`, `>>>=` as one
                # token, but in type position each `>` closes one generic
                # level (e.g. `Array<Array<number>>`).  Peel a single `>`
                # off the token in place so depth bookkeeping stays exact
                # and any trailing `=` can terminate the annotation at
                # depth 0 on the next iteration.
                depth -= 1
                if depth < 0:
                    return
                t.value = v[1:]
                t.start += 1
                continue
            self.eat()

    def _opt_type_annotation(self):
        """Consume `?` optional markers and `: Type` annotations if present;
        returns the annotation source text (or None).  Inline object types
        (`x: { a: string; b: number }`) are parsed structurally — the member
        list lands in `self.last_type_members` (anon-class synthesis)."""
        self.last_type_members = None
        if self.at("?") and self.peek(1).value == ":":
            self.eat("?")
        if self.at(":"):
            self.eat(":")
            t0 = self.peek().start
            if self.at("{"):
                self.last_type_members = self._parse_type_members()
                return self.src[t0:self.toks[self.pos - 1].end].strip()
            self._skip_type_annotation()
            return self.src[t0:self.toks[self.pos - 1].end].strip()
        return None

    def _parse_decorators(self):
        """`@a.b.c(args)` decorator list; returns
        [{code,name,full,start,end,expr}] where `expr` is the parsed
        decorator expression (used by the __decorate lowering)."""
        out = []
        while self.at("@"):
            at_tok = self.eat("@")
            save = self.pos
            parts = [self.eat().value]
            while self.at("."):
                self.eat(".")
                parts.append(self.eat().value)
            end = self.toks[self.pos - 1].end
            if self.at("("):
                depth = 0
                while self.peek().kind != "eof":
                    v = self.eat().value
                    if v == "(":
                        depth += 1
                    elif v == ")":
                        depth -= 1
                        if depth == 0:
                            break
                end = self.toks[self.pos - 1].end
            stop = self.pos
            # re-parse the decorator body as a real expression for lowering
            expr = None
            try:
                self.pos = save
                expr = self.parse_call_member()
            except ParseError:
                expr = None
            finally:
                self.pos = stop
            out.append({"code": self.src[at_tok.start:end],
                        "name": parts[-1], "full": ".".join(parts),
                        "start": at_tok.start, "end": end, "expr": expr})
        return out

    def _parse_type_members(self):
        """Interface / object-type member list: property, index, call,
        method and construct signatures (spans include the trailing ';')."""
        self.eat("{")
        members = []

        def _end_with_semi():
            end = self.toks[self.pos - 1].end
            semi = self.peek()
            self.semicolon()
            if semi.kind == "punct" and semi.value == ";":
                end = semi.end
            return end

        while not self.at("}") and self.peek().kind != "eof":
            if self.opt(";") or self.opt(","):
                continue
            mstart = self.peek().start
            if self.at("["):
                self.eat("[")
                pid = self.parse_identifier()
                self._opt_type_annotation()
                self.eat("]")
                self._opt_type_annotation()
                members.append(self.node("TSIndexSignature", mstart,
                                         _end_with_semi(), id=pid))
                continue
            if self.at("("):
                params = self.parse_params()
                members.append(self.node("TSCallSignature", mstart,
                                         _end_with_semi(), params=params))
                continue
            if self.peek().value == "new" and self.peek(1).value == "(":
                self.eat("new")
                params = self.parse_params()
                members.append(self.node("TSConstructSignature", mstart,
                                         self.toks[self.pos - 1].end,
                                         params=params))
                self.opt(";")
                continue
            key = self.parse_property_key()
            if self.at("("):
                params = self.parse_params()
                members.append(self.node("TSMethodSignature", mstart,
                                         _end_with_semi(), key=key,
                                         params=params))
            else:
                ts_type = self._opt_type_annotation()
                members.append(self.node("TSPropertySignature", mstart,
                                         _end_with_semi(), key=key,
                                         ts_type=ts_type))
        self.eat("}")
        return members

    def parse_params(self):
        self.eat("(")
        params = []
        while not self.at(")"):
            pt = self.peek()
            if pt.value == "...":
                self.eat("...")
                arg = self.parse_binding_target()
                self._opt_type_annotation()
                params.append(self.node("RestElement", pt.start, arg["end"], argument=arg))
            else:
                p_decorators = self._parse_decorators()
                p_mods = []
                while (self.peek().kind == "id"
                       and self.peek().value in ("public", "private",
                                                 "protected", "readonly",
                                                 "override")
                       and self.peek(1).kind == "id"):
                    p_mods.append(self.eat().value)
                p = self.parse_binding_target()
                ts_type = self._opt_type_annotation()
                ts_members = self.last_type_members
                if p_mods or p_decorators:
                    p = dict(p)
                    p["ts_modifiers"] = p_mods
                    p["decorators"] = p_decorators
                if ts_type is not None:
                    p = dict(p)
                    p["ts_type"] = ts_type
                    p["end"] = self.toks[self.pos - 1].end
                    if ts_members is not None:
                        p["ts_type_members"] = ts_members
                if self.opt("="):
                    dflt = self.parse_assignment()
                    p = self.node("AssignmentPattern", p["start"], dflt["end"], left=p, right=dflt)
                params.append(p)
            if not self.opt(","):
                break
        self.eat(")")
        # TS return-type annotation `): T` (before `=>` or `{`); stashed on
        # the parser for the enclosing function node to pick up
        self.last_return_type = self._opt_type_annotation()
        return params

    def parse_class(self, is_declaration: bool):
        kw = self.eat("class")
        cid = self.parse_identifier() if self.peek().kind == "id" else None
        superclass = None
        if self.opt("extends"):
            superclass = self.parse_unary()
        lb = self.eat("{")
        members = []
        while not self.at("}") and self.peek().kind != "eof":
            if self.opt(";"):
                continue
            decorators = self._parse_decorators()
            mstart = self.peek().start
            is_private_name = self.src[mstart:mstart + 1] == "#" or (
                mstart > 0 and self.src[mstart - 1] == "#")
            static = False
            ts_mods = []  # TS member modifiers in source order
            while (self.peek().kind == "id"
                   and self.peek().value in ("public", "private", "protected",
                                             "readonly", "abstract", "declare",
                                             "override")
                   and self.peek(1).value not in ("(", "=", ";", "}", ":", "?")):
                ts_mods.append(self.eat().value)
            if self.at("static") and self.peek(1).value not in ("(", "="):
                self.eat("static")
                static = True
                if self.at("{"):
                    body = self.parse_block()
                    members.append(self.node("StaticBlock", mstart, body["end"],
                                             body=body["body"]))
                    continue
            while (self.peek().kind == "id"
                   and self.peek().value in ("public", "private", "protected",
                                             "readonly", "abstract", "declare",
                                             "override")
                   and self.peek(1).value not in ("(", "=", ";", "}", ":", "?")):
                ts_mods.append(self.eat().value)
            kind = "method"
            if self.peek().value in ("get", "set") and self.peek(1).value not in ("(", "=", ";", "}"):
                kind = self.eat().value
            if not is_private_name and self.peek().start > mstart and \
                    self.src[self.peek().start - 1] == "#":
                is_private_name = True
            key = self.parse_property_key()
            if self.at("("):
                params = self.parse_params()
                m_return_type = self.last_return_type
                if self.at("{"):
                    body = self.parse_block()
                    end = body["end"]
                else:
                    # abstract / declared method signature (no body); span
                    # includes the trailing `;`
                    end = self.toks[self.pos - 1].end
                    semi = self.peek()
                    self.semicolon()
                    if semi.kind == "punct" and semi.value == ";":
                        end = semi.end
                    body = {"type": "BlockStatement", "body": [],
                            "start": end, "end": end}
                if key.get("name") == "constructor":
                    kind = "constructor"
                members.append(
                    self.node("ClassMethod", mstart, end, key=key, params=params,
                              body=body, kind=kind, static=static, computed=False,
                              ts_modifiers=ts_mods, private_name=is_private_name,
                              decorators=decorators, return_type=m_return_type)
                )
            else:
                self.opt("!")  # definite-assignment assertion `msg!: string`
                prop_type = self._opt_type_annotation()
                value = None
                if self.opt("="):
                    value = self.parse_assignment()
                end = self.toks[self.pos - 1].end
                semi = self.peek()
                self.semicolon()
                if semi.kind == "punct" and semi.value == ";":
                    end = semi.end  # Babel ClassProperty span includes `;`
                members.append(
                    self.node("ClassProperty", mstart, end, key=key, value=value,
                              static=static, computed=False,
                              ts_modifiers=ts_mods, private_name=is_private_name,
                              ts_type=prop_type, decorators=decorators)
                )
        rb = self.eat("}")
        body = self.node("ClassBody", lb.start, rb.end, body=members)
        typ = "ClassDeclaration" if is_declaration and cid else "ClassExpression"
        return self.node(typ, kw.start, rb.end, id=cid, superClass=superclass, body=body)

    def parse_if(self):
        kw = self.eat("if")
        self.eat("(")
        test = self.parse_expression()
        self.eat(")")
        consequent = self.parse_statement()
        alternate = None
        if self.opt("else"):
            alternate = self.parse_statement()
        end = (alternate or consequent)["end"]
        return self.node("IfStatement", kw.start, end, test=test,
                         consequent=consequent, alternate=alternate)

    def parse_while(self):
        kw = self.eat("while")
        self.eat("(")
        test = self.parse_expression()
        self.eat(")")
        body = self.parse_statement()
        return self.node("WhileStatement", kw.start, body["end"], test=test, body=body)

    def parse_do_while(self):
        kw = self.eat("do")
        body = self.parse_statement()
        self.eat("while")
        self.eat("(")
        test = self.parse_expression()
        self.eat(")")
        end = self.peek().start
        self.opt(";")
        return self.node("DoWhileStatement", kw.start, test["end"] + 1, test=test, body=body)

    def parse_for(self):
        kw = self.eat("for")
        self.eat("(")
        init = None
        if not self.at(";"):
            if self.peek().value in ("var", "let", "const"):
                init = self.parse_variable_declaration()
            else:
                init = self.parse_expression(no_in=True)
            if self.peek().value in ("in", "of"):
                of_or_in = self.eat().value
                right = self.parse_expression()
                self.eat(")")
                body = self.parse_statement()
                typ = "ForInStatement" if of_or_in == "in" else "ForOfStatement"
                return self.node(typ, kw.start, body["end"], left=init, right=right, body=body)
        self.eat(";")
        test = None if self.at(";") else self.parse_expression()
        self.eat(";")
        update = None if self.at(")") else self.parse_expression()
        self.eat(")")
        body = self.parse_statement()
        return self.node("ForStatement", kw.start, body["end"], init=init, test=test,
                         update=update, body=body)

    def parse_switch(self):
        kw = self.eat("switch")
        self.eat("(")
        disc = self.parse_expression()
        self.eat(")")
        self.eat("{")
        cases = []
        while not self.at("}") and self.peek().kind != "eof":
            ct = self.peek()
            if self.opt("case"):
                test = self.parse_expression()
            else:
                self.eat("default")
                test = None
            self.eat(":")
            consequent = []
            while not (self.at("case") or self.at("default") or self.at("}")):
                consequent.append(self.parse_statement())
            end = consequent[-1]["end"] if consequent else ct.end
            cases.append(self.node("SwitchCase", ct.start, end, test=test, consequent=consequent))
        rb = self.eat("}")
        return self.node("SwitchStatement", kw.start, rb.end, discriminant=disc, cases=cases)

    def parse_try(self):
        kw = self.eat("try")
        block = self.parse_block()
        handler = None
        finalizer = None
        if self.at("catch"):
            ct = self.eat("catch")
            param = None
            if self.opt("("):
                param = self.parse_binding_target()
                self.eat(")")
            cbody = self.parse_block()
            handler = self.node("CatchClause", ct.start, cbody["end"], param=param, body=cbody)
        if self.opt("finally"):
            finalizer = self.parse_block()
        end = (finalizer or (handler or {"end": block["end"]}))["end"]
        return self.node("TryStatement", kw.start, end, block=block, handler=handler,
                         finalizer=finalizer)

    def parse_module_decl(self):
        """Loose import/export handling: imports become ImportDeclaration with
        specifiers; `export` unwraps to the inner declaration (reference
        lowers these to require()/exports assignments — see astlower)."""
        t = self.peek()
        if t.value == "import":
            self.eat("import")
            specifiers = []
            source = None
            if self.peek().kind == "str":
                st = self.eat()
                source = self.node("StringLiteral", st.start, st.end, value=_strip_str(st.value))
            else:
                # TS import-equals: `import path = require('path')`
                if self.peek().kind == "id" and self.peek(1).value == "=":
                    local = self.parse_identifier()
                    self.eat("=")
                    expr = self.parse_assignment()
                    self.semicolon()
                    return self.node("TSImportEqualsDeclaration", t.start,
                                     expr["end"], id=local, expression=expr)
                # default / named / namespace
                if self.peek().kind == "id":
                    local = self.parse_identifier()
                    specifiers.append(self.node("ImportDefaultSpecifier", local["start"],
                                                local["end"], local=local))
                    self.opt(",")
                if self.opt("*"):
                    self.eat("as")
                    local = self.parse_identifier()
                    specifiers.append(self.node("ImportNamespaceSpecifier", local["start"],
                                                local["end"], local=local))
                elif self.at("{"):
                    self.eat("{")
                    while not self.at("}"):
                        imported = self.parse_identifier()
                        local = imported
                        if self.opt("as"):
                            local = self.parse_identifier()
                        specifiers.append(self.node("ImportSpecifier", imported["start"],
                                                    local["end"], imported=imported, local=local))
                        if not self.opt(","):
                            break
                    self.eat("}")
                self.eat("from")
                st = self.eat(kind="str")
                source = self.node("StringLiteral", st.start, st.end, value=_strip_str(st.value))
            end = source["end"] if source else t.end
            self.semicolon()
            return self.node("ImportDeclaration", t.start, end,
                             specifiers=specifiers, source=source)
        # export
        self.eat("export")
        if self.opt("default"):
            decl = self.parse_statement()
            return self.node("ExportDefaultDeclaration", t.start, decl["end"], declaration=decl)
        if self.at("=") :
            # TS export-assignment: `export = expr;`
            self.eat("=")
            expr = self.parse_statement()
            return self.node("TSExportAssignment", t.start, expr["end"],
                             expression=expr)
        if self.at("*"):
            # export * [as name] from "source"
            self.eat("*")
            exported = None
            if self.opt("as"):
                exported = self.parse_identifier()
            self.eat("from")
            st = self.eat(kind="str")
            source = self.node("StringLiteral", st.start, st.end, value=_strip_str(st.value))
            self.semicolon()
            return self.node("ExportAllDeclaration", t.start, st.end,
                             exported=exported, source=source)
        if self.at("{"):
            # export { a, b as c, ... } [from "source"]
            self.eat("{")
            specifiers = []
            while not self.at("}") and self.peek().kind != "eof":
                local = self.parse_identifier_name()
                exported = local
                if self.opt("as"):
                    exported = self.parse_identifier_name()
                specifiers.append(self.node("ExportSpecifier", local["start"],
                                            exported["end"], local=local,
                                            exported=exported))
                if not self.opt(","):
                    break
            self.eat("}")
            source = None
            if self.opt("from"):
                st = self.eat(kind="str")
                source = self.node("StringLiteral", st.start, st.end,
                                   value=_strip_str(st.value))
            self.semicolon()
            return self.node("ExportNamedDeclaration", t.start, t.end,
                             declaration=None, specifiers=specifiers,
                             source=source)
        if self.peek().kind == "id" and self.peek(1).value == "from":
            # `export bar from "Bar"` (proposal syntax used by the reference)
            local = self.parse_identifier()
            self.eat("from")
            st = self.eat(kind="str")
            source = self.node("StringLiteral", st.start, st.end,
                               value=_strip_str(st.value))
            self.semicolon()
            spec = self.node("ExportSpecifier", local["start"], local["end"],
                             local=local, exported=local)
            return self.node("ExportNamedDeclaration", t.start, st.end,
                             declaration=None, specifiers=[spec], source=source)
        decl = self.parse_statement()
        return self.node("ExportNamedDeclaration", t.start, decl["end"], declaration=decl)

    # --- expressions ---------------------------------------------------------
    def parse_expression(self, no_in=False):
        first = self.parse_assignment(no_in=no_in)
        if not self.at(","):
            return first
        exprs = [first]
        while self.opt(","):
            exprs.append(self.parse_assignment(no_in=no_in))
        return self.node("SequenceExpression", first["start"], exprs[-1]["end"],
                         expressions=exprs)

    def _try_arrow(self):
        """Detect arrow functions: `ident =>` or `( params ) =>`."""
        t = self.peek()
        if t.kind == "id" and self.peek(1).value == "=>":
            start_pos = self.pos
            param = self.parse_identifier()
            self.eat("=>")
            return self._finish_arrow(t.start, [param])
        if t.value == "(":
            # scan ahead for matching ) followed by =>
            depth = 0
            j = self.pos
            while j < len(self.toks):
                v = self.toks[j].value
                if v == "(":
                    depth += 1
                elif v == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            # `) =>` directly, or `) : Type =>` (TS return annotation): scan
            # past a possible annotation (no nesting resets at depth 0)
            k = j + 1
            if k < len(self.toks) and self.toks[k].value == ":":
                d2 = 0
                k += 1
                while k < len(self.toks):
                    v2 = self.toks[k].value
                    if d2 == 0 and v2 in ("=>", ";", ")", ",", "=", "{"):
                        break
                    if v2 in ("(", "[", "<"):
                        d2 += 1
                    elif v2 in (")", "]", ">"):
                        d2 -= 1
                    k += 1
            if k < len(self.toks) and self.toks[k].value == "=>":
                params = self.parse_params()
                self.eat("=>")
                return self._finish_arrow(t.start, params)
        return None

    def _finish_arrow(self, start, params):
        if self.at("{"):
            body = self.parse_block()
        else:
            body = self.parse_assignment()
        return self.node("ArrowFunctionExpression", start, body["end"], id=None,
                         params=params, body=body, generator=False, **{"async": False})

    def parse_assignment(self, no_in=False):
        t = self.peek()
        if t.kind == "kw" and t.value == "yield":
            self.eat("yield")
            self.opt("*")
            arg = None
            nt = self.peek()
            if not (nt.value in (";", ")", "]", "}", ",") or nt.kind == "eof" or nt.nl_before):
                arg = self.parse_assignment(no_in=no_in)
            end = arg["end"] if arg else t.end
            return self.node("YieldExpression", t.start, end, argument=arg)
        if (t.kind == "id" and t.value == "async" and not self.peek(1).nl_before
                and (self.peek(1).value == "function"
                     or self.peek(1).kind == "id" and self.peek(2).value == "=>"
                     or self.peek(1).value == "(")):
            # async function-expression / async arrow: `async` is decorative
            # for CPG purposes (await is handled as an operator)
            save = self.pos
            self.eat()
            if self.at("function"):
                return self.parse_function(is_declaration=False)
            arrow = self._try_arrow()
            if arrow is not None:
                arrow["async"] = True
                arrow["start"] = t.start
                return arrow
            self.pos = save
        arrow = self._try_arrow()
        if arrow is not None:
            return arrow
        left = self.parse_conditional(no_in=no_in)
        t = self.peek()
        if t.kind == "punct" and t.value in ASSIGN_OPS:
            self.eat()
            right = self.parse_assignment(no_in=no_in)
            left2 = _to_pattern(left)
            return self.node("AssignmentExpression", left["start"], right["end"],
                             operator=t.value, left=left2, right=right)
        return left

    def parse_conditional(self, no_in=False):
        test = self.parse_binary(0, no_in=no_in)
        if self.at("?") and self.peek().value == "?":
            self.eat("?")
            consequent = self.parse_assignment()
            self.eat(":")
            alternate = self.parse_assignment(no_in=no_in)
            return self.node("ConditionalExpression", test["start"], alternate["end"],
                             test=test, consequent=consequent, alternate=alternate)
        return test

    def parse_binary(self, min_prec, no_in=False):
        left = self.parse_unary()
        # TS `expr as Type` / `expr satisfies Type` (pass-through nodes; the
        # CPG lowers the inner expression, the span keeps the cast text)
        while ((self.peek().kind == "kw" and self.peek().value == "as")
               or (self.peek().kind == "id" and self.peek().value == "satisfies")
               ) and not self.peek().nl_before:
            kw_tok = self.eat()
            t0 = self.peek().start
            self._skip_type_annotation()
            end = self.toks[self.pos - 1].end
            # `as` is a cast (TSAsExpression → <operator>.cast); `satisfies`
            # is a pure compile-time check (pass-through, TsAst golden
            # asserts x,y as direct assignment arguments)
            typ = "TSAsExpression" if kw_tok.value == "as" else "TSSatisfiesExpression"
            left = self.node(typ, left["start"], end,
                             expression=left,
                             ts_type=self.src[t0:end].strip())
        while True:
            t = self.peek()
            op = t.value
            if op == "in" and no_in:
                break
            if (t.kind == "punct" or (t.kind == "kw" and op in ("in", "instanceof"))) and op in BIN_PREC:
                prec = BIN_PREC[op]
                if prec < min_prec:
                    break
                self.eat()
                # ** is right-assoc; others left
                next_min = prec if op == "**" else prec + 1
                right = self.parse_binary(next_min, no_in=no_in)
                typ = "LogicalExpression" if op in ("&&", "||", "??") else "BinaryExpression"
                left = self.node(typ, left["start"], right["end"], operator=op,
                                 left=left, right=right)
                continue
            break
        return left

    def parse_unary(self):
        t = self.peek()
        if t.kind == "punct" and t.value in ("!", "~", "+", "-"):
            self.eat()
            arg = self.parse_unary()
            return self.node("UnaryExpression", t.start, arg["end"], operator=t.value,
                             argument=arg, prefix=True)
        if t.kind == "kw" and t.value in ("typeof", "void", "delete", "await"):
            self.eat()
            arg = self.parse_unary()
            if t.value == "await":
                return self.node("AwaitExpression", t.start, arg["end"], argument=arg)
            return self.node("UnaryExpression", t.start, arg["end"], operator=t.value,
                             argument=arg, prefix=True)
        if t.kind == "punct" and t.value in ("++", "--"):
            self.eat()
            arg = self.parse_unary()
            return self.node("UpdateExpression", t.start, arg["end"], operator=t.value,
                             argument=arg, prefix=True)
        expr = self.parse_postfix()
        return expr

    def parse_postfix(self):
        expr = self.parse_call_member()
        t = self.peek()
        if t.kind == "punct" and t.value in ("++", "--") and not t.nl_before:
            self.eat()
            return self.node("UpdateExpression", expr["start"], t.end, operator=t.value,
                             argument=expr, prefix=False)
        return expr

    def parse_call_member(self):
        t = self.peek()
        if t.kind == "kw" and t.value == "new":
            self.eat("new")
            callee = self.parse_member_only()
            args = []
            end = callee["end"]
            if self.at("("):
                args, end = self.parse_args()
            new_expr = self.node("NewExpression", t.start, end, callee=callee, arguments=args)
            return self.parse_member_tail(new_expr)
        expr = self.parse_primary()
        return self.parse_member_tail(expr)

    def parse_member_only(self):
        """Member chain without call (for `new Foo.Bar(...)`)."""
        expr = self.parse_primary()
        while True:
            if self.at("."):
                self.eat(".")
                prop = self.parse_identifier_name()
                expr = self.node("MemberExpression", expr["start"], prop["end"], object=expr,
                                 property=prop, computed=False)
            elif self.at("["):
                self.eat("[")
                prop = self.parse_expression()
                rb = self.eat("]")
                expr = self.node("MemberExpression", expr["start"], rb.end, object=expr,
                                 property=prop, computed=True)
            else:
                return expr

    def parse_member_tail(self, expr):
        while True:
            if self.at(".") or self.at("?."):
                self.eat()
                prop = self.parse_identifier_name()
                expr = self.node("MemberExpression", expr["start"], prop["end"], object=expr,
                                 property=prop, computed=False)
            elif self.at("["):
                self.eat("[")
                prop = self.parse_expression()
                rb = self.eat("]")
                expr = self.node("MemberExpression", expr["start"], rb.end, object=expr,
                                 property=prop, computed=True)
            elif self.at("("):
                args, end = self.parse_args()
                expr = self.node("CallExpression", expr["start"], end, callee=expr,
                                 arguments=args)
            elif self.peek().kind == "template":
                tpl = self.parse_primary()
                expr = self.node("TaggedTemplateExpression", expr["start"], tpl["end"],
                                 tag=expr, quasi=tpl)
            elif (self.peek().kind == "punct" and self.peek().value == "!"
                  and not self.peek().nl_before):
                # TS non-null assertion `expr!` (a bare `!` postfix — `!=`
                # and `!==` lex as single tokens, so no ambiguity)
                bang = self.eat("!")
                expr = self.node("TSNonNullExpression", expr["start"], bang.end,
                                 expression=expr)
            else:
                return expr

    def parse_args(self):
        self.eat("(")
        args = []
        while not self.at(")"):
            if self.at("..."):
                st = self.eat("...")
                arg = self.parse_assignment()
                args.append(self.node("SpreadElement", st.start, arg["end"], argument=arg))
            else:
                args.append(self.parse_assignment())
            if not self.opt(","):
                break
        rp = self.eat(")")
        return args, rp.end

    def parse_identifier(self):
        t = self.eat(kind="id")
        return self.node("Identifier", t.start, t.end, name=t.value)

    def parse_identifier_name(self):
        t = self.eat()
        return self.node("Identifier", t.start, t.end, name=t.value)

    def parse_primary(self):
        t = self.peek()
        if t.kind == "num":
            self.eat()
            return self.node("NumericLiteral", t.start, t.end, value=t.value)
        if t.kind == "str":
            self.eat()
            return self.node("StringLiteral", t.start, t.end, value=_strip_str(t.value))
        if t.kind == "template":
            self.eat()
            return self._template_node(t)
        if t.kind == "regex":
            self.eat()
            return self.node("RegExpLiteral", t.start, t.end, pattern=t.value)
        if t.kind == "kw":
            if t.value == "true" or t.value == "false":
                self.eat()
                return self.node("BooleanLiteral", t.start, t.end, value=t.value == "true")
            if t.value == "null":
                self.eat()
                return self.node("NullLiteral", t.start, t.end)
            if t.value == "this":
                self.eat()
                return self.node("ThisExpression", t.start, t.end)
            if t.value == "function":
                return self.parse_function(is_declaration=False)
            if t.value == "class":
                return self.parse_class(is_declaration=False)
            if t.value == "super":
                self.eat()
                return self.node("Super", t.start, t.end)
            if t.value == "new":
                return self.parse_call_member()
            if t.value in ("of", "as", "from", "static", "await", "yield", "default"):
                # contextual keywords usable as identifiers
                self.eat()
                return self.node("Identifier", t.start, t.end, name=t.value)
        if t.kind == "id":
            return self.parse_identifier()
        if t.value == "(":
            self.eat("(")
            expr = self.parse_expression()
            rp = self.eat(")")
            expr = dict(expr)
            expr["extra_parenthesized"] = True
            # Babel keeps the inner node's span but enclosing nodes extend
            # through the `)` (they cover all consumed tokens) — record it
            # so parents (e.g. VariableDeclarator) can use the outer extent.
            expr["paren_start"] = t.start
            expr["paren_end"] = rp.end
            return expr
        if t.value == "[":
            self.eat("[")
            elems = []
            while not self.at("]"):
                if self.at(","):
                    self.eat(",")
                    elems.append(None)
                    continue
                if self.at("..."):
                    st = self.eat("...")
                    arg = self.parse_assignment()
                    elems.append(self.node("SpreadElement", st.start, arg["end"], argument=arg))
                else:
                    elems.append(self.parse_assignment())
                if not self.opt(","):
                    break
            rb = self.eat("]")
            return self.node("ArrayExpression", t.start, rb.end, elements=elems)
        if t.value == "{":
            return self.parse_object_expression()
        if t.value == "<":
            # JSX element/fragment: parsed at CHARACTER level from the
            # source (JSX text content does not tokenize as JS), embedded
            # {expr} containers are sub-parsed as real expressions
            try:
                node, end = _parse_jsx(self.src, t.start)
            except ParseError:
                # TS type assertion `<T>expr`: skip the balanced <...>,
                # parse the asserted expression (pass-through)
                self.eat("<")
                t0 = self.peek().start
                depth = 1
                while depth > 0 and self.peek().kind != "eof":
                    tok = self.eat()
                    v = tok.value
                    if tok.kind == "punct" and v in ("%", "@", "#", "!", "?",
                                                     ";", "{", "}"):
                        # never legal inside a TS type assertion — this is
                        # broken input, not a type (Babel rejects it too;
                        # ProjectParseTests "strange filenames")
                        raise ParseError(
                            f"invalid token {v!r} in type assertion at {tok.start}")
                    if v == "<":
                        depth += 1
                    elif v == ">":
                        depth -= 1
                t1 = self.toks[self.pos - 1].start  # before closing `>`
                expr = self.parse_unary()
                return self.node("TSTypeAssertion", t.start, expr["end"],
                                 expression=expr,
                                 ts_type=self.src[t0:t1].strip())
            # re-sync the token cursor past the element
            while self.pos < len(self.toks) and self.toks[self.pos].start < end:
                self.pos += 1
            return node
        raise ParseError(f"unexpected token {t.value!r} at {t.start}")

    def parse_object_expression(self):
        lb = self.eat("{")
        props = []
        while not self.at("}"):
            pt = self.peek()
            if pt.value == "...":
                self.eat("...")
                arg = self.parse_assignment()
                props.append(self.node("SpreadElement", pt.start, arg["end"], argument=arg))
            else:
                kind = None
                if pt.value in ("get", "set") and self.peek(1).value not in (",", ":", "(", "}"):
                    kind = self.eat().value
                key = self.parse_property_key()
                computed = key.get("computed_key", False)
                if self.at("("):
                    params = self.parse_params()
                    body = self.parse_block()
                    props.append(self.node("ObjectMethod", key["start"], body["end"], key=key,
                                           params=params, body=body, kind=kind or "method",
                                           computed=computed))
                elif self.opt(":"):
                    value = self.parse_assignment()
                    props.append(self.node("ObjectProperty", key["start"], value["end"], key=key,
                                           value=value, computed=computed, shorthand=False))
                else:
                    props.append(self.node("ObjectProperty", key["start"], key["end"], key=key,
                                           value=key, computed=computed, shorthand=True))
            if not self.opt(","):
                break
        rb = self.eat("}")
        return self.node("ObjectExpression", lb.start, rb.end, properties=props)

    def _template_node(self, t: Token):
        """Parse the template token's inside into quasis/expressions."""
        raw = self.src[t.start + 1 : t.end - 1]
        quasis = []
        expressions = []
        buf_start = 0
        i = 0
        while i < len(raw):
            if raw[i] == "\\":
                i += 2
                continue
            if raw[i] == "$" and i + 1 < len(raw) and raw[i + 1] == "{":
                quasis.append((buf_start, i))
                depth = 1
                j = i + 2
                while j < len(raw) and depth > 0:
                    if raw[j] == "{":
                        depth += 1
                    elif raw[j] == "}":
                        depth -= 1
                    j += 1
                inner = raw[i + 2 : j - 1]
                sub = Parser(inner)
                try:
                    expr = sub.parse_expression()
                    _shift_offsets(expr, t.start + 1 + i + 2)
                except ParseError:
                    expr = self.node("Unknown", t.start + 1 + i + 2, t.start + 1 + j - 1)
                expressions.append(expr)
                buf_start = j
                i = j
                continue
            i += 1
        quasis.append((buf_start, len(raw)))
        base = t.start + 1
        qnodes = []
        for idx, (qs, qe) in enumerate(quasis):
            qnodes.append(
                self.node("TemplateElement", base + qs, base + qe,
                          value={"raw": raw[qs:qe]}, tail=idx == len(quasis) - 1)
            )
        return self.node("TemplateLiteral", t.start, t.end, quasis=qnodes,
                         expressions=expressions)


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
             "v": "\v", "0": "\0", "'": "'", '"': '"', "`": "`", "\\": "\\"}


def _strip_str(tok_text: str) -> str:
    """COOKED string value (Babel `value`): outer quotes removed, standard
    escapes processed — the CPG literal code is '"' + value + '"'."""
    if len(tok_text) >= 2 and tok_text[0] in "'\"" and tok_text[-1] == tok_text[0]:
        inner = tok_text[1:-1]
    else:
        return tok_text
    if "\\" not in inner:
        return inner
    out = []
    i = 0
    n = len(inner)
    while i < n:
        c = inner[i]
        if c != "\\" or i + 1 >= n:
            out.append(c)
            i += 1
            continue
        e = inner[i + 1]
        if e in _ESCAPES:
            out.append(_ESCAPES[e])
            i += 2
        elif e == "x" and i + 3 < n + 1:
            try:
                out.append(chr(int(inner[i + 2:i + 4], 16)))
                i += 4
            except ValueError:
                out.append(e)
                i += 2
        elif e == "u":
            try:
                if i + 2 < n and inner[i + 2] == "{":
                    j = inner.index("}", i + 3)
                    out.append(chr(int(inner[i + 3:j], 16)))
                    i = j + 1
                else:
                    out.append(chr(int(inner[i + 2:i + 6], 16)))
                    i += 6
            except (ValueError, IndexError):
                out.append(e)
                i += 2
        elif e == "\n":
            i += 2  # line continuation
        else:
            out.append(e)
            i += 2
    return "".join(out)


def _to_pattern(node):
    """Re-interpret an expression as a destructuring pattern (Babel does this
    for `{a, b} = x`)."""
    if node["type"] == "ObjectExpression":
        props = []
        for p in node.get("properties", []):
            if p["type"] == "ObjectProperty":
                q = dict(p)
                q["value"] = _to_pattern(p["value"])
                props.append(q)
            else:
                props.append(p)
        out = dict(node)
        out["type"] = "ObjectPattern"
        out["properties"] = props
        return out
    if node["type"] == "ArrayExpression":
        out = dict(node)
        out["type"] = "ArrayPattern"
        out["elements"] = [(_to_pattern(e) if e else None) for e in node.get("elements", [])]
        return out
    return node


def _shift_offsets(node, delta):
    if isinstance(node, dict):
        if "start" in node:
            node["start"] += delta
        if "end" in node:
            node["end"] += delta
        for v in node.values():
            _shift_offsets(v, delta)
    elif isinstance(node, list):
        for v in node:
            _shift_offsets(v, delta)


def parse(src: str) -> dict:
    """Parse ES-subset source → Babel-shaped Program dict."""
    return Parser(src).parse_program()


# --- JSX (character-level) ----------------------------------------------

def _offset_tree(node, delta):
    """Shift start/end offsets of a sub-parsed AST by delta (used when an
    embedded JSX expression is parsed from a source slice)."""
    if isinstance(node, dict):
        for k, v in node.items():
            if k in ("start", "end") and isinstance(v, int):
                node[k] = v + delta
            else:
                _offset_tree(v, delta)
    elif isinstance(node, list):
        for item in node:
            _offset_tree(item, delta)


def _jsx_sub_expression(src, start, end):
    """Parse src[start:end] as an expression; offsets become absolute."""
    sub = Parser(src[start:end]).parse_expression()
    _offset_tree(sub, start)
    return sub


def _jsx_skip_ws(src, i):
    while i < len(src) and src[i] in " \t\r\n":
        i += 1
    return i


def _jsx_name(src, i):
    j = i
    while j < len(src) and (src[j].isalnum() or src[j] in "_$.-:"):
        j += 1
    return src[i:j], j


def _jsx_balanced_brace(src, i):
    """i points at '{'; returns index AFTER the matching '}' (string/template
    aware)."""
    depth = 0
    n = len(src)
    while i < n:
        c = src[i]
        if c in "'\"":
            q = c
            i += 1
            while i < n and src[i] != q:
                i += 2 if src[i] == "\\" else 1
            i += 1
            continue
        if c == "`":
            i += 1
            while i < n and src[i] != "`":
                i += 2 if src[i] == "\\" else 1
            i += 1
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ParseError(f"unterminated JSX expression at {i}")


def _mk(src, typ, start, end, **kw):
    node = {"type": typ, "start": start, "end": end}
    node.update(kw)
    return node


def _parse_jsx(src, i):
    """Parse a JSX element/fragment starting at src[i] == '<'.
    Returns (node, end_offset).  Truncated input surfaces as ParseError,
    never IndexError — per-file/projected recovery catches ParseError."""
    try:
        return _parse_jsx_inner(src, i)
    except IndexError:
        raise ParseError(f"unterminated JSX at {i}") from None


def _parse_jsx_inner(src, i):
    start = i
    assert src[i] == "<"
    i = _jsx_skip_ws(src, i + 1)
    name, i = _jsx_name(src, i)
    if name == "":
        # fragment <> ... </>
        i = _jsx_skip_ws(src, i)
        if src[i] != ">":
            raise ParseError(f"bad JSX fragment at {i}")
        children, i = _parse_jsx_children(src, i + 1)
        # consume closing </>
        i = _jsx_skip_ws(src, i + 2)
        if src[i] != ">":
            raise ParseError(f"bad JSX fragment close at {i}")
        return _mk(src, "JSXFragment", start, i + 1, children=children), i + 1

    attributes = []
    while True:
        i = _jsx_skip_ws(src, i)
        if i >= len(src):
            raise ParseError("unterminated JSX element")
        if src.startswith("/>", i):
            opening = _mk(src, "JSXOpeningElement", start, i + 2,
                          name=name, attributes=attributes, selfClosing=True)
            elem = _mk(src, "JSXElement", start, i + 2,
                       openingElement=opening, closingElement=None, children=[])
            return elem, i + 2
        if src[i] == ">":
            i += 1
            break
        if src[i] == "{":
            # spread attribute {...expr}
            j = _jsx_balanced_brace(src, i)
            expr = _jsx_sub_expression(src, i + 1, j - 1)
            attributes.append(_mk(src, "JSXSpreadAttribute", i, j, argument=expr))
            i = j
            continue
        a_start = i
        a_name, i = _jsx_name(src, i)
        if not a_name:
            raise ParseError(f"bad JSX attribute at {i}")
        i = _jsx_skip_ws(src, i)
        value = None
        if i < len(src) and src[i] == "=":
            i = _jsx_skip_ws(src, i + 1)
            if src[i] in "'\"":
                q = src[i]
                j = src.index(q, i + 1)
                value = _mk(src, "StringLiteral", i, j + 1, value=src[i + 1:j])
                i = j + 1
            elif src[i] == "{":
                j = _jsx_balanced_brace(src, i)
                inner = _jsx_sub_expression(src, i + 1, j - 1)
                value = _mk(src, "JSXExpressionContainer", i, j, expression=inner)
                i = j
            elif src[i] == "<":
                value, i = _parse_jsx(src, i)
        attributes.append(_mk(src, "JSXAttribute", a_start, i,
                              name=a_name, value=value))

    opening_end = i
    opening = _mk(src, "JSXOpeningElement", start, opening_end,
                  name=name, attributes=attributes, selfClosing=False)
    children, i = _parse_jsx_children(src, i)
    # closing </name >
    close_start = i
    i = _jsx_skip_ws(src, i + 2)
    _cname, i = _jsx_name(src, i)
    i = _jsx_skip_ws(src, i)
    if i >= len(src) or src[i] != ">":
        raise ParseError(f"bad JSX closing tag at {i}")
    closing = _mk(src, "JSXClosingElement", close_start, i + 1, name=_cname)
    elem = _mk(src, "JSXElement", start, i + 1, openingElement=opening,
               closingElement=closing, children=children)
    return elem, i + 1


# Vue templates keep whitespace-only JSXText nodes (Babel emits them;
# the JSX goldens run with them stripped) — toggled by the .vue lowering.
JSX_KEEP_WS_TEXT = False


def _parse_jsx_children(src, i):
    """Children until (but not consuming) a '</'. Returns (children, i)."""
    def flush_text(children, text_start, i):
        if i > text_start and (src[text_start:i].strip() or JSX_KEEP_WS_TEXT):
            children.append(_mk(src, "JSXText", text_start, i,
                                value=src[text_start:i]))

    children = []
    n = len(src)
    text_start = i
    while i < n:
        if src.startswith("</", i):
            flush_text(children, text_start, i)
            return children, i
        if src[i] == "<":
            flush_text(children, text_start, i)
            child, i = _parse_jsx(src, i)
            children.append(child)
            text_start = i
            continue
        if src[i] == "{":
            flush_text(children, text_start, i)
            j = _jsx_balanced_brace(src, i)
            inner_src = src[i + 1:j - 1]
            if inner_src.strip().startswith("/*") or not inner_src.strip():
                # comment / empty container — emit empty expression
                children.append(_mk(src, "JSXExpressionContainer", i, j,
                                    expression=None))
            else:
                expr = _jsx_sub_expression(src, i + 1, j - 1)
                children.append(_mk(src, "JSXExpressionContainer", i, j,
                                    expression=expr))
            i = j
            text_start = i
            continue
        i += 1
    raise ParseError("unterminated JSX children")
