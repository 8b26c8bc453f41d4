"""JS AST → CPG lowering (the jssrc2cpg-equivalent frontend).

Fresh Python implementation of the reference's lowering conventions
(jssrc2cpg astcreation/*.scala — file:line cites inline): `:program`
module method with a `this` parameter, every operation a CALL node with a
canonical `<operator>.*` name, ECMAScript call shape (receiver/base/args
with argument indices -1/0/1..n), object/array literal tmp-lowering,
destructuring lowering, for-in/of iterator desugaring, closure method refs
with capture tracking.
"""

from __future__ import annotations

import re
from typing import Optional

from joern_spark.cpg.core import Ast, Cpg, Node
from joern_spark.frontends.js.builtins import ARRAY_FACTORY, GLOBAL_BUILTINS
from joern_spark.frontends.js.jsparser import _to_pattern, parse

ANY = "ANY"
STATIC = "STATIC_DISPATCH"
DYNAMIC = "DYNAMIC_DISPATCH"
DYNAMIC_UNKNOWN_FULL_NAME = "<unknownFullName>"
MAX_CODE_LENGTH = 1000

TS_BUILTIN_TYPES = {"string": "__ecma.String", "number": "__ecma.Number",
                    "boolean": "__ecma.Boolean"}


def _ts_type_full(ts_type):
    if not ts_type:
        return ANY
    if ts_type.endswith("[]"):
        return "__ecma.Array"
    return TS_BUILTIN_TYPES.get(ts_type, ANY)


# typeFor (TypeHelper.scala:59-80): keyword types map to __ecma.*; type
# REFERENCES keep their raw annotation text (resolved later by
# XTypeRecovery).  Distinct from _ts_type_full, which is the
# typeFullName-if-builtin-else-ANY rule.
TS_KEYWORD_TYPES = {
    "boolean": "__ecma.Boolean", "bigint": "__ecma.Number",
    "null": "__ecma.Null", "number": "__ecma.Number",
    "object": "__ecma.Object", "string": "__ecma.String",
    "symbol": "__ecma.Symbol", "Number": "__ecma.Number",
    "String": "__ecma.String",
    "unknown": ANY, "void": ANY, "undefined": ANY, "never": ANY, "any": ANY,
}

JS_BUILTIN_FULL = {
    "ANY", "__ecma.Array", "__ecma.Number", "__ecma.String",
    "__ecma.Boolean", "__ecma.Null", "__ecma.Math", "__ecma.Symbol",
    "__whatwg.console", "__ecma.Object", "__ecma.BigInt",
}


def ts_annotation_full(ts_type):
    """typeFor equivalent over our captured annotation text."""
    if not ts_type:
        return None
    if ts_type.endswith("[]"):
        return "__ecma.Array"
    return TS_KEYWORD_TYPES.get(ts_type, ts_type)

OPERATORS = {
    "=": "<operator>.assignment",
    "+=": "<operator>.assignmentPlus",
    "-=": "<operator>.assignmentMinus",
    "*=": "<operator>.assignmentMultiplication",
    "/=": "<operator>.assignmentDivision",
    "%=": "<operator>.assignmentModulo",
    "**=": "<operator>.assignmentExponentiation",
    "&=": "<operator>.assignmentAnd",
    "&&=": "<operator>.assignmentAnd",
    "|=": "<operator>.assignmentOr",
    "||=": "<operator>.assignmentOr",
    "^=": "<operator>.assignmentXor",
    "<<=": "<operator>.assignmentShiftLeft",
    ">>=": "<operator>.assignmentArithmeticShiftRight",
    ">>>=": "<operator>.assignmentLogicalShiftRight",
    "??=": "<operator>.notNullAssert",
}

BINARY_OPERATORS = {
    "+": "<operator>.addition",
    "-": "<operator>.subtraction",
    "/": "<operator>.division",
    "%": "<operator>.modulo",
    "*": "<operator>.multiplication",
    "**": "<operator>.exponentiation",
    "&": "<operator>.and",
    ">>": "<operator>.arithmeticShiftRight",
    ">>>": "<operator>.arithmeticShiftRight",
    "<<": "<operator>.shiftLeft",
    "^": "<operator>.xor",
    "==": "<operator>.equals",
    "===": "<operator>.equals",
    "!=": "<operator>.notEquals",
    "!==": "<operator>.notEquals",
    "in": "<operator>.in",
    ">": "<operator>.greaterThan",
    "<": "<operator>.lessThan",
    ">=": "<operator>.greaterEqualsThan",
    "<=": "<operator>.lessEqualsThan",
    "instanceof": "<operator>.instanceOf",
    "||": "<operator>.logicalOr",
    "|": "<operator>.or",
    "&&": "<operator>.logicalAnd",
    "??": "<operator>.logicalOr",
}

UNARY_OPERATORS = {
    "void": "<operator>.void",
    "delete": "<operator>.delete",
    "!": "<operator>.logicalNot",
    "+": "<operator>.plus",
    "-": "<operator>.minus",
    "~": "<operator>.bitNot",
    "typeof": "<operator>.instanceOf",
}


class Scope:
    """One element of the PERSISTENT scope tree (VariableScopeManager's
    ScopeElement): pops move the cursor up but elements survive so that
    reference linking can run over the whole file at the end."""

    __slots__ = ("kind", "method", "block", "capturing_ref", "variables", "parent")

    def __init__(self, kind: str, method: Optional[Node] = None,
                 parent: Optional["Scope"] = None):
        self.kind = kind  # "method" | "block"
        self.method = method  # owning METHOD node for method scopes
        self.block: Optional[Node] = None  # the method's body BLOCK
        self.capturing_ref: Optional[Node] = None  # METHOD_REF, if any
        self.variables: dict[str, Node] = {}
        self.parent = parent


class ScopeManager:
    """Behavioral port of x2cpg VariableScopeManager: declarations register
    in a persistent scope tree; identifier references are PENDING until the
    file is fully lowered, then `finalize` resolves them —
    createVariableReferenceLinks (VariableScopeManager.scala:334-396):

    - unresolved names create a LOCAL in the reference's enclosing METHOD
      scope block (resolve:451-466),
    - references that cross method boundaries materialize a capture chain:
      a CLOSURE_BINDING (id = methodFullName:var, CAPTURE edge from the
      method's METHOD_REF) plus a shadow LOCAL with that closureBindingId
      in each crossed method; the identifier REFs the innermost shadow and
      each binding REFs the next level out (nextLinkStep:366-395)."""

    def __init__(self, cpg: Cpg):
        self.cpg = cpg
        self.current: Optional[Scope] = None
        # (name, identifier_node, scope_at_use)
        self.pending: list[tuple[str, Node, Scope]] = []

    # --- stack interface used by the lowerer --------------------------------
    def push_method(self, method: Node, capturing_ref: Optional[Node] = None):
        self.current = Scope("method", method, parent=self.current)
        self.current.capturing_ref = capturing_ref

    def push_block(self):
        self.current = Scope("block", parent=self.current)

    def set_scope_block(self, block: Node):
        self.current.block = block

    def set_capturing_ref(self, ref: Optional[Node]):
        scope = self._enclosing_method(self.current)
        if scope is not None:
            scope.capturing_ref = ref

    def add_variable(self, name: str, node: Node, function_scoped: bool = False):
        """`var` declarations are FUNCTION-scoped (ScopeType.MethodScope):
        they register in the nearest enclosing method scope; the LOCAL node
        itself stays where it was declared."""
        scope = self._enclosing_method(self.current) if function_scoped else self.current
        (scope or self.current).variables[name] = node

    def add_reference(self, name: str, ident: Node):
        self.pending.append((name, ident, self.current))

    def pop(self):
        self.current = self.current.parent

    # --- end-of-file linking -------------------------------------------------
    @staticmethod
    def _enclosing_method(scope: Optional[Scope]) -> Optional[Scope]:
        while scope is not None and scope.kind != "method":
            scope = scope.parent
        return scope

    @staticmethod
    def _try_resolve(scope: Scope, name: str) -> Optional[Node]:
        while scope is not None:
            v = scope.variables.get(name)
            if v is not None:
                return v
            scope = scope.parent
        return None

    def _create_local(self, scope: Scope, name: str,
                      closure_binding_id: Optional[str] = None) -> Node:
        local = Node("LOCAL", name=name, code=name, type_full_name="ANY",
                     order=0, closure_binding_id=closure_binding_id)
        self.cpg.add_node(local)
        if scope.block is not None:
            self.cpg.add_edge(scope.block, local, "AST")
        return local

    def finalize(self):
        """createVariableReferenceLinks: resolve + link every pending ref.

        Resolution order: shallowest use first (stable).  The reference's
        expected outputs require the OUTER use of an undeclared name to
        win — its local is created in the outer method and inner uses
        become captures (MixedAstCreationPassTests: the two-anonymous-
        functions and hoisted-function cases both place the local in foo).
        Ordering by scope depth realizes that invariant for hoisted AND
        non-hoisted recording orders; sibling scopes stay independent
        because creation in one is invisible to the other's chain."""
        def depth(scope: Optional[Scope]) -> int:
            d = 0
            while scope is not None:
                d += 1
                scope = scope.parent
            return d

        ordered = sorted(self.pending, key=lambda p: depth(p[2]))
        captured_locals: dict[str, Node] = {}
        captured_bindings: dict[str, Node] = {}
        for name, ident, use_scope in ordered:
            var_node = self._try_resolve(use_scope, name)
            if var_node is None:
                m_scope = self._enclosing_method(use_scope)
                if m_scope is None:
                    continue
                var_node = self._create_local(m_scope, name)
                # the materialized local sits at its first (shallowest) use
                var_node.line, var_node.column = ident.line, ident.column
                m_scope.variables[name] = var_node
            # linking walk (nextLinkStep)
            scope = use_scope
            current_ref = ident
            crossed_methods: list[Node] = []
            while scope is not None:
                if scope.variables.get(name) is not None:
                    self.cpg.add_edge(current_ref, var_node, "REF")
                    break
                if scope.kind == "method":
                    full = scope.method.full_name if scope.method else ""
                    cb_id = f"{full}:{name}"
                    existing = captured_locals.get(cb_id)
                    if existing is not None:
                        # Terminate(existing): a capture chain for this
                        # (method, name) already exists — reuse its shadow
                        self.cpg.add_edge(current_ref, existing, "REF")
                        break
                    binding = Node("CLOSURE_BINDING", code="<empty>",
                                   closure_binding_id=cb_id,
                                   evaluation_strategy="BY_REFERENCE")
                    self.cpg.add_node(binding)
                    if scope.capturing_ref is not None:
                        self.cpg.add_edge(scope.capturing_ref, binding, "CAPTURE")
                    shadow = self._create_local(scope, name,
                                                closure_binding_id=cb_id)
                    captured_locals[cb_id] = shadow
                    captured_bindings[cb_id] = binding
                    self.cpg.add_edge(current_ref, shadow, "REF")
                    current_ref = binding
                    if scope.method is not None:
                        crossed_methods.append(scope.method)
                scope = scope.parent
            # legacy capture pairs consumed by the DDG/engine layers
            for m in crossed_methods:
                self.cpg.captures.append((var_node, m))


def vue_parse_source(src: str) -> str:
    """Same-length parseable source for a Vue SFC: style blocks and HTML
    comments blanked, `<script ...>`/`</script>` tags blanked (content
    kept), template kept as JSX with `{{ expr }}` interpolations rewritten
    in place to `{ expr }` containers — offsets are preserved so every
    code field still reads the ORIGINAL .vue text (the role astgen's
    `-t vue` transform plays for the reference)."""
    out = list(src)
    n = len(src)

    def blank(a: int, b: int):
        for k in range(a, min(b, n)):
            if out[k] != "\n":
                out[k] = " "

    i = 0
    while i < n:
        if src.startswith("<!--", i):
            j = src.find("-->", i)
            j = n if j < 0 else j + 3
            blank(i, j)
            i = j
        elif src.startswith("<style", i):
            j = src.find("</style>", i)
            j = n if j < 0 else j + len("</style>")
            blank(i, j)
            i = j
        elif src.startswith("<script", i):
            open_end = src.find(">", i)
            close = src.find("</script>", i)
            if open_end < 0 or close < 0:
                i += 1
                continue
            blank(i, open_end + 1)
            blank(close, close + len("</script>"))
            i = close + len("</script>")
        elif src.startswith("<template", i):
            depth = 0
            j = i
            while j < n:
                if src.startswith("<template", j):
                    depth += 1
                    j += len("<template")
                elif src.startswith("</template>", j):
                    depth -= 1
                    j += len("</template>")
                    if depth == 0:
                        break
                else:
                    j += 1
            k = i
            while k < j:
                if src.startswith("{{", k):
                    out[k + 1] = " "
                    m = src.find("}}", k + 2)
                    if m >= 0 and m < j:
                        out[m] = " "
                        k = m + 2
                        continue
                k += 1
            i = j
        else:
            i += 1
    return "".join(out)


class AstLowerer:
    """One instance per document (mirrors jssrc2cpg AstCreator)."""

    def __init__(self, src: str, filename: str = "script.js",
                 cpg: Cpg | None = None):
        self.src = src
        self.filename = filename
        # Vue SFCs parse a same-length transformed source (script tags and
        # style/comment sections blanked, {{ }} → JSX containers) while all
        # code fields still read from the ORIGINAL src via identical offsets.
        # EJS templates use the same dual-text trick: preprocess_ejs yields a
        # same-length JS view (output tags → `ap(...)`), and because code
        # fields read the ORIGINAL template, the fake `ap` callee surfaces as
        # `<%` — which _ejs_output_call_name renames to escapeFn/__append
        # (AstGenRunner.scala:225-246 route + AstCreatorHelper.ejsOutputCallName).
        if filename.endswith(".vue"):
            self._parse_src = vue_parse_source(src)
        elif filename.endswith(".ejs"):
            from joern_spark.extract import preprocess_ejs
            self._parse_src = preprocess_ejs(src)
        else:
            self._parse_src = src
        # multi-file projects lower every file into ONE shared graph (the
        # reference CPG holds all compilation units of a project)
        self.cpg = cpg if cpg is not None else Cpg(filename)
        # watermark: finalization passes only touch nodes this lowerer adds
        # (multi-file projects share one Cpg)
        self._node_start = len(self.cpg.nodes)
        self.scope = ScopeManager(self.cpg)
        self.method_parent_stack: list[Node] = []
        self.local_parent_stack: list[Node] = []
        self.used_variable_names: dict[str, int] = {}
        self.function_full_names: set[str] = set()
        self.function_key_to_name: dict[str, tuple[str, str]] = {}
        self.closure_counter = 0
        self.scope_name_stack: list[str] = []
        self._pending_inherits: list[tuple[str, str]] = []
        self._anon_class_counter = 0
        # line index
        self.line_starts = [0]
        for i, ch in enumerate(src):
            if ch == "\n":
                self.line_starts.append(i + 1)

    # --- positions / code -----------------------------------------------------
    def line_of(self, offset: int) -> int:
        lo, hi = 0, len(self.line_starts) - 1
        while lo < hi:
            mid = (lo + hi + 1) >> 1
            if self.line_starts[mid] <= offset:
                lo = mid
            else:
                hi = mid - 1
        return lo + 1

    def col_of(self, offset: int) -> int:
        return offset - self.line_starts[self.line_of(offset) - 1]

    def code_of_node(self, js) -> str:
        s = max(js["start"], 0)
        e = min(js["end"], len(self.src))
        return _shorten(self.src[s:e].strip())

    # --- node factories ---------------------------------------------------------
    def _pos(self, js) -> dict:
        return {
            "line": self.line_of(js["start"]),
            "column": self.col_of(js["start"]),
            "start": js["start"],
            "end": js["end"],
        }

    def call_node(self, js, code: str, name: str, dispatch: str) -> Node:
        full = name if dispatch == STATIC else DYNAMIC_UNKNOWN_FULL_NAME
        return Node("CALL", code=code, name=name, method_full_name=full,
                    dispatch_type=dispatch, type_full_name=ANY, **self._pos(js))

    def call_node_at(self, code, name, dispatch, line, column) -> Node:
        full = name if dispatch == STATIC else DYNAMIC_UNKNOWN_FULL_NAME
        return Node("CALL", code=code, name=name, method_full_name=full,
                    dispatch_type=dispatch, type_full_name=ANY, line=line, column=column)

    def identifier_node(self, js, name: str) -> Node:
        # console/Math get a dynamic instance type hint at creation time
        # (AstNodeBuilder.scala:148-155) — seed data for XTypeRecovery.
        hint = {"console": ("__whatwg.console",), "Math": ("__ecma.Math",)}.get(name, ())
        return Node("IDENTIFIER", name=name, code=name, type_full_name=ANY,
                    dynamic_type_hint_full_name=hint, **self._pos(js))

    def literal_node(self, js, code: str, type_full_name: str = ANY) -> Node:
        return Node("LITERAL", code=code, type_full_name=type_full_name, **self._pos(js))

    def field_identifier_node(self, js, name: str) -> Node:
        return Node("FIELD_IDENTIFIER", canonical_name=name, code=name, **self._pos(js))

    def block_node(self, js, code: str = "<empty>") -> Node:
        return Node("BLOCK", code=code, type_full_name=ANY, **self._pos(js))

    def local_node(self, js, name: str) -> Node:
        return Node("LOCAL", name=name, code=name, type_full_name=ANY, order=0, **self._pos(js))

    def unused_name(self, prefix: str) -> str:
        counter = self.used_variable_names.get(prefix, -1) + 1
        self.used_variable_names[prefix] = counter
        return f"{prefix}_{counter}"

    # --- callAst (CallAstBuilder.callAst semantics) -----------------------------
    def call_ast(self, call: Node, arguments: list[Ast], base: Optional[Ast] = None,
                 receiver: Optional[Ast] = None) -> Ast:
        for i, a in enumerate(arguments):
            if a.root is not None and a.root.is_expression:
                a.root.argument_index = i + 1
        base_root = base.root if base is not None else None
        if base_root is not None and base_root.is_expression:
            base_root.argument_index = 0
        if receiver is None and base is not None:
            receiver_roots = [base_root] if base_root is not None else []
        else:
            receiver_roots = []
            if receiver is not None and receiver.root is not None:
                if receiver.root.is_expression:
                    receiver.root.argument_index = -1
                receiver_roots = [receiver.root]
        ast = Ast(call)
        if receiver is not None:
            ast.with_child(receiver)
        if base is not None:
            ast.with_child(base)
        ast.with_children(arguments)
        if base_root is not None:
            ast.with_typed_edge("argument", call, base_root)
        ast.with_arg_edges(call, [a.root for a in arguments if a.root is not None])
        for r in receiver_roots:
            ast.with_typed_edge("receiver", call, r)
        return ast

    # --- composite call builders (AstNodeBuilder.scala) --------------------------
    def assignment_call(self, dest: Ast, source: Ast, code: str, line, column) -> Ast:
        call = self.call_node_at(code, "<operator>.assignment", STATIC, line, column)
        return self.call_ast(call, [dest, source])

    def field_access_call(self, base: Ast, part: Node, line, column) -> Ast:
        code = f"{_code_of(base.root)}.{part.code}"
        call = self.call_node_at(code, "<operator>.fieldAccess", STATIC, line, column)
        return self.call_ast(call, [base, Ast(part)])

    def index_access_call(self, base: Ast, part: Ast, line, column) -> Ast:
        code = f"{_code_of(base.root)}[{_code_of(part.root)}]"
        call = self.call_node_at(code, "<operator>.indexAccess", STATIC, line, column)
        return self.call_ast(call, [base, part])

    def ternary_call(self, test: Ast, true_ast: Ast, false_ast: Ast, line, column) -> Ast:
        code = f"{_code_of(test.root)} ? {_code_of(true_ast.root)} : {_code_of(false_ast.root)}"
        call = self.call_node_at(code, "<operator>.conditional", STATIC, line, column)
        return self.call_ast(call, [test, true_ast, false_ast])

    def equals_call(self, dest: Ast, source: Ast, line, column) -> Ast:
        code = f"{_code_of(dest.root)} === {_code_of(source.root)}"
        call = self.call_node_at(code, "<operator>.equals", STATIC, line, column)
        return self.call_ast(call, [dest, source])

    def void_call(self, line, column) -> Node:
        return self.call_node_at("void 0", "<operator>.void", STATIC, line, column)

    # --- entry -------------------------------------------------------------------
    def create(self, link_inheritance: bool = True) -> Cpg:
        if self.filename.endswith(".vue"):
            from joern_spark.frontends.js import jsparser as _jsp
            _jsp.JSX_KEEP_WS_TEXT = True
            try:
                program = parse(self._parse_src)
            finally:
                _jsp.JSX_KEEP_WS_TEXT = False
            # astgen's vue transform hoists the script imports above the
            # template element (VueJsDomAstCreationPassTests identifier
            # order: imports → template → class → exports)
            body = program.get("body", [])
            imports = [s for s in body if s.get("type") == "ImportDeclaration"]
            templates = [s for s in body
                         if s.get("type") == "ExpressionStatement"
                         and s.get("expression", {}).get("type") in
                         ("JSXElement", "JSXFragment")]
            rest = [s for s in body if s not in imports and s not in templates]
            program["body"] = imports + templates + rest
        else:
            program = parse(self._parse_src)
        # content mirrors File.contents with file-content enabled
        # (CodeDumperFromContentTests) — same str object, no copy
        file_node = Node("FILE", name=self.filename, code="<empty>", order=0,
                         content=self.src)
        ns = Node("NAMESPACE_BLOCK", name="<global>",
                  full_name=f"{self.filename}:<global>", filename=self.filename, order=1)
        self.method_parent_stack.append(ns)
        prog_ast = self._program_method(program)
        ast = Ast(file_node).with_child(Ast(ns).with_child(prog_ast))
        ast.store(self.cpg)
        while self.scope.current is not None:
            self.scope.pop()
        self.scope.finalize()
        self._add_contains_edges()
        self._link_parameter_outs()
        self._add_file_and_type_edges()
        # multi-file projects defer linking until every file is lowered, so
        # cross-file supertypes resolve to the real TYPE_DECL, not a stub
        pending = getattr(self.cpg, "pending_inherits", [])
        pending.extend(self._pending_inherits)
        self.cpg.pending_inherits = pending
        if link_inheritance:
            self._link_inheritance()
        return self.cpg

    def _link_inheritance(self):
        """TypeHierarchyPass equivalent: INHERITS_FROM between TYPE_DECLs
        recorded during class lowering (x2cpg typerelations)."""
        decls_by_name = {}
        for n in self.cpg.nodes:
            if n.label == "TYPE_DECL":
                decls_by_name.setdefault(n.name, n)
        pending = getattr(self.cpg, "pending_inherits", self._pending_inherits)
        self.cpg.pending_inherits = []
        for child_name, super_name in pending:
            if super_name not in decls_by_name:
                # unknown supertype: external TYPE_DECL stub so the
                # hierarchy (and inheritsFromTypeFullName) is still recorded
                stub = Node("TYPE_DECL", name=super_name, full_name=super_name,
                            code=super_name, is_external=True)
                self.cpg.add_node(stub)
                decls_by_name[super_name] = stub
            child = decls_by_name.get(child_name)
            sup = decls_by_name.get(super_name)
            if child is not None and sup is not None:
                self.cpg.add_edge(child, sup, "INHERITS_FROM")

    def _program_method(self, program) -> Ast:
        name = ":program"
        full_name = f"{self.filename}:{name}"
        method = Node("METHOD", name=name, full_name=full_name, code=name,
                      filename=self.filename, order=1,
                      line=self.line_of(program["start"]), column=self.col_of(program["start"]))
        type_decl = Node("TYPE_DECL", name=name, full_name=full_name,
                         filename=self.filename, code=name)
        binding = Node("BINDING", name="", code="<empty>")
        td_ast = Ast(type_decl)
        td_ast.with_typed_edge("binds", type_decl, binding)
        td_ast.nodes.append(binding)
        td_ast.with_typed_edge("ref", binding, method)

        self.method_parent_stack.append(method)
        block = self.block_node(program)
        self.scope.push_method(method)
        self.scope.set_scope_block(block)
        self.scope_name_stack.append(name)
        self.local_parent_stack.append(block)

        this_param = Node("METHOD_PARAMETER_IN", name="this", code="this", index=0,
                          order=0, evaluation_strategy="BY_VALUE", type_full_name=ANY,
                          line=method.line, column=method.column)
        self.scope.add_variable("this", this_param)

        children = self.block_statement_asts(program["body"])

        self.local_parent_stack.pop()
        self.scope_name_stack.pop()
        self.scope.pop()
        self.method_parent_stack.pop()

        ret = Node("METHOD_RETURN", code="RET", type_full_name=ANY,
                   line=method.line, column=method.column)
        modifier = Node("MODIFIER", modifier_type="MODULE", code="<empty>")
        m_ast = (
            Ast(method)
            .with_child(Ast(this_param))
            .with_child(Ast(block).with_children(children))
            .with_child(Ast(modifier))
            .with_child(Ast(ret))
        )
        return td_ast.with_child(m_ast)

    # --- statements ---------------------------------------------------------------
    def block_statement_asts(self, stmts: list) -> list[Ast]:
        ordered = sorted(
            stmts,
            key=lambda s: 0 if s["type"] == "ImportDeclaration"
            else 1 if s["type"] == "FunctionDeclaration" else 2,
        )
        return [self.ast_for_node_with_fref_and_call(s) for s in ordered]

    def ast_for_node_with_fref_and_call(self, js) -> Ast:
        if js["type"] in ("FunctionDeclaration",):
            return self.ast_for_function(js, create_reference=True, create_assignment=True)
        return self.ast_for_node(js)

    def ast_for_node_with_fref(self, js) -> Ast:
        if js["type"] in ("FunctionDeclaration", "FunctionExpression", "ArrowFunctionExpression"):
            return self.ast_for_function(js, create_reference=True)
        return self.ast_for_node(js)

    def ast_for_node(self, js) -> Ast:  # noqa: C901 (dispatch table)
        t = js["type"]
        fn = getattr(self, f"_ast_{_snake(t)}", None)
        if fn is None:
            return Ast(Node("UNKNOWN", code=self.code_of_node(js),
                            parser_type_name=t, **self._pos(js)))
        return fn(js)

    # statements
    def _ast_expression_statement(self, js) -> Ast:
        return self.ast_for_node_with_fref(js["expression"])

    def _ast_empty_statement(self, js) -> Ast:
        return Ast(self.block_node(js))

    def _ast_block_statement(self, js) -> Ast:
        block = self.block_node(js, self.code_of_node(js))
        self.scope.push_block()
        self.local_parent_stack.append(block)
        children = self.block_statement_asts(js["body"])
        self.local_parent_stack.pop()
        self.scope.pop()
        return Ast(block).with_children(children)

    def _ast_return_statement(self, js) -> Ast:
        code = self.code_of_node(js).rstrip(";")
        ret = Node("RETURN", code=code, **self._pos(js))
        if js.get("argument") is not None:
            arg = self.ast_for_node_with_fref(js["argument"])
            if arg.root is not None and arg.root.is_expression:
                arg.root.argument_index = 1
            return Ast(ret).with_child(arg).with_arg_edges(ret, [arg.root])
        return Ast(ret)

    # YieldExpression lowers like a return (AstCreator.scala:179)
    def _ast_yield_expression(self, js) -> Ast:
        return self._ast_return_statement(js)

    def _ast_with_statement(self, js) -> Ast:
        """astForWithStatement (AstForStatementsCreator.scala:43-58): a
        BLOCK holding the object expression followed by the body's
        statements (flattened when the body is a block)."""
        block = self.block_node(js, self.code_of_node(js))
        self.scope.push_block()
        self.local_parent_stack.append(block)
        obj = self.ast_for_node_with_fref(js["object"])
        body = js["body"]
        if body["type"] == "BlockStatement":
            children = [obj] + self.block_statement_asts(body["body"])
        else:
            children = [obj, self.ast_for_node_with_fref(body)]
        self.local_parent_stack.pop()
        self.scope.pop()
        return Ast(block).with_children(children)

    def _ast_tstype_assertion(self, js) -> Ast:
        """TS `<T>expr`: pass-through to the asserted expression."""
        return self.ast_for_node_with_fref(js["expression"])

    def _ast_tsinterface_declaration(self, js) -> Ast:
        """TS interface: TYPE_DECL(code "interface X") with an <init>
        member + fake constructor (code "new: X", interfaceConstructor in
        AstForTypesCreator), property/index-signature MEMBERs with
        source-span codes, and call/method signatures as bodyless METHODs
        plus MEMBER mirrors."""
        name = js["id"]["name"]
        full_name = f"{self.filename}:{':'.join(self.scope_name_stack)}:{name}"
        td = Node("TYPE_DECL", name=name, full_name=full_name,
                  code=f"interface {name}", filename=self.filename,
                  **self._pos(js))
        td_ast = Ast(td)
        self.method_parent_stack.append(td)
        self.scope_name_stack.append(name)

        init_mem = Node("MEMBER", name="<init>", code="new",
                        type_full_name=full_name, **self._pos(js))
        td_ast.with_child(Ast(init_mem))

        def bodyless_method(mname, params_js, member, code):
            fake = {
                "type": "FunctionExpression",
                "id": {"name": mname, "start": member["start"],
                       "end": member["start"], "type": "Identifier"},
                "params": params_js,
                "body": {"type": "BlockStatement", "body": [],
                         "start": member["end"], "end": member["end"]},
                "start": member["start"], "end": member["end"],
            }
            self.ast_for_function(fake, code_override=code)

        for member in js["body"]:
            t = member["type"]
            code = self.code_of_node(member)
            if t == "TSPropertySignature":
                key_name = member["key"].get("name",
                                             self.code_of_node(member["key"]))
                td_ast.with_child(Ast(Node(
                    "MEMBER", name=_strip_quotes(key_name), code=code,
                    type_full_name=_ts_type_full(member.get("ts_type")),
                    **self._pos(member))))
            elif t == "TSIndexSignature":
                td_ast.with_child(Ast(Node(
                    "MEMBER", name=member["id"]["name"], code=code,
                    **self._pos(member))))
            elif t == "TSCallSignature":
                lam = self.next_closure_name()
                bodyless_method(lam, member.get("params", []), member, code)
                td_ast.with_child(Ast(Node("MEMBER", name=lam, code=code,
                                           **self._pos(member))))
            elif t == "TSMethodSignature":
                key_name = member["key"].get("name",
                                             self.code_of_node(member["key"]))
                bodyless_method(key_name, member.get("params", []), member, code)
                td_ast.with_child(Ast(Node("MEMBER", name=key_name, code=code,
                                           **self._pos(member))))

        # interfaceConstructor: explicit `new (...)` construct signature if
        # present, else the fake constructor `new: <name>`
        construct = next((m for m in js["body"]
                          if m["type"] == "TSConstructSignature"), None)
        if construct is not None:
            bodyless_method("<init>", construct.get("params", []), construct,
                            self.code_of_node(construct))
        else:
            fake_ctor = {
                "type": "FunctionExpression",
                "id": {"name": "<init>", "start": js["start"],
                       "end": js["start"], "type": "Identifier"},
                "params": [],
                "body": {"type": "BlockStatement", "body": [],
                         "start": js["start"], "end": js["start"]},
                "start": js["start"], "end": js["start"],
            }
            self.ast_for_function(fake_ctor, code_override=f"new: {name}")
        self._mark_constructor(f"{full_name}:<init>")

        self.scope_name_stack.pop()
        self.method_parent_stack.pop()
        # the TYPE_DECL is the statement's node (reference returns the
        # typedecl ast, giving interfaces a block-order slot)
        return td_ast

    def _ast_tstype_alias_declaration(self, js) -> Ast:
        """TS `type X = {...}`: TYPE_DECL with typed property MEMBERs
        (astForTypeAlias); non-object aliases are a bare TYPE_DECL."""
        name = js["id"]["name"]
        full_name = f"{self.filename}:{':'.join(self.scope_name_stack)}:{name}"
        td = Node("TYPE_DECL", name=name, full_name=full_name,
                  code=f"type {name}", filename=self.filename,
                  # non-object aliases record the aliased type so
                  # AliasLinkerPass can add the ALIAS_OF edge
                  alias_type_full_name=js.get("aliased_type") or None,
                  **self._pos(js))
        td_ast = Ast(td)
        for member in js.get("body") or []:
            if member["type"] != "TSPropertySignature":
                continue
            key_name = member["key"].get("name",
                                         self.code_of_node(member["key"]))
            td_ast.with_child(Ast(Node(
                "MEMBER", name=_strip_quotes(key_name),
                code=self.code_of_node(member),
                type_full_name=_ts_type_full(member.get("ts_type")),
                **self._pos(member))))
        return td_ast

    def _ast_tsenum_declaration(self, js) -> Ast:
        """TS enum: TYPE_DECL(code "enum X") + one MEMBER per entry (source
        span codes) + a <clinit> static initializer holding the entry
        assignments (astsForEnumMember semantics)."""
        name = js["id"]["name"]
        full_name = f"{self.filename}:{':'.join(self.scope_name_stack)}:{name}"
        td = Node("TYPE_DECL", name=name, full_name=full_name,
                  code=f"enum {name}", filename=self.filename, **self._pos(js))
        td_ast = Ast(td)
        self.method_parent_stack.append(td)
        self.scope_name_stack.append(name)
        inits = []
        for m in js["members"]:
            key_name = m["id"].get("name", self.code_of_node(m["id"]))
            mem = Node("MEMBER", name=_strip_quotes(key_name),
                       code=self.code_of_node(m), **self._pos(m))
            td_ast.with_child(Ast(mem))
            if m.get("initializer") is not None:
                inits.append(m)
        if inits:
            fake = {
                "type": "FunctionExpression",
                "id": {"name": "<clinit>", "start": js["start"],
                       "end": js["start"], "type": "Identifier"},
                "params": [],
                "body": {"type": "BlockStatement", "body": [],
                         "start": js["start"], "end": js["start"]},
                "start": js["start"], "end": js["start"],
            }

            def clinit_body():
                out = []
                for m in inits:
                    key_name = m["id"].get("name", self.code_of_node(m["id"]))
                    lhs = self.identifier_node(m, _strip_quotes(key_name))
                    self.scope.add_reference(lhs.name, lhs)
                    rhs = self.ast_for_node_with_fref(m["initializer"])
                    out.append(self.assignment_call(
                        Ast(lhs), rhs, self.code_of_node(m),
                        self.line_of(m["start"]), self.col_of(m["start"])))
                return out

            self.ast_for_function(fake, code_override="<clinit>",
                                  prelude_builder=clinit_body,
                                  modifiers=("STATIC", "CONSTRUCTOR"))
        self.scope_name_stack.pop()
        self.method_parent_stack.pop()
        return td_ast

    def _ast_tsmodule_declaration(self, js) -> Ast:
        """TS `namespace A[.B.C] { ... }` / `module M { ... }`: a chain of
        NAMESPACE_BLOCK nodes (fullName = scope path), the innermost one
        holding the body block; classes/typedecls inside get namespace-
        qualified full names."""
        parts = js.get("name_parts") or [(js["name"], js["start"])]
        prefix = f"{self.filename}:{':'.join(self.scope_name_stack)}"
        ns_nodes = []
        for idx, (pname, pstart) in enumerate(parts):
            prefix = f"{prefix}:{pname}"
            # first segment's code starts at the `namespace` keyword
            code = self.src[(js["start"] if idx == 0 else pstart):js["end"]]
            if len(code) > MAX_CODE_LENGTH:
                code = code[:MAX_CODE_LENGTH]
            ns = Node("NAMESPACE_BLOCK", name=pname, full_name=prefix,
                      code=code, filename=self.filename, **self._pos(js))
            ns_nodes.append(ns)
            self.scope_name_stack.append(pname)
            self.method_parent_stack.append(ns)
        body_ast = self.ast_for_node_with_fref(js["body"])
        for _ in parts:
            self.scope_name_stack.pop()
            self.method_parent_stack.pop()
        # build bottom-up: with_child snapshots the child's contents, so the
        # innermost namespace must be complete before wrapping it
        cur_ast = Ast(ns_nodes[-1]).with_child(body_ast)
        for ns in reversed(ns_nodes[:-1]):
            cur_ast = Ast(ns).with_child(cur_ast)
        return cur_ast

    def _ast_tsas_expression(self, js) -> Ast:
        """TS `expr as Type` → <operator>.cast(TypeLiteral, expr) with
        possibleTypes=[Type] (astForCastExpression,
        AstForExpressionsCreator.scala:227-236)."""
        return self._cast_call_ast(js)

    def _ast_tstype_assertion(self, js) -> Ast:
        """TS `<Type>expr` — same cast lowering as `as`."""
        return self._cast_call_ast(js)

    def _ast_tssatisfies_expression(self, js) -> Ast:
        """`expr satisfies T` is a pure compile-time check: pass-through
        (TsAstCreationPassTests.scala:121-128 asserts direct arguments)."""
        return self.ast_for_node_with_fref(js["expression"])

    def _cast_call_ast(self, js) -> Ast:
        tpe = ts_annotation_full(js.get("ts_type"))
        possible = (tpe,) if tpe else ()
        lhs = Ast(Node("LITERAL", code=js.get("ts_type") or "<empty>",
                       type_full_name=ANY, possible_types=possible,
                       **self._pos(js)))
        rhs = self.ast_for_node_with_fref(js["expression"])
        call = self.call_node(js, self.code_of_node(js), "<operator>.cast", STATIC)
        call.possible_types = possible
        return self.call_ast(call, [lhs, rhs])

    def _ast_tsnon_null_expression(self, js) -> Ast:
        """astForTSNonNullExpression: `expr!` → <operator>.notNullAssert."""
        arg = self.ast_for_node_with_fref(js["expression"])
        call = self.call_node(js, self.code_of_node(js),
                              "<operator>.notNullAssert", STATIC)
        return self.call_ast(call, [arg])

    def _ast_if_statement(self, js) -> Ast:
        cond = self.ast_for_node_with_fref(js["test"])
        then = self.ast_for_node_with_fref(js["consequent"])
        els = self.ast_for_node_with_fref(js["alternate"]) if js.get("alternate") else None
        node = Node("CONTROL_STRUCTURE", control_structure_type="IF",
                    parser_type_name="IfStatement", code=self.code_of_node(js), **self._pos(js))
        ast = Ast(node).with_child(cond).with_child(then)
        if els is not None:
            ast.with_child(els)
        ast.with_typed_edge("condition", node, cond.root)
        if then.root is not None:
            ast.with_typed_edge("true_body", node, then.root)
        if els is not None and els.root is not None:
            ast.with_typed_edge("false_body", node, els.root)
        return ast

    def _ast_while_statement(self, js) -> Ast:
        cond = self.ast_for_node_with_fref(js["test"])
        body = self.ast_for_node_with_fref(js["body"])
        return self._while_ast(js, cond, [body])

    def _while_ast(self, js, cond: Ast, bodies: list[Ast]) -> Ast:
        node = Node("CONTROL_STRUCTURE", control_structure_type="WHILE",
                    parser_type_name="WhileStatement", code=self.code_of_node(js),
                    **self._pos(js))
        ast = Ast(node).with_child(cond).with_children(bodies)
        ast.with_typed_edge("condition", node, cond.root)
        if bodies and bodies[0].root is not None:
            ast.with_typed_edge("true_body", node, bodies[0].root)
        return ast

    def _ast_do_while_statement(self, js) -> Ast:
        cond = self.ast_for_node_with_fref(js["test"])
        body = self.ast_for_node_with_fref(js["body"])
        node = Node("CONTROL_STRUCTURE", control_structure_type="DO",
                    parser_type_name="DoWhileStatement", code=self.code_of_node(js),
                    **self._pos(js))
        ast = Ast(node).with_child(body).with_child(cond)
        ast.with_typed_edge("condition", node, cond.root)
        if body.root is not None:
            ast.with_typed_edge("do_body", node, body.root)
        return ast

    def _ast_for_statement(self, js) -> Ast:
        init = [self.ast_for_node_with_fref(js["init"])] if js.get("init") else []
        if js.get("test"):
            test = [self.ast_for_node_with_fref(js["test"])]
        else:
            test = [Ast(self.literal_node(js, "true", "__ecma.Boolean"))]
        update = [self.ast_for_node_with_fref(js["update"])] if js.get("update") else []
        body = self.ast_for_node_with_fref(js["body"])
        node = Node("CONTROL_STRUCTURE", control_structure_type="FOR",
                    parser_type_name="ForStatement", code=self.code_of_node(js), **self._pos(js))
        line = node.line

        def wrap(asts, order):
            if len(asts) == 1:
                a = asts[0]
            elif not asts:
                a = Ast(Node("BLOCK", code="<empty>", type_full_name=ANY, line=line))
            else:
                a = Ast(Node("BLOCK", code="<empty>", type_full_name=ANY, line=line)).with_children(asts)
            if a.root is not None:
                a.root.order = order
            return a

        init_b = wrap(init, 1)
        cond_b = wrap(test, 2)
        upd_b = wrap(update, 3)
        if body.root is not None:
            body.root.order = 4
        ast = (Ast(node).with_child(init_b).with_child(cond_b).with_child(upd_b).with_child(body))
        for c in test:
            if c.root is not None:
                ast.with_typed_edge("condition", node, c.root)
        if init_b.root is not None:
            ast.with_typed_edge("for_init", node, init_b.root)
        if upd_b.root is not None:
            ast.with_typed_edge("for_update", node, upd_b.root)
        if body.root is not None:
            ast.with_typed_edge("for_body", node, body.root)
        return ast

    def _ast_labeled_statement(self, js) -> Ast:
        label = js["label"]["name"]
        target = Node("JUMP_TARGET", name=label, code=f"{label}:",
                      parser_type_name="LabeledStatement", **self._pos(js))
        block = self.block_node(js, self.code_of_node(js))
        self.scope.push_block()
        self.local_parent_stack.append(block)
        body = self.ast_for_node_with_fref(js["body"])
        self.local_parent_stack.pop()
        self.scope.pop()
        return Ast(block).with_child(Ast(target)).with_child(body)

    def _jump_ast(self, js, kind: str) -> Ast:
        node = Node("CONTROL_STRUCTURE", control_structure_type=kind,
                    parser_type_name=f"{kind.title()}Statement",
                    code=self.code_of_node(js), **self._pos(js))
        if js.get("label"):
            name = js["label"]["name"]
            jl = Node("JUMP_LABEL", name=name, code=name, order=1, **self._pos(js["label"]))
            return Ast(node).with_child(Ast(jl)).with_typed_edge("jump_argument", node, jl)
        return Ast(node)

    def _ast_break_statement(self, js) -> Ast:
        return self._jump_ast(js, "BREAK")

    def _ast_continue_statement(self, js) -> Ast:
        return self._jump_ast(js, "CONTINUE")

    def _ast_throw_statement(self, js) -> Ast:
        arg = self.ast_for_node_with_fref(js["argument"])
        node = Node("CONTROL_STRUCTURE", control_structure_type="THROW",
                    parser_type_name="ThrowStatement", code=self.code_of_node(js),
                    **self._pos(js))
        ast = Ast(node).with_child(arg)
        if arg.root is not None:
            ast.with_typed_edge("argument", node, arg.root)
        return ast

    def _ast_switch_statement(self, js) -> Ast:
        disc = self.ast_for_node_with_fref(js["discriminant"])
        if disc.root is not None:
            disc.root.order = 1
        block = self.block_node(js, self.code_of_node(js))
        block.order = 2
        self.scope.push_block()
        self.local_parent_stack.append(block)
        case_asts = []
        for case in js["cases"]:
            if case["test"] is not None:
                jt = Node("JUMP_TARGET", name="case",
                          code=f"case {self.code_of_node(case['test'])}:",
                          parser_type_name="SwitchCase", **self._pos(case))
                case_asts.append(Ast(jt))
                case_asts.append(self.ast_for_node_with_fref(case["test"]))
            else:
                jt = Node("JUMP_TARGET", name="default", code="default:",
                          parser_type_name="SwitchCase", **self._pos(case))
                case_asts.append(Ast(jt))
            for c in case["consequent"]:
                case_asts.append(self.ast_for_node_with_fref(c))
        self.local_parent_stack.pop()
        self.scope.pop()
        body = Ast(block).with_children(case_asts)
        node = Node("CONTROL_STRUCTURE", control_structure_type="SWITCH",
                    parser_type_name="SwitchStatement", code=self.code_of_node(js),
                    **self._pos(js))
        ast = Ast(node).with_child(disc).with_child(body)
        ast.with_typed_edge("condition", node, disc.root)
        ast.with_typed_edge("true_body", node, block)
        return ast

    def _ast_try_statement(self, js) -> Ast:
        body = self.ast_for_node_with_fref(js["block"])
        node = Node("CONTROL_STRUCTURE", control_structure_type="TRY",
                    parser_type_name="TryStatement", code=self.code_of_node(js),
                    **self._pos(js))
        ast = Ast(node).with_child(body)
        if body.root is not None:
            body.root.argument_index = 1
            ast.with_typed_edge("try_body", node, body.root)
        idx = 2
        if js.get("handler"):
            h = js["handler"]
            catch_cs = Node("CONTROL_STRUCTURE", control_structure_type="CATCH",
                            parser_type_name="CatchClause", code=self.code_of_node(h),
                            **self._pos(h))
            cblock = self.block_node(h, self.code_of_node(h))
            self.scope.push_block()
            self.local_parent_stack.append(cblock)
            parts = []
            if h.get("param") is not None:
                parts.append(self.ast_for_node_with_fref(h["param"]))
            parts.extend(self.block_statement_asts(h["body"]["body"]))
            self.local_parent_stack.pop()
            self.scope.pop()
            catch_ast = Ast(catch_cs).with_child(Ast(cblock).with_children(parts))
            catch_cs.argument_index = idx
            idx += 1
            ast.with_child(catch_ast)
            ast.with_typed_edge("catch_body", node, catch_cs)
        if js.get("finalizer"):
            f = js["finalizer"]
            fin_cs = Node("CONTROL_STRUCTURE", control_structure_type="FINALLY",
                          parser_type_name="BlockStatement", code=self.code_of_node(f),
                          **self._pos(f))
            fin_ast = Ast(fin_cs).with_child(self.ast_for_node_with_fref(f))
            fin_cs.argument_index = idx
            ast.with_child(fin_ast)
            ast.with_typed_edge("finally_body", node, fin_cs)
        return ast

    # declarations ------------------------------------------------------------
    def _ast_variable_declaration(self, js) -> Ast:
        kind = js["kind"]
        decls = [self._ast_variable_declarator(d, kind) for d in js["declarations"]]
        decls = [d for d in decls if d is not None]
        if not decls:
            return Ast()
        if len(decls) == 1:
            return decls[0]
        return Ast(self.block_node(js, self.code_of_node(js))).with_children(decls)

    def _ast_variable_declarator(self, decl, kind: str) -> Optional[Ast]:
        idj = decl["id"]
        init = decl.get("init")
        declarator_code = f"{kind} {self.code_of_node(decl)}"
        id_name = idj.get("name", self.code_of_node(idj))
        local = self.local_node(decl, id_name)
        # `let x: T` — typeFullName if T is builtin, possibleTypes always
        # (AstForDeclarationsCreator.scala:585-591)
        anno = ts_annotation_full(decl.get("ts_type"))
        if anno:
            local.possible_types = (anno,)
            if anno in JS_BUILTIN_FULL and anno != ANY:
                local.type_full_name = anno
        # let is block-scoped; var AND const are MethodScope in the
        # reference (AstForDeclarationsCreator.scala:306-307)
        self.scope.add_variable(id_name, local, function_scoped=(kind != "let"))
        self.cpg.add_node(local)
        if self.local_parent_stack:
            self.cpg.add_edge(self.local_parent_stack[-1], local, "AST")
        if init is None:
            return Ast()
        source_ast = self.ast_for_node_with_fref(init)
        # `x = require("src")...` declarators (incl. chained member/call
        # tails) get an IMPORT + DEPENDENCY (ImportsPass /
        # astForDeconstruction:555-575: groupId = text between `require("`
        # and the first `")`)
        import re as _re
        _m = _re.search(r'require\((["\'])(.*?)\1\)', self.code_of_node(init))
        if _m:
            group_id = _m.group(2)
            req_call = next((n for n in source_ast.nodes
                             if n.label == "CALL" and n.name == "require"), None)
            names = ([id_name] if idj["type"] == "Identifier" else
                     [self.code_of_node(p.get("value", p) if p.get("value") else p)
                      for p in idj.get("properties", idj.get("elements", []))
                      if p])
            for nm in names:
                self._create_import_node(
                    f"{nm} = require(\"{group_id}\")", group_id, nm, req_call,
                    group_name=nm, group_id=group_id, version="require",
                    line=self.line_of(decl["start"]),
                    col=self.col_of(decl["start"]))
        if idj["type"] in ("ObjectPattern", "ArrayPattern"):
            return self.ast_for_deconstruction(idj, source_ast, declarator_code)
        dest = self.ast_for_node(idj)
        return self.assignment_call(
            dest, source_ast, declarator_code,
            self.line_of(decl["start"]), self.col_of(decl["start"]),
        )

    def ast_for_deconstruction(self, pattern, source_ast: Ast, code: str,
                               param_name: Optional[str] = None) -> Ast:
        """AstForDeclarationsCreator.astForDeconstruction:459-539."""
        tmp = self.unused_name("_tmp")
        block = Node("BLOCK", code=code, type_full_name=ANY, **self._pos(pattern))
        self.scope.push_block()
        self.local_parent_stack.append(block)
        local = self.local_node(pattern, tmp)
        tmp_node = self.identifier_node(pattern, tmp)
        self.cpg.add_node(local)
        self.cpg.add_edge(self.local_parent_stack[-1], local, "AST")
        self.scope.add_variable(tmp, local)
        self.scope.add_reference(tmp, tmp_node)

        line, col = self.line_of(pattern["start"]), self.col_of(pattern["start"])
        if param_name is not None:
            # tmp = (param === void 0 ? source : param)
            lhs_id = self.identifier_node(pattern, param_name)
            self.scope.add_reference(param_name, lhs_id)
            test = self.equals_call(Ast(lhs_id), Ast(self.void_call(line, col)), line, col)
            false_id = self.identifier_node(pattern, param_name)
            self.scope.add_reference(param_name, false_id)
            rhs = self.ternary_call(test, source_ast, Ast(false_id), line, col)
        else:
            rhs = source_ast
        assign_tmp = self.assignment_call(
            Ast(tmp_node), rhs, f"{tmp} = {_code_of(rhs.root)}", line, col)

        sub = []
        if pattern["type"] == "ObjectPattern":
            for element in pattern["properties"]:
                if element["type"] == "RestElement":
                    sub.append(self._spread_or_rest(
                        element, Ast(self.identifier_node(element, tmp))))
                    continue
                value = element["value"]
                key = element["key"]
                if value["type"] == "Identifier":
                    sub.append(self._destruct_object_element(value, key, tmp))
                elif value["type"] == "AssignmentPattern":
                    sub.append(self._destruct_object_element_default(value, key, tmp))
                else:
                    sub.append(self.ast_for_node_with_fref(value))
        elif pattern["type"] == "ArrayPattern":
            for index, element in enumerate(pattern["elements"]):
                if element is None:
                    sub.append(Ast())
                elif element["type"] == "RestElement":
                    base = Ast(self.identifier_node(element, tmp))
                    key = Ast(self.literal_node(element, str(index), "__ecma.Number"))
                    acc = self.index_access_call(base, key,
                                                 self.line_of(element["start"]),
                                                 self.col_of(element["start"]))
                    sub.append(self._spread_or_rest(element, acc))
                elif element["type"] == "Identifier":
                    sub.append(self._destruct_array_element(element, index, tmp))
                elif element["type"] == "AssignmentPattern":
                    sub.append(self._destruct_array_element_default(element, index, tmp))
                else:
                    sub.append(self.ast_for_node_with_fref(element))
        else:
            sub.append(self._destruct_object_element(pattern, pattern, tmp))

        ret_tmp = self.identifier_node(pattern, tmp)
        self.scope.add_reference(tmp, ret_tmp)
        self.scope.pop()
        self.local_parent_stack.pop()
        return Ast(block).with_child(assign_tmp).with_children(sub).with_child(Ast(ret_tmp))

    def _destruct_object_element(self, element, key, tmp: str) -> Ast:
        value_ast = self.ast_for_node(element)
        ename = self.code_of_node(element)
        local = self.local_node(element, ename)
        self.cpg.add_node(local)
        self.cpg.add_edge(self.local_parent_stack[-1], local, "AST")
        # destructure element locals are MethodScope
        # (AstForDeclarationsCreator.scala:640/:660)
        self.scope.add_variable(ename, local, function_scoped=True)
        line, col = self.line_of(element["start"]), self.col_of(element["start"])
        base = self.identifier_node(element, tmp)
        self.scope.add_reference(tmp, base)
        key_name = _strip_quotes(self.code_of_node(key))
        part = self.field_identifier_node(key, key_name)
        access = self.field_access_call(Ast(base), part, line, col)
        return self.assignment_call(
            value_ast, access, f"{_code_of(value_ast.root)} = {_code_of(access.root)}",
            line, col)

    def _destruct_array_element(self, element, index: int, tmp: str) -> Ast:
        value_ast = self.ast_for_node(element)
        ename = self.code_of_node(element)
        local = self.local_node(element, ename)
        self.cpg.add_node(local)
        self.cpg.add_edge(self.local_parent_stack[-1], local, "AST")
        # destructure element locals are MethodScope
        # (AstForDeclarationsCreator.scala:640/:660)
        self.scope.add_variable(ename, local, function_scoped=True)
        line, col = self.line_of(element["start"]), self.col_of(element["start"])
        base = self.identifier_node(element, tmp)
        self.scope.add_reference(tmp, base)
        key = Ast(self.literal_node(element, str(index), "__ecma.Number"))
        access = self.index_access_call(Ast(base), key, line, col)
        return self.assignment_call(
            value_ast, access, f"{_code_of(value_ast.root)} = {_code_of(access.root)}",
            line, col)

    def _destruct_object_element_default(self, element, key, tmp: str) -> Ast:
        line, col = self.line_of(element["start"]), self.col_of(element["start"])
        rhs = self.ast_for_node_with_fref(element["right"])
        lhs = self.ast_for_node_with_fref(element["left"])
        key_name = _strip_quotes(self.code_of_node(key))
        base1 = self.identifier_node(element, tmp)
        self.scope.add_reference(tmp, base1)
        test_access = self.field_access_call(Ast(base1), self.field_identifier_node(key, key_name),
                                             line, col)
        test = self.equals_call(test_access, Ast(self.void_call(line, col)), line, col)
        base2 = self.identifier_node(element, tmp)
        self.scope.add_reference(tmp, base2)
        false_ast = self.field_access_call(Ast(base2), self.field_identifier_node(key, key_name),
                                           line, col)
        ternary = self.ternary_call(test, rhs, false_ast, line, col)
        return self.assignment_call(lhs, ternary,
                                    f"{_code_of(lhs.root)} = {_code_of(ternary.root)}", line, col)

    def _destruct_array_element_default(self, element, index: int, tmp: str) -> Ast:
        line, col = self.line_of(element["start"]), self.col_of(element["start"])
        rhs = self.ast_for_node_with_fref(element["right"])
        lhs = self.ast_for_node_with_fref(element["left"])
        key = lambda: Ast(self.literal_node(element, str(index), "__ecma.Number"))  # noqa: E731
        base1 = self.identifier_node(element, tmp)
        self.scope.add_reference(tmp, base1)
        test_access = self.index_access_call(Ast(base1), key(), line, col)
        test = self.equals_call(test_access, Ast(self.void_call(line, col)), line, col)
        base2 = self.identifier_node(element, tmp)
        self.scope.add_reference(tmp, base2)
        false_ast = self.index_access_call(Ast(base2), key(), line, col)
        ternary = self.ternary_call(test, rhs, false_ast, line, col)
        return self.assignment_call(lhs, ternary,
                                    f"{_code_of(lhs.root)} = {_code_of(ternary.root)}", line, col)

    def _spread_or_rest(self, js, arg1: Optional[Ast] = None) -> Ast:
        ast = self.ast_for_node_with_fref(js["argument"])
        call = self.call_node(js, self.code_of_node(js), "<operator>.spread", STATIC)
        args = ([arg1] if arg1 is not None else []) + [ast]
        return self.call_ast(call, args)

    _ast_spread_element = _spread_or_rest
    _ast_rest_element = _spread_or_rest

    # functions -----------------------------------------------------------------
    def next_closure_name(self) -> str:
        n = f"<lambda>{self.closure_counter}"
        self.closure_counter += 1
        return n

    def method_name_and_fullname(self, js) -> tuple[str, str]:
        # synthetic methods (fake constructor / <clinit>) share zero-width
        # spans — include the intended name so they don't collide in the
        # memo table
        key = f"{js['start']}:{js['end']}:{js.get('id', {}).get('name', '') if js.get('id') else ''}"
        if key in self.function_key_to_name:
            return self.function_key_to_name[key]
        if js.get("id"):
            intended = js["id"]["name"]
        elif js.get("_key_name"):
            intended = js["_key_name"]
        else:
            intended = self.next_closure_name()
        prefix = f"{self.filename}:{':'.join(self.scope_name_stack)}:"
        name = intended
        i = 1
        while f"{prefix}{name}" in self.function_full_names:
            name = f"{intended}{i}"
            i += 1
        full = f"{prefix}{name}"
        self.function_full_names.add(full)
        self.function_key_to_name[key] = (name, full)
        return name, full

    def _ast_function_declaration(self, js) -> Ast:
        return self.ast_for_function(js)

    _ast_function_expression = _ast_function_declaration
    _ast_arrow_function_expression = _ast_function_declaration

    def ast_for_function(self, js, create_reference: bool = False,
                         create_assignment: bool = False,
                         code_override: str | None = None,
                         prelude_builder=None,
                         modifiers: tuple = ("VIRTUAL",)) -> Ast:
        """createMethodAstAndNode (AstForFunctionsCreator.scala:396-498).
        prelude_builder() (run inside the method scope) supplies statements
        prepended to the body — constructorContent field initializers."""
        name, full_name = self.method_name_and_fullname(js)
        code = code_override if code_override is not None else self.code_of_node(js)
        method_ref = None
        if create_reference:
            method_ref = Node("METHOD_REF", code=name, method_full_name=full_name,
                              type_full_name=full_name, **self._pos(js))
        call_ast = Ast()
        if create_assignment and create_reference:
            id_node = self.identifier_node(js, name)
            id_local = self.local_node(js, name)
            # the declared function's local is typed with the method full
            # name (reference: astForFunctionDeclaration localNode typeFullName)
            id_local.type_full_name = full_name
            self.cpg.add_node(id_local)
            if self.local_parent_stack:
                self.cpg.add_edge(self.local_parent_stack[-1], id_local, "AST")
            self.scope.add_variable(name, id_local)
            self.scope.add_reference(name, id_node)
            acode = f"function {name} = {code}"
            call_ast = self.assignment_call(Ast(id_node), Ast(method_ref), acode,
                                            self.line_of(js["start"]), self.col_of(js["start"]))

        method = Node("METHOD", name=name, full_name=full_name, code=code,
                      filename=self.filename, **self._pos(js))
        parent = self.method_parent_stack[-1]
        self.method_parent_stack.append(method)

        body_js = js["body"]
        block = self.block_node(body_js, self.code_of_node(body_js))
        self.scope.push_method(method, capturing_ref=method_ref)
        self.scope.set_scope_block(block)
        self.scope_name_stack.append(name)
        self.local_parent_stack.append(block)

        this_param = Node("METHOD_PARAMETER_IN", name="this", code="this", index=0, order=0,
                          evaluation_strategy="BY_VALUE", type_full_name=ANY,
                          **self._pos(js))
        self.scope.add_variable("this", this_param)

        extra_stmts: list[Ast] = []
        params = self._handle_parameters(js.get("params", []), extra_stmts)

        if js["type"] == "ArrowFunctionExpression" and body_js["type"] != "BlockStatement":
            ret_code = self.code_of_node(body_js).rstrip(";")
            ret = Node("RETURN", code=ret_code, **self._pos(body_js))
            arg = self.ast_for_node_with_fref(body_js)
            if arg.root is not None and arg.root.is_expression:
                arg.root.argument_index = 1
            body_stmts = [Ast(ret).with_child(arg).with_arg_edges(ret, [arg.root])]
        else:
            body_stmts = self.block_statement_asts(body_js["body"])

        prelude = prelude_builder() if prelude_builder is not None else []
        children = extra_stmts + prelude + body_stmts

        self.local_parent_stack.pop()
        self.scope_name_stack.pop()
        self.scope.pop()
        self.method_parent_stack.pop()

        ret_anno = ts_annotation_full(js.get("return_type"))
        ret_node = Node("METHOD_RETURN", code="RET", type_full_name=ANY,
                        possible_types=(ret_anno,) if ret_anno else (),
                        **self._pos(js))
        m_ast = Ast(method)
        for p in [this_param] + params:
            m_ast.with_child(Ast(p))
        m_ast.with_child(Ast(block).with_children(children))
        for mt in modifiers:
            m_ast.with_child(Ast(Node("MODIFIER", modifier_type=mt, code="<empty>")))
        m_ast.with_child(Ast(ret_node))
        m_ast.store(self.cpg)
        # TYPE_DECL + BINDING for the function type
        td = Node("TYPE_DECL", name=name, full_name=full_name, filename=self.filename, code=name)
        binding = Node("BINDING", name="", code="<empty>")
        td_ast = Ast(td)
        td_ast.nodes.append(binding)
        td_ast.with_typed_edge("binds", td, binding)
        td_ast.with_typed_edge("ref", binding, method)
        td_ast.store(self.cpg)
        self.cpg.add_edge(parent, method, "AST")
        if method_ref is not None:
            self.cpg.add_edge(method_ref, method, "REF")
        if method_ref is not None and not call_ast.nodes:
            return Ast(method_ref)
        return call_ast

    def _handle_parameters(self, params_js: list, extra_stmts: list[Ast]) -> list[Node]:
        params = []
        for index, p in enumerate(params_js, start=1):
            t = p["type"]
            if t == "RestElement":
                pname = self.code_of_node(p).replace("...", "")
                node = Node("METHOD_PARAMETER_IN", name=pname, code=self.code_of_node(p),
                            index=index, order=index, is_variadic=True,
                            evaluation_strategy="BY_VALUE",
                            # rest parameters are arrays (TSTypesTests:
                            # "empty method with rest parameter")
                            type_full_name="__ecma.Array", **self._pos(p))
                local = self.local_node(p, pname)
                self.cpg.add_node(local)
                self.cpg.add_edge(self.local_parent_stack[-1], local, "AST")
                self.scope.add_variable(pname, node)
            elif t == "AssignmentPattern":
                left = p["left"]
                if left["type"] in ("ObjectPattern", "ArrayPattern"):
                    pname = self.unused_name(f"param{index}")
                    node = Node("METHOD_PARAMETER_IN", name=pname, code=self.code_of_node(p),
                                index=index, order=index, evaluation_strategy="BY_VALUE",
                                type_full_name=ANY, **self._pos(p))
                    self.scope.add_variable(pname, node)
                    rhs = self.ast_for_node_with_fref(p["right"])
                    extra_stmts.append(
                        self.ast_for_deconstruction(left, rhs, self.code_of_node(p), pname))
                else:
                    extra_stmts.append(self._param_with_default(p))
                    node = Node("METHOD_PARAMETER_IN", name=self.code_of_node(left),
                                code=self.code_of_node(p), index=index, order=index,
                                evaluation_strategy="BY_VALUE", type_full_name=ANY,
                                **self._pos(left))
                    self.scope.add_variable(node.name, node)
            elif t in ("ObjectPattern", "ArrayPattern"):
                pname = self.unused_name(f"param{index}")
                node = Node("METHOD_PARAMETER_IN", name=pname, code=self.code_of_node(p),
                            index=index, order=index, evaluation_strategy="BY_VALUE",
                            type_full_name=ANY, **self._pos(p))
                if t == "ObjectPattern":
                    # destructured params get a synthesized anonymous type
                    # (AstForFunctionsCreator.scala:154-161: astForTypeAlias
                    # over the pattern → <anon-class>N TYPE_DECL)
                    specs = []
                    for e in p.get("properties", []):
                        tgt = e.get("value") if e.get("value") else e.get("key", e)
                        if isinstance(tgt, dict) and tgt.get("type") == "Identifier":
                            specs.append((tgt["name"], ANY))
                    node.type_full_name = self._anon_param_typedecl(p, specs)
                self.scope.add_variable(pname, node)
                if t == "ObjectPattern":
                    elements = [(e.get("key"), e.get("value"), e) for e in p["properties"]]
                else:
                    elements = [(None, e, e) for e in p["elements"]]
                for i, (key, value, raw) in enumerate(elements):
                    if raw is None:
                        continue
                    if raw.get("type") == "RestElement":
                        # handleRestInParameters: `rest = paramN.rest`
                        # (fieldAccess by the rest name, `...` stripped)
                        target = raw.get("argument", raw)
                        if target.get("type") != "Identifier":
                            continue
                        key = None  # field name = element name
                    else:
                        target = value if value is not None else raw
                        if target.get("type") != "Identifier":
                            continue
                    ename = target["name"]
                    local = self.local_node(target, ename)
                    self.cpg.add_node(local)
                    self.cpg.add_edge(self.local_parent_stack[-1], local, "AST")
                    self.scope.add_variable(ename, local)
                    lp = self.identifier_node(target, ename)
                    base = self.identifier_node(target, pname)
                    self.scope.add_reference(pname, base)
                    line, col = self.line_of(target["start"]), self.col_of(target["start"])
                    # BOTH pattern kinds use fieldAccess by element NAME in
                    # parameters (AstForFunctionsCreator.scala:101-150: the
                    # ArrayPattern branch emits `elem = paramN.elem`, unlike
                    # array destructuring in declarations which indexes)
                    part = self.field_identifier_node(key or target, ename)
                    access = self.field_access_call(Ast(base), part, line, col)
                    extra_stmts.append(self.assignment_call(
                        Ast(lp), access, f"{ename} = {_code_of(access.root)}", line, col))
            else:  # Identifier
                pname = p.get("name", self.code_of_node(p))
                anno = ts_annotation_full(p.get("ts_type"))
                ts = anno if (anno in JS_BUILTIN_FULL and anno != ANY) else ANY
                if p.get("ts_type_members") is not None:
                    # `credentials: { username: string; ... }` — inline
                    # object type becomes an <anon-class>N TYPE_DECL
                    # (AstForFunctionsCreator.scala:224-246)
                    specs = []
                    for m in p["ts_type_members"]:
                        key = m.get("key", {})
                        mname = key.get("name", self.code_of_node(key)) if key else ""
                        if mname:
                            specs.append((_strip_quotes(mname),
                                          _ts_type_full(m.get("ts_type"))))
                    ts = self._anon_param_typedecl(p, specs)
                    anno = ts
                node = Node("METHOD_PARAMETER_IN", name=pname, code=self.code_of_node(p),
                            index=index, order=index, evaluation_strategy="BY_VALUE",
                            type_full_name=ts,
                            possible_types=(anno,) if anno else (),
                            **self._pos(p))
                if p.get("decorators"):
                    self.cpg.add_node(node)
                    self._attach_annotations(node, p["decorators"])
                self.scope.add_variable(pname, node)
            params.append(node)
        return params

    def _anon_param_typedecl(self, p, member_specs) -> str:
        """Synthesize an `<anon-class>N` TYPE_DECL for an inline object type
        or destructured parameter; returns its full name
        (AstCreatorHelper.scala:286,311 nextAnonClassName)."""
        name = f"<anon-class>{self._anon_class_counter}"
        self._anon_class_counter += 1
        full = f"{self.filename}:{':'.join(self.scope_name_stack)}:{name}"
        td = Node("TYPE_DECL", name=name, full_name=full,
                  code=self.code_of_node(p), filename=self.filename,
                  **self._pos(p))
        self.cpg.add_node(td)
        self.cpg.add_edge(self.method_parent_stack[-1], td, "AST")
        for mname, mtype in member_specs:
            mem = Node("MEMBER", name=mname, code=mname, type_full_name=mtype,
                       **self._pos(p))
            self.cpg.add_edge(td, mem, "AST")
        return full

    def _param_with_default(self, p) -> Ast:
        """convertParamWithDefault: `x = (x === void 0 ? default : x)`."""
        line, col = self.line_of(p["start"]), self.col_of(p["start"])
        rhs = self.ast_for_node_with_fref(p["right"])
        lhs = self.ast_for_node(p["left"])
        key = self.identifier_node(p, _code_of(lhs.root))
        test = self.equals_call(Ast(key), Ast(self.void_call(line, col)), line, col)
        false_node = self.identifier_node(p, _code_of(lhs.root))
        ternary = self.ternary_call(test, rhs, Ast(false_node), line, col)
        return self.assignment_call(lhs, ternary,
                                    f"{_code_of(lhs.root)} = {_code_of(ternary.root)}", line, col)

    # expressions -----------------------------------------------------------------
    def _ast_identifier(self, js) -> Ast:
        # astForIdentifier (AstForPrimitivesCreator.scala:12): the EJS fake
        # output callee identifier surfaces under its modeled name, never `ap`
        name = self._ejs_output_call_name(js) or js["name"]
        node = self.identifier_node(js, name)
        self.scope.add_reference(name, node)
        return Ast(node)

    def _ast_this_expression(self, js) -> Ast:
        node = self.identifier_node(js, "this")
        self.scope.add_reference("this", node)
        return Ast(node)

    def _ast_super(self, js) -> Ast:
        return Ast(self.identifier_node(js, "super"))

    def _ast_numeric_literal(self, js) -> Ast:
        return Ast(self.literal_node(js, self.code_of_node(js), "__ecma.Number"))

    def _ast_string_literal(self, js) -> Ast:
        # astForStringLiteral (AstForPrimitivesCreator.scala:35-38):
        # code = '"' + COOKED value + '"' (escapes processed, quote style
        # normalized) — strippedCode then peels one outer pair
        return Ast(self.literal_node(js, f'"{js["value"]}"', "__ecma.String"))

    def _ast_boolean_literal(self, js) -> Ast:
        return Ast(self.literal_node(js, self.code_of_node(js), "__ecma.Boolean"))

    def _ast_null_literal(self, js) -> Ast:
        return Ast(self.literal_node(js, self.code_of_node(js), "__ecma.Null"))

    def _ast_reg_exp_literal(self, js) -> Ast:
        return Ast(self.literal_node(js, self.code_of_node(js), "__ecma.String"))

    def _ast_template_element(self, js) -> Ast:
        return Ast(self.literal_node(js, f'"{js["value"]["raw"]}"', "__ecma.String"))

    def _ast_template_literal(self, js) -> Ast:
        """astForTemplateLiteral: formatString(...) call."""
        expressions = js["expressions"]
        quasis = [q for q in js["quasis"] if not q["tail"]]
        quasis_tail = [q for q in js["quasis"] if q["tail"]][0]
        if not expressions and not quasis:
            return self._ast_template_element(quasis_tail)
        call_name = "<operator>.formatString"
        args_codes = []
        for expr, quasi in zip(expressions, quasis):
            args_codes += [f'"{quasi["value"]["raw"]}"', self.code_of_node(expr)]
        args_codes.append(f'"{quasis_tail["value"]["raw"]}"')
        call_code = f"{call_name}({', '.join(args_codes)})"
        call = self.call_node(js, call_code, call_name, STATIC)
        arg_asts = []
        for expr, quasi in zip(expressions, quasis):
            arg_asts.append(self._ast_template_element(quasi))
            arg_asts.append(self.ast_for_node_with_fref(expr))
        arg_asts.append(self._ast_template_element(quasis_tail))
        return self.call_ast(call, arg_asts)

    def _ast_sequence_expression(self, js) -> Ast:
        block = self.block_node(js, self.code_of_node(js))
        self.scope.push_block()
        self.local_parent_stack.append(block)
        children = self.block_statement_asts(js["expressions"])
        self.local_parent_stack.pop()
        self.scope.pop()
        return Ast(block).with_children(children)

    def _ast_await_expression(self, js) -> Ast:
        call = self.call_node(js, self.code_of_node(js), "<operator>.await", STATIC)
        return self.call_ast(call, [self.ast_for_node_with_fref(js["argument"])])

    def _ast_unary_expression(self, js) -> Ast:
        arg = self.ast_for_node_with_fref(js["argument"])
        op = UNARY_OPERATORS.get(js["operator"], "<operator>.assignment")
        call = self.call_node(js, self.code_of_node(js), op, STATIC)
        return self.call_ast(call, [arg])

    def _ast_update_expression(self, js) -> Ast:
        prefix = js["prefix"]
        if js["operator"] == "++":
            op = "<operator>.preIncrement" if prefix else "<operator>.postIncrement"
        else:
            # NOTE: reference maps both prefix/postfix `--` to *Increment
            # (AstForExpressionsCreator.scala:284-287) — replicated for parity
            op = "<operator>.preIncrement" if prefix else "<operator>.postIncrement"
        arg = self.ast_for_node_with_fref(js["argument"])
        call = self.call_node(js, self.code_of_node(js), op, STATIC)
        return self.call_ast(call, [arg])

    def _ast_binary_expression(self, js) -> Ast:
        op = BINARY_OPERATORS.get(js["operator"], "<operator>.assignment")
        lhs = self.ast_for_node_with_fref(js["left"])
        rhs = self.ast_for_node_with_fref(js["right"])
        call = self.call_node(js, self.code_of_node(js), op, STATIC)
        return self.call_ast(call, [lhs, rhs])

    _ast_logical_expression = _ast_binary_expression

    def _ast_conditional_expression(self, js) -> Ast:
        test = self.ast_for_node_with_fref(js["test"])
        cons = self.ast_for_node_with_fref(js["consequent"])
        alt = self.ast_for_node_with_fref(js["alternate"])
        return self.ternary_call(test, cons, alt,
                                 self.line_of(js["start"]), self.col_of(js["start"]))

    def _ast_assignment_expression(self, js) -> Ast:
        op = OPERATORS.get(js.get("operator", "="), "<operator>.assignment")
        left = js["left"]
        if left["type"] in ("ObjectPattern", "ArrayPattern"):
            rhs = self.ast_for_node_with_fref(js["right"])
            return self.ast_for_deconstruction(left, rhs, self.code_of_node(js))
        lhs = self.ast_for_node(left)
        rhs = self.ast_for_node_with_fref(js["right"])
        call = self.call_node(js, self.code_of_node(js), op, STATIC)
        # `x = require('mod')` without a declaration also gets an IMPORT
        # (ImportsPassTests.scala:31-46)
        if (op == "<operator>.assignment" and left.get("type") == "Identifier"):
            import re as _re
            _m = _re.search(r'require\((["\'])(.*?)\1\)', self.code_of_node(js["right"]))
            if _m:
                req_call = next((n for n in rhs.nodes
                                 if n.label == "CALL" and n.name == "require"), None)
                if req_call is not None:
                    group_id = _m.group(2)
                    self._create_import_node(
                        self.code_of_node(js), group_id, left["name"], req_call,
                        group_name=left["name"], group_id=group_id,
                        version="require",
                        line=self.line_of(js["start"]),
                        col=self.col_of(js["start"]))
        return self.call_ast(call, [lhs, rhs])

    _ast_assignment_pattern = _ast_assignment_expression

    def _ast_member_expression(self, js) -> Ast:
        base = self.ast_for_node_with_fref(js["object"])
        prop = js["property"]
        line, col = self.line_of(js["start"]), self.col_of(js["start"])
        if js.get("computed"):
            member = self.ast_for_node(prop)
            return self.index_access_call(base, member, line, col)
        field_name = _strip_quotes(self.code_of_node(prop))
        part = self.field_identifier_node(prop, field_name)
        return self.field_access_call(base, part, line, col)

    def _ast_call_expression(self, js) -> Ast:
        callee = js["callee"]
        callee_code = self.code_of_node(callee)
        if callee_code in GLOBAL_BUILTINS:
            call_name = (self.code_of_node(callee["property"])
                         if callee["type"] == "MemberExpression" else callee_code)
            call = self.call_node_at(self.code_of_node(js), call_name, STATIC,
                                     self.line_of(callee["start"]), self.col_of(callee["start"]))
            # static builtins keep the DICTIONARY name as methodFullName
            # ("JSON.parse"), not the short call name
            call.method_full_name = callee_code
            args = [self.ast_for_node_with_fref(a) for a in js["arguments"]]
            return self.call_ast(call, args)
        receiver_ast, base_node, call_name = self._call_expression_info(callee)
        args = [self.ast_for_node_with_fref(a) for a in js["arguments"]]
        call = self.call_node(js, self.code_of_node(js), call_name, DYNAMIC)
        # resolve closure callees locally, if possible
        if callee["type"] in ("FunctionExpression", "ArrowFunctionExpression",
                              "FunctionDeclaration"):
            cid = callee.get("id", {}).get("name", "") if callee.get("id") else ""
            key = f"{callee['start']}:{callee['end']}:{cid}"
            if key in self.function_key_to_name:
                n, fn = self.function_key_to_name[key]
                call.name, call.method_full_name = n, fn
        elif callee["type"] == "Identifier":
            pass  # call linking happens in the call-graph pass by name
        return self.call_ast(call, args, base=Ast(base_node), receiver=receiver_ast)

    def _call_expression_info(self, callee) -> tuple[Ast, Node, str]:
        """callExpressionInfoForCallLikeExpr (AstForExpressionsCreator.scala:54-93)."""
        if callee["type"] == "MemberExpression":
            base = callee["object"]
            member = callee["property"]
            if base["type"] == "ThisExpression":
                receiver = self.ast_for_node_with_fref(callee)
                base_node = self.identifier_node(base, self.code_of_node(base))
                self.scope.add_reference(base_node.name, base_node)
                return receiver, base_node, self.code_of_node(member)
            if base["type"] == "Identifier":
                receiver = self.ast_for_node_with_fref(callee)
                base_node = self.identifier_node(base, self.code_of_node(base))
                self.scope.add_reference(base_node.name, base_node)
                return receiver, base_node, self.code_of_node(member)
            # tmp lowering: (_tmp_0 = <base>).<member>
            tmp = self.unused_name("_tmp")
            base_tmp = self.identifier_node(base, tmp)
            self.scope.add_reference(tmp, base_tmp)
            base_ast = self.ast_for_node_with_fref(base)
            code = f"({tmp} = {self.code_of_node(base)})"
            tmp_assign = self.assignment_call(Ast(base_tmp), base_ast, code,
                                              self.line_of(base["start"]),
                                              self.col_of(base["start"]))
            field_name = _strip_quotes(self.code_of_node(member))
            part = self.field_identifier_node(member, field_name)
            field_access = self.field_access_call(tmp_assign, part,
                                                  self.line_of(callee["start"]),
                                                  self.col_of(callee["start"]))
            this_tmp = self.identifier_node(callee, tmp)
            self.scope.add_reference(tmp, this_tmp)
            return field_access, this_tmp, self.code_of_node(member)
        receiver = self.ast_for_node_with_fref(callee)
        this_node = self.identifier_node(callee, "this")
        self.scope.add_reference("this", this_node)
        call_name = self._ejs_output_call_name(callee) or self.code_of_node(callee)
        return receiver, this_node, call_name

    def _ejs_output_call_name(self, js) -> str | None:
        """AstCreatorHelper.ejsOutputCallName (jssrc2cpg, lines 293-304): a
        callee whose ORIGINAL-source code is exactly `<%` is the EJS fake
        output call `ap(...)`; the char after it picks the modeled name —
        `=` → escapeFn (escaped output), `-` → __append (raw output).
        EJS-gated: Vue is also dual-text, but only the EJS preprocessor
        manufactures `ap` calls over `<%` spans."""
        if not self.filename.endswith(".ejs"):
            return None
        if self.src[js["start"]:js["end"]] != "<%":
            return None
        end = js["end"]
        if end < len(self.src):
            ch = self.src[end]
            if ch == "=":
                return "escapeFn"
            if ch == "-":
                return "__append"
        return None

    def _ast_new_expression(self, js) -> Ast:
        """astForNewExpression: block { _tmp = .alloc; new(...); _tmp }."""
        block = self.block_node(js, self.code_of_node(js))
        self.scope.push_block()
        self.local_parent_stack.append(block)
        tmp = self.unused_name("_tmp")
        local = self.local_node(js, tmp)
        tmp1 = self.identifier_node(js, tmp)
        self.cpg.add_node(local)
        self.cpg.add_edge(self.local_parent_stack[-1], local, "AST")
        self.scope.add_variable(tmp, local)
        self.scope.add_reference(tmp, tmp1)
        alloc = self.call_node(js, ".alloc", "<operator>.alloc", STATIC)
        assign = self.assignment_call(Ast(tmp1), Ast(alloc), f"{tmp} = .alloc",
                                      self.line_of(js["start"]), self.col_of(js["start"]))
        tmp2 = self.identifier_node(js, tmp)
        self.scope.add_reference(tmp, tmp2)
        receiver = self.ast_for_node_with_fref(js["callee"])
        args = [self.ast_for_node_with_fref(a) for a in js["arguments"]]
        call = self.call_node(js, self.code_of_node(js), "<operator>.new", DYNAMIC)
        call_ast = self.call_ast(call, args, base=Ast(tmp2), receiver=receiver)
        tmp3 = self.identifier_node(js, tmp)
        self.scope.add_reference(tmp, tmp3)
        self.scope.pop()
        self.local_parent_stack.pop()
        return Ast(block).with_child(assign).with_child(call_ast).with_child(Ast(tmp3))

    def _ast_object_expression(self, js) -> Ast:
        """astForObjectExpression: tmp-lowered property assignments."""
        block = self.block_node(js, self.code_of_node(js))
        self.scope.push_block()
        self.local_parent_stack.append(block)
        tmp = self.unused_name("_tmp")
        local = self.local_node(js, tmp)
        self.cpg.add_node(local)
        self.cpg.add_edge(self.local_parent_stack[-1], local, "AST")
        self.scope.add_variable(tmp, local)

        prop_asts = []
        for prop in js["properties"]:
            pt = prop["type"]
            if pt in ("SpreadElement", "RestElement"):
                prop_asts.append(self._spread_or_rest(prop, Ast(self.identifier_node(prop, tmp))))
                continue
            line, col = self.line_of(prop["start"]), self.col_of(prop["start"])
            if pt == "ObjectMethod":
                if prop.get("computed"):
                    # calcMethodName (AstCreatorHelper.scala:229-231): computed
                    # object methods get a synthesized unique name and the key
                    # stays an expression → indexAccess assignment
                    key_name = self.unused_name("_computed_object_method")
                else:
                    key_name = prop["key"].get("name", self.code_of_node(prop["key"]))
                prop["_key_name"] = key_name
                method_js = dict(prop)
                method_js["type"] = "FunctionExpression"
                method_js["id"] = {"name": key_name, "start": prop["key"]["start"],
                                   "end": prop["key"]["end"], "type": "Identifier"}
                rhs_ast = self.ast_for_function(method_js, create_reference=True)
                if prop.get("computed"):
                    key_ast = self.ast_for_node(prop["key"])
                else:
                    key_ast = Ast(self.field_identifier_node(prop["key"], _strip_quotes(key_name)))
            else:
                key = prop["key"]
                if prop.get("computed"):
                    key_ast = self.ast_for_node(key)
                else:
                    field_name = _strip_quotes(self.code_of_node(key))
                    key_ast = Ast(self.field_identifier_node(key, field_name))
                rhs_ast = self.ast_for_node_with_fref(prop["value"])
            lhs_tmp = self.identifier_node(prop, tmp)
            self.scope.add_reference(tmp, lhs_tmp)
            if key_ast.root is not None and key_ast.root.label == "FIELD_IDENTIFIER":
                lhs_access = self.field_access_call(Ast(lhs_tmp), key_ast.root, line, col)
            else:
                lhs_access = self.index_access_call(Ast(lhs_tmp), key_ast, line, col)
            prop_asts.append(self.assignment_call(
                lhs_access, rhs_ast,
                f"{_code_of(lhs_access.root)} = {_code_of(rhs_ast.root)}", line, col))

        tmp_ret = self.identifier_node(js, tmp)
        self.scope.add_reference(tmp, tmp_ret)
        self.scope.pop()
        self.local_parent_stack.pop()
        return Ast(block).with_children(prop_asts).with_child(Ast(tmp_ret))

    _ast_object_pattern = _ast_object_expression

    MAX_INITIALIZERS = 1000  # AstForExpressionsCreator.scala:338

    def _ast_array_expression(self, js) -> Ast:
        """astForArrayExpression: tmp + .push() lowering; initializer lists
        beyond MAX_INITIALIZERS truncate to a <too-many-initializers>
        placeholder literal (AstForExpressionsCreator.scala:398-401)."""
        all_elements = [e for e in js.get("elements", [])]
        truncated = len(all_elements) > self.MAX_INITIALIZERS
        elements = all_elements[: self.MAX_INITIALIZERS]
        if not elements:
            return Ast(self.call_node(js, f"{ARRAY_FACTORY}()", ARRAY_FACTORY, STATIC))
        block = self.block_node(js, self.code_of_node(js))
        self.scope.push_block()
        self.local_parent_stack.append(block)
        tmp = self.unused_name("_tmp")
        local = self.local_node(js, tmp)
        tmp_node = self.identifier_node(js, tmp)
        self.cpg.add_node(local)
        self.cpg.add_edge(self.local_parent_stack[-1], local, "AST")
        self.scope.add_variable(tmp, local)
        self.scope.add_reference(tmp, tmp_node)
        factory = self.call_node(js, f"{ARRAY_FACTORY}()", ARRAY_FACTORY, STATIC)
        assign = self.assignment_call(Ast(tmp_node), Ast(factory),
                                      f"{tmp} = {ARRAY_FACTORY}()",
                                      self.line_of(js["start"]), self.col_of(js["start"]))
        elem_asts = []
        for element in elements:
            if element is None:
                continue
            line, col = self.line_of(element["start"]), self.col_of(element["start"])
            if element["type"] == "RestElement":
                elem_ast = self._spread_or_rest(element, Ast(self.identifier_node(js, tmp)))
            else:
                elem_ast = self.ast_for_node_with_fref(element)
            elem_code = _code_of(elem_ast.root) if elem_ast.root else self.code_of_node(element)
            push_call = self.call_node_at(f"{tmp}.push({elem_code})", "", DYNAMIC, line, col)
            base = self.identifier_node(element, tmp)
            self.scope.add_reference(tmp, base)
            member = self.field_identifier_node(element, "push")
            receiver = self.field_access_call(Ast(base), member, line, col)
            this_push = self.identifier_node(element, tmp)
            self.scope.add_reference(tmp, this_push)
            elem_asts.append(self.call_ast(push_call, [elem_ast], base=Ast(this_push),
                                           receiver=receiver))
        if truncated:
            ph = Node("LITERAL", code="<too-many-initializers>",
                      type_full_name=ANY, **self._pos(js))
            elem_asts.append(Ast(ph))
        tmp_ret = self.identifier_node(js, tmp)
        self.scope.add_reference(tmp, tmp_ret)
        self.scope.pop()
        self.local_parent_stack.pop()
        return Ast(block).with_child(assign).with_children(elem_asts).with_child(Ast(tmp_ret))

    _ast_array_pattern = _ast_array_expression

    def _ast_tagged_template_expression(self, js) -> Ast:
        receiver_ast, base_node, call_name = self._call_expression_info(js["tag"])
        call = self.call_node(js, self.code_of_node(js), call_name, DYNAMIC)
        quasi = js["quasi"]
        quasis_arr = {"type": "ArrayExpression", "start": quasi["start"], "end": quasi["end"],
                      "elements": quasi["quasis"]}
        quasis_arg = self._ast_array_expression(quasis_arr)
        expr_args = [self.ast_for_node_with_fref(e) for e in quasi["expressions"]]
        return self.call_ast(call, [quasis_arg] + expr_args, base=Ast(base_node),
                             receiver=receiver_ast)

    # for-in / for-of desugaring ---------------------------------------------------
    def _ast_for_in_statement(self, js) -> Ast:
        return self._ast_in_of(js)

    _ast_for_of_statement = _ast_for_in_statement

    def _ast_in_of(self, js) -> Ast:
        """astForInOfStatement lowering (AstForStatementsCreator.scala:212-355)."""
        left = js["left"]
        id_info = None
        if left["type"] == "VariableDeclaration":
            d = left["declarations"][0]
            id_info = d["id"]
        elif left["type"] == "AssignmentPattern":
            id_info = left["left"]
        else:
            id_info = left
        # `for({a,b,c} of x)` / `for([a,b] of x)`: the LHS parses as an
        # EXPRESSION — Babel (and the reference lowering) treat it as a
        # destructuring pattern, same as the declaration form
        if id_info["type"] in ("ObjectExpression", "ArrayExpression"):
            id_info = _to_pattern(id_info)
        block = self.block_node(js, self.code_of_node(js))
        self.scope.push_block()
        self.local_parent_stack.append(block)

        collection = js["right"]
        collection_name = self.code_of_node(collection)
        line, col = self.line_of(js["start"]), self.col_of(js["start"])

        iterator_name = self.unused_name("_iterator")
        it_local = self.local_node(js, iterator_name)
        it_node = self.identifier_node(js, iterator_name)
        self.cpg.add_node(it_local)
        self.cpg.add_edge(self.local_parent_stack[-1], it_local, "AST")
        self.scope.add_variable(iterator_name, it_local)
        self.scope.add_reference(iterator_name, it_node)
        iterator_call = self.call_node(js, f"<operator>.iterator({collection_name})",
                                       "<operator>.iterator", STATIC)
        it_call_ast = self.call_ast(iterator_call, [self.ast_for_node_with_fref(collection)])
        it_assign_node = self.call_node(
            js, f"{iterator_name} = <operator>.iterator({collection_name})",
            "<operator>.assignment", STATIC)
        it_assign = self.call_ast(it_assign_node, [Ast(it_node), it_call_ast])

        result_name = self.unused_name("_result")
        res_local = self.local_node(js, result_name)
        res_node = self.identifier_node(js, result_name)
        self.cpg.add_node(res_local)
        self.cpg.add_edge(self.local_parent_stack[-1], res_local, "AST")
        self.scope.add_variable(result_name, res_local)
        self.scope.add_reference(result_name, res_node)

        loop_var_nodes = []
        if id_info["type"] == "Identifier":
            loop_names = [id_info.get("name", self.code_of_node(id_info))]
        elif id_info["type"] == "ObjectPattern":
            loop_names = [_strip_quotes(self.code_of_node(p)) for p in id_info["properties"]]
        elif id_info["type"] == "ArrayPattern":
            loop_names = [self.code_of_node(e) for e in id_info["elements"] if e]
        else:
            loop_names = []
        for ln in loop_names:
            lv_local = self.local_node(js, ln)
            lv_node = self.identifier_node(js, ln)
            self.cpg.add_node(lv_local)
            self.cpg.add_edge(self.local_parent_stack[-1], lv_local, "AST")
            self.scope.add_variable(ln, lv_local)
            self.scope.add_reference(ln, lv_node)
            loop_var_nodes.append(lv_node)

        # test: !(_result = _iterator.next()).done — the reference names
        # this Operators.not, NOT logicalNot (AstForStatementsCreator:278;
        # general `!` is logicalNot, this desugaring is the exception)
        test_call = self.call_node(js, f"!({result_name} = {iterator_name}.next()).done",
                                   "<operator>.not", STATIC)
        done_base = self.call_node(js, f"({result_name} = {iterator_name}.next())",
                                   "<operator>.assignment", STATIC)
        lhs_node = self.identifier_node(js, result_name)
        self.scope.add_reference(result_name, lhs_node)
        rhs_call = self.call_node(js, f"{iterator_name}.next()", "next", DYNAMIC)
        next_base = self.identifier_node(js, iterator_name)
        self.scope.add_reference(iterator_name, next_base)
        next_member = self.field_identifier_node(js, "next")
        next_receiver = self.field_access_call(Ast(next_base), next_member, line, col)
        this_next = self.identifier_node(js, iterator_name)
        self.scope.add_reference(iterator_name, this_next)
        rhs_ast = self.call_ast(rhs_call, [], base=Ast(this_next), receiver=next_receiver)
        done_base_ast = self.call_ast(done_base, [Ast(lhs_node), rhs_ast])
        done_member = self.field_identifier_node(js, "done")
        test_node = self.field_access_call(done_base_ast, done_member, line, col)
        test_ast = self.call_ast(test_call, [test_node])

        # loop variable assignment(s)
        assigns = []
        if id_info["type"] == "Identifier":
            ln = loop_names[0]
            wl_var = self.identifier_node(js, ln)
            self.scope.add_reference(ln, wl_var)
            base = self.identifier_node(js, result_name)
            self.scope.add_reference(result_name, base)
            member = self.field_identifier_node(js, "value")
            access = self.field_access_call(Ast(base), member, line, col)
            assign_node = self.call_node(js, f"{ln} = {result_name}.value",
                                         "<operator>.assignment", STATIC)
            assigns.append(self.call_ast(assign_node, [Ast(wl_var), access]))
        elif id_info["type"] == "ObjectPattern":
            for ln in loop_names:
                wl_var = self.identifier_node(js, ln)
                self.scope.add_reference(ln, wl_var)
                base = self.identifier_node(js, result_name)
                self.scope.add_reference(result_name, base)
                member = self.field_identifier_node(js, "value")
                access = self.field_access_call(Ast(base), member, line, col)
                vmember = self.field_identifier_node(js, ln)
                vaccess = self.field_access_call(access, vmember, line, col)
                assign_node = self.call_node(js, f"{ln} = {result_name}.value.{ln}",
                                             "<operator>.assignment", STATIC)
                assigns.append(self.call_ast(assign_node, [Ast(wl_var), vaccess]))
        elif id_info["type"] == "ArrayPattern":
            for i, ln in enumerate(loop_names):
                wl_var = self.identifier_node(js, ln)
                self.scope.add_reference(ln, wl_var)
                base = self.identifier_node(js, result_name)
                self.scope.add_reference(result_name, base)
                member = self.field_identifier_node(js, "value")
                access = self.field_access_call(Ast(base), member, line, col)
                key = Ast(self.literal_node(js, str(i), "__ecma.Number"))
                vaccess = self.index_access_call(access, key, line, col)
                assign_node = self.call_node(js, f"{ln} = {result_name}.value[{i}]",
                                             "<operator>.assignment", STATIC)
                assigns.append(self.call_ast(assign_node, [Ast(wl_var), vaccess]))
        else:
            # expression form: expr = _result.value
            wl_var = self.ast_for_node(id_info)
            base = self.identifier_node(js, result_name)
            self.scope.add_reference(result_name, base)
            member = self.field_identifier_node(js, "value")
            access = self.field_access_call(Ast(base), member, line, col)
            assign_node = self.call_node(
                js, f"{self.code_of_node(id_info)} = {result_name}.value",
                "<operator>.assignment", STATIC)
            assigns.append(self.call_ast(assign_node, [wl_var, access]))

        while_block = self.block_node(js, self.code_of_node(js))
        self.scope.push_block()
        self.local_parent_stack.append(while_block)
        body_ast = self.ast_for_node_with_fref(js["body"])
        self.local_parent_stack.pop()
        self.scope.pop()
        while_block_ast = Ast(while_block).with_children(assigns + [body_ast])
        while_ast = self._while_ast(js, test_ast, [while_block_ast])

        self.scope.pop()
        self.local_parent_stack.pop()
        children = [it_assign, Ast(res_node)] + [Ast(n) for n in loop_var_nodes] + [while_ast]
        return Ast(block).with_children(children)

    # classes (basic) ---------------------------------------------------------------
    def _ast_class(self, js, create_assignment: bool) -> Ast:
        if js.get("id"):
            name = js["id"]["name"]
        else:
            name = f"<anon-class>{self._anon_class_counter}"
            self._anon_class_counter += 1
        if js.get("superClass") and js["superClass"].get("type") == "Identifier":
            self._pending_inherits.append((name, js["superClass"]["name"]))
        full_name = f"{self.filename}:{':'.join(self.scope_name_stack)}:{name}"
        # TYPE_DECL code is the short form ("class X"), not the whole span
        td = Node("TYPE_DECL", name=name, full_name=full_name, code=f"class {name}",
                  filename=self.filename, **self._pos(js))
        td_ast = Ast(td)
        if js.get("abstract"):
            td_ast.with_child(Ast(Node("MODIFIER", modifier_type="ABSTRACT",
                                       code="<empty>")))
        self.method_parent_stack.append(td)
        self.scope_name_stack.append(name)
        ctor_member = None
        prop_inits = []    # non-static ClassProperty members with a value
        static_stmts = []  # ("prop", member) | ("block", stmt) for <clinit>

        TS_TYPES = {"string": "__ecma.String", "number": "__ecma.Number",
                    "boolean": "__ecma.Boolean"}

        annotate_members = []  # (MEMBER node, decorators) attached post-store

        def add_member(key_name, member, static=False):
            mem = Node("MEMBER", name=_strip_quotes(key_name),
                       code=self.code_of_node(member),
                       type_full_name=TS_TYPES.get(member.get("ts_type"), ANY)
                       if isinstance(member, dict) else ANY,
                       **self._pos(member))
            td_ast.with_child(Ast(mem))
            if isinstance(member, dict) and member.get("decorators"):
                annotate_members.append((mem, member["decorators"]))
            mods = []
            if static:
                mods.append("STATIC")
            # reversed source order matches the reference's modifier lists
            # ([public, readonly] -> READONLY, PUBLIC)
            for m in reversed(member.get("ts_modifiers", []) or []):
                if m in ("public", "private", "protected", "readonly",
                         "abstract"):
                    mods.append(m.upper())
            if member.get("private_name"):
                mods.append("PRIVATE")
            for mt in mods:
                mod = Node("MODIFIER", modifier_type=mt, code="<empty>")
                self.cpg.add_node(mod)
                self.cpg.add_edge(mem, mod, "AST")
            return mem

        for member in js["body"]["body"]:
            mtype = member["type"]
            if mtype == "ClassMethod":
                key_name = member["key"].get("name", self.code_of_node(member["key"]))
                if member.get("kind") == "constructor" or key_name == "constructor":
                    # explicit constructor: method named <init>, NOT a MEMBER
                    # (AstForTypesCreator: allMembers.diff(constructor))
                    ctor_member = member
                    continue
                m_js = dict(member)
                m_js["type"] = "FunctionExpression"
                m_js["id"] = {"name": key_name, "start": member["key"]["start"],
                              "end": member["key"]["end"], "type": "Identifier"}
                self.ast_for_function(m_js)
                if member.get("decorators"):
                    target = next((n for n in reversed(self.cpg.nodes)
                                   if n.label == "METHOD"
                                   and n.full_name == f"{full_name}:{key_name}"),
                                  None)
                    if target is not None:
                        self._attach_annotations(target, member["decorators"])
                if member.get("static"):
                    self._add_method_modifier(f"{full_name}:{key_name}", "STATIC")
                for m in reversed(member.get("ts_modifiers", []) or []):
                    if m in ("public", "private", "protected", "abstract"):
                        self._add_method_modifier(f"{full_name}:{key_name}",
                                                  m.upper())
                add_member(key_name, member, static=member.get("static", False))
            elif mtype == "ClassProperty":
                key_name = member["key"].get("name", self.code_of_node(member["key"]))
                add_member(key_name, member, static=member.get("static", False))
                if member.get("value") is not None:
                    if member.get("static"):
                        static_stmts.append(("prop", member))
                    else:
                        prop_inits.append(member)
            elif mtype == "StaticBlock":
                for stmt in member["body"]:
                    static_stmts.append(("block", stmt))

        def prop_init_asts(members):
            """Field initializers as `<name> = <value>` assignments with the
            member's source span as code (constructorContent semantics)."""
            out = []
            for m in members:
                key_name = m["key"].get("name", self.code_of_node(m["key"]))
                lhs = self.identifier_node(m, _strip_quotes(key_name))
                self.scope.add_reference(lhs.name, lhs)
                rhs = self.ast_for_node_with_fref(m["value"])
                out.append(self.assignment_call(
                    Ast(lhs), rhs, self.code_of_node(m),
                    self.line_of(m["start"]), self.col_of(m["start"])))
            return out

        # constructor (explicit or createFakeConstructor), with non-static
        # field initializers prepended into its body
        if ctor_member is not None:
            # TS parameter properties (`constructor(public readonly x: T)`):
            # each becomes a MEMBER (+modifiers, typed) and a `this.x = x`
            # assignment in the constructor body
            param_props = [p for p in ctor_member.get("params", [])
                           if isinstance(p, dict) and p.get("ts_modifiers")]
            for p in param_props:
                add_member(p.get("name", self.code_of_node(p)), p)

            def ctor_prelude():
                out = prop_init_asts(prop_inits)
                for p in param_props:
                    pname = p.get("name", self.code_of_node(p))
                    line_p = self.line_of(p["start"])
                    col_p = self.col_of(p["start"])
                    this_n = self.identifier_node(p, "this")
                    self.scope.add_reference("this", this_n)
                    part = self.field_identifier_node(p, pname)
                    access = self.field_access_call(Ast(this_n), part,
                                                    line_p, col_p)
                    rhs = self.identifier_node(p, pname)
                    self.scope.add_reference(pname, rhs)
                    out.append(self.assignment_call(
                        access, Ast(rhs), f"this.{pname} = {pname}",
                        line_p, col_p))
                return out

            m_js = dict(ctor_member)
            m_js["type"] = "FunctionExpression"
            m_js["id"] = {"name": "<init>", "start": ctor_member["key"]["start"],
                          "end": ctor_member["key"]["end"], "type": "Identifier"}
            self.ast_for_function(m_js, prelude_builder=ctor_prelude)
            # dynamically declared members: direct `this.X = ...` statements
            # in the constructor body (isInitializedMember; chained accesses
            # like this.f.g are NOT members)
            for stmt in ctor_member["body"]["body"]:
                expr = stmt.get("expression") if stmt["type"] == "ExpressionStatement" else None
                if not expr or expr.get("type") != "AssignmentExpression":
                    continue
                left = expr.get("left", {})
                if (left.get("type") == "MemberExpression"
                        and not left.get("computed")
                        and left.get("object", {}).get("type") == "ThisExpression"
                        and left.get("property", {}).get("type") == "Identifier"):
                    code = self.code_of_node(expr)
                    if expr["end"] < len(self.src) and self.src[expr["end"]] == ";":
                        code = code + ";"
                    mem = Node("MEMBER", name=left["property"]["name"], code=code,
                               **self._pos(expr))
                    td_ast.with_child(Ast(mem))
        else:
            # createClassConstructor's default branch: every class gets a
            # constructor METHOD named <init>, code "constructor() {}"
            # (AstForTypesCreator.scala:157-177)
            fake = {
                "type": "FunctionExpression",
                "id": {"name": "<init>", "start": js["start"],
                       "end": js["start"], "type": "Identifier"},
                "params": [],
                "body": {"type": "BlockStatement", "body": [],
                         "start": js["start"], "end": js["start"]},
                "start": js["start"], "end": js["start"],
            }
            self.ast_for_function(
                fake, code_override="constructor() {}",
                prelude_builder=lambda: prop_init_asts(prop_inits))
        self._mark_constructor(f"{full_name}:<init>")

        # static initializer <clinit>: static field initializers + static
        # blocks (x2cpg Defines.StaticInitMethodName)
        if static_stmts:
            fake = {
                "type": "FunctionExpression",
                "id": {"name": "<clinit>", "start": js["start"],
                       "end": js["start"], "type": "Identifier"},
                "params": [],
                "body": {"type": "BlockStatement", "body": [],
                         "start": js["start"], "end": js["start"]},
                "start": js["start"], "end": js["start"],
            }

            def clinit_body():
                out = []
                for kind, item in static_stmts:
                    if kind == "prop":
                        out.extend(prop_init_asts([item]))
                    else:
                        out.append(self.ast_for_node_with_fref(item))
                return out

            self.ast_for_function(fake, code_override="<clinit>",
                                  prelude_builder=clinit_body,
                                  modifiers=("STATIC", "CONSTRUCTOR"))

        self.scope_name_stack.pop()
        self.method_parent_stack.pop()
        td_ast.store(self.cpg)
        self.cpg.add_edge(self.method_parent_stack[-1], td, "AST")
        # the class VALUE: class EXPRESSIONS produce a TypeRef with code
        # "class <name>"; class DECLARATIONS additionally assign the
        # CONSTRUCTOR's METHOD_REF to the class name
        # (JsClassesAstCreationPassTests "synthetic assignment for ClassA")
        if create_assignment:
            ctor_full = f"{full_name}:<init>"
            ctor = next((n for n in reversed(self.cpg.nodes)
                         if n.label == "METHOD" and n.full_name == ctor_full), None)
            ctor_ref = Node("METHOD_REF", code=(ctor.code if ctor else "constructor() {}"),
                            method_full_name=ctor_full, type_full_name=ctor_full,
                            **self._pos(js))
            if ctor is not None:
                self.cpg.add_edge(ctor_ref, ctor, "REF")
            id_node = self.identifier_node(js, name)
            self.scope.add_reference(name, id_node)
            class_assign = self.assignment_call(
                Ast(id_node), Ast(ctor_ref), f"class {name}",
                self.line_of(js["start"]), self.col_of(js["start"]))
            # TS decorators (AstForTypesCreator.scala:540-566): ANNOTATION
            # nodes on the TYPE_DECL / MEMBERs, plus the Babel __decorate
            # desugar — one `Name = __decorate([...], Name)` assignment for
            # class decorators, one `__decorate([...], Name.prototype,
            # 'prop', void 0)` call per decorated property
            for mem, decs in annotate_members:
                self._attach_annotations(mem, decs)
            class_decs = js.get("decorators") or []
            decorated_props = [m for m in js["body"]["body"]
                               if m["type"] == "ClassProperty" and m.get("decorators")]
            decorated_methods = [
                m for m in js["body"]["body"]
                if m["type"] == "ClassMethod"
                and (m.get("decorators")
                     or any(isinstance(p, dict) and p.get("decorators")
                            for p in m.get("params", [])))]
            if class_decs:
                self._attach_annotations(td, class_decs)
            if class_decs or decorated_props or decorated_methods:
                stmts = [class_assign]
                if class_decs:
                    stmts.append(self._class_decoration_ast(js, name, ctor_full,
                                                            class_decs))
                for m in decorated_props:
                    stmts.append(self._property_decoration_ast(js, m, name))
                for m in decorated_methods:
                    stmts.append(self._method_decoration_ast(js, m, name))
                return Ast(self.block_node(js, self.code_of_node(js))).with_children(stmts)
            return class_assign
        type_ref = Node("TYPE_REF", code=f"class {name}", type_full_name=td.full_name,
                        **self._pos(js))
        for mem, decs in annotate_members:
            self._attach_annotations(mem, decs)
        if js.get("decorators"):
            self._attach_annotations(td, js["decorators"])
        return Ast(type_ref)

    def _decorator_exprs(self, decorators):
        """Lowered decorator expression asts (skipping any that failed to
        re-parse) and their source codes (the `@`-less decorator text).
        Elements are lowered BEFORE the decorate-array tmp is allocated —
        the reference's astForDecorateArray receives pre-lowered asts, so
        nested arrays (e.g. design:paramtypes) number their _tmp first."""
        asts, codes = [], []
        for d in decorators:
            if d.get("expr") is not None:
                asts.append(self.ast_for_node_with_fref(d["expr"]))
                codes.append(d["code"][1:] if d["code"].startswith("@") else d["code"])
        return asts, codes

    def _decorate_array_ast(self, js, elem_asts) -> Ast:
        """astForDecorateArray (AstForTypesCreator.scala:934-980): the
        array-factory/push block over PRE-LOWERED element asts."""
        block = self.block_node(js, self.code_of_node(js))
        self.scope.push_block()
        self.local_parent_stack.append(block)
        tmp = self.unused_name("_tmp")
        local = self.local_node(js, tmp)
        tmp_node = self.identifier_node(js, tmp)
        self.cpg.add_node(local)
        self.cpg.add_edge(self.local_parent_stack[-1], local, "AST")
        self.scope.add_variable(tmp, local)
        self.scope.add_reference(tmp, tmp_node)
        factory = self.call_node(js, f"{ARRAY_FACTORY}()", ARRAY_FACTORY, STATIC)
        line, col = self.line_of(js["start"]), self.col_of(js["start"])
        assign = self.assignment_call(Ast(tmp_node), Ast(factory),
                                      f"{tmp} = {ARRAY_FACTORY}()", line, col)
        pushes = []
        for ea in elem_asts:
            elem_code = _code_of(ea.root) if ea.root else "<empty>"
            push_call = self.call_node_at(f"{tmp}.push({elem_code})", "",
                                          DYNAMIC, line, col)
            base = self.identifier_node(js, tmp)
            self.scope.add_reference(tmp, base)
            member = self.field_identifier_node(js, "push")
            receiver = self.field_access_call(Ast(base), member, line, col)
            this_push = self.identifier_node(js, tmp)
            self.scope.add_reference(tmp, this_push)
            pushes.append(self.call_ast(push_call, [ea], base=Ast(this_push),
                                        receiver=receiver))
        ret = self.identifier_node(js, tmp)
        self.scope.add_reference(tmp, ret)
        self.local_parent_stack.pop()
        self.scope.pop()
        return Ast(block).with_children([assign] + pushes + [Ast(ret)])

    def _decorate_call_ast(self, js, args, code: str) -> Ast:
        """`__decorate(...)` dynamic call with receiver `__decorate` and
        base `this` (createClassDecorationAst / createPropertyDecorationAsts,
        AstForTypesCreator.scala:572-621, 773-832)."""
        recv = self.identifier_node(js, "__decorate")
        self.scope.add_reference("__decorate", recv)
        this_node = self.identifier_node(js, "this")
        program_td = next((n for n in self.cpg.nodes if n.label == "TYPE_DECL"
                           and n.name == ":program"), None)
        if program_td is not None:
            this_node.dynamic_type_hint_full_name = (program_td.full_name,)
        self.scope.add_reference("this", this_node)
        call = self.call_node(js, code, "__decorate", DYNAMIC)
        return self.call_ast(call, args, base=Ast(this_node), receiver=Ast(recv))

    def _class_decoration_ast(self, js, name: str, ctor_full: str,
                              decorators) -> Ast:
        dec_asts, codes = self._decorator_exprs(decorators)
        arr_ast = self._decorate_array_ast(js, dec_asts)
        code = f"__decorate([{','.join(codes)}], {name})"
        class_ref = self.identifier_node(js, name)
        class_ref.dynamic_type_hint_full_name = (ctor_full,)
        self.scope.add_reference(name, class_ref)
        dec_call = self._decorate_call_ast(js, [arr_ast, Ast(class_ref)], code)
        lhs = self.identifier_node(js, name)
        lhs.dynamic_type_hint_full_name = (ctor_full,)
        self.scope.add_reference(name, lhs)
        return self.assignment_call(
            Ast(lhs), dec_call, f"{name} = {code}",
            self.line_of(js["start"]), self.col_of(js["start"]))

    def _class_prototype_access(self, js, class_name: str) -> Ast:
        line, col = self.line_of(js["start"]), self.col_of(js["start"])
        base = self.identifier_node(js, class_name)
        self.scope.add_reference(class_name, base)
        proto = self.field_identifier_node(js, "prototype")
        return self.field_access_call(Ast(base), proto, line, col)

    def _property_decoration_ast(self, js, member, class_name: str) -> Ast:
        dec_asts, codes = self._decorator_exprs(member.get("decorators") or [])
        arr_ast = self._decorate_array_ast(js, dec_asts)
        prop_name = _strip_quotes(
            member["key"].get("name", self.code_of_node(member["key"])))
        proto_access = self._class_prototype_access(js, class_name)
        name_lit = Ast(self.literal_node(member, f"'{prop_name}'", "__ecma.String"))
        void_call = Ast(self.call_node(member, "void 0", "<operator>.void", STATIC))
        code = (f"__decorate([{','.join(codes)}], "
                f"{class_name}.prototype, '{prop_name}', void 0)")
        return self._decorate_call_ast(
            js, [arr_ast, proto_access, name_lit, void_call], code)

    def _metadata_call_ast(self, member, code: str, arg2: Ast,
                           key_lit_code: str) -> Ast:
        """`__metadata(...)` dynamic call (createMetadataCall*Ast,
        AstForTypesCreator.scala:623-770)."""
        recv = self.identifier_node(member, "__metadata")
        self.scope.add_reference("__metadata", recv)
        this_node = self.identifier_node(member, "this")
        program_td = next((n for n in self.cpg.nodes if n.label == "TYPE_DECL"
                           and n.name == ":program"), None)
        if program_td is not None:
            this_node.dynamic_type_hint_full_name = (program_td.full_name,)
        self.scope.add_reference("this", this_node)
        key_lit = Ast(self.literal_node(member, key_lit_code, "__ecma.String"))
        call = self.call_node(member, code, "__metadata", DYNAMIC)
        return self.call_ast(call, [key_lit, arg2], base=Ast(this_node),
                             receiver=Ast(recv))

    def _method_decoration_ast(self, js, member, class_name: str) -> Ast:
        """createMethodDecorationAsts (AstForTypesCreator.scala:835-932):
        __decorate([decs, __param(i, ...)s, __metadata x3],
        Class.prototype, 'name', null)."""
        dec_asts, dec_codes = self._decorator_exprs(member.get("decorators") or [])
        params = [p for p in member.get("params", []) if isinstance(p, dict)]
        param_asts, param_codes = [], []
        for idx, p in enumerate(params):
            p_dec_asts, p_dec_codes = self._decorator_exprs(p.get("decorators") or [])
            for pa, pc in zip(p_dec_asts, p_dec_codes):
                code = f"__param({idx}, {pc})"
                recv = self.identifier_node(p, "__param")
                self.scope.add_reference("__param", recv)
                this_node = self.identifier_node(p, "this")
                program_td = next((n for n in self.cpg.nodes
                                   if n.label == "TYPE_DECL"
                                   and n.name == ":program"), None)
                if program_td is not None:
                    this_node.dynamic_type_hint_full_name = (program_td.full_name,)
                self.scope.add_reference("this", this_node)
                idx_lit = Ast(self.literal_node(p, str(idx), "__ecma.Number"))
                call = self.call_node(p, code, "__param", DYNAMIC)
                param_asts.append(self.call_ast(call, [idx_lit, pa],
                                                base=Ast(this_node),
                                                receiver=Ast(recv)))
                param_codes.append(code)
        # __metadata("design:type", Function)
        meta1 = self._metadata_call_ast(
            member, '__metadata("design:type", Function)',
            Ast(self.literal_node(member, "Function", ANY)), "'design:type'")
        # __metadata("design:paramtypes", [Object,...]) — one Object literal
        # per parameter, via the decorate-array block (allocates its _tmp
        # BEFORE the outer array's, matching the reference numbering)
        obj_lits = [Ast(self.literal_node(member, "Object", "__ecma.Object"))
                    for _ in params]
        paramtypes_code = ("__metadata(\"design:paramtypes\", ["
                           + ",".join(["Object"] * len(params)) + "])")
        meta2 = self._metadata_call_ast(
            member, paramtypes_code, self._decorate_array_ast(member, obj_lits),
            "'design:paramtypes'")
        # __metadata("design:type", <returnType>) — key literal is
        # 'design:returntype' while the CODE says design:type (reference
        # quirk kept for parity, AstForTypesCreator.scala:750-757)
        tpe = (ts_annotation_full(member.get("return_type")) or ANY)
        tpe = tpe[len("__ecma."):] if tpe.startswith("__ecma.") else tpe
        meta3 = self._metadata_call_ast(
            member, f'__metadata("design:type", {tpe})',
            Ast(self.literal_node(member, tpe, ANY)), "'design:returntype'")

        arr_ast = self._decorate_array_ast(
            js, dec_asts + param_asts + [meta1, meta2, meta3])
        key_name = member["key"].get("name", self.code_of_node(member["key"]))
        m_name = "<init>" if (member.get("kind") == "constructor"
                              or key_name == "constructor") else _strip_quotes(key_name)
        proto_access = self._class_prototype_access(js, class_name)
        name_lit = Ast(self.literal_node(member, f"'{m_name}'", "__ecma.String"))
        null_lit = Ast(self.literal_node(member, "null", "__ecma.Null"))
        code = (f"__decorate([{','.join(dec_codes)}, {','.join(param_codes)}, "
                f'__metadata("design:type", Function), {paramtypes_code}, '
                f'__metadata("design:type", {tpe})], '
                f"{class_name}.prototype, '{m_name}', null)")
        return self._decorate_call_ast(
            js, [arr_ast, proto_access, name_lit, null_lit], code)

    def _attach_annotations(self, node: Node, decorators):
        """ANNOTATION nodes for TS decorators (order = 1..n)."""
        for i, d in enumerate(decorators or [], start=1):
            ann = Node("ANNOTATION", name=d["name"], full_name=d["full"],
                       code=d["code"], order=i,
                       line=self.line_of(d["start"]),
                       column=self.col_of(d["start"]))
            self.cpg.add_edge(node, ann, "AST")

    def _add_method_modifier(self, method_full_name: str, modifier_type: str):
        for n in reversed(self.cpg.nodes):
            if n.label == "METHOD" and n.full_name == method_full_name:
                mod = Node("MODIFIER", modifier_type=modifier_type, code="<empty>")
                self.cpg.add_edge(n, mod, "AST")
                return

    def _mark_constructor(self, method_full_name: str):
        """Attach the CONSTRUCTOR modifier to the method (reference:
        dstGraph.addEdge(methodNode, NewModifier().modifierType(CONSTRUCTOR),
        AST) in createClassConstructor)."""
        for n in reversed(self.cpg.nodes):
            if n.label == "METHOD" and n.full_name == method_full_name:
                mod = Node("MODIFIER", modifier_type="CONSTRUCTOR", code="<empty>")
                self.cpg.add_edge(n, mod, "AST")
                return

    def _ast_class_declaration(self, js) -> Ast:
        return self._ast_class(js, create_assignment=True)

    def _ast_class_expression(self, js) -> Ast:
        return self._ast_class(js, create_assignment=False)

    # imports / exports ----------------------------------------------------------
    def _ast_import_declaration(self, js) -> Ast:
        """astForImportDeclaration: var x = require("source") lowering."""
        source = js["source"]["value"] if js.get("source") else ""
        specifiers = js.get("specifiers", [])
        if not specifiers:
            return self._require_assignment(js, source, None, source, bare=True)
        asts = []
        for spec in specifiers:
            name = spec["local"]["name"]
            if spec["type"] == "ImportSpecifier":
                req_name = spec["imported"]["name"]
                alias = name
            else:
                req_name, alias = name, None
            asts.append(self._require_assignment(js, req_name, alias, source,
                                                 is_import_n=spec["type"] == "ImportSpecifier"))
        if len(asts) == 1:
            return asts[0]
        return Ast(self.block_node(js, self.code_of_node(js))).with_children(asts)

    def _create_import_node(self, code: str, imported_entity: str,
                            imported_as: str, call: Optional[Node],
                            group_name: str, group_id: str, version: str,
                            line=None, col=None):
        """createImportNodeAndAttachToCall + dependencyNode
        (AstForDeclarationsCreator.scala:431-457, 333-360): IMPORT attached
        to :program via AST, IS_CALL_FOR_IMPORT from the require call,
        IMPORTS edge from the IMPORT to its DEPENDENCY."""
        imp = Node("IMPORT", code=code, imported_entity=imported_entity,
                   imported_as=imported_as, line=line, column=col)
        self.cpg.add_node(imp)
        program = next((m for m in self.method_parent_stack[::-1]
                        if m.label == "METHOD" and m.name == ":program"),
                       None)
        if program is None:
            program = next((n for n in self.cpg.nodes
                            if n.label == "METHOD" and n.name == ":program"),
                           None)
        if program is not None:
            self.cpg.add_edge(program, imp, "AST")
        if call is not None:
            self.cpg.add_edge(call, imp, "IS_CALL_FOR_IMPORT")
        dep = Node("DEPENDENCY", name=group_name,
                   dependency_group_id=group_id, version=version)
        self.cpg.add_node(dep)
        self.cpg.add_edge(imp, dep, "IMPORTS")
        return imp

    def _require_assignment(self, js, name, alias, from_source,
                            is_import_n=False, bare=False) -> Ast:
        dest_name = alias or name
        dest = self.identifier_node(js, dest_name)
        local = self.local_node(js, dest_name)
        self.cpg.add_node(local)
        if self.local_parent_stack:
            self.cpg.add_edge(self.local_parent_stack[-1], local, "AST")
        self.scope.add_variable(dest_name, local)
        self.scope.add_reference(dest_name, dest)
        line, col = self.line_of(js["start"]), self.col_of(js["start"])
        src_lit = self.literal_node(js, f'"{from_source}"')
        source_call = self.call_node(js, f'require("{from_source}")', "require", DYNAMIC)
        recv = self.identifier_node(js, "require")
        this_node = self.identifier_node(js, "this")
        self.scope.add_reference("this", this_node)
        c_ast = self.call_ast(source_call, [Ast(src_lit)], base=Ast(this_node), receiver=Ast(recv))
        if is_import_n:
            part = self.field_identifier_node(js, _strip_quotes(name))
            c_ast = self.field_access_call(c_ast, part, line, col)
        # IMPORT + DEPENDENCY for the import statement
        # (astForImportDeclaration:333-360): importedEntity is "source:name"
        # for EVERY specifier form (named/default/namespace); plain source
        # only for bare `import "source"`
        entity = from_source if bare else f"{from_source}:{name}"
        self._create_import_node(
            self.code_of_node(js).rstrip(";"), entity, dest_name, source_call,
            group_name=dest_name, group_id=from_source, version="import",
            line=line, col=col)
        return self.assignment_call(Ast(dest), c_ast,
                                    f"var {dest_name} = {_code_of(c_ast.root)}", line, col)

    def _export_names_of(self, decl) -> list[str]:
        t = decl.get("type")
        if t == "VariableDeclaration":
            out = []
            for d in decl.get("declarations", []):
                idj = d.get("id", {})
                if idj.get("type") == "Identifier":
                    out.append(idj["name"])
                elif idj.get("type") == "ObjectPattern":
                    for p in idj.get("properties", []):
                        v = p.get("value") or p.get("argument") or {}
                        if v.get("type") == "Identifier":
                            out.append(v["name"])
                elif idj.get("type") == "ArrayPattern":
                    for el in idj.get("elements", []):
                        if el and el.get("type") == "Identifier":
                            out.append(el["name"])
            return out
        if t in ("FunctionDeclaration", "ClassDeclaration") and decl.get("id"):
            return [decl["id"]["name"]]
        return []

    def _exports_assignment(self, js, exported: str, rhs_ast: Ast,
                            rhs_code: str, line, col,
                            default: bool = False) -> Ast:
        """createExportCallAst + createExportAssignmentCallAst:
        `exports.<exported> = <rhs>` (or exports["default"] = <rhs>)."""
        # the synthetic `exports` base is NOT a scope reference (no local is
        # created for it in the reference)
        base = self.identifier_node(js, "exports")
        if default:
            key = Ast(self.literal_node(js, '"default"', "__ecma.String"))
            access = self.index_access_call(Ast(base), key, line, col)
            lhs_code = 'exports["default"]'
        else:
            part = self.field_identifier_node(js, exported)
            access = self.field_access_call(Ast(base), part, line, col)
            lhs_code = f"exports.{exported}"
        return self.assignment_call(
            access, rhs_ast, f"{lhs_code} = {rhs_code}", line, col)

    def _ident_ast(self, js, name: str) -> Ast:
        n = self.identifier_node(js, name)
        self.scope.add_reference(name, n)
        return Ast(n)

    def _ast_export_named_declaration(self, js) -> Ast:
        line, col = self.line_of(js["start"]), self.col_of(js["start"])
        if js.get("declaration"):
            decl_ast = self.ast_for_node_with_fref_and_call(js["declaration"])
            names = self._export_names_of(js["declaration"])
            if not names:
                return decl_ast
            exports_asts = [
                self._exports_assignment(js, name, self._ident_ast(js, name),
                                         name, line, col)
                for name in names
            ]
            block = self.block_node(js, self.code_of_node(js))
            return Ast(block).with_child(decl_ast).with_children(exports_asts)
        specifiers = js.get("specifiers") or []
        if not specifiers:
            return Ast()
        source = js["source"]["value"] if js.get("source") else None
        stmts = []
        base_name = None
        if source is not None:
            # export { ... } from "src": var _<base> = require("src") once,
            # then exports.<exported> = _<base>.<local>, plus a DEPENDENCY
            # per exported name (version "require")
            seg = source.rstrip("/").rsplit("/", 1)[-1]
            base_name = "_" + "".join(ch for ch in seg if ch.isalnum() or ch == "_")
            stmts.append(self._require_var(js, base_name, source, line, col))
        for spec in specifiers:
            local = spec["local"].get("name", self.code_of_node(spec["local"]))
            exported = spec["exported"].get("name", self.code_of_node(spec["exported"]))
            if source is not None:
                fa_base = self._ident_ast(js, base_name)
                part = self.field_identifier_node(js, local)
                rhs = self.field_access_call(fa_base, part, line, col)
                rhs_code = f"{base_name}.{local}"
                self._create_import_node(
                    f"{exported} = require(\"{source}\").{local}", source,
                    exported, None, group_name=exported, group_id=source,
                    version="require", line=line, col=col)
            else:
                rhs = self._ident_ast(js, local)
                rhs_code = local
            stmts.append(self._exports_assignment(
                js, exported, rhs, rhs_code, line, col,
                default=exported == "default"))
        if len(stmts) == 1:
            return stmts[0]
        return Ast(self.block_node(js, self.code_of_node(js))).with_children(stmts)

    def _require_var(self, js, var_name: str, source: str, line, col) -> Ast:
        """`var <var_name> = require("<source>")` helper for export-from."""
        dest = self.identifier_node(js, var_name)
        local = self.local_node(js, var_name)
        self.cpg.add_node(local)
        if self.local_parent_stack:
            self.cpg.add_edge(self.local_parent_stack[-1], local, "AST")
        self.scope.add_variable(var_name, local)
        self.scope.add_reference(var_name, dest)
        src_lit = self.literal_node(js, f'"{source}"')
        req = self.call_node(js, f'require("{source}")', "require", DYNAMIC)
        recv = self.identifier_node(js, "require")
        this_node = self.identifier_node(js, "this")
        self.scope.add_reference("this", this_node)
        c_ast = self.call_ast(req, [Ast(src_lit)], base=Ast(this_node),
                              receiver=Ast(recv))
        return self.assignment_call(
            Ast(dest), c_ast, f'var {var_name} = require("{source}")', line, col)

    def _ast_export_all_declaration(self, js) -> Ast:
        """export * [as name] from "src": DEPENDENCY(name = alias or last
        path segment, version "require") + the require var."""
        line, col = self.line_of(js["start"]), self.col_of(js["start"])
        source = js["source"]["value"]
        if js.get("exported"):
            name = js["exported"]["name"]
        else:
            name = source.rstrip("/").rsplit("/", 1)[-1]
        dep = Node("DEPENDENCY", name=name, dependency_group_id=source,
                   version="require")
        self.cpg.add_node(dep)
        base = "_" + "".join(ch for ch in name if ch.isalnum() or ch == "_")
        return self._require_var(js, base, source, line, col)

    def _ast_tsexport_assignment(self, js) -> Ast:
        """`export = expr`: the exported entity keeps its own lowering
        (functions keep their declaration assignment; classes and plain
        identifiers don't add one) + `exports.<name> = <name>`."""
        line, col = self.line_of(js["start"]), self.col_of(js["start"])
        expr = js["expression"]
        inner = expr.get("expression") if expr.get("type") == "ExpressionStatement" else None
        stmts = []
        fn_types = ("FunctionDeclaration", "FunctionExpression",
                    "ArrowFunctionExpression")
        if expr.get("type") in fn_types or (
                inner and inner.get("type") in fn_types):
            fn = expr if expr.get("type") in fn_types else inner
            name, _full = self.method_name_and_fullname(fn)
            stmts.append(self.ast_for_function(fn, create_reference=True,
                                               create_assignment=True))
        elif expr.get("type") in ("ClassDeclaration", "ClassExpression") or (
                inner and inner.get("type") == "ClassExpression"):
            cls = expr if expr.get("type") in ("ClassDeclaration",
                                               "ClassExpression") else inner
            self._ast_class(cls, create_assignment=False)
            name = cls["id"]["name"] if cls.get("id") else None
        elif inner and inner.get("type") == "Identifier":
            name = inner["name"]
        else:
            return self.ast_for_node_with_fref_and_call(expr)
        if name is None:
            return Ast()
        stmts.append(self._exports_assignment(
            js, name, self._ident_ast(js, name), name, line, col))
        if len(stmts) == 1:
            return stmts[0]
        return Ast(self.block_node(js, self.code_of_node(js))).with_children(stmts)

    def _ast_tsimport_equals_declaration(self, js) -> Ast:
        """`import path = require('path')` — lowers like a require
        declarator: local + `var path = require("path")` assignment."""
        name = js["id"]["name"]
        expr = js["expression"]
        source = ""
        if (expr.get("type") == "CallExpression"
                and expr.get("callee", {}).get("name") == "require"
                and expr.get("arguments")):
            source = expr["arguments"][0].get("value", "")
        return self._require_assignment(js, name, None, source, bare=True)

    def _ast_export_default_declaration(self, js) -> Ast:
        """export default <decl>: the declaration lowers normally, then
        exports["default"] = <name>."""
        line, col = self.line_of(js["start"]), self.col_of(js["start"])
        decl = js.get("declaration")
        if not decl:
            return Ast()
        decl_ast = self.ast_for_node_with_fref_and_call(decl)
        name = None
        names = self._export_names_of(decl)
        if names:
            name = names[0]
        elif decl.get("type") == "ExpressionStatement":
            inner = decl.get("expression", {})
            if inner.get("type") == "AssignmentExpression" and \
                    inner.get("left", {}).get("type") == "Identifier":
                name = inner["left"]["name"]
            elif inner.get("type") == "Identifier":
                name = inner["name"]
        if name is None:
            return decl_ast
        exp = self._exports_assignment(js, name, self._ident_ast(js, name),
                                       name, line, col, default=True)
        block = self.block_node(js, self.code_of_node(js))
        return Ast(block).with_child(decl_ast).with_child(exp)

    # JSX / template DOM (AstForTemplateDomCreator.scala:10-90) --------------
    def _template_dom(self, typ: str, js, code: str | None = None) -> Node:
        return Node("TEMPLATE_DOM", name=typ,
                    code=code if code is not None else self.code_of_node(js),
                    **self._pos(js))

    def _ast_jsxelement(self, js) -> Ast:
        dom = self._template_dom("JSXElement", js)
        children = [self.ast_for_node_with_fref(js["openingElement"])]
        children += [self.ast_for_node_with_fref(c) for c in js.get("children", [])]
        if js.get("closingElement"):
            children.append(self.ast_for_node_with_fref(js["closingElement"]))
        return Ast(dom).with_children(children)

    def _ast_jsxfragment(self, js) -> Ast:
        dom = self._template_dom("JSXFragment", js)
        return Ast(dom).with_children(
            [self.ast_for_node_with_fref(c) for c in js.get("children", [])])

    def _ast_jsxopening_element(self, js) -> Ast:
        dom = self._template_dom("JSXOpeningElement", js)
        return Ast(dom).with_children(
            [self.ast_for_node_with_fref(a) for a in js.get("attributes", [])])

    def _ast_jsxclosing_element(self, js) -> Ast:
        return Ast(self._template_dom("JSXClosingElement", js))

    def _ast_jsxattribute(self, js) -> Ast:
        dom = self._template_dom("JSXAttribute", js)
        if js.get("value") is not None:
            return Ast(dom).with_child(self.ast_for_node_with_fref(js["value"]))
        return Ast(dom)

    def _ast_jsxspread_attribute(self, js) -> Ast:
        dom = self._template_dom("JSXSpreadAttribute", js)
        return Ast(dom).with_child(self.ast_for_node_with_fref(js["argument"]))

    def _ast_jsxexpression_container(self, js) -> Ast:
        dom = self._template_dom("JSXExpressionContainer", js)
        if js.get("expression") is not None:
            return Ast(dom).with_child(self.ast_for_node_with_fref(js["expression"]))
        return Ast(dom)

    def _ast_jsxtext(self, js) -> Ast:
        return Ast(self._template_dom("JSXText", js))

    def _ast_unknown(self, js) -> Ast:
        return Ast(Node("UNKNOWN", code=self.code_of_node(js), **self._pos(js)))

    # post passes ------------------------------------------------------------------
    def _add_file_and_type_edges(self):
        """FileCreationPass (x2cpg FileCreationPass.scala:12-18): SOURCE_FILE
        edges from filename-carrying nodes to the FILE node; and
        TypeEval/TypeRefPass (TypeEvalPass.scala:9-12, TypeRefPass.scala:9-12):
        TYPE nodes per used typeFullName, EVAL_TYPE from expressions, REF from
        TYPE to a matching TYPE_DECL."""
        file_node = next((n for n in self._own_nodes()
                          if n.label == "FILE" and n.name == self.filename), None)
        if file_node is not None:
            for n in self._own_nodes():
                if n.label in ("METHOD", "TYPE_DECL", "NAMESPACE_BLOCK") and n.filename:
                    self.cpg.add_edge(n, file_node, "SOURCE_FILE")
        # TYPE nodes for every non-ANY typeFullName in use.  TypeNodePass
        # registers names from ALL nodes (members/locals/params included);
        # EVAL_TYPE edges are added for expressions only (TypeEvalPass).
        type_nodes: dict[str, Node] = {n.full_name: n for n in self.cpg.nodes
                                       if n.label == "TYPE"}
        decls = {n.full_name: n for n in self.cpg.nodes if n.label == "TYPE_DECL"}
        for n in list(self._own_nodes()):
            t = n.type_full_name
            if not t or t == "ANY" or n.label in ("TYPE", "TYPE_DECL"):
                continue
            tn = type_nodes.get(t)
            if tn is None:
                # short name: the segment after the last path separator
                # (':' for jssrc full names, '.' for builtin dictionaries)
                short = re.split(r"[.:]", t)[-1] or t
                tn = Node("TYPE", name=short, full_name=t, code=t)
                self.cpg.add_node(tn)
                type_nodes[t] = tn
                if t in decls:
                    self.cpg.add_edge(tn, decls[t], "REF")
            if n.is_expression:
                self.cpg.add_edge(n, tn, "EVAL_TYPE")

    def _own_nodes(self):
        return self.cpg.nodes[self._node_start:]

    def _own_methods(self):
        return [n for n in self._own_nodes() if n.label == "METHOD"]

    def _add_contains_edges(self):
        from joern_spark.cpg.passes import CONTAINS_SOURCES, add_contains_edges
        add_contains_edges(self.cpg, [n for n in self._own_nodes()
                                      if n.label in CONTAINS_SOURCES])

    def _link_parameter_outs(self):
        from joern_spark.cpg.passes import create_parameter_outs
        create_parameter_outs(self.cpg, self._own_methods())


def _shorten(code: str, max_len: int = MAX_CODE_LENGTH) -> str:
    return code if len(code) <= max_len else code[: max_len - 3] + "..."


def _strip_quotes(s: str) -> str:
    for q in ('"', "'", "`"):
        if s.startswith(q):
            s = s[1:]
        if s.endswith(q):
            s = s[:-1]
    return s


def _code_of(node: Optional[Node]) -> str:
    return node.code if node is not None else ""


_SNAKE_MEMO: dict[str, str] = {}


def _snake(name: str) -> str:
    s = _SNAKE_MEMO.get(name)
    if s is None:
        out = []
        for i, ch in enumerate(name):
            if ch.isupper() and i > 0 and (not name[i - 1].isupper()):
                out.append("_")
            out.append(ch.lower())
        s = _SNAKE_MEMO[name] = "".join(out)
    return s


def lower_js(src: str, filename: str = "script.js") -> Cpg:
    """Parse + lower one JS document to a CPG (AST layer only — CFG/DDG are
    added by cfg.py / reachingdef.py)."""
    return AstLowerer(src, filename).create()


def lower_js_files(files: list[tuple[str, str]]) -> Cpg:
    """Lower a multi-file project ((filename, src) pairs) into ONE CPG —
    the reference graph holds every compilation unit, which is what
    cross-file import resolution and the multi-file reference tests need."""
    cpg = Cpg(files[0][0] if files else "script.js")
    last = None
    for filename, src in files:
        last = AstLowerer(src, filename, cpg=cpg)
        last.create(link_inheritance=False)
    if last is not None:
        last._link_inheritance()  # deferred: resolves across all files
    return cpg
