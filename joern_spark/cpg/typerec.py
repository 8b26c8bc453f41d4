"""XTypeRecovery for JavaScript/TypeScript — full port of the reference's
flow-insensitive, symbol-table-based type propagation:

- SymbolTable / SBKey            (x2cpg passes/frontend/SymbolTable.scala)
- JavaScriptImportResolverPass   (x2cpg frontendspecific/jssrc2cpg/
                                  JavaScriptImportResolverPass.scala)
- ConstClosurePass               (.../ConstClosurePass.scala)
- XTypeRecovery core + JS overrides
                                 (passes/frontend/XTypeRecovery.scala:300-1331,
                                  frontendspecific/jssrc2cpg/JavaScriptTypeRecovery.scala)
- JavaScriptTypeHintCallLinker   (passes/frontend/XTypeHintCallLinker.scala,
                                  .../JavaScriptTypeHintCallLinker.scala)
- ObjectPropertyCallLinker       (.../ObjectPropertyCallLinker.scala)

Pass order mirrors jssrc2cpg postProcessingPasses (x2cpg
frontendspecific/jssrc2cpg/package.scala:10-15): ConstClosure →
ImportResolver → TypeRecovery × iterations → TypeHintCallLinker →
ObjectPropertyCallLinker.  The whole pipeline is per-document Python
(documents are self-contained pages), invoked from the Spark build UDF.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from joern_spark.cpg.core import Cpg, Node

PATH_SEP = ":"
DUMMY_RETURN_TYPE = "<returnValue>"
DUMMY_MEMBER_LOAD = "<member>"
DUMMY_INDEX_ACCESS = "<indexAccess>"
_DUMMY_TOKENS = (DUMMY_RETURN_TYPE, DUMMY_MEMBER_LOAD, DUMMY_INDEX_ACCESS)
CONSTRUCTOR = "<init>"
OPERATORS_NEW = "<operator>.new"
ASSIGNMENT = "<operator>.assignment"
FIELD_ACCESS = "<operator>.fieldAccess"
INDEX_ACCESS = "<operator>.indexAccess"
PROGRAM = ":program"

# XTypeRecovery.unknownTypePattern (case-insensitive)
_UNKNOWN_RE = re.compile(r"(?i)^(UNKNOWN|ANY|<unresolvedNamespace>).*")

# GlobalBuiltins.builtins (jssrc2cpg GlobalBuiltins.scala) — the subset a
# web page realistically constructs; extend as goldens demand.
GLOBAL_BUILTINS = {
    "AggregateError", "Array", "ArrayBuffer", "BigInt", "Boolean", "DataView",
    "Date", "Error", "EvalError", "Function", "HTMLImageElement", "Intl",
    "JSON", "Map", "Math", "Number", "Object", "Promise", "Proxy", "RangeError",
    "ReferenceError", "RegExp", "Set", "SharedArrayBuffer", "String", "Symbol",
    "SyntaxError", "TypeError", "URIError", "WeakMap", "WeakRef", "WeakSet",
    "Int8Array", "Int16Array", "Int32Array", "Uint8Array", "Uint16Array",
    "Uint32Array", "Float32Array", "Float64Array", "BigInt64Array",
    "BigUint64Array",
}


def is_dummy_type(t: str) -> bool:
    return (DUMMY_RETURN_TYPE in t or DUMMY_MEMBER_LOAD in t
            or DUMMY_INDEX_ACCESS in t)


def _known(types) -> "dict[str, None]":
    """Ordered set of types with unknown-pattern entries dropped."""
    return {t: None for t in types if t and not _UNKNOWN_RE.match(t)}


def all_types_of(n: Node) -> list[str]:
    return ([n.type_full_name or "ANY"]
            + list(n.dynamic_type_hint_full_name)
            + list(n.possible_types))


def known_types_of(n: Node) -> "dict[str, None]":
    # fast path: the overwhelmingly common single-source case avoids the
    # list concat + dictcomp (hot in the per-document build)
    if not n.dynamic_type_hint_full_name and not n.possible_types:
        t = n.type_full_name or "ANY"
        if t and not _UNKNOWN_RE.match(t):
            return {t: None}
        return {}
    return _known(all_types_of(n))


# ---------------------------------------------------------------------------
# SymbolTable (SymbolTable.scala) — keys are plain tuples for hashability;
# values are insertion-ordered dicts used as ordered sets (the reference
# uses Scala Sets; ordering here makes the 10-entry bound deterministic).
# ---------------------------------------------------------------------------

def LocalVar(name: str):
    return ("local", name)


def CollectionVar(name: str, idx: str):
    return ("coll", name, idx)


def CallAlias(name: str, receiver: Optional[str] = None):
    return ("call", name, receiver)


class SymbolTable:
    SET_LIMIT = 10  # bounds dummy-type permutations (SymbolTable.scala:78)

    def __init__(self, cpg: Cpg):
        self.cpg = cpg
        self.table: dict[tuple, dict[str, None]] = {}

    # SBKey.fromNodeToLocalKey
    def key_from_node(self, n: Node):
        if n.label == "IDENTIFIER" or n.label == "LOCAL" or n.label == "METHOD_PARAMETER_IN":
            return LocalVar(n.name)
        if n.label == "CALL":
            recv = None
            for a in self.cpg.arguments(n):
                if a.argument_index == 0 and a.label == "IDENTIFIER":
                    recv = a.name
                    break
            return CallAlias(n.name, recv)
        if n.label == "METHOD":
            return CallAlias(n.name, "this")
        if n.label == "METHOD_REF":
            return CallAlias(n.code)
        if n.label == "FIELD_IDENTIFIER":
            return LocalVar(n.canonical_name)
        return None

    def _coalesce(self, old, new) -> dict:
        every = list(old) + [t for t in new if t not in old]
        no_dummy = [t for t in every if not is_dummy_type(t)]
        dummy = [t for t in every if is_dummy_type(t)]
        return {t: None for t in (no_dummy + dummy)[: self.SET_LIMIT]}

    def _key(self, k):
        return self.key_from_node(k) if isinstance(k, Node) else k

    def put(self, k, types) -> "dict[str, None]":
        key = self._key(k)
        if isinstance(types, str):
            types = {types: None}
        types = {t: None for t in types}
        if key is None or not types:
            return {}
        entry = self._coalesce({}, types)
        self.table[key] = entry
        return entry

    def append(self, k, types) -> "dict[str, None]":
        key = self._key(k)
        if isinstance(types, str):
            types = {types: None}
        types = {t: None for t in types}
        if key is None or not types:
            return {}
        old = self.table.get(key)
        if old is not None and set(old) == set(types):
            return old
        entry = self._coalesce(old or {}, types)
        self.table[key] = entry
        return entry

    def contains(self, k) -> bool:
        key = self._key(k)
        return key is not None and key in self.table

    def get(self, k) -> "dict[str, None]":
        key = self._key(k)
        return dict(self.table.get(key, {})) if key is not None else {}


# ---------------------------------------------------------------------------
# EvaluatedImport records (semanticcpg importresolver) — attached to the
# Cpg as `cpg.evaluated_imports`: {import_call_node_id: [records]}.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ResolvedMethod:
    full_name: str
    alias: str
    receiver: Optional[str] = None
    label: str = field(default="RESOLVED_METHOD")


@dataclass(frozen=True)
class ResolvedTypeDecl:
    full_name: str
    label: str = field(default="RESOLVED_TYPE_DECL")


@dataclass(frozen=True)
class ResolvedMember:
    base_path: str
    member_name: str
    label: str = field(default="RESOLVED_MEMBER")


@dataclass(frozen=True)
class UnknownMethod:
    full_name: str
    alias: str
    receiver: Optional[str] = None
    label: str = field(default="UNKNOWN_METHOD")


@dataclass(frozen=True)
class UnknownTypeDecl:
    full_name: str
    label: str = field(default="UNKNOWN_TYPE_DECL")


@dataclass(frozen=True)
class UnknownImport:
    path: str
    label: str = field(default="UNKNOWN_IMPORT")


# ---------------------------------------------------------------------------
# Shared traversal helpers over our Cpg
# ---------------------------------------------------------------------------

def _ast_parent(cpg: Cpg, n: Node) -> Optional[Node]:
    return cpg.ast_parent(n)


def _ast_siblings(cpg: Cpg, n: Node) -> list[Node]:
    p = cpg.ast_parent(n)
    if p is None:
        return []
    return [c for c in cpg.ast_children(p) if c is not n]


def _in_assignment(cpg: Cpg, n: Node) -> Optional[Node]:
    c = cpg.in_call(n)
    if c is not None and c.name == ASSIGNMENT:
        return c
    return None


def _assignments(cpg: Cpg) -> list[Node]:
    return [n for n in cpg.nodes_by_label("CALL") if n.name == ASSIGNMENT]


def _assignment_args(cpg: Cpg, a: Node) -> list[Node]:
    return cpg.arguments(a)


def _methods_by_full_name(cpg: Cpg) -> dict[str, Node]:
    out = {}
    for m in cpg.methods():
        out.setdefault(m.full_name, m)
    return out


def _typedecls_by_full_name(cpg: Cpg) -> dict[str, Node]:
    out = {}
    for t in cpg.nodes:
        if t.label == "TYPE_DECL":
            out.setdefault(t.full_name, t)
    return out


def _members_of(cpg: Cpg, typedecl: Node) -> list[Node]:
    return [c for c in cpg.ast_children(typedecl) if c.label == "MEMBER"]


def _field_identifier(cpg: Cpg, fa: Node) -> Optional[Node]:
    for a in cpg.arguments(fa):
        if a.label == "FIELD_IDENTIFIER":
            return a
    return None


def _method_of(cpg: Cpg, n: Node) -> Optional[Node]:
    return cpg.method_of(n)


# ---------------------------------------------------------------------------
# JavaScriptInheritanceNamePass (XInheritanceFullNamePass.scala +
# jssrc2cpg JavaScriptInheritanceNamePass.scala: pathSep=':',
# moduleName=':program', fileExt='.js') — resolves short inherited type
# names against import information, rewriting the external supertype stub
# to its module-qualified full name.
# ---------------------------------------------------------------------------

def _names_intersect(a: str, b: str, sep: str = ":") -> bool:
    aa, bb = a.split(sep), b.split(sep)
    inter = [x for x in aa if x in bb]
    return bool(inter) and (aa[-len(inter):] == inter or bb[-len(inter):] == inter)


def _combined_path(imported_type: str, imported_path: str, sep: str = ":") -> str:
    a, b = ((imported_type, imported_path)
            if len(imported_type) > len(imported_path)
            else (imported_path, imported_type))
    aa, bb = a.split(sep), b.split(sep)
    inter = [x for x in aa if x in bb]
    if a == imported_path:
        return sep.join([x for x in bb if x not in inter] + aa)
    return sep.join([x for x in aa if x not in inter] + bb)


def _x_type_full_name(imported_type: str, imported_path: str,
                      file_ext: str = ".js") -> tuple[str, str]:
    """`foo:bar:Baz` → ("Baz", "foo/bar.js::program:Baz")
    (XInheritanceFullNamePass.scala:103-121)."""
    combined = _combined_path(imported_type, imported_path)
    t_name = combined.split(":")[-1]
    prefix = combined.removesuffix(f":{t_name}").replace(":", "/")
    return t_name, f"{prefix}{file_ext}:{PROGRAM}:{t_name}"


def inheritance_full_name_pass(cpg: Cpg):
    import posixpath

    # imported entities per file (relative path heads normalized)
    entities_by_file: dict[str, list[str]] = {}
    for imp in cpg.nodes_by_label("IMPORT"):
        ent = imp.imported_entity
        if not ent:
            continue
        prog = cpg.ast_parent(imp)
        fname = (prog.full_name.split("::")[0]
                 if prog is not None and prog.label == "METHOD" else cpg.filename)
        if re.match(r"^[.]+/?.*", ent):
            parts = ent.split(":")
            parts[0] = posixpath.normpath(parts[0])
            ent = ":".join(parts)
        entities_by_file.setdefault(fname, []).append(ent)

    for td in cpg.nodes_by_label("TYPE_DECL"):
        for e in cpg.out(td, "INHERITS_FROM"):
            stub = e.dst
            # unresolved external supertype stub: short name == full name
            if not (stub.is_external and stub.full_name == stub.name
                    and stub.name not in ("ANY", "object")):
                continue
            qualified = [q for q in entities_by_file.get(td.filename, [])
                         if not q.endswith(PROGRAM)]
            for qn in qualified:
                if _names_intersect(qn, stub.name):
                    t_name, full = _x_type_full_name(qn, stub.name)
                    stub.name = t_name
                    stub.full_name = full
                    break


# ---------------------------------------------------------------------------
# ConstClosurePass (ConstClosurePass.scala) — renames closure methods
# assigned to constants / exports / single-assignment mutable vars.
# ---------------------------------------------------------------------------

def const_closure_pass(cpg: Cpg):
    method_by_full = _methods_by_full_name(cpg)

    def referenced_method(mref: Node) -> Optional[Node]:
        for e in cpg.out(mref, "REF"):
            if e.dst.label == "METHOD":
                return e.dst
        return method_by_full.get(mref.method_full_name)

    def update(method: Node, mref: Node, enclosing_full: str, name: str):
        full = f"{enclosing_full}:{name}"
        mref.method_full_name = full
        method.name = name
        old = method.full_name
        method.full_name = full
        method_by_full.pop(old, None)
        method_by_full[full] = method

    assigned_count: dict[str, int] = {}
    for a in _assignments(cpg):
        args = _assignment_args(cpg, a)
        if args and args[0].label == "IDENTIFIER":
            assigned_count[args[0].name] = assigned_count.get(args[0].name, 0) + 1

    for a in _assignments(cpg):
        args = _assignment_args(cpg, a)
        if len(args) != 2:
            continue
        target, source = args
        encl = _method_of(cpg, a)
        if encl is None:
            continue
        # handleConstClosuresDefinedInObjectExpr: `_tmp_N.prop = methodRef`
        if (a.code.startswith("_tmp_") and target.label == "CALL"
                and target.name == FIELD_ACCESS and source.label == "METHOD_REF"):
            fi = _field_identifier(cpg, target)
            m = referenced_method(source)
            if fi is not None and m is not None:
                update(m, source, encl.full_name, fi.canonical_name)
            continue
        if source.label == "METHOD_REF":
            m = referenced_method(source)
            if m is None:
                continue
            # handleConstClosures: `const f = function(){}`
            if a.code.startswith("const ") and target.label == "IDENTIFIER":
                update(m, source, encl.full_name, target.name)
            # handleClosuresAssignedToMutableVar: var/let, single assignment
            elif (re.match(r"^(var|let) ", a.code) and target.label == "IDENTIFIER"
                  and assigned_count.get(target.name) == 1):
                update(m, source, encl.full_name, target.name)
        # handleClosuresDefinedAtExport: `exports.f = ...` with a method ref
        # anywhere in the RHS AST
        if a.code.startswith("export") and target.label == "CALL":
            fis = [x for x in cpg.ast_subtree(target) if x.label == "FIELD_IDENTIFIER"]
            mrefs = [x for x in cpg.ast_subtree(source) if x.label == "METHOD_REF"]
            for fi in fis:
                for mref in mrefs:
                    m = referenced_method(mref)
                    if m is not None:
                        update(m, mref, encl.full_name, fi.canonical_name)


# ---------------------------------------------------------------------------
# JavaScriptImportResolverPass (JavaScriptImportResolverPass.scala)
# ---------------------------------------------------------------------------

def resolve_imports_js(cpg: Cpg) -> dict[int, list]:
    """Resolve IMPORT nodes to EvaluatedImport records.  External imports
    (no local file match) become UnknownMethod+UnknownTypeDecl; local
    module imports resolve against the target module's exports.  For a
    single-document CPG, file lookup is over the files lowered into this
    graph (multi-script pages / test fixtures)."""
    evaluated: dict[int, list] = {}
    program_methods = {m.filename or cpg.filename: m for m in cpg.methods()
                       if m.name == PROGRAM}
    # fall back to full_name prefix for file identity
    programs = {m.full_name: m for m in cpg.methods() if m.name == PROGRAM}

    for imp in cpg.nodes_by_label("IMPORT"):
        entity, alias = imp.imported_entity, imp.imported_as
        if not entity or not alias:
            continue
        call = next((e.src for e in cpg.inn(imp, "IS_CALL_FOR_IMPORT")), None)
        key = (call.id if call is not None else imp.id)
        is_local = bool(re.match(r"^[.]+/?.*", entity))
        m = re.search(r"[\"']([\w/.]+)[\"']", entity.lstrip("./"))
        entity_path = m.group(1) if m else entity.lstrip("./") if is_local else entity

        results: list = []
        target = None
        if is_local:
            base = entity_path.split(PATH_SEP)[0]
            for full, prog in programs.items():
                fname = full.split("::")[0]
                stem = fname.rsplit(".", 1)[0]
                if stem == base or fname == base or stem.endswith("/" + base):
                    target = prog
                    break
        if target is not None:
            results.extend(_resolve_local_module_exports(cpg, target, alias))
        if not results:
            results = [UnknownMethod(entity_path, alias, "this"),
                       UnknownTypeDecl(entity_path)]
        evaluated.setdefault(key, []).extend(results)
    cpg.evaluated_imports = evaluated
    return evaluated


def _resolve_local_module_exports(cpg: Cpg, target_program: Node, alias: str) -> list:
    """The matchingExports logic of JavaScriptImportResolverPass.scala:68-126."""
    results: list = []
    module_methods = [n for n in cpg.ast_subtree(target_program) if n.label == "METHOD"]
    # assignments contained in the target program
    assigns = [n for n in cpg.ast_subtree(target_program)
               if n.label == "CALL" and n.name == ASSIGNMENT]
    export_re = re.compile(r"^(module\.)?exports.*")
    tmp_re = re.compile(r"^_tmp_\d+\.\w+ =.*")

    matching = [a for a in assigns
                if export_re.match(a.code) or tmp_re.match(a.code)]
    # whole-module import: all exports; named: filter by alias
    named = [a for a in matching
             if any(x.code == alias for x in cpg.arguments(a))]
    candidates = named if named else matching

    for exp in candidates:
        args = cpg.arguments(exp)
        if len(args) != 2:
            continue
        lhs, rhs = args
        if (lhs.label == "CALL" and export_re.match(lhs.code)
                and rhs.label == "IDENTIFIER"):
            name = rhs.name
            method_matches = [m for m in module_methods if m.name == name]
            ctor_matches = [m for m in module_methods
                            if m.full_name.endswith(f"{name}{PATH_SEP}{CONSTRUCTOR}")]
            paths = [m.full_name for m in (method_matches or ctor_matches)]
            if paths:
                for p in paths:
                    results.append(ResolvedMethod(p, alias, "this"))
                    results.append(ResolvedTypeDecl(p))
            else:
                # module exports a variable by this name
                locals_ = [n for n in cpg.ast_subtree(target_program)
                           if n.label == "LOCAL" and n.name == name]
                if locals_:
                    results.append(ResolvedMember(target_program.full_name, name))
        elif lhs.label == "CALL" and rhs.label == "METHOD_REF":
            fi = _field_identifier(cpg, lhs)
            method_name = fi.canonical_name if fi is not None else ""
            if method_name == "exports" or not method_name:
                call_name, receiver = alias, "this"
            else:
                call_name, receiver = method_name, alias
            results.append(ResolvedMethod(rhs.method_full_name, call_name, receiver))
            parent = cpg.ast_parent(rhs)
            pm = _method_of(cpg, rhs)
            if pm is not None:
                results.append(ResolvedTypeDecl(pm.full_name))
        elif lhs.label == "CALL":
            # exported closure: method ref anywhere within the RHS AST
            for mref in [x for x in cpg.ast_subtree(rhs) if x.label == "METHOD_REF"]:
                results.append(ResolvedMethod(mref.method_full_name, alias, "this"))
    return results


# ---------------------------------------------------------------------------
# The recovery task (RecoverForXCompilationUnit + JS overrides)
# ---------------------------------------------------------------------------

class JsTypeRecovery:
    """One iteration of RecoverForJavaScriptFile over a whole document."""

    def __init__(self, cpg: Cpg, iteration: int, iterations: int = 2,
                 dummy_types: bool = True, shared: dict | None = None):
        self.cpg = cpg
        self.iteration = iteration
        self.is_first = iteration == 0
        self.is_final = iteration == iterations - 1
        self.enable_dummy = self.is_final and dummy_types
        self.st = SymbolTable(cpg)
        self.new_member_types: dict[int, dict[str, None]] = {}
        self._is_field_cache: dict[int, bool] = {}
        if shared is None:
            shared = self.build_shared_indexes(cpg)
        self._methods_by_full = shared["methods_by_full"]
        self._typedecls_by_full = shared["typedecls_by_full"]
        self._typedecls_by_name = shared["typedecls_by_name"]
        self._members_by_name = shared["members_by_name"]

    @staticmethod
    def build_shared_indexes(cpg: Cpg) -> dict:
        """Node-index tables that are identical across fixpoint iterations
        (the iteration passes write type FIELDS, never add/move the METHOD/
        TYPE_DECL/MEMBER nodes these tables index) — built once per document
        and shared by both JsTypeRecovery runs."""
        typedecls_by_name: dict[str, list[Node]] = {}
        members_by_name: dict[str, list[Node]] = {}
        for t in cpg.nodes_by_label("TYPE_DECL"):
            typedecls_by_name.setdefault(t.name, []).append(t)
            for mem in _members_of(cpg, t):
                members_by_name.setdefault(mem.name, []).append(mem)
        return {
            "methods_by_full": _methods_by_full_name(cpg),
            "typedecls_by_full": _typedecls_by_full_name(cpg),
            "typedecls_by_name": typedecls_by_name,
            "members_by_name": members_by_name,
        }

    # -- entry ---------------------------------------------------------------
    def run(self):
        cpg = self.cpg
        for imp_key, records in getattr(cpg, "evaluated_imports", {}).items():
            self.visit_import(records)
        self.prepopulate_symbol_table()
        for a in _assignments(cpg):
            self.visit_assignments(a)
        for r in cpg.nodes_by_label("RETURN"):
            self.visit_return(r)
        self.set_type_information()
        self.post_set_type_information()

    # -- imports (XTypeRecovery.scala:410-434) --------------------------------
    def visit_import(self, records):
        for rec in records:
            if isinstance(rec, ResolvedMethod):
                self.st.append(CallAlias(rec.alias, rec.receiver), rec.full_name)
            elif isinstance(rec, ResolvedTypeDecl):
                # alias — ResolvedTypeDecl has no alias field in the tag;
                # reference uses i.importedAs for LocalVar.  We keep the
                # record order (method then typedecl with same alias) and
                # recover the alias from the paired ResolvedMethod.
                pass
            elif isinstance(rec, ResolvedMember):
                pass  # alias-paired below
            elif isinstance(rec, UnknownMethod):
                self.st.append(CallAlias(rec.alias, rec.receiver), rec.full_name)
            elif isinstance(rec, UnknownTypeDecl):
                pass  # handled below with alias
            elif isinstance(rec, UnknownImport):
                self.st.append(CallAlias(rec.path), rec.path)
                self.st.append(LocalVar(rec.path), rec.path)
        # LocalVar(alias) ← typedecl full names: the reference pairs each
        # tag with i.importedAs; replicate by using the alias captured on
        # the sibling method records (same import).
        alias = next((r.alias for r in records if hasattr(r, "alias")), None)
        if alias:
            for rec in records:
                if isinstance(rec, (ResolvedTypeDecl, UnknownTypeDecl)):
                    self.st.append(LocalVar(alias), rec.full_name)
                elif isinstance(rec, ResolvedMember):
                    prog = self._methods_by_full.get(rec.base_path)
                    member_types: dict[str, None] = {}
                    if prog is not None:
                        for n in self.cpg.ast_subtree(prog):
                            if n.label == "LOCAL" and n.name == rec.member_name:
                                member_types.update(known_types_of(n))
                    for t in self._typedecls_by_name.values():
                        for td in t:
                            if td.full_name == rec.base_path:
                                for mem in _members_of(self.cpg, td):
                                    if mem.name == rec.member_name:
                                        member_types.update(known_types_of(mem))
                    self.st.append(LocalVar(alias), member_types)

    # -- prepopulation (JavaScriptTypeRecovery.scala:50-108) ------------------
    def prepopulate_symbol_table(self):
        cpg = self.cpg
        for x in cpg.nodes:
            if x.label in ("IDENTIFIER", "LOCAL", "METHOD_PARAMETER_IN", "CALL") \
                    and self._has_types(x):
                self._prepopulate_entry(x)
        # methods as this-call aliases
        for f in cpg.methods():
            self.st.put(CallAlias(f.name, "this"), f.full_name)
        # typed parameters and method returns: resolve annotation text
        # against import symbols (JavaScriptTypeRecovery.scala:87-108)
        for m in cpg.methods():
            nodes = [p for p in cpg.parameters(m) if p.name != "this"]
            try:
                nodes.append(cpg.method_return(m))
            except KeyError:
                pass
            for p in nodes:
                if not known_types_of(p):
                    continue
                resolved: dict[str, None] = {}
                for t in known_types_of(p):
                    base = t.split(".")[0]
                    if self.st.contains(LocalVar(base)):
                        hits = {f"{x}{t[len(base):]}": None
                                for x in self.st.get(LocalVar(base))}
                        if set(hits) == {t}:
                            resolved[t] = None
                        else:
                            for h in hits:
                                resolved[re.sub(r"\.(?!js:" + PROGRAM + ")",
                                                PATH_SEP, h)] = None
                    else:
                        resolved[t] = None
                if p.label == "METHOD_PARAMETER_IN":
                    self.st.put(p, resolved)
                elif p.label == "METHOD_RETURN":
                    if len(resolved) == 1:
                        p.type_full_name = next(iter(resolved))
                    elif resolved:
                        p.type_full_name = "ANY"
                        p.dynamic_type_hint_full_name = tuple(resolved)
        # Local-class constructor aliases → LocalVar(name) so alloc sites
        # resolve internal classes (mirrors the cpgTypeFullName fallback of
        # prepopulateSymbolTableEntry, JavaScriptTypeRecovery.scala:52-60).
        for name, tds in self._typedecls_by_name.items():
            if name in (PROGRAM,) or not name or name[0] == "<":
                continue
            internal = [t for t in tds
                        if not t.is_external and t.full_name and "::" in t.full_name
                        and not t.full_name.endswith(f"{PATH_SEP}{name}{PATH_SEP}{CONSTRUCTOR}")]
            cls = [t for t in internal if t.name == name and t.name[0:1].isupper()]
            if cls and not self.st.contains(LocalVar(name)):
                self.st.put(LocalVar(name), {t.full_name: None for t in cls})

    def _has_types(self, x: Node) -> bool:
        if x.label == "CALL":
            if x.method_full_name.startswith("<operator>"):
                return False
            return x.method_full_name.lower() not in ("<unknownfullname>", "any", "")
        return bool(known_types_of(x))

    def _prepopulate_entry(self, x: Node):
        # JavaScriptTypeRecovery.prepopulateSymbolTableEntry
        if x.label in ("IDENTIFIER", "LOCAL", "METHOD_PARAMETER_IN"):
            tfn = x.type_full_name or "ANY"
            if tfn != "ANY":
                hints = {t: None for t in self.st.get(LocalVar(tfn)) if t != tfn}
                cpg_fulls = {t.full_name: None
                             for t in self._typedecls_by_name.get(tfn, [])}
                if hints:
                    resolved = self.st.put(x, hints)
                elif cpg_fulls:
                    resolved = self.st.put(x, cpg_fulls)
                else:
                    resolved = self.st.put(x, known_types_of(x))
                if resolved and tfn not in resolved and len(resolved) == 1:
                    x.type_full_name = next(iter(resolved))
                return
            possible = [t for t in x.possible_types if t]
            if possible:
                if len(possible) == 1 and possible[0] != "ANY":
                    t0 = possible[0]
                    hints = {t: None for t in self.st.get(LocalVar(t0)) if t != t0}
                    cpg_fulls = {t.full_name: None
                                 for t in self._typedecls_by_name.get(t0, [])}
                    if hints:
                        resolved = self.st.put(x, hints)
                    elif cpg_fulls:
                        resolved = self.st.put(x, cpg_fulls)
                    else:
                        resolved = self.st.put(x, known_types_of(x))
                    if resolved and t0 not in resolved and len(resolved) == 1:
                        x.type_full_name = next(iter(resolved))
                return
            self.st.put(x, known_types_of(x))
        elif x.label == "CALL":
            self.st.put(x, {x.method_full_name: None,
                            **{t: None for t in x.dynamic_type_hint_full_name},
                            **{t: None for t in x.possible_types}})

    # -- constructor heuristics (JavaScriptTypeRecovery.scala:42-48) ----------
    def is_constructor_call(self, c: Node) -> bool:
        if not c.name.endswith("factory"):
            return False
        in_call = _in_assignment(self.cpg, c) or self.cpg.in_call(c)
        if in_call is None:
            return False
        p = self.cpg.ast_parent(in_call)
        return p is not None and p.label == "BLOCK"

    @staticmethod
    def is_constructor_name(name: str) -> bool:
        return bool(name) and (name[0].isupper() or name.endswith("factory"))

    # -- assignments (XTypeRecovery.scala:445-466) ----------------------------
    def visit_assignments(self, a: Node):
        args = _assignment_args(self.cpg, a)
        return self.visit_assignment_arguments(args)

    def visit_assignment_arguments(self, args: list[Node]):
        if len(args) != 2:
            return {}
        x, y = args
        lx, ly = x.label, y.label
        if lx == "IDENTIFIER" and ly == "BLOCK":
            return self.visit_identifier_assigned_to_block(x, y)
        if lx == "IDENTIFIER" and ly == "CALL":
            return self.visit_identifier_assigned_to_call(x, y)
        if lx == "IDENTIFIER" and ly == "IDENTIFIER":
            return self.visit_identifier_assigned_to_identifier(x, y)
        if lx == "IDENTIFIER" and ly == "LITERAL":
            if self.is_first:
                return self.visit_identifier_assigned_to_literal(x, y)
            return {}
        if lx == "IDENTIFIER" and ly == "METHOD_REF":
            return self.visit_identifier_assigned_to_method_ref(x, y, "this")
        if lx == "IDENTIFIER" and ly == "TYPE_REF":
            return self.visit_identifier_assigned_to_type_ref(x, y, "this")
        if lx == "CALL" and ly == "IDENTIFIER":
            return self.assign_types_to_call(x, self.st.get(y))
        if lx == "CALL" and ly == "CALL":
            return self.assign_types_to_call(x, self.get_types_from_call(y))
        if lx == "CALL" and ly == "LITERAL":
            if self.is_first:
                return self.visit_call_assigned_to_literal(x, y)
            return {}
        if lx == "CALL" and ly == "METHOD_REF":
            return self.assign_types_to_call(x, {y.method_full_name: None})
        if lx == "CALL" and ly == "BLOCK":
            return self.assign_types_to_call(x, self.visit_statements_in_block(y))
        return {}

    # XTypeRecovery.scala:468-504
    def visit_identifier_assigned_to_block(self, i: Node, b: Node):
        block_types = self.visit_statements_in_block(b, assignment_target=i)
        if block_types:
            return self.associate_types(i, block_types)
        return {}

    def visit_statements_in_block(self, b: Node, assignment_target: Optional[Node] = None):
        result: dict[str, None] = {}
        for x in self.cpg.ast_children(b):
            if x.label == "CALL" and x.name.startswith(ASSIGNMENT):
                result = self.visit_assignments(x) or {}
            elif x.label == "CALL" and x.name.startswith("<operator>") \
                    and assignment_target is not None:
                result = self.visit_identifier_assigned_to_operator(
                    assignment_target, x, x.name) or {}
            elif x.label == "IDENTIFIER" and self.st.contains(x):
                result = self.st.get(x)
            elif x.label == "CALL" and self.st.contains(x):
                result = self.st.get(x)
            elif x.label == "CALL" and self._first_argument_in_table(x):
                result = self.set_call_method_full_name_from_base(x)
            elif x.label == "BLOCK":
                result = self.visit_statements_in_block(x)
            elif x.label == "LOCAL":
                result = self.st.get(x)
            else:
                result = {}
        return result

    def _first_argument_in_table(self, c: Node) -> bool:
        args = self.cpg.arguments(c)
        return bool(args) and self.st.contains(args[0])

    # XTypeRecovery.scala:506-526
    def visit_identifier_assigned_to_call(self, i: Node, c: Node):
        if c.name == "require":  # JavaScriptTypeRecovery.scala:199-201
            return {}
        return self._visit_identifier_assigned_to_call_core(i, c)

    def _visit_identifier_assigned_to_call_core(self, i: Node, c: Node, depth=0):
        if c.name.startswith("<operator>"):
            return self.visit_identifier_assigned_to_operator(i, c, c.name)
        if self.st.contains(c) and self.is_constructor_call(c):
            return self.visit_identifier_assigned_to_constructor(i, c)
        if self.st.contains(c):
            return self.visit_identifier_assigned_to_call_ret_val(i, c)
        arg0 = self.cpg.argument(c, 0)
        if arg0 is not None and self.st.contains(arg0) and depth < 2:
            self.set_call_method_full_name_from_base(c)
            return self._visit_identifier_assigned_to_call_core(i, c, depth + 1)
        return self.visit_identifier_assigned_to_call_ret_val(i, c)

    def visit_identifier_assigned_to_identifier(self, x: Node, y: Node):
        if self.st.contains(y):
            return self.associate_types(x, self.st.get(y))
        return {}

    # XTypeRecovery.scala:531-549
    def set_call_method_full_name_from_base(self, c: Node):
        args = self.cpg.arguments(c)
        rec_types: dict[str, None] = {}
        if args:
            h = args[0]
            if h.label == "CALL" and (h.type_full_name or "ANY") != "ANY":
                rec_types = {h.type_full_name: None}
            elif h.label == "CALL":
                m = self._methods_by_full.get(c.method_full_name)
                fulls: dict[str, None] = {}
                if m is not None:
                    try:
                        mr = self.cpg.method_return(m)
                        if (mr.type_full_name or "ANY") != "ANY":
                            fulls[mr.type_full_name] = None
                        for t in mr.possible_types:
                            fulls[t] = None
                    except KeyError:
                        pass
                if fulls:
                    rec_types = fulls
                else:
                    rec_types = {f"{t}{PATH_SEP}{DUMMY_RETURN_TYPE}": None
                                 for t in self.st.get(h)}
            else:
                rec_types = self.st.get(h)
        call_types = {f"{t}{PATH_SEP}{c.name}": None for t in rec_types}
        return self.st.append(c, call_types)

    # JS override (JavaScriptTypeRecovery.scala:123-152)
    def visit_identifier_assigned_to_constructor(self, i: Node, c: Node):
        if c.method_full_name.endswith(".alloc"):
            in_assign = _in_assignment(self.cpg, c)
            new_op = None
            if in_assign is not None:
                for sib in _ast_siblings(self.cpg, in_assign):
                    if sib.label == "CALL" and sib.name == OPERATORS_NEW:
                        new_op = sib
                        break
            new_children = self.cpg.ast_children(new_op) if new_op is not None else []
            id_child = next((n for n in new_children if n.label == "IDENTIFIER"
                             and n.argument_index != 0), None)
            if id_child is None:
                id_child = next((n for n in new_children if n.label == "IDENTIFIER"), None)
            possible_import: dict[str, None] = {}
            if id_child is not None:
                if id_child.name in GLOBAL_BUILTINS:
                    possible_import = {f"__ecma.{id_child.name}": None}
                else:
                    typs = self.st.get(CallAlias(id_child.name, "this"))
                    if typs and new_op is not None:
                        self.st.put(new_op, typs)
                    possible_import = self.st.get(id_child)
            possible_ctor_pointer: dict[str, None] = {}
            for n in new_children:
                for fi in self.cpg.ast_children(n):
                    if fi.label == "FIELD_IDENTIFIER":
                        possible_ctor_pointer = self.st.get(
                            CallAlias(fi.canonical_name, "this"))
                        break
                if possible_ctor_pointer:
                    break
            paths = possible_import or possible_ctor_pointer or {}
            # internal class types also flow to the <operator>.new call so
            # the hint linker can set its methodFullName
            if paths and new_op is not None and not self.st.contains(new_op):
                self.st.put(new_op, {(p if p.endswith(CONSTRUCTOR)
                                      else f"{p}{PATH_SEP}{CONSTRUCTOR}"): None
                                     for p in paths})
        else:
            got = self.st.get(c)
            got[c.method_full_name] = None
            paths = {t.removesuffix(".factory"): None for t in got}
        return self.associate_types(i, paths)

    # XTypeRecovery.scala:653-668 + JS override (:154-170)
    def visit_identifier_assigned_to_operator(self, i: Node, c: Node, operation: str):
        if operation == "<operator>.alloc":
            return self.visit_identifier_assigned_to_constructor(i, c)
        if operation == FIELD_ACCESS:
            return self.visit_identifier_assigned_to_field_load(i, c)
        if operation == INDEX_ACCESS:
            return self.associate_types(i, self.get_types_from_call(c))
        if operation == "<operator>.cast":
            types = _known([c.type_full_name]
                           + list(c.dynamic_type_hint_full_name)
                           + list(c.possible_types))
            return self.associate_types(i, types)
        if operation == OPERATORS_NEW:
            kids = self.cpg.ast_children(c)
            fa = next((k for k in kids if k.label == "CALL" and k.name == FIELD_ACCESS), None)
            ident = next((k for k in kids if k.label == "IDENTIFIER"), None)
            if fa is not None and ident is not None:
                base_types = self.visit_identifier_assigned_to_field_load(ident, fa)
                return self.st.append(c, {f"{t}{PATH_SEP}{CONSTRUCTOR}": None
                                          for t in base_types})
            return {}
        return {}

    # XTypeRecovery.scala:670-699
    def visit_identifier_assigned_to_call_ret_val(self, i: Node, c: Node):
        if self.st.contains(c):
            return self.associate_types(i, self.method_return_values(list(self.st.get(c))))
        arg0 = self.cpg.argument(c, 0)
        if arg0 is not None:
            fulls: dict[str, None] = {}
            if arg0.label == "IDENTIFIER":
                if self.st.contains(LocalVar(arg0.name)):
                    fulls = self.st.get(LocalVar(arg0.name))
                elif self.st.contains(CallAlias(arg0.name)):
                    fulls = self.st.get(CallAlias(arg0.name))
            names = [f"{t}{PATH_SEP}{c.name}" for t in fulls]
            return self.associate_types(i, self.method_return_values(names))
        return self.associate_types(
            i, {f"{c.name}{PATH_SEP}{DUMMY_RETURN_TYPE}": None})

    def method_return_values(self, method_full_names: list[str]):
        rs: dict[str, None] = {}
        for fn in method_full_names:
            m = self._methods_by_full.get(fn)
            if m is None:
                continue
            try:
                mr = self.cpg.method_return(m)
            except KeyError:
                continue
            for t in [mr.type_full_name] + list(mr.dynamic_type_hint_full_name) \
                    + list(mr.possible_types):
                if t and t != "ANY":
                    rs[t] = None
        if not rs:
            return {f"{fn}{PATH_SEP}{DUMMY_RETURN_TYPE}": None
                    for fn in method_full_names}
        return rs

    def visit_identifier_assigned_to_literal(self, i: Node, l: Node):
        return self.associate_types(i, self.get_literal_type(l))

    @staticmethod
    def get_literal_type(l: Node):
        out = {}
        if l.type_full_name:
            out[l.type_full_name] = None
        for t in l.possible_types:
            out[t] = None
        return out

    # JS overrides route methodRef/typeRef aliases through receiver "this"
    def visit_identifier_assigned_to_method_ref(self, i: Node, m: Node, rec="this"):
        return self.st.append(CallAlias(i.name, rec), {m.method_full_name: None})

    def visit_identifier_assigned_to_type_ref(self, i: Node, t: Node, rec="this"):
        return self.st.append(CallAlias(i.name, rec), {t.type_full_name: None})

    # XTypeRecovery.scala:736-765
    def get_types_from_call(self, c: Node):
        if c.name == FIELD_ACCESS:
            return self.st.get(LocalVar(self.get_field_name(c)))
        if self.st.contains(c):
            return self.method_return_values(list(self.st.get(c)))
        if c.name == INDEX_ACCESS:
            return self.get_index_access_types(c)
        return {}

    def assign_types_to_call(self, x: Node, types):
        if not types:
            return {}
        lhs_key, global_keys = self.get_symbol_from_call(x)
        for (comp_unit_full, member_name) in global_keys:
            self.persist_member_with_typedecl(comp_unit_full, member_name, types)
        return self.st.append(lhs_key, types)

    def get_index_access_types(self, ia: Node):
        cvar = self.index_access_to_collection_var(ia)
        if cvar is None:
            return {}
        if self.st.contains(cvar):
            return self.st.get(cvar)
        name = cvar[1]
        arg1 = self.cpg.argument(ia, 1)
        if arg1 is not None and arg1.label == "CALL" and self.st.contains(CallAlias(name)):
            return {f"{t}{PATH_SEP}{DUMMY_RETURN_TYPE}{PATH_SEP}{DUMMY_INDEX_ACCESS}": None
                    for t in self.st.get(CallAlias(name))}
        if self.st.contains(LocalVar(name)):
            return {f"{t}{PATH_SEP}{DUMMY_INDEX_ACCESS}": None
                    for t in self.st.get(LocalVar(name))}
        return {}

    # XTypeRecovery.scala:789-800
    def get_symbol_from_call(self, c: Node):
        if c.name == FIELD_ACCESS:
            field_name = self.get_field_name(c)
            parents = self.get_field_parents(c)
            return LocalVar(field_name), {(p, field_name) for p in parents}
        if c.name == INDEX_ACCESS:
            cv = self.index_access_to_collection_var(c)
            return (cv if cv is not None else LocalVar(c.name)), set()
        return LocalVar(c.name), set()

    # XTypeRecovery.scala:802-840
    def get_field_name(self, fa: Node, prefix: str = "", suffix: str = "") -> str:
        def wrap(n: str) -> str:
            parts = []
            if prefix:
                parts.append(prefix)
            parts.append(n)
            out = PATH_SEP.join(parts)
            if suffix:
                out = f"{out}{PATH_SEP}{suffix}"
            return out

        args = self.cpg.arguments(fa)
        if len(args) != 2:
            return wrap("<unknown>")
        a, b = args
        if a.label == "IDENTIFIER" and b.label == "FIELD_IDENTIFIER":
            if a.name in ("self", "this"):
                return wrap(b.canonical_name)
            return wrap(f"{a.name}{PATH_SEP}{b.canonical_name}")
        if a.label == "CALL" and b.label == "FIELD_IDENTIFIER":
            if a.name == FIELD_ACCESS:
                return wrap(self.get_field_name(a, suffix=b.canonical_name))
            types_from_base = self.get_types_from_call(a)
            if types_from_base:
                t0 = next(iter(types_from_base))
                return wrap(f"{t0}{PATH_SEP}{b.canonical_name}")
            call_code = a.code[a.code.index("(") :] if "(" in a.code else a.code
            return f"{call_code}{PATH_SEP}{DUMMY_MEMBER_LOAD}({b.canonical_name})"
        if a.label == "FIELD_IDENTIFIER" and b.label == "CALL" and b.name == FIELD_ACCESS:
            return wrap(self.get_field_name(b, prefix=a.canonical_name))
        if a.label == "TYPE_REF" and b.label == "FIELD_IDENTIFIER":
            return b.canonical_name
        return wrap("<unknown>")

    def get_field_parents(self, fa: Node) -> set:
        field_name = self.get_field_name(fa).split(PATH_SEP)[-1]
        out = set()
        for mem in self._members_by_name.get(field_name, []):
            td = self.cpg.ast_parent(mem)
            if td is not None and td.label == "TYPE_DECL" and "ANY" not in td.full_name:
                out.add(td.full_name)
        return out

    def visit_call_assigned_to_literal(self, c: Node, l: Node):
        if c.name == INDEX_ACCESS:
            args = self.cpg.arguments(c)
            if len(args) == 2:
                a, idx = args
                if a.label == "IDENTIFIER" and idx.label == "LITERAL":
                    cv = self.index_access_to_collection_var(c)
                    return self.st.append(cv, self.get_literal_type(l)) if cv else {}
                if a.label == "IDENTIFIER" and idx.label == "IDENTIFIER" and self.st.contains(idx):
                    cv = self.index_access_to_collection_var(c)
                    return self.st.append(cv, self.st.get(idx)) if cv else {}
                if a.label == "IDENTIFIER" and idx.label == "CALL":
                    return self.st.append(CollectionVar(a.name, "*"),
                                          self.get_types_from_call(idx))
                if a.label == "CALL" and idx.label == "LITERAL":
                    return self.assign_types_to_call(a, self.get_literal_type(l))
            return {}
        if c.name == FIELD_ACCESS:
            field_name = self.get_field_name(c)
            return self.associate_types_fa(LocalVar(field_name), c,
                                           self.get_literal_type(l))
        return {}

    # XTypeRecovery.scala:608-620 (associateTypes with member persist)
    def associate_types_fa(self, symbol, fa: Node, types):
        args = self.cpg.arguments(fa)
        head = next((x for x in args if not re.fullmatch(r"(this|self)", x.code)), None)
        if head is not None:
            if head.label == "FIELD_IDENTIFIER":
                for t in self.get_field_parents(fa):
                    self.persist_member_with_typedecl(t, head.canonical_name, types)
            elif head.label == "IDENTIFIER" and self.is_field(head):
                for t in self.get_field_parents(fa):
                    self.persist_member_with_typedecl(t, head.name, types)
        return self.st.append(symbol, types)

    def index_access_to_collection_var(self, c: Node):
        def call_name(x: Node) -> str:
            if x.name == FIELD_ACCESS:
                return self.get_field_name(x)
            if x.name == INDEX_ACCESS:
                cv = self.index_access_to_collection_var(x)
                return f"{cv[1]}[{cv[2]}]" if cv else DUMMY_INDEX_ACCESS
            return x.name

        args = self.cpg.arguments(c)
        if len(args) != 2:
            return None
        a, idx = args
        if a.label == "IDENTIFIER" and idx.label in ("LITERAL", "IDENTIFIER"):
            return CollectionVar(a.name, idx.code)
        if a.label == "CALL" and idx.label == "CALL":
            return CollectionVar(call_name(a), call_name(idx))
        if a.label == "CALL" and idx.label in ("LITERAL", "IDENTIFIER"):
            return CollectionVar(call_name(a), idx.code)
        return None

    # XTypeRecovery.scala:902-946 (field loads)
    def visit_identifier_assigned_to_field_load(self, i: Node, fa: Node):
        field_name = self.get_field_name(fa)
        args = self.cpg.arguments(fa)
        if len(args) != 2:
            return {}
        base, fi = args
        if base.label == "IDENTIFIER" and fi.label == "FIELD_IDENTIFIER":
            if self.st.contains(LocalVar(base.name)):
                local_types = self.st.get(LocalVar(base.name))
                return self.associate_interprocedural_types(i, base, fi, field_name, local_types)
            if self.st.contains(LocalVar(field_name)):
                local_types = self.st.get(LocalVar(field_name))
                return self.associate_interprocedural_types(i, base, fi, field_name, local_types)
            dummy = {f"{field_name}{PATH_SEP}{DUMMY_RETURN_TYPE}": None}
            return self.associate_interprocedural_types(i, base, fi, field_name, dummy)
        if base.label == "CALL" and fi.label == "FIELD_IDENTIFIER" and base.name == FIELD_ACCESS:
            base_name = self.get_field_name(base)
            buf: list[str] = []
            for segment in base_name.split(PATH_SEP) + [fi.canonical_name]:
                if not buf:
                    types = list(self.st.get(LocalVar(segment)))
                else:
                    types = []
                    for t in buf:
                        types.extend(self.st.get(LocalVar(f"{t}{PATH_SEP}{segment}")))
                if types:
                    buf = list(dict.fromkeys(types))
                else:
                    prev = list(buf)
                    buf = []
                    for t in prev:
                        if self.is_constructor_name(segment):
                            buf.append(f"{t}{PATH_SEP}{segment}")
                        else:
                            buf.append(f"{t}{PATH_SEP}{DUMMY_MEMBER_LOAD}({segment})")
            return self.associate_types(i, dict.fromkeys(buf))
        if base.label == "CALL" and fi.label == "FIELD_IDENTIFIER":
            stripped = field_name.removesuffix(
                f"{DUMMY_MEMBER_LOAD}{PATH_SEP}{fi.canonical_name}")
            return self.assign_types_to_call(base, {stripped: None})
        return {}

    # JS override (JavaScriptTypeRecovery.scala:172-195)
    def associate_interprocedural_types(self, i: Node, base: Node, fi: Node,
                                        field_full_name: str, base_types):
        field_name = fi.canonical_name
        if self.st.contains(LocalVar(field_name)):
            return self.st.append(i, self.st.get(LocalVar(field_name)))
        if self.st.contains(CallAlias(field_name, "this")):
            return self.st.get(CallAlias(field_name, "this"))
        global_types = self.get_field_base_type(base.name, field_name)
        return self._associate_interprocedural_core(
            i, field_full_name, field_name, global_types, base_types)

    def _associate_interprocedural_core(self, i: Node, field_full_name: str,
                                        field_name: str, global_types, base_types):
        if global_types:
            return self.associate_types(i, global_types)
        if base_types:
            if set(base_types) == set(self.st.get(LocalVar(field_full_name))):
                return self.associate_types(i, base_types)
            existing = [m for t in base_types
                        for td in ([self._typedecls_by_full[t]]
                                   if t in self._typedecls_by_full else [])
                        for m in _members_of(self.cpg, td) if m.name == field_name]
            if not existing:
                return self.associate_types(
                    i, {f"{t}{PATH_SEP}{DUMMY_MEMBER_LOAD}({field_name})": None
                        for t in base_types})
            return {}
        prefix = field_full_name.removesuffix(f"{PATH_SEP}{field_name}")
        return self.associate_types(
            i, {f"{prefix}{PATH_SEP}{DUMMY_MEMBER_LOAD}({field_name})": None})

    def get_field_base_type(self, base_name: str, field_name: str):
        out: dict[str, None] = {}
        for t in self.st.get(LocalVar(base_name)):
            td = self._typedecls_by_full.get(t)
            if td is None:
                continue
            for mem in _members_of(self.cpg, td):
                if mem.name == field_name:
                    for ty in all_types_of(mem):
                        if ty and ty != "ANY":
                            out[ty] = None
        return out

    # isField (XTypeRecovery.scala:582-587 + JS exportedIdentifiers quirk)
    def is_field(self, i: Node) -> bool:
        cached = self._is_field_cache.get(i.id)
        if cached is not None:
            return cached
        res = self._is_field_uncached(i)
        self._is_field_cache[i.id] = res
        return res

    def _is_field_uncached(self, i: Node) -> bool:
        m = _method_of(self.cpg, i)
        if m is None:
            return False
        td = self.cpg.ast_parent(m)
        while td is not None and td.label != "TYPE_DECL":
            td = self.cpg.ast_parent(td)
        if td is None:
            return False
        return any(mem.name == i.name for mem in _members_of(self.cpg, td))

    def associate_types(self, i: Node, types):
        return self.st.append(i, types)

    # -- returns (XTypeRecovery.scala:964-1007) -------------------------------
    def visit_return(self, ret: Node):
        m = _method_of(self.cpg, ret)
        if m is None:
            return
        try:
            mr = self.cpg.method_return(m)
        except KeyError:
            return
        existing = {t: None for t in all_types_of(mr) if t and t != "ANY"}

        def extract(xs: list[Node]) -> dict:
            if len(xs) == 1:
                head = xs[0]
                if head.label == "LITERAL":
                    return self.get_literal_type(head)
                if head.label == "CALL" and head.name == FIELD_ACCESS:
                    sym, ts = self.get_symbol_from_call(head)
                    cpg_types: dict[str, None] = {}
                    for (tfull, mname) in ts:
                        td = self._typedecls_by_full.get(tfull)
                        if td is None:
                            continue
                        for mem in _members_of(self.cpg, td):
                            if mem.name == sym[1]:
                                for ty in all_types_of(mem):
                                    if ty not in ("ANY", "this", ""):
                                        cpg_types[ty] = None
                    return cpg_types or self.st.get(sym)
                if head.label == "CALL" and self.st.contains(head):
                    call_paths = self.st.get(head)
                    rvs = self.method_return_values(list(call_paths))
                    return rvs or {f"{c}{PATH_SEP}{DUMMY_RETURN_TYPE}": None
                                   for c in call_paths}
                if head.label == "CALL":
                    args = self.cpg.arguments(head)
                    if args and self.st.contains(args[0]):
                        return {f"{t}{PATH_SEP}{head.name}{PATH_SEP}{DUMMY_RETURN_TYPE}": None
                                for t in self.st.get(args[0])}
                    return extract(args)
                if head.label == "IDENTIFIER" and self.st.contains(head):
                    return self.st.get(head)
            return {}

        ret_types = extract(self.cpg.ast_children(ret))
        existing.update(ret_types)
        mr.dynamic_type_hint_full_name = tuple(existing)

    # -- persistence (XTypeRecovery.scala:1011-1160) --------------------------
    def set_type_information(self):
        cpg = self.cpg
        for x in cpg.nodes:
            if x.label == "LOCAL" and self.st.contains(x):
                self.store_node_type_info(x, list(self.st.get(x)))
            elif x.label in ("METHOD_PARAMETER_IN", "METHOD_RETURN") and self.is_final:
                self.set_type_from_type_hints(x)
            elif x.label == "IDENTIFIER" and self.st.contains(x):
                in_call = cpg.in_call(x)
                self._set_type_for_rec_call(x, in_call)
            elif x.label == "CALL" and self.st.contains(x):
                typs = [t for t in self.st.get(x)
                        if self.enable_dummy or not is_dummy_type(t)]
                self.store_call_type_info(x, typs)
            elif (x.label == "CALL" and self.st.contains(CallAlias(x.name))
                  and not x.name.startswith("<operator>")):
                typs = []
                for t in self.st.get(CallAlias(x.name)):
                    if t.endswith(f"{PATH_SEP}{x.name}"):
                        typs.append(t)
                    else:
                        typs.append(f"{t}{PATH_SEP}{x.name}")
                self.store_call_type_info(
                    x, [t for t in typs if not is_dummy_type(t)])
            elif x.label == "IDENTIFIER" and self.st.contains(CallAlias(x.name)) \
                    and cpg.in_call(x) is not None:
                self._set_type_for_rec_call(x, cpg.in_call(x))
            elif x.label == "CALL":
                args = cpg.arguments(x)
                if args and self.st.contains(args[0]):
                    self._set_type_for_rec_call(x, x)
        for mem_id, ts in self.new_member_types.items():
            # node.id is its index in cpg.nodes (add_node invariant)
            mem = cpg.nodes[mem_id] if 0 <= mem_id < len(cpg.nodes) else None
            if mem is not None and mem.id == mem_id:
                self.store_default_type_info(mem, list(ts))

    def _set_type_for_rec_call(self, x: Node, call: Optional[Node]):
        cpg = self.cpg
        if call is not None:
            ms = cpg.arguments(call)
            if call.name == ASSIGNMENT and len(ms) >= 2 \
                    and ms[0].label == "IDENTIFIER" and ms[1].label == "CALL":
                self._set_type_identifier_assigned_to_call(call, ms[0], ms[1])
            elif call.name == ASSIGNMENT and ms and ms[0].label == "IDENTIFIER":
                id_hints = self.st.get(ms[0])
                self.persist_type(ms[0], id_hints)
                self.persist_type(call, id_hints)
            elif call.name != FIELD_ACCESS and ms and ms[0].label == "IDENTIFIER":
                i = ms[0]
                if i.argument_index in (0, 1):
                    self._set_type_for_dynamic_dispatch_call(call, i)
            elif call.name == FIELD_ACCESS and len(ms) >= 2 \
                    and ms[0].label == "IDENTIFIER" and ms[1].label == "FIELD_IDENTIFIER":
                self._set_type_for_field_access(call, ms[0], ms[1])
        if not (x.label == "CALL" and x.name.startswith("<operator")):
            self.persist_type(x, self.st.get(x))

    def _set_type_for_dynamic_dispatch_call(self, call: Node, i: Node):
        id_hints = self.st.get(i) if self.st.contains(i) else self.st.get(CallAlias(i.name))
        call_types = self.st.get(call)
        self.persist_type(i, id_hints)
        if not call_types and not call.name.startswith("<operator>"):
            self.persist_type(
                call, {f"{t}{PATH_SEP}{call.name}": None for t in id_hints})
        else:
            self.persist_type(call, call_types)

    def _set_type_identifier_assigned_to_call(self, call: Node, i: Node, c: Node):
        id_types = self.st.get(i) if self.st.contains(i) else self.st.get(CallAlias(i.name))
        call_types = self.st.get(c)
        self.persist_type(call, call_types)
        if id_types or call_types:
            if set(id_types) == set(call_types):
                self.persist_type(i, call_types)
            else:
                self.persist_type(i, id_types)

    def _set_type_for_field_access(self, fa: Node, i: Node, f: Node):
        id_hints = self.st.get(i) if self.st.contains(i) else self.st.get(CallAlias(i.name))
        call_types = self.st.get(fa)
        self.persist_type(i, id_hints)
        self.persist_type(fa, call_types)
        parent = self.cpg.ast_parent(fa)
        if parent is not None and parent.label == "CALL" and self.st.contains(parent):
            self.persist_type(parent, self.st.get(parent))

    def set_type_from_type_hints(self, n: Node):
        types = [t for t in known_types_of(n) if not is_dummy_type(t)]
        if types:
            self._set_types(n, types)

    def persist_type(self, x: Node, types):
        filtered = [t for t in types
                    if self.enable_dummy or not is_dummy_type(t)]
        if not filtered:
            return
        self.store_node_type_info(x, filtered)
        if x.label == "IDENTIFIER" and self.st.contains(x) and self.is_field(x):
            mem = self._get_local_member(x)
            if mem is not None:
                self.store_node_type_info(mem, filtered)

    def _get_local_member(self, i: Node) -> Optional[Node]:
        m = _method_of(self.cpg, i)
        if m is None:
            return None
        td = self.cpg.ast_parent(m)
        while td is not None and td.label != "TYPE_DECL":
            td = self.cpg.ast_parent(td)
        target_full = td.full_name if td is not None else m.full_name
        td2 = self._typedecls_by_full.get(target_full)
        if td2 is None:
            return None
        return next((mem for mem in _members_of(self.cpg, td2)
                     if mem.name == i.name), None)

    def persist_member_with_typedecl(self, type_full_name: str, member_name: str, types):
        td = self._typedecls_by_full.get(type_full_name)
        if td is None:
            return
        mem = next((m for m in _members_of(self.cpg, td) if m.name == member_name), None)
        if mem is not None:
            self.store_node_type_info(mem, list(types))

    def store_node_type_info(self, n: Node, types: list[str]):
        if not types:
            return
        existing = known_types_of(n)
        has_unknown = bool(_UNKNOWN_RE.match(n.type_full_name or "ANY"))
        if not (has_unknown or set(types) != set(existing)):
            return
        if n.label == "MEMBER":
            self.new_member_types.setdefault(n.id, {}).update(dict.fromkeys(types))
        elif n.label == "IDENTIFIER":
            # JS: constructor suffixes are stripped on identifiers/locals
            self.store_default_type_info(
                n, [t.removesuffix(f"{PATH_SEP}{CONSTRUCTOR}") for t in types])
        elif n.label == "LOCAL":
            kept = [t.removesuffix(f"{PATH_SEP}{CONSTRUCTOR}") for t in types
                    if self.enable_dummy or not is_dummy_type(t)]
            if kept:
                self.store_default_type_info(n, kept)
        elif n.label == "CALL" and not n.name.startswith("<operator>"):
            self.store_call_type_info(n, types)
        elif n.label == "CALL":
            pass
        else:
            self._set_types(n, types)

    def store_call_type_info(self, c: Node, types: list[str]):
        if types:
            merged = list(dict.fromkeys(list(c.dynamic_type_hint_full_name) + types))
            c.dynamic_type_hint_full_name = tuple(merged)

    def store_default_type_info(self, n: Node, types: list[str]):
        has_unknown = bool(_UNKNOWN_RE.match(n.type_full_name or "ANY"))
        if set(types) != set(known_types_of(n)) or (has_unknown and types):
            merged = list(dict.fromkeys(list(n.dynamic_type_hint_full_name) + types))
            self._set_types(n, merged)

    def _set_types(self, n: Node, types: list[str]):
        if len(types) == 1:
            n.type_full_name = types[0]
            n.dynamic_type_hint_full_name = ()
        else:
            n.dynamic_type_hint_full_name = tuple(types)

    # JS postSetTypeInformation: `this` identifiers pick up their hints
    def post_set_type_information(self):
        for n in self.cpg.nodes:
            if n.label == "IDENTIFIER" and n.name == "this" \
                    and (n.type_full_name or "ANY") == "ANY" \
                    and n.dynamic_type_hint_full_name:
                self.set_type_from_type_hints(n)


# ---------------------------------------------------------------------------
# JavaScriptTypeHintCallLinker (XTypeHintCallLinker.scala:21-110 + JS :9-16)
# ---------------------------------------------------------------------------

def type_hint_call_linker(cpg: Cpg):
    from joern_spark.cpg.passes import _make_stub

    methods_by_full = _methods_by_full_name(cpg)

    def callee_names(c: Node) -> list[str]:
        return list(dict.fromkeys(
            t for t in c.dynamic_type_hint_full_name if t != "ANY"))

    def has_callee(c: Node) -> bool:
        return bool(cpg.out(c, "CALL"))

    calls = [c for c in cpg.nodes if c.label == "CALL"
             and (not c.name.startswith("<operator>") or c.name == OPERATORS_NEW)
             and callee_names(c) and not has_callee(c)]

    typedecls_by_full = _typedecls_by_full_name(cpg)

    def cha_resolvable(fn: str) -> bool:
        # internal receiver type with no same-named method: leave it to the
        # CHA DynamicCallLinker (super-class fallback), don't speculate a
        # stub that would shadow the inherited target
        if PATH_SEP not in fn or "::" not in fn:
            return False
        type_part = fn.rsplit(PATH_SEP, 1)[0]
        td = typedecls_by_full.get(type_part)
        return td is not None and not td.is_external

    new_stubs: dict[str, Node] = {}
    for call in calls:
        names = callee_names(call)
        ms = [methods_by_full[n] for n in names if n in methods_by_full]
        targets = list(ms)
        if not ms:
            for fn in names:
                if is_dummy_type(fn) or cha_resolvable(fn):
                    continue
                if fn not in new_stubs:
                    stub = _make_stub(cpg, call, fn)
                    stub.name = fn.rsplit(PATH_SEP, 1)[-1] if PATH_SEP in fn else fn
                    new_stubs[fn] = stub
                    methods_by_full.setdefault(fn, stub)
                targets.append(new_stubs[fn])
        for m in targets:
            cpg.add_edge(call, m, "CALL")
            try:
                mr = cpg.method_return(m)
                if (mr.type_full_name or "ANY") != "ANY":
                    call.type_full_name = mr.type_full_name
                elif mr.possible_types and mr.possible_types[0] != "ANY":
                    call.type_full_name = mr.possible_types[0]
            except KeyError:
                pass
        _set_callees(call, names)


def _set_callees(call: Node, names: list[str]):
    non_dummy = [n for n in names if not is_dummy_type(n)]
    if len(names) == 1:
        call.method_full_name = names[0]
        call.dynamic_type_hint_full_name = tuple(
            t for t in call.dynamic_type_hint_full_name if t not in names)
    elif len(names) > 1 and names != non_dummy:
        _set_callees(call, non_dummy)


# ---------------------------------------------------------------------------
# ObjectPropertyCallLinker (ObjectPropertyCallLinker.scala)
# ---------------------------------------------------------------------------

def object_property_call_linker(cpg: Cpg):
    pattern = re.compile(r"^(?:\{.*\}|.*<returnValue>):<member>\((.*)\):.*$")
    property_access_to_calls: dict[str, list[Node]] = {}
    for call in cpg.nodes:
        if call.label != "CALL":
            continue
        m = pattern.match(call.method_full_name or "")
        if m:
            property_access_to_calls.setdefault(
                f"{m.group(1)}.{call.name}", []).append(call)
    if not property_access_to_calls:
        return
    methods_by_full = _methods_by_full_name(cpg)
    for a in _assignments(cpg):
        args = _assignment_args(cpg, a)
        if len(args) != 2:
            continue
        target, source = args
        if source.label != "METHOD_REF" or target.label != "CALL" \
                or target.name != FIELD_ACCESS:
            continue
        callee = source.method_full_name
        for prop, calls in property_access_to_calls.items():
            if target.code.endswith(prop):
                for c in calls:
                    c.method_full_name = callee


# ---------------------------------------------------------------------------
# Pipeline entry
# ---------------------------------------------------------------------------

def run_type_recovery(cpg: Cpg, iterations: int = 2, dummy_types: bool = True):
    """jssrc2cpg postProcessingPasses order (package.scala:10-15), minus
    NaiveCallLinker (run later by passes.link_calls)."""
    inheritance_full_name_pass(cpg)
    const_closure_pass(cpg)
    resolve_imports_js(cpg)
    shared = JsTypeRecovery.build_shared_indexes(cpg)
    for i in range(iterations):
        JsTypeRecovery(cpg, i, iterations, dummy_types, shared=shared).run()
    type_hint_call_linker(cpg)
    object_property_call_linker(cpg)
