"""Port of the reference's MockCpg test fixture builder
(semanticcpg/src/test/.../testing/MockCpg.scala) over the plain Cpg —
used by the semanticcpg structure-suite ports."""

from __future__ import annotations

from joern_spark.cpg.core import Cpg, Node


class MockCpg:
    def __init__(self):
        self.cpg = Cpg()

    # -- helpers -------------------------------------------------------------
    def _one(self, label, name):
        (n,) = [x for x in self.cpg.nodes_by_label(label) if x.name == name]
        return n

    def _block_of(self, method):
        (b,) = [c for c in self.cpg.ast_children(method) if c.label == "BLOCK"]
        return b

    # -- builders (MockCpg.scala:27-186) -------------------------------------
    def with_file(self, filename, content=None):
        self.cpg.add_node(Node("FILE", name=filename, content=content or ""))
        return self

    def with_namespace(self, name, in_file=None):
        block = self.cpg.add_node(Node("NAMESPACE_BLOCK", name=name))
        ns = self.cpg.add_node(Node("NAMESPACE", name=name))
        self.cpg.add_edge(block, ns, "REF")
        if in_file is not None:
            self.cpg.add_edge(block, self._one("FILE", in_file), "SOURCE_FILE")
        return self

    def with_type_decl(self, name, is_external=False, in_namespace=None,
                       in_file=None, offset=None, offset_end=None):
        typ = self.cpg.add_node(Node("TYPE", name=name))
        td = self.cpg.add_node(Node("TYPE_DECL", name=name, full_name=name,
                                    is_external=is_external,
                                    start=offset, end=offset_end))
        member = self.cpg.add_node(Node("MEMBER", name="amember"))
        modifier = self.cpg.add_node(Node("MODIFIER", modifier_type="STATIC"))
        self.cpg.add_edge(typ, td, "REF")
        self.cpg.add_edge(td, member, "AST")
        self.cpg.add_edge(member, modifier, "AST")
        if in_namespace is not None:
            self.cpg.add_edge(self._one("NAMESPACE_BLOCK", in_namespace),
                              td, "AST")
        if in_file is not None:
            self.cpg.add_edge(td, self._one("FILE", in_file), "SOURCE_FILE")
        return self

    def with_method(self, name, external=False, in_type_decl=None,
                    file_name="", offset=None, offset_end=None):
        ret = Node("METHOD_RETURN", type_full_name="int", order=10,
                   code="RET")
        param = Node("METHOD_PARAMETER_IN", order=1, index=1, name="param1")
        param_type = Node("TYPE", name="paramtype")
        param_out = Node("METHOD_PARAMETER_OUT", name="param1", order=1,
                         index=1)
        method = Node("METHOD", is_external=external, name=name,
                      full_name=name, signature="asignature",
                      filename=file_name, start=offset, end=offset_end)
        block = Node("BLOCK", type_full_name="int")
        modifier = Node("MODIFIER", modifier_type="modifiertype")
        for n in (method, ret, param, param_type, param_out, block, modifier):
            self.cpg.add_node(n)
        self.cpg.add_edge(method, ret, "AST")
        self.cpg.add_edge(method, param, "AST")
        self.cpg.add_edge(param, param_out, "PARAMETER_LINK")
        self.cpg.add_edge(method, block, "AST")
        self.cpg.add_edge(param, param_type, "EVAL_TYPE")
        self.cpg.add_edge(param_out, param_type, "EVAL_TYPE")
        self.cpg.add_edge(method, modifier, "AST")
        if in_type_decl is not None:
            self.cpg.add_edge(self._one("TYPE_DECL", in_type_decl),
                              method, "AST")
        if file_name:
            self.cpg.add_edge(method, self._one("FILE", file_name),
                              "SOURCE_FILE")
        return self

    def with_call_in_method(self, method_name, call_name, code=None):
        method = self._one("METHOD", method_name)
        call = self.cpg.add_node(Node("CALL", name=call_name,
                                      code=code or call_name))
        self.cpg.add_edge(self._block_of(method), call, "AST")
        self.cpg.add_edge(method, call, "CONTAINS")
        return self

    def with_literal_argument(self, call_name, literal_code):
        call = self._one("CALL", call_name)
        method = self.cpg.method_of(call)
        lit = self.cpg.add_node(Node("LITERAL", code=literal_code))
        self.cpg.add_node(Node("TYPE_DECL", name="ATypeDecl",
                               full_name="ATypeDecl"))
        self.cpg.add_edge(call, lit, "AST")
        self.cpg.add_edge(method, lit, "CONTAINS")
        return self

    def with_custom(self, f):
        f(self.cpg)
        return self
