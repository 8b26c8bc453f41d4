"""Ported reference goldens: the jssrc2cpg linking-pass suites —
ImportsPassTests, RequirePassTests, ConstClosurePassTests,
InheritanceFullNamePassTests, CallLinkerPassTests (each test cites its
source file).  Post-processed fixture (DataFlowCodeToCpgSuite)."""

from __future__ import annotations

import pytest

from joern_spark.cpg.build import build_cpg, build_cpg_files


def _calls(cpg, name):
    return [n for n in cpg.nodes if n.label == "CALL" and n.name == name]


def _methods(cpg, name):
    return [m for m in cpg.methods() if m.name == name]


def _call_in(cpg, method):
    return [e.src for e in cpg.inn(method, "CALL")]


# ==========================================================================
# ImportsPassTests.scala
# ==========================================================================
class TestImportsPass:
    # ImportsPassTests.scala:14-29
    def test_import_node_for_declaration(self):
        cpg = build_cpg("var barOrBaz = require('./bar.js');\n")
        imports = [n for n in cpg.nodes if n.label == "IMPORT"]
        assert len(imports) == 1
        x = imports[0]
        assert x.imported_entity == "./bar.js"
        assert x.imported_as == "barOrBaz"
        calls = [e.src for e in cpg.inn(x, "IS_CALL_FOR_IMPORT")]
        assert len(calls) == 1
        assert calls[0].code == "require('./bar.js')"
        assign = cpg.in_call(calls[0])
        assert assign.name == "<operator>.assignment"
        assert assign.code == "var barOrBaz = require('./bar.js')"
        assert cpg.argument(assign, 1).code == "barOrBaz"
        assert cpg.argument(assign, 2) is calls[0]

    # ImportsPassTests.scala:31-46
    def test_import_node_for_assignment_from_require(self):
        cpg = build_cpg("barOrBaz = require('./bar.js');\n")
        imports = [n for n in cpg.nodes if n.label == "IMPORT"]
        assert len(imports) == 1
        x = imports[0]
        assert x.imported_entity == "./bar.js"
        assert x.imported_as == "barOrBaz"
        calls = [e.src for e in cpg.inn(x, "IS_CALL_FOR_IMPORT")]
        assert len(calls) == 1
        assign = cpg.in_call(calls[0])
        assert cpg.argument(assign, 1).code == "barOrBaz"


# ==========================================================================
# RequirePassTests.scala
# ==========================================================================
class TestRequirePass:
    # RequirePassTests.scala:11-39
    def test_methods_imported_via_require(self):
        cpg = build_cpg_files([
            ("sample.js", """
const externalfunc = require('./sampleone');
function testone() {
  var name = "foo";
  console.log(name);
  externalfunc(name);
}

testone();
"""),
            ("sampleone.js", """
module.exports = function (nameparam) {
  console.log( "external func" + nameparam);
}
"""),
        ])
        ext = _calls(cpg, "externalfunc")
        assert [c.method_full_name for c in ext] == ["sampleone.js::program:<lambda>0"]
        callees = [e.dst.full_name for c in ext for e in cpg.out(c, "CALL")]
        assert callees == ["sampleone.js::program:<lambda>0"]

    # RequirePassTests.scala:41-75
    def test_methods_imported_via_import(self):
        cpg = build_cpg_files([
            ("sample.js", """
import {foo, bar} from './sampleone.mjs';
var x = "literal";
foo(x);
bar(x);
"""),
            ("sampleone.mjs", """
export function foo(x) {
  console.log(x);
}

export function bar(x) {
  console.log(x);
}
"""),
        ])
        foos = _calls(cpg, "foo")
        assert [c.method_full_name for c in foos] == ["sampleone.mjs::program:foo"]
        assert [e.dst.full_name for c in foos for e in cpg.out(c, "CALL")] == \
            ["sampleone.mjs::program:foo"]
        bars = _calls(cpg, "bar")
        assert [c.method_full_name for c in bars] == ["sampleone.mjs::program:bar"]
        assert [e.dst.full_name for c in bars for e in cpg.out(c, "CALL")] == \
            ["sampleone.mjs::program:bar"]

    # RequirePassTests.scala:77-103
    def test_typescript_relative_imports(self):
        cpg = build_cpg_files([
            ("foo.ts", "export function foo() {}\n"),
            ("d1/d2/bar.ts", """
import { foo } from "../../foo.ts";

foo();
export function bar() {}
"""),
            ("d1/baz.ts", """
import { bar } from "./d2/bar.ts";

bar();
"""),
        ])
        bars = _calls(cpg, "bar")
        assert bars and bars[0].method_full_name == "d1/d2/bar.ts::program:bar"
        foos = _calls(cpg, "foo")
        assert foos and foos[0].method_full_name == "foo.ts::program:foo"


# ==========================================================================
# ConstClosurePassTests.scala
# ==========================================================================
class TestConstClosurePass:
    # ConstClosurePassTests.scala:8-51 (object properties assigned to closures)
    def test_object_property_closures(self):
        cpg = build_cpg("""
var myObject = {
  prop1: "a",
  prop2: "b",

  // Function 1
  sayHello: function () {
    console.log("sayHello");
  },

  // Function 2
  sayWorld: function () {
    console.log("sayWorld");
  },

  // Function 3
  sayHelloWorld: function () {
    console.log("sayHelloWorld");
  }
};
myObject.sayHello()
myObject.sayWorld()
myObject.sayHelloWorld()
""")
        for name in ("sayHello", "sayWorld", "sayHelloWorld"):
            ms = _methods(cpg, name)
            assert len(ms) == 1, name
            assert ms[0].full_name.endswith(f"program:{name}")
            cs = _calls(cpg, name)
            assert len(cs) == 1, name
            assert cs[0].method_full_name.endswith(f"program:{name}"), name

    # ConstClosurePassTests.scala:53-66
    def test_const_arrow_functions_named(self):
        cpg = build_cpg("""
const foo = (x,y) => { return x + y; }
const bar = (x,y) => { return x - y; }
""")
        foo = _methods(cpg, "foo")
        assert len(foo) == 1 and foo[0].full_name.endswith("program:foo")
        bar = _methods(cpg, "bar")
        assert len(bar) == 1 and bar[0].full_name.endswith("program:bar")

    # ConstClosurePassTests.scala:68-83
    def test_exported_iife_closure_named(self):
        cpg = build_cpg("""
exports.foo = (function() {
	var count = 0;
	return function() {
		count++;
		return count;
	};
})();

this.foo();
""")
        ms = _methods(cpg, "foo")
        assert len(ms) == 1
        assert ms[0].full_name.endswith("program:foo")

    # ConstClosurePassTests.scala:85-110 (mutable variables)
    def test_mutable_var_closures(self):
        cpg = build_cpg("""
var foo = function() {};
foo();

var bar = function() {};
bar();
bar = 2;
""")
        foo = _methods(cpg, "foo")
        assert len(foo) == 1 and foo[0].full_name.endswith("program:foo")
        foo_calls = _calls(cpg, "foo")
        assert len(foo_calls) == 1
        assert foo_calls[0].method_full_name.endswith("program:foo")
        # reassigned later → keeps the anonymous name
        lam = _methods(cpg, "<lambda>1")
        assert len(lam) == 1 and lam[0].full_name.endswith("program:<lambda>1")
        bar_calls = _calls(cpg, "bar")
        assert len(bar_calls) == 1
        assert bar_calls[0].method_full_name.endswith("program:<lambda>1")


# ==========================================================================
# InheritanceFullNamePassTests.scala
# ==========================================================================
class TestInheritanceFullNamePass:
    # InheritanceFullNamePassTests.scala:11-63
    @pytest.fixture(scope="class")
    def cpg(self):
        return build_cpg_files([
            ("inheritance.js", """
import Musician from "./domain/music";

class MusicWithLyrics extends Musician {
  constructor(name, song, lyrics) {
    super(name, song);
    this.lyrics = lyrics;
  }
}

const myMusician = new Musician('Rafi', 'song1');
const myMusicWithLyrics = new MusicWithLyrics('Fido', 'song1', 'lyrics');
"""),
            ("domain/music.js", """
class Musician {
    constructor(name, song) {
        this.username = name;
        this.song = song;
    }
    sing() {
        console.log(`${this.username} says ${this.song}`);
    }
}

export default Musician;
"""),
        ])

    def test_resolves_inherited_type_fully(self, cpg):
        tgt = next(n for n in cpg.nodes if n.label == "TYPE_DECL"
                   and n.name == "MusicWithLyrics")
        assert tgt.full_name == "inheritance.js::program:MusicWithLyrics"
        musicians = [n for n in cpg.nodes if n.label == "TYPE_DECL"
                     and n.name == "Musician"]
        assert musicians[0].full_name == "domain/music.js::program:Musician"
        inherits = [e.dst.full_name for e in cpg.out(tgt, "INHERITS_FROM")]
        assert inherits[:1] == ["domain/music.js::program:Musician"]

    def test_instantiated_identifiers_typed(self, cpg):
        m1 = [n for n in cpg.nodes if n.label == "IDENTIFIER"
              and n.name == "myMusician"]
        assert m1 and m1[0].type_full_name == "domain/music.js::program:Musician"
        m2 = [n for n in cpg.nodes if n.label == "IDENTIFIER"
              and n.name == "myMusicWithLyrics"]
        assert m2 and m2[0].type_full_name == "inheritance.js::program:MusicWithLyrics"

    # InheritanceFullNamePassTests.scala:65-86
    def test_external_inherited_type_stub(self):
        cpg = build_cpg("""
import Musician from "music";

class MusicWithLyrics extends Musician {
  constructor(name, song, lyrics) {
    super(name, song);
    this.lyrics = lyrics;
  }
}
""", "inheritance.js")
        tgt = next(n for n in cpg.nodes if n.label == "TYPE_DECL"
                   and n.name == "MusicWithLyrics")
        assert tgt.full_name == "inheritance.js::program:MusicWithLyrics"
        inherits = [e.dst.full_name for e in cpg.out(tgt, "INHERITS_FROM")]
        assert inherits[:1] == ["music.js::program:Musician"]


# ==========================================================================
# CallLinkerPassTests.scala
# ==========================================================================
class TestCallLinkerPass:
    # CallLinkerPassTests.scala:12-40
    def test_call_edges_for_class_methods(self):
        cpg = build_cpg("""
class Foo {
  a() {
    this.b();
  }

  b() {
    console.log("b");
    new this.bar().c();
  }

  bar = class Bar {
    c() {
      console.log("c");
    }
  }
}""")
        b = _methods(cpg, "b")[0]
        calls = _call_in(cpg, b)
        assert len(calls) == 1
        assert calls[0].code == "this.b()"
        assert calls[0].method_full_name.endswith(".js::program:Foo:b")
        c = _methods(cpg, "c")[0]
        c_calls = _call_in(cpg, c)
        assert len(c_calls) == 1
        assert c_calls[0].code == "new this.bar().c()"
        assert c_calls[0].method_full_name.endswith(".js::program:Foo:<init>:Bar:c")

    # CallLinkerPassTests.scala:42-59
    def test_call_edges_basic(self):
        cpg = build_cpg("""
function sayhi() {
  console.log("Hello World!");
}
sayhi();
""")
        m = _methods(cpg, "sayhi")
        assert len(m) == 1 and m[0].full_name.endswith(".js::program:sayhi")
        calls = _call_in(cpg, m[0])
        assert len(calls) == 1
        assert calls[0].code == "sayhi()"
        assert calls[0].method_full_name.endswith(".js::program:sayhi")

    # CallLinkerPassTests.scala:61-119
    def test_exported_lambdas_across_files(self):
        cpg = build_cpg_files([
            ("foo.js", """
const bar = require('./bar.js');
const baz = require('./baz.js');

bar.sayhi();
baz.sayhowdy();
"""),
            ("bar.js", """
module.exports = {
  sayhi: function() {
    console.log("Hello World!");
  },
  saybye: function() {
    console.log("Good-bye!");
  }
}
"""),
            ("baz.js", """
module.exports = {
  sayhowdy: function() {
    console.log("Howdy World!");
  }
}
"""),
        ])
        sayhi = next(m for m in cpg.methods()
                     if m.full_name == "bar.js::program:sayhi")
        assert sayhi.name == "sayhi"
        calls = _call_in(cpg, sayhi)
        assert len(calls) == 1
        assert calls[0].code == "bar.sayhi()"
        assert calls[0].method_full_name == "bar.js::program:sayhi"

        sayhowdy = next(m for m in cpg.methods()
                        if m.full_name == "baz.js::program:sayhowdy")
        howdy_calls = _call_in(cpg, sayhowdy)
        assert len(howdy_calls) == 1
        assert howdy_calls[0].code == "baz.sayhowdy()"
        assert howdy_calls[0].method_full_name == "baz.js::program:sayhowdy"

    # CallLinkerPassTests.scala:121-189
    def test_conservative_flow_insensitive_linking(self):
        cpg = build_cpg_files([
            ("foo.js", """
var barOrBaz = require('./bar.js');
barOrBaz = require('./baz.js');

barOrBaz.sayhi();
"""),
            ("bar.js", """
module.exports = {
  sayhi: function() {
    console.log("Hello World, love BAR");
  }
}
"""),
            ("baz.js", """
module.exports = {
  sayhi: function() {
    console.log("Howdy World, love BAZ");
  }
}
"""),
        ])
        call = next(c for c in _calls(cpg, "sayhi")
                    if c.code == "barOrBaz.sayhi()")
        callees = sorted(e.dst.full_name for e in cpg.out(call, "CALL"))
        assert callees == ["bar.js::program:sayhi", "baz.js::program:sayhi"]
        # ambiguous → methodFullName stays unknown
        assert call.method_full_name == "<unknownFullName>"
