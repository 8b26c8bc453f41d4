"""Golden JS dataflow fixtures.

Snippets and expected flow sets transcribed from the reference's test suite
(jssrc2cpg/src/test/.../dataflow/DataflowTests.scala — cited per case).
These are test INPUTS/EXPECTATIONS (data), used to verify behavioral parity
of the engine; the corpus generator embeds the snippets into HTML pages
(FIXTURES.md §1/§3).
"""

from __future__ import annotations

# Each case: id → dict(code, query description). Queries are expressed with
# tiny selector lambdas over (Q, cpg) in tests; expected as sets of
# (code,line) tuple-paths or counts.

SNIPPETS: dict[str, str] = {
    "flows1": """
function flows1(fd, mode) {
  var buff = [];

  var sz = 0;
  if (mode == 1) sz = 20;
  if (mode == 2) sz = 200;
  if (mode == 3) sz = 41;
  if (mode == 5) sz = -5;

  read(fd, buff, sz);
}""",
    "argflow": """
function foo(x) {}

function method(y) {
  var a = 10;
  if (a < y) {
    foo(a);
  }
}""",
    "chain": """
function flow() {
  var a = 0x37;
  var b = a;
  var c = 0x31;
  var z = b + c;
  z++;
  var p = z;
  var x = z;
}""",
    "ret": """
function flow(a) {
  var z = a;
  var b = z;

  return b;
}""",
    "nested": """
function nested(a) {
  var x = 0;
  var z = 1;
  if(a < 10) {
    if( a < 5) {
      if(a < 2) {
        x = a;
      }
    }
  } else
    x = z;

  return x;
}""",
    "paramchain": """
function foo(y) {};

function param(x) {
  var a = x;
  var b = a;
  var z = foo(b);
} """,
    "paramnofoo": """
function param(x) {
  var a = x;
  var b = a;
  var z = foo(b);
}""",
    "member": """
var node = {
  'value1' : 1,
  'value2' : 2
};

function test() {
  var x = 10;
  node.value1 = x;
  node.value2 = node.value1;
}""",
    "lit37": """
function flow() {
  var a = 37;
  var b = a;
  var c = 31;
  var z = b + c;
  z++;
  var p = z;
  var x = z;
}""",
    "shorthand": """
function flow() {
  var a = 37;
  var b = a;
  var z = b;
  z += a;
}""",
    "shorthand2": """
function flow() {
  var a = 37;
  var b = a;
  var z = b;
  z += a;
  var w = z;
}""",
    "arrayparam": """
function main(argc, argv){
  var x = argv[1];
  var y = x;
  var z = y;
  return 0;
}""",
    "conditional": """
function foo(x, y) {
  var z =  x ? f(y) : g(y);
  return;
}""",
    "sourcecaller": """
function bar() {
  var x = source();
  foo(x);
}

function foo(y) {
  sink(y);
}""",
    "sourcecallee": """
function bar() {
  return source();
}

function sink(param) {}

function foo(y) {
  var y = bar();
  sink(y);
}""",
    "structdata": """
var point = {
  'x' : 0,
  'y' : 0
}

function source() {
  return 2.0;
}

function sink(x) {
  return 3;
}

function main() {
  var k = source();
  point.x = k;
  point.y = 2;
  sink(point.x);
}""",
    "objelem": """
var s = { 'field' : 0 }

function foo(arg) {
  arg.field = source();
  sink(arg.field);
}""",
    "objelemsource": """
function bar() {
  source(a.b);
  sink(a.b);
}""",
    "methodreturn": """
function foo(y, x) {
  free(y);
  free(x);
}""",
    "callretonce": """
function foo() {
  return bar();
}""",
    "outerinner": """
function f(x, y) {
  g(x, y);
}""",
    "membercls": """
class Foo {
  x = "foo";
  func() {
    sink(x);
  }
}
""",
    "memberclsstatic": """
class Foo {
  static x = "foo";
  func() {
    sink(x);
  }
}
""",
    "closureparams": "foo.bar( (x,y) => { sink1(x); sink2(y); } )",
    "ctor": "const x = new Foo(y);",
    "ctorobj": "const x = new Foo({ z : y } );",
    "fieldobj": "const x = { p : a.y };",
    "objnotation": """
const a = { b : 47 } ;
fn(a);
""",
    "lambdaconst": """
const foo = (x, y) => {
  sink(x);
};
foo(1, 2);
""",
    "irrelevant": """
const irrelevant = "irrelevant";
const a = { } ;
sink(a);""",
    "forin": """
function foo(x) {
  for(var elem in x) {
    console.log(elem)
  }
}""",
    "foreachlambda": """
function foo(x) {
  Object.keys(x).forEach(elem => console.log(elem))
}""",
    "parentchild": """
function foo(u) {

  const x = 1;

  function bar() {
     y = x;
     console.log(y);
     v = u;
     console.debug(v);
  }

}""",
    "multiassign": """
const middle = source()
const number = 1, sink = middle.fn()
""",
    "asyncyield": """
async function fetchUser(id) {
  var data = await source(id);
  sink(data);
  return data;
}
function* pages() {
  yield 1;
  yield 2;
}""",
    "modulelit": """
import axios from 'axios';
import { User } from './user';

const API_Endpoint = "https://test-api-service.com";

export const createUser = (user) => {
  return axios.post(API_Endpoint + "/user", user);
};
""",
}


# Web-taint corpus snippets: deterministic positives AND negatives for the
# web_taint_bundle queries (query/scan.py) — the cpg_web_taint driver query
# scans pages embedding these (snippet = i mod len), and its fixture oracle
# (tools/gen_cpg_fixtures.py) recomputes the same counts with the
# pure-Python engine.
WEB_TAINT_SNIPPETS: dict[str, str] = {
    "sqli_pos": "var q = location.search; db.query(q);",
    "sqli_neg": "db.query('SELECT 1');",
    "cmdi_pos": "var cmd = location.hash; exec(cmd);",
    "cmdi_neg": "var cmd = 'ls -la'; execSync(cmd);",
    "xss_pos": "var v = document.cookie; el.innerHTML = v;",
    "xss_write_pos": "document.write(location.search);",
    "xss_neg": "el.innerHTML = '<b>hi</b>';",
    "redirect_pos": "var t = document.cookie; location.href = t;",
    "redirect_neg": "location.replace('/login');",
    "regexi_pos": "var p = location.hash; var r = new RegExp(p);",
    "timeout_pos": "setTimeout(\"doEvil()\", 100);",
    "timeout_neg": "setTimeout(function() { ok(); }, 100);",
    "cred_pos": "var password = 'hunter2'; config.apiKey = \"abc123\";",
    "cred_neg": "var password = readInput();",
    "randtok_pos": "var token = Math.random();",
    "randtok_neg": "var x = Math.random();",
}
