"""Ported reference goldens: jssrc2cpg JsUsageSliceTests.scala —
UsageSlicing over the express/Car sample and object parameters, with the
full type-recovery chain (`express:<returnValue>` dummy types, CHA
resolution) feeding definedBy/invokedCalls/argToCalls."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg
from joern_spark.dataflow.slicing import usage_slice

SRC_EXPRESS = """const express = require('express')
const app = express()
const port = 3000

app.get('/', (req, res) => {
    res.send('Hello World!')
})

app.listen(port, () => {
    console.log(`Example app listening on port ${port}`)
})

console.log(app)

function notHiddenByClosure() {
    console.debug(app)
}

class Car {
    constructor(name, year) {
        this.name = name;
        this.year = year;
    }

    rev() {
        return "vroom";
    }

}

function carTest() {
    const c = new Car("Noodle", 2012);
    c.rev();
}

"""

SRC_FOO = """class Foo {

    constructor(a, b) {
        this.a = a;
        this.b = b;
    }

    getA() {
        return this.a;
    }
}


function bar(y) {
    y.getA();
}
const x = new Foo(1, 2)

bar(x)

"""


def _slice_for(prog, full_name, obj_name):
    for ms in prog["objectSlices"]:
        if ms["fullName"] != full_name:
            continue
        for sl in ms["slices"]:
            if sl["targetObj"]["name"] == obj_name:
                return sl
    raise AssertionError(f"no slice {full_name}/{obj_name}")


def _express_slice():
    cpg = build_cpg(SRC_EXPRESS, "main.js")
    return usage_slice(cpg)


# JsUsageSliceTests.scala:52-81 (express.js slice)
def test_express_slice():
    prog = _express_slice()
    sl = _slice_for(prog, "main.js::program", "app")
    d = sl["definedBy"]
    assert (d["label"], d["name"], d["typeFullName"],
            d["resolvedMethod"], d["lineNumber"], d["columnNumber"]) == \
        ("CALL", "express", "ANY", "express", 2, 12)
    t = sl["targetObj"]
    assert (t["name"], t["typeFullName"], t["lineNumber"],
            t["columnNumber"]) == ("app", "express:<returnValue>", 2, 6)

    inv1 = next(c for c in sl["invokedCalls"] if c["callName"] == "get")
    inv2 = next(c for c in sl["invokedCalls"] if c["callName"] == "listen")
    assert inv1["paramTypes"] == ["__ecma.String", "LAMBDA"]
    assert inv1["returnType"] == "ANY"
    assert inv2["paramTypes"] == ["__ecma.Number", "LAMBDA"]
    assert inv2["returnType"] == "ANY"

    arg1 = next(c for c in sl["argToCalls"] if c["callName"] == "log")
    assert arg1["position"] == 1
    assert arg1["paramTypes"] == ["express:<returnValue>"]
    assert arg1["returnType"] == "ANY"
    # console.debug(app) lands in notHiddenByClosure's shadow slice (the
    # reference's flat object slice sees both; ours splits per method)
    sh = _slice_for(prog, "main.js::program:notHiddenByClosure", "app")
    arg2 = next(c for c in sh["argToCalls"] if c["callName"] == "debug")
    assert arg2["position"] == 1
    assert arg2["paramTypes"] == ["express:<returnValue>"]
    assert arg2["returnType"] == "ANY"


# JsUsageSliceTests.scala:83-90 (Car UDT)
def test_car_udt():
    prog = _express_slice()
    car_udt = prog["userDefinedTypes"][0]
    assert car_udt["name"] == "main.js::program:Car"
    car_init = car_udt["procedures"][0]
    assert car_init["callName"] == "<init>"
    assert car_init["returnType"] == "ANY"


# JsUsageSliceTests.scala:92-105 (Car object instantiation)
def test_car_instantiation():
    prog = _express_slice()
    sl = _slice_for(prog, "main.js::program:carTest", "c")
    d = sl["definedBy"]
    assert (d["name"], d["typeFullName"], d["resolvedMethod"],
            d["lineNumber"], d["columnNumber"]) == \
        ("new Car", "main.js::program:Car", "main.js::program:Car", 32, 14)
    t = sl["targetObj"]
    assert (t["label"], t["name"], t["typeFullName"], t["lineNumber"],
            t["columnNumber"]) == ("LOCAL", "c", "main.js::program:Car", 32, 10)

    inv1 = next(c for c in sl["invokedCalls"] if c["callName"] == "Car")
    inv2 = next(c for c in sl["invokedCalls"] if c["callName"] == "rev")
    assert inv1["paramTypes"] == ["__ecma.String", "__ecma.Number"]
    assert inv1["returnType"] == "main.js::program:Car"
    assert inv2["paramTypes"] == []
    assert inv2["returnType"] == "ANY"


# JsUsageSliceTests.scala:136-148 (y param of bar)
def test_object_param_y():
    cpg = build_cpg(SRC_FOO, "main.js")
    prog = usage_slice(cpg)
    sl = _slice_for(prog, "main.js::program:bar", "y")
    t = sl["targetObj"]
    assert (t["label"], t["name"], t["typeFullName"], t["position"],
            t["lineNumber"], t["columnNumber"]) == \
        ("PARAM", "y", "ANY", 1, 14, 13)
    d = sl["definedBy"]
    assert (d["label"], d["name"], d["position"]) == ("PARAM", "y", 1)
    inv1 = next(c for c in sl["invokedCalls"] if c["callName"] == "getA")
    assert inv1["resolvedMethod"] == "main.js::program:Foo:getA"
    assert inv1["paramTypes"] == []
    assert inv1["returnType"] == "ANY"


# JsUsageSliceTests.scala:150-176 (x local with new Foo + bar(x))
def test_object_local_x():
    cpg = build_cpg(SRC_FOO, "main.js")
    prog = usage_slice(cpg)
    sl = _slice_for(prog, "main.js::program", "x")
    t = sl["targetObj"]
    assert (t["label"], t["name"], t["typeFullName"], t["lineNumber"],
            t["columnNumber"]) == ("LOCAL", "x", "main.js::program:Foo", 17, 6)
    d = sl["definedBy"]
    assert (d["name"], d["typeFullName"], d["resolvedMethod"],
            d["lineNumber"], d["columnNumber"]) == \
        ("new Foo", "main.js::program:Foo", "main.js::program:Foo", 17, 10)

    inv1 = next(c for c in sl["invokedCalls"] if c["callName"] == "Foo")
    assert inv1["resolvedMethod"] == "main.js::program:Foo"
    assert inv1["paramTypes"] == ["__ecma.Number", "__ecma.Number"]
    assert inv1["returnType"] == "main.js::program:Foo"

    arg1 = next(c for c in sl["argToCalls"] if c["callName"] == "bar")
    assert (arg1["resolvedMethod"], arg1["paramTypes"], arg1["returnType"],
            arg1["position"], arg1["lineNumber"], arg1["columnNumber"]) == \
        ("main.js::program:bar", ["main.js::program:Foo"], "ANY", 1, 19, 0)
