"""Ported reference goldens: jssrc2cpg TsUsageSliceTests.scala — usage
slicing over a real-world TypeScript module (abstract classes, typed
class properties, constructor-type parameter annotations).

Documented deviation: the reference resolves `new Loader()` only to the
bare external stub name `Loader` (TsUsageSliceTests.scala:115); our import
resolver qualifies it to the module full name `loader:Loader` — strictly
more information, same shape."""

from __future__ import annotations

from joern_spark.cpg.build import build_cpg
from joern_spark.dataflow.slicing import usage_slice

SRC = """import Loader from './loader'; // Used to load files from the web server
import Input from './input'; // Used to manage the user input

//This is the abstract base of all scenes
export abstract class Scene {
    game: Game;
    gl: WebGL2RenderingContext;
    public constructor(game: Game){
        this.game = game;
        this.gl = game.gl;
    }

    public abstract load(): void; // Here we will tell the loader which files to load from the webserver
    public abstract timer(): void;
    public abstract start(): void; // Here we will initialize the scene objects before entering the draw loop
    public abstract draw(deltaTime: number): number; // Here will draw the scene (deltaTime is the difference in time between this frame and the past frame in milliseconds)
    public abstract end(): void; // Here we free the memory from objects we allocated
}

//This class create the WebGL2 context, manages the scenes and handles the game loop
export default class Game {
    canvas: HTMLCanvasElement; // The canvas on which we will draw
    gl: WebGL2RenderingContext; // The WebGL2 context of the canvas (we will use it to draw)
    loader: Loader = new Loader(); // A loader to read files from the webserver
    input: Input; // A manager for user input (keyboard and mouse)
    scenes: {[name: string]: Scene} = {}; // A dictionary of all available scenes
    currentScene: Scene = null; // The scene that is currently being drawn
    nextScene: Scene = null; // The scene that will replace the current scene after its files have been loaded
    nextSceneReady: boolean = false; // Whether the files requested by the next scene has been loaded or not
    lastTick: number; // The time of the last frame in milliseconds (used to calculate delta time)

    constructor(canvas: HTMLCanvasElement){
        this.canvas = canvas;
        this.gl = this.canvas.getContext("webgl2", {
            preserveDrawingBuffer: true, // This will prevent the Browser from automatically clearing the frame buffer every frame
            alpha: true, // this will tell the browser that we want an alpha component in our frame buffer
            antialias: true, // this will tell the browser that we want antialiasing
            depth: true, // this will tell the browser that we want a depth buffer
            powerPreference: "high-performance",
            premultipliedAlpha: false, // This can be used if the canvas are going to be blended with the rest of the webpage (transparency)
            stencil: true // this will tell the browser that we want a stencil buffer
        }); // This command loads the WebGL2 context which we will use to draw
        this.input = new Input(this.canvas);
        this.lastTick = performance.now();
        this.loop(performance.now()); // Start the game loop
    }

    public addScene(name: string, type: new (game: Game) => Scene){
        this.scenes[name] = new type(this);
    }

    public addScenes(scenes: {[name: string]: new (game: Game) => Scene}){
        for(let name in scenes) this.addScene(name, scenes[name]);
    }

    public startScene(name: string){
        if(name in this.scenes){
            this.nextScene = this.scenes[name];
            this.nextSceneReady = false;
            this.nextScene.load();
            this.loader.wait().then(()=>{this.nextSceneReady = true;}) // This will make the loader notify us when the files are ready
        } else {
            console.warn(`Scene "${name}" not found`);
        }
    }

    private loop(time: DOMHighResTimeStamp){
        requestAnimationFrame((time) => this.loop(time)); // Tell the browser to call this function again when the next frame needs to be drawn
        if(this.nextScene != null && this.nextSceneReady){ // If there is a next scene and it is ready, replace the current scene with it.
            if(this.currentScene != null) this.currentScene.end(); // If there was an old scene, tell it to free its memory
            this.currentScene = this.nextScene;
            this.nextScene = null;
            this.currentScene.start(); // Tell the scene to initialize its objects
        }
        // this.currentScene = this.nextScene;
        // this.currentScene.start();
        if(this.currentScene != null){
            let state = this.currentScene.draw(time-this.lastTick); // Tell the scene to draw itself
            if (state == -1)
            {
                console.log("Game");
                return;
            }
        }
        this.input.update(); // Update some information about the user input
        this.lastTick = time;
    }

}

"""


def _prog():
    cpg = build_cpg(SRC, "main.ts")
    return usage_slice(cpg, exclude_operator_calls=False)


def _slice_for(prog, full_name, obj_name):
    for ms in prog["objectSlices"]:
        if ms["fullName"] != full_name:
            continue
        for sl in ms["slices"]:
            if sl["targetObj"]["name"] == obj_name:
                return sl
    raise AssertionError(f"no slice {full_name}/{obj_name}")


# TsUsageSliceTests.scala:110-123 ('loader' object slice)
def test_loader_slice():
    prog = _prog()
    sl = _slice_for(prog, "main.ts::program:Game:<init>", "loader")
    d = sl["definedBy"]
    # reference: CallDef("new Loader", "Loader", Some("Loader"), 24, 21) —
    # module-qualified here (see module docstring)
    assert (d["label"], d["name"], d["typeFullName"], d["resolvedMethod"],
            d["lineNumber"], d["columnNumber"]) == \
        ("CALL", "new Loader", "loader:Loader", "loader:Loader", 24, 21)
    t = sl["targetObj"]
    assert (t["label"], t["name"], t["typeFullName"], t["lineNumber"],
            t["columnNumber"]) == ("LOCAL", "loader", "loader:Loader", 24, 4)
    inv1 = next(c for c in sl["invokedCalls"] if c["callName"] == "Loader")
    assert inv1["returnType"] == "loader:Loader"


# TsUsageSliceTests.scala:125-140 ('time' lambda parameter slice)
def test_time_lambda_param_slice():
    prog = _prog()
    sl = _slice_for(prog, "main.ts::program:Game:loop:<lambda>1", "time")
    for key in ("targetObj", "definedBy"):
        p = sl[key]
        assert (p["label"], p["name"], p["typeFullName"], p["position"],
                p["lineNumber"], p["columnNumber"]) == \
            ("PARAM", "time", "ANY", 1, 68, 31)
    arg1 = next(c for c in sl["argToCalls"] if c["callName"] == "loop")
    assert arg1["position"] == 1
    assert arg1["paramTypes"] == ["DOMHighResTimeStamp"]
    assert arg1["returnType"] == "ANY"
