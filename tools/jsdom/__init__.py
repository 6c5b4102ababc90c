"""Vendored mini-JS runtime: executes the shipped client (logic.js +
app.js) against a fake DOM in CI. See interp.py and dom.py."""

from tools.jsdom.dom import Browser, Response, make_event
from tools.jsdom.interp import (
    Interpreter,
    JSArray,
    JSObject,
    JSSyntaxError,
    JSThrow,
    js_from_py,
    py_from_js,
    undefined,
)

__all__ = [
    "Browser",
    "Response",
    "make_event",
    "Interpreter",
    "JSArray",
    "JSObject",
    "JSSyntaxError",
    "JSThrow",
    "js_from_py",
    "py_from_js",
    "undefined",
]
