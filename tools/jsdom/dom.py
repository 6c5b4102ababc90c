"""A minimal fake DOM + fetch for executing ``client/static/app.js`` in CI.

Implements exactly the browser surface the client uses (reference
behaviors: ``/root/reference/client/src/app.rs:26-69``,
``image_card.rs:12-27``, ``image_modal.rs:14-55``, ``header.rs:13-20``):
``document.getElementById/createElement``, element ``classList``/
``dataset``/``style``/``value``/``checked``/``disabled``, event listeners
with a test-side ``dispatch``, ``replaceChildren``/``append``,
``getBoundingClientRect``, ``window.confirm``, and a synchronous ``fetch``
routed to a test-provided handler. Everything is synchronous: promises
resolve inline (see :mod:`tools.jsdom.interp`).
"""

from __future__ import annotations

import json as _json
from typing import Callable, Dict, List, Optional

from tools.jsdom.interp import (
    JSArray,
    JSObject,
    JSPromise,
    JSThrow,
    js_from_py,
    make_error,
    undefined,
)


class ClassList:
    def __init__(self, el: "Element"):
        self._el = el
        self._names: List[str] = []

    def add(self, *names):
        for n in names:
            if n not in self._names:
                self._names.append(n)
        return undefined

    def remove(self, *names):
        self._names = [n for n in self._names if n not in names]
        return undefined

    def toggle(self, name, force=undefined):
        want = (name not in self._names) if force is undefined else bool(force)
        if want:
            self.add(name)
        else:
            self.remove(name)
        return want

    def contains(self, name):
        return name in self._names

    def __contains__(self, name):  # python-side convenience
        return name in self._names

    def __repr__(self):
        return f"ClassList({self._names})"


class Element:
    """One fake DOM node. Attributes the client sets (src, alt, value,
    checked, disabled, loading, type, ...) are plain Python attributes."""

    def __init__(self, doc: "Document", tag: str):
        self._doc = doc
        self.tagName = tag.upper()
        self.children: List["Element"] = []
        self.parentNode: Optional["Element"] = None
        self.classList = ClassList(self)
        self.dataset = JSObject()
        self.style = JSObject()
        self.textContent = ""
        self.value = ""
        self.id = ""
        self.checked = False
        self.disabled = False
        self._listeners: Dict[str, List[Callable]] = {}
        self._rect = JSObject({"left": 0.0, "top": 0.0, "width": 200.0, "height": 100.0})

    # -- className maps onto classList (app.js sets .className) --
    @property
    def className(self):
        return " ".join(self.classList._names)

    @className.setter
    def className(self, v):
        self.classList._names = [n for n in str(v).split() if n]

    # -- tree ops --
    def append(self, *kids):
        for k in kids:
            k.parentNode = self
            self.children.append(k)
        return undefined

    def replaceChildren(self, *kids):
        for c in self.children:
            c.parentNode = None
        self.children = []
        return self.append(*kids)

    # -- events --
    def addEventListener(self, evt, handler, _opts=undefined):
        self._listeners.setdefault(evt, []).append(handler)
        return undefined

    def dispatch(self, evt: str, event=None):
        """Test-side: fire listeners for ``evt`` (bubbling not modeled)."""
        if event is None:
            event = make_event(target=self)
        for h in list(self._listeners.get(evt, [])):
            h(event)
        return event

    def getBoundingClientRect(self):
        return self._rect

    def click(self):
        """Programmatic .click() like the real DOM: fires click listeners."""
        self.dispatch("click")
        return undefined

    # -- test-side helpers --
    def set_rect(self, left, top, width, height):
        self._rect = JSObject(
            {"left": float(left), "top": float(top), "width": float(width), "height": float(height)}
        )

    def query_class(self, name: str) -> List["Element"]:
        """All descendants carrying a CSS class (depth-first)."""
        out = []
        for c in self.children:
            if name in c.classList:
                out.append(c)
            out.extend(c.query_class(name))
        return out

    def __repr__(self):
        ident = f"#{self.id}" if self.id else ""
        return f"<{self.tagName.lower()}{ident} class={self.className!r}>"


class Document:
    def __init__(self):
        self._by_id: Dict[str, Element] = {}

    def createElement(self, tag):
        return Element(self, tag)

    def getElementById(self, el_id):
        return self._by_id.get(el_id)  # None == null, like the browser

    # test-side
    def register(self, el_id: str, el: Element):
        el.id = el_id
        self._by_id[el_id] = el
        return el


class Window:
    """Holds ISXLogic (set by logic.js), confirm, and window-level events."""

    def __init__(self):
        self._listeners: Dict[str, List[Callable]] = {}
        self.confirm_response = True
        self.confirm_calls: List[str] = []

    def confirm(self, message=""):
        self.confirm_calls.append(str(message))
        return self.confirm_response

    def addEventListener(self, evt, handler, _opts=undefined):
        self._listeners.setdefault(evt, []).append(handler)
        return undefined

    def dispatch(self, evt: str, event=None):
        if event is None:
            event = make_event()
        for h in list(self._listeners.get(evt, [])):
            h(event)
        return event


def make_event(**fields) -> JSObject:
    """A fake Event: carries whatever fields the test sets plus a
    ``preventDefault`` that records it was called."""
    ev = JSObject()
    calls: List[str] = []
    ev.props["preventDefault"] = lambda: calls.append("preventDefault") or undefined
    ev.props["_prevented"] = calls  # test-side: non-empty once called
    ev.props["target"] = fields.pop("target", undefined)
    for k, v in fields.items():
        ev.props[k] = float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else v
    return ev


class Response:
    """Fake fetch Response: ``ok``/``status`` plus a promise-returning
    ``json()`` like the real one (app.js awaits and .catch()es it)."""

    def __init__(self, status=200, json_body=None, raw_text=None):
        self.status = float(status)
        self.ok = 200 <= status < 300
        self._json_body = json_body
        self._raw_text = raw_text

    def json(self):
        def run():
            if self._raw_text is not None:
                try:
                    return js_from_py(_json.loads(self._raw_text))
                except ValueError as err:
                    raise JSThrow(make_error(str(err), "SyntaxError"))
            return js_from_py(self._json_body)

        return JSPromise(run)

    def text(self):
        body = self._raw_text if self._raw_text is not None else _json.dumps(self._json_body)
        return JSPromise(lambda: body)


class FetchStub:
    """Routes fetch(url, opts) to a test handler; records every call.

    The handler receives (url, method, parsed_json_body_or_None) and
    returns a Response — or raises ConnectionError to simulate a network
    failure (fetch rejects)."""

    def __init__(self, handler: Callable):
        self.handler = handler
        self.calls: List[dict] = []

    def __call__(self, url, opts=undefined):
        method = "GET"
        body = None
        if isinstance(opts, JSObject):
            method = str(opts.props.get("method", "GET"))
            raw = opts.props.get("body")
            if isinstance(raw, str):
                # JSON bodies arrive parsed (what handlers assert against);
                # non-JSON bodies (e.g. raw image bytes for /search_image)
                # pass through verbatim like a real fetch body would
                try:
                    body = _json.loads(raw)
                except ValueError:
                    body = raw
            elif raw is not undefined and raw is not None:
                body = raw  # File/Blob-like objects pass through untouched
        call = {"url": str(url), "method": method, "body": body}
        self.calls.append(call)

        def run():
            try:
                return self.handler(str(url), method, body)
            except ConnectionError as err:
                raise JSThrow(make_error(str(err) or "network error", "TypeError"))

        return JSPromise(run)


class Browser:
    """The assembled realm: document + window + fetch, with the client's
    static files executed in load order (logic.js before app.js, matching
    index.html). ``fetch_handler`` serves both files' HTTP traffic."""

    #: element ids app.js looks up; index.html must provide each (checked
    #: against the real index.html by the test suite)
    REQUIRED_IDS = (
        "grid",
        "status",
        "search-input",
        "scan-btn",
        "dup-btn",
        "remove-btn",
        "img-btn",
        "image-input",
        "modal",
        "modal-img",
    )

    def __init__(self, fetch_handler: Callable, static_dir: str):
        from tools.jsdom.interp import Interpreter

        self.document = Document()
        self.window = Window()
        self.fetch = FetchStub(fetch_handler)
        for el_id in self.REQUIRED_IDS:
            self.document.register(el_id, Element(self.document, "div"))
        self.interp = Interpreter(
            {
                "window": self.window,
                "document": self.document,
                "fetch": self.fetch,
            }
        )
        import os

        for fname in ("logic.js", "app.js"):
            with open(os.path.join(static_dir, fname)) as f:
                self.interp.run(f.read(), fname)

    # -- conveniences for tests --
    def el(self, el_id: str) -> Element:
        return self.document._by_id[el_id]

    @property
    def status_text(self) -> str:
        return self.el("status").textContent

    def grid_cards(self) -> List[Element]:
        return self.el("grid").query_class("card")

    def search(self, query: str):
        """Type a query and press Enter (header.rs:13-20 flow)."""
        inp = self.el("search-input")
        inp.value = query
        inp.dispatch("keydown", make_event(key="Enter", target=inp))

    def card_for(self, media_path: str) -> Element:
        for c in self.grid_cards():
            for ch in c.children:
                if getattr(ch, "tagName", "") == "IMG" and getattr(ch, "src", "") == media_path:
                    return c
        raise AssertionError(f"no card for {media_path}")

    def toggle_mark(self, media_path: str, checked: bool):
        card = self.card_for(media_path)
        box = next(ch for ch in card.children if getattr(ch, "type", "") == "checkbox")
        box.checked = checked
        box.dispatch("change", make_event(target=box))
        return card
