"""Executable tests for the SHIPPED client logic (client/static/logic.js).

No JS runtime exists in this sandbox (no node, no embeddable engine), so
these tests run the exact logic.js source through a strict JS-subset ->
Python translator and exercise the behaviors the reference implements in
compiled Rust: wheel-zoom clamp + cursor-anchoring (image_modal.rs:14-34),
drag panning (:36-55), click-outside/Escape close (:68), mark persistence
(image_card.rs:12-27, app.rs:24), the Enter/non-empty submit guard
(header.rs:13-20), and the search wire shapes (app.rs:26-56).

The translator is deliberately NARROW: anything outside the documented
subset raises, so a future edit that strays from the discipline fails CI
loudly instead of silently losing coverage. logic.js documents the subset.
"""

import json
import math
import os
import re

import pytest

LOGIC_PATH = os.path.join(
    os.path.dirname(__file__), "..", "image_search_tpu", "client", "static", "logic.js"
)


class JsTranslationError(Exception):
    pass


def _expr(js: str) -> str:
    """JS expression -> Python expression (strict subset)."""
    s = js
    # template literals -> f-strings
    def templ(m):
        body = m.group(1)
        if '"' in body or "'" in body:
            raise JsTranslationError(f"quotes inside template literal: {body!r}")
        return 'f"' + body.replace("${", "{") + '"'
    s = re.sub(r"`([^`]*)`", templ, s)
    # method/builtin maps (before generic member access)
    s = s.replace("Math.min", "min").replace("Math.max", "max").replace("Math.abs", "abs")
    s = s.replace("JSON.stringify", "_json_stringify")
    s = re.sub(r"([A-Za-z_]\w*(?:\[[^\]]+\])?)\.length\b", r"len(\1)", s)
    s = s.replace(".push(", ".append(")
    s = s.replace(".trim()", ".strip()")
    # arr.join(sep) -> _js_join(arr, sep)  (JS argument order is reversed)
    s = re.sub(r"([A-Za-z_]\w*(?:\[[^\]]+\])?)\.join\(", r"_js_join(\1, ", s)
    # object literal { a: x, b: y } -> {"a": x, "b": y} (keys are identifiers)
    s = re.sub(r"([{,]\s*)([A-Za-z_]\w*)\s*:", r'\1"\2":', s)
    # remaining member access obj.prop -> obj.get("prop") (JS undefined ~ None)
    s = re.sub(r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)\b(?!\s*\()", r'\1.get("\2")', s)
    if re.search(r"\.\w+\s*\(", s) and not re.search(r"\.(append|strip|get)\(", s):
        raise JsTranslationError(f"unknown method call in: {js!r}")
    # operators / keywords
    s = s.replace("===", "==").replace("!==", "!=")
    s = s.replace("&&", " and ").replace("||", " or ")
    for bad in ("=>", "function", "new ", "typeof", "++", "--"):
        if bad in s:
            raise JsTranslationError(f"outside subset ({bad!r}): {js!r}")
    if re.search(r"!(?!=)", s):  # unary not (standalone '!') is out of subset
        raise JsTranslationError(f"outside subset ('!'): {js!r}")
    s = re.sub(r"\btrue\b", "True", s)
    s = re.sub(r"\bfalse\b", "False", s)
    s = re.sub(r"\bnull\b", "None", s)
    # single ternary: cond ? a : b  ->  (a if cond else b); a '?' inside a
    # string literal is NOT a ternary (e.g. a URL query string)
    if "?" in re.sub(r'"[^"]*"|\'[^\']*\'', "", s):
        m = re.match(r"^([^?]+)\?([^:?]+):([^:?]+)$", s)
        if not m:
            raise JsTranslationError(f"unsupported ternary: {js!r}")
        cond, a, b = m.groups()
        s = f"(({a.strip()}) if ({cond.strip()}) else ({b.strip()}))"
    return s


def translate(src: str) -> str:
    """logic.js source -> executable Python source."""
    out = ["def _json_stringify(x):", "    return json.dumps(x)", ""]
    depth = 0
    in_export = False
    declared: set = set()  # let/const/params/loop vars of the current function
    for raw in src.splitlines():
        line = raw.split("//")[0].rstrip()
        if not line.strip():
            continue
        stripped = line.strip()
        if stripped.startswith("/*"):
            in_export = True  # everything after the EXPORT marker is browser-only
        if in_export:
            continue
        indent = "    " * depth

        m = re.match(r"^function\s+([A-Za-z_]\w*)\s*\(([^)]*)\)\s*\{$", stripped)
        if m:
            out.append(f"def {m.group(1)}({m.group(2)}):")
            declared = {a.strip() for a in m.group(2).split(",") if a.strip()}
            depth += 1
            continue
        m = re.match(r"^for \(let (\w+) = 0; \1 < (\w+)\.length; \1\+\+\) \{$", stripped)
        if m:
            out.append(f"{indent}for {m.group(1)} in range(len({m.group(2)})):")
            declared.add(m.group(1))
            depth += 1
            continue
        m = re.match(r"^if \((.*)\) \{$", stripped)
        if m:
            out.append(f"{indent}if {_expr(m.group(1))}:")
            depth += 1
            continue
        if stripped == "} else {":
            out.append("    " * (depth - 1) + "else:")
            continue
        m = re.match(r"^\} else if \((.*)\) \{$", stripped)
        if m:
            out.append("    " * (depth - 1) + f"elif {_expr(m.group(1))}:")
            continue
        if stripped in ("}", "};"):
            depth -= 1
            if depth < 0:
                raise JsTranslationError("unbalanced braces")
            continue
        # multi-line object literal continuation lines (inside return {...})
        if stripped.startswith("return {"):
            # gather until the closing '};' into one expression
            out.append(f"{indent}return __OBJ__")
            out.append(f"{indent}# OBJ-START")
            depth += 1
            continue
        m = re.match(r"^(const|let)\s+(\w+)\s*=\s*(.*);$", stripped)
        if m:
            declared.add(m.group(2))
            out.append(f"{indent}{m.group(2)} = {_expr(m.group(3))}")
            continue
        # bare reassignment: only to names DECLARED in this function — a
        # typo'd identifier would be a silent sloppy-mode global in the
        # browser, so the translator rejects it instead of passing CI
        m = re.match(r"^(\w+)\s*=\s*(.*);$", stripped)
        if m:
            if m.group(1) not in declared:
                raise JsTranslationError(
                    f"assignment to undeclared name {m.group(1)!r}: {stripped!r}"
                )
            out.append(f"{indent}{m.group(1)} = {_expr(m.group(2))}")
            continue
        m = re.match(r"^return (.*);$", stripped)
        if m:
            out.append(f"{indent}return {_expr(m.group(1))}")
            continue
        m = re.match(r"^(\w+(?:\[[^\]]+\])?)\.push\((.*)\);$", stripped)
        if m:
            out.append(f"{indent}{m.group(1)}.append({_expr(m.group(2))})")
            continue
        # bare object-literal member line inside a return { ... } block
        m = re.match(r"^([A-Za-z_]\w*)\s*:\s*(.*?),?$", stripped)
        if m and out and "# OBJ-START" in "\n".join(out[-6:]):
            out.append(f"{indent}# OBJ {m.group(1)} = {_expr(m.group(2))}")
            continue
        raise JsTranslationError(f"line outside subset: {stripped!r}")
    if depth != 0:
        raise JsTranslationError("unbalanced braces at EOF")

    # resolve multi-line `return { ... }` blocks collected as comments
    resolved, i = [], 0
    lines = out
    while i < len(lines):
        ln = lines[i]
        if ln.strip() == "# OBJ-START":
            items = []
            j = i + 1
            while j < len(lines) and lines[j].strip().startswith("# OBJ "):
                body = lines[j].strip()[len("# OBJ ") :]
                k, v = body.split(" = ", 1)
                items.append(f'"{k}": {v}')
                j += 1
            obj = "{" + ", ".join(items) + "}"
            # patch the `return __OBJ__` line just above
            for b in range(len(resolved) - 1, -1, -1):
                if resolved[b].strip() == "return __OBJ__":
                    resolved[b] = resolved[b].replace("__OBJ__", obj)
                    break
            i = j
        else:
            resolved.append(ln)
            i += 1
    return "\n".join(resolved)


@pytest.fixture(scope="module")
def L():
    with open(LOGIC_PATH) as f:
        src = f.read()
    py = translate(src)
    import urllib.parse

    ns = {
        "json": json, "math": math, "min": min, "max": max, "abs": abs,
        "len": len,
        "_js_join": lambda arr, sep: sep.join(str(x) for x in arr),
        # JS leaves A-Za-z0-9 -_.!~*'() unescaped
        "encodeURIComponent": lambda s: urllib.parse.quote(
            str(s), safe="!'()*-._~"
        ),
    }
    exec(compile(py, "logic.js", "exec"), ns)
    return ns


def test_zoom_clamps_to_bounds(L):
    z, px, py_ = 1.0, 0.0, 0.0
    for _ in range(40):  # way past 5.0
        r = L["wheelZoom"](z, px, py_, -1, 10, 10)
        z, px, py_ = r["zoom"], r["panX"], r["panY"]
    assert z == 5.0
    for _ in range(80):
        r = L["wheelZoom"](z, px, py_, +1, 10, 10)
        z, px, py_ = r["zoom"], r["panX"], r["panY"]
    assert z == 0.5  # image_modal.rs clamp [0.5, 5.0]


def test_zoom_anchors_cursor_point(L):
    """The image point under the cursor stays fixed on screen: the cursor's
    offset from the image center scales by k while the pan absorbs exactly
    the difference."""
    z, px, py_ = 1.3, 24.0, -8.0
    cx, cy = 57.0, -31.0
    r = L["wheelZoom"](z, px, py_, -1, cx, cy)
    k = r["zoom"] / z
    # new screen offset of the old cursor point = cx*k + (pan delta) == cx
    assert abs(cx * k + (r["panX"] - px) - cx) < 1e-9
    assert abs(cy * k + (r["panY"] - py_) - cy) < 1e-9


def test_pan_accumulates_drag_deltas(L):
    st = {"panX": 0.0, "panY": 0.0, "lastX": 100.0, "lastY": 100.0}
    for (mx, my) in [(110, 95), (130, 90), (125, 120)]:
        st = L["panMove"](st["panX"], st["panY"], st["lastX"], st["lastY"], mx, my)
    assert (st["panX"], st["panY"]) == (25.0, 20.0)  # total mouse travel
    assert (st["lastX"], st["lastY"]) == (125, 120)


def test_transform_string(L):
    assert L["transformOf"](2, 10, -5) == "translate(10px, -5px) scale(2)"


def test_mark_persistence_and_toggle(L):
    marked = []
    marked = L["toggleMark"](marked, "media/a.jpg", True)
    marked = L["toggleMark"](marked, "media/b.jpg", True)
    assert marked == ["media/a.jpg", "media/b.jpg"]
    # marks persist across rounds until un-checked (app.rs:24)
    marked = L["toggleMark"](marked, "media/a.jpg", False)
    assert marked == ["media/b.jpg"]
    # re-marking is idempotent (no duplicates)
    marked = L["toggleMark"](marked, "media/b.jpg", True)
    assert marked == ["media/b.jpg"]


def test_submit_guard(L):
    assert L["shouldSearch"]("Enter", "cat")
    assert not L["shouldSearch"]("Enter", "   ")  # non-empty guard header.rs:14
    assert not L["shouldSearch"]("a", "cat")


def test_search_body_wire_shape(L):
    body = json.loads(L["searchBody"]("dog", ["media/x.png"]))
    assert body == {"q": "dog", "referenced_images": ["media/x.png"]}


def test_results_of_tolerates_missing_field(L):
    assert L["resultsOf"]({"images": [{"id": "1"}]}) == [{"id": "1"}]
    assert L["resultsOf"]({}) == []


def test_scan_status_text(L):
    s = L["scanStatusText"](
        {"embedded": 3, "skipped_existing": 1, "decode_failures": 0, "seconds": 2.5}
    )
    assert s == "scan done: 3 new, 1 known, 0 failed (2.5s)"
    assert L["scanStatusText"](None) == "scan done"


def test_modal_close_conditions(L):
    assert L["shouldCloseModal"](True, "")       # click on backdrop
    assert L["shouldCloseModal"](False, "Escape")
    assert not L["shouldCloseModal"](False, "a")


def test_app_js_wiring_consistency():
    """app.js only calls ISXLogic functions logic.js actually exports, and
    index.html loads logic.js BEFORE app.js (no browser exists in this
    sandbox, so wiring drift must be caught statically)."""
    static = os.path.dirname(LOGIC_PATH)
    with open(os.path.join(static, "app.js")) as f:
        app = f.read()
    with open(LOGIC_PATH) as f:
        logic = f.read()
    with open(os.path.join(static, "index.html")) as f:
        html = f.read()
    exported = set(re.findall(r"^function\s+(\w+)", logic, re.M))
    used = set(re.findall(r"\bL\.(\w+)\(", app))
    assert used, "app.js no longer routes through ISXLogic"
    assert used <= exported, f"app.js calls unexported logic: {used - exported}"
    assert html.index("logic.js") < html.index("app.js")


def test_remove_body_wire_shape(L):
    assert json.loads(L["removeBody"](["media/a.jpg", "media/b.jpg"])) == {
        "images": ["media/a.jpg", "media/b.jpg"]
    }


def test_after_removal_drops_deleted_results(L):
    results = [
        {"id": "1", "image_path": "media/a.jpg", "score": 0.9},
        {"id": "2", "image_path": "media/b.jpg", "score": 0.8},
        {"id": "3", "image_path": "media/c.jpg", "score": 0.7},
    ]
    out = L["afterRemoval"](results, ["media/b.jpg"])
    assert [r["image_path"] for r in out] == ["media/a.jpg", "media/c.jpg"]
    assert L["afterRemoval"](results, []) == results
    assert L["afterRemoval"]([], ["media/a.jpg"]) == []


def test_removed_status_text(L):
    assert L["removedStatusText"]({"removed": 3}) == "removed 3 images"
    assert L["removedStatusText"](None) == "removed"


def test_duplicate_groups_tolerate_missing_field(L):
    assert L["duplicateGroupsOf"]({"groups": [["media/a.jpg", "media/b.jpg"]]}) == [
        ["media/a.jpg", "media/b.jpg"]
    ]
    assert L["duplicateGroupsOf"]({}) == []
    assert L["dupStatusText"]([[1, 2], [3, 4]]) == "2 duplicate groups"


def test_visible_marked_protects_offscreen_feedback_marks(L):
    results = [{"id": "1", "image_path": "media/a.jpg", "score": 0.9}]
    marked = ["media/offscreen.jpg", "media/a.jpg"]
    assert L["visibleMarked"](marked, results) == ["media/a.jpg"]
    assert L["visibleMarked"](marked, []) == []
    assert L["visibleMarked"]([], results) == []


def test_groups_after_removal_keeps_layout_and_prunes_singletons(L):
    groups = [
        ["media/a.jpg", "media/b.jpg", "media/c.jpg"],
        ["media/d.jpg", "media/e.jpg"],
    ]
    out = L["groupsAfterRemoval"](groups, ["media/b.jpg", "media/e.jpg"])
    # group 1 keeps its 2 survivors; group 2 shrank below 2 -> gone
    assert out == [["media/a.jpg", "media/c.jpg"]]
    assert L["groupsAfterRemoval"](groups, []) == groups


def test_translator_rejects_undeclared_assignment():
    src = "function f(a) {\n  typoed = 1;\n  return a;\n}\n"
    with pytest.raises(JsTranslationError, match="undeclared"):
        translate(src)


def test_image_search_url_carries_marks_encoded(L):
    """Marks ride /search_image as repeatable ?ref= params, urlencoded —
    the server decodes them and runs the Rocchio feedback round on the
    image query (uniform with /search's referenced_images)."""
    assert L["imageSearchUrl"]([]) == "/search_image"
    assert L["imageSearchUrl"](["media/a.jpg"]) == "/search_image?ref=media%2Fa.jpg"
    assert (
        L["imageSearchUrl"](["media/a b.jpg", "media/c&d.png"])
        == "/search_image?ref=media%2Fa%20b.jpg&ref=media%2Fc%26d.png"
    )


def test_picked_query_file(L):
    f = {"name": "q.jpg", "type": "image/jpeg"}
    assert L["pickedQueryFile"]([f, {"name": "b.png"}]) is f
    assert L["pickedQueryFile"]([]) is None
    assert L["pickedQueryFile"](None) is None
