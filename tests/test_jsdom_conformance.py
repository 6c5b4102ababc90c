"""Independent conformance suite for the vendored mini-JS interpreter
(tools/jsdom/interp.py) — round-3 verdict item #4.

The interpreter is load-bearing CI infrastructure: it executes the SHIPPED
client (app.js + logic.js) in tests/test_client_dom.py, standing in for the
reference's compiled, type-checked Rust/WASM client
(/root/reference/client/src/app.rs:26-56). Until now its own semantics were
validated only by the client tests it hosts — a silent evaluator bug
(precedence, coercion, closure capture) could pass a buggy client.

This file pins the semantics against hand-verified expected outputs that do
NOT involve the client: each fixture is a tiny JS program whose `emit(...)`
calls must produce an exact Python value sequence. Expected values are real
JavaScript semantics, except where the interpreter documents an intentional
divergence (synchronous promises: every `await` resolves immediately — see
the interp.py module doc; those cases pin the DOCUMENTED contract, marked
`# sync-await contract` below).

A mutation check at the bottom proves the suite has teeth: deliberately
breaking one evaluator primitive makes conformance cases fail without any
client involvement.
"""

import math

import pytest

from tools.jsdom import interp as I
from tools.jsdom.interp import Interpreter, JSSyntaxError, JSThrow, py_from_js


def run(src: str):
    """Execute `src`; return the list of py-converted emit() arguments."""
    out = []

    def emit(*args):
        out.append(
            py_from_js(args[0]) if len(args) == 1
            else tuple(py_from_js(a) for a in args)
        )

    it = Interpreter({"emit": emit})
    it.run(src, "<conformance>")
    return out


# Every case: (name, source, expected emits). Hand-verified against real JS
# (node) semantics by construction; numbers come back as Python floats/ints
# (strict_eq treats them uniformly), so expectations use == over floats.
CASES = [
    # -- operator precedence and associativity --------------------------------
    ("mul_over_add", "emit(2 + 3 * 4); emit((2 + 3) * 4);", [14, 20]),
    ("div_mod_left_assoc", "emit(20 / 4 / 5); emit(17 % 12 % 10);", [1, 5]),
    ("sub_left_assoc", "emit(10 - 3 - 2);", [5]),
    ("unary_binds_tighter", "emit(-2 + 5); emit(!false && true);", [3, True]),
    ("relational_over_equality", "emit(1 < 2 === true);", [True]),
    ("and_over_or", "emit(true || false && false);", [True]),
    ("or_returns_operand", 'emit("" || "fallback"); emit("x" || "y");',
     ["fallback", "x"]),
    ("and_returns_operand", 'emit("a" && "b"); emit(0 && "b");', ["b", 0]),
    ("ternary_right_assoc", 'emit(0 ? "a" : 1 ? "b" : "c");', ["b"]),
    ("ternary_lower_than_or", 'emit(false || true ? "t" : "f");', ["t"]),
    ("assign_is_expression", "let a; let b = (a = 5) + 1; emit(a); emit(b);",
     [5, 6]),
    ("postfix_returns_old", "let i = 7; emit(i++); emit(i); emit(i--); emit(i);",
     [7, 8, 8, 7]),
    ("compound_assign", "let x = 4; x += 3; emit(x); x -= 2; emit(x);", [7, 5]),
    # -- coercion and truthiness ----------------------------------------------
    ("string_concat_left_to_right", 'emit("x" + 1 + 2); emit(1 + 2 + "x");',
     ["x12", "3x"]),
    ("number_string_concat", 'emit(1.5 + ""); emit(3 + "");', ["1.5", "3"]),
    ("truthiness_table",
     'emit(!!""); emit(!!"0"); emit(!!0); emit(!!1); emit(!!null);'
     "emit(!!undefined); emit(!!NaN); emit(!![]); emit(!!{});",
     [False, True, False, True, False, False, False, True, True]),
    ("typeof_table",
     "emit(typeof 1); emit(typeof 'a'); emit(typeof true);"
     "emit(typeof undefined); emit(typeof null); emit(typeof {});"
     "emit(typeof []); emit(typeof (() => 1));",
     ["number", "string", "boolean", "undefined", "object", "object",
      "object", "function"]),
    ("strict_eq_no_coercion",
     'emit(1 === "1"); emit(0 === false); emit(null === undefined);'
     "emit(NaN === NaN); emit(1 !== true);",
     [False, False, False, False, True]),
    ("array_object_identity",
     "const a = [1]; const b = [1]; emit(a === b); emit(a === a);",
     [False, True]),
    # -- closures and scoping -------------------------------------------------
    ("closure_counter",
     "function mk() { let n = 0; return () => { n++; return n; }; }"
     "const c = mk(); const d = mk(); emit(c()); emit(c()); emit(d());",
     [1, 2, 1]),
    ("let_per_iteration_capture",  # the classic for-let pitfall
     "const fs = []; for (let i = 0; i < 3; i++) { fs.push(() => i); }"
     "emit(fs.map(f => f()));",
     [[0, 1, 2]]),
    ("var_shared_capture",
     "const fs = []; for (var j = 0; j < 3; j++) { fs.push(() => j); }"
     "emit(fs.map(f => f()));",
     [[3, 3, 3]]),
    ("forof_per_iteration_capture",
     "const fs = []; for (const v of [10, 20]) { fs.push(() => v); }"
     "emit(fs.map(f => f()));",
     [[10, 20]]),
    ("block_shadowing",
     "let x = 1; { let x = 2; emit(x); } emit(x);", [2, 1]),
    ("inner_assign_outer",
     "let x = 1; function f() { x = 9; } f(); emit(x);", [9]),
    ("hoisted_function_decls",
     "emit(later()); function later() { return 42; }", [42]),
    ("arg_binding_not_aliased",
     "function f(a) { a = a + 1; return a; } let v = 1; emit(f(v)); emit(v);",
     [2, 1]),
    # -- template literals ----------------------------------------------------
    ("template_basic", "const n = 2; emit(`a${n + 1}b${'c'}`);", ["a3bc"]),
    ("template_number_format", "emit(`${1.0}|${1.5}|${-0.25}`);",
     ["1|1.5|-0.25"]),
    ("template_stringify_values",
     "emit(`${null}|${undefined}|${true}|${[1,2]}`);",
     ["null|undefined|true|1,2"]),
    ("template_nested_expr", "emit(`${`in${2}`}out`);", ["in2out"]),
    # -- control flow ---------------------------------------------------------
    ("ifelse_chain",
     "function g(n) { if (n > 1) { return 'big'; } else if (n === 1) "
     "{ return 'one'; } else { return 'small'; } }"
     "emit(g(5)); emit(g(1)); emit(g(0));",
     ["big", "one", "small"]),
    ("while_loop", "let s = 0; let i = 0; while (i < 4) { s += i; i++; } emit(s);",
     [6]),
    ("forof_over_string_chars",
     "const cs = []; for (const ch of 'ab') { cs.push(ch); } emit(cs);",
     [["a", "b"]]),
    ("throw_try_catch_finally",
     "const log = [];"
     "try { log.push('t'); throw new Error('boom'); }"
     "catch (e) { log.push('c:' + e.message); }"
     "finally { log.push('f'); }"
     "emit(log);",
     [["t", "c:boom", "f"]]),
    ("finally_runs_on_return",
     "const log = []; function f() { try { return 'r'; } finally "
     "{ log.push('fin'); } } emit(f()); emit(log);",
     ["r", ["fin"]]),
    ("catch_binds_thrown_value",
     "try { throw new TypeError('tt'); } catch (err) "
     "{ emit(typeof err.message); emit(err.message); }",
     ["string", "tt"]),
    # -- async/await: the documented synchronous-promise contract -------------
    ("sync_await_contract",  # sync-await contract (interp.py module doc)
     "const log = []; async function f() { log.push('in'); return 5; }"
     "async function g() { const v = await f(); log.push('got' + v); }"
     "g(); log.push('after'); emit(log);",
     [["in", "got5", "after"]]),
    ("await_rejection_becomes_throw",
     "async function bad() { throw new Error('nope'); }"
     "async function main() { try { await bad(); emit('no'); } "
     "catch (e) { emit('caught:' + e.message); } finally { emit('fin'); } }"
     "main();",
     ["caught:nope", "fin"]),
    # -- array methods the client leans on ------------------------------------
    ("array_map_filter_chain",
     "emit([1, 2, 3, 4].filter(x => x % 2 === 0).map(x => x * 10));",
     [[20, 40]]),
    ("array_push_returns_length",
     "const a = [1]; emit(a.push(2)); emit(a);", [2, [1, 2]]),
    ("array_indexof_includes",
     "const a = ['p', 'q']; emit(a.indexOf('q')); emit(a.indexOf('z'));"
     "emit(a.includes('p')); emit(a.includes('z'));",
     [1, -1, True, False]),
    ("array_splice_removes",
     "const a = [1, 2, 3, 4]; const cut = a.splice(1, 2); emit(cut); emit(a);",
     [[2, 3], [1, 4]]),
    ("array_slice_join",
     "emit([1, 2, 3].slice(1)); emit(['a', 'b'].join('-'));",
     [[2, 3], "a-b"]),
    ("array_foreach_with_index",
     "const out = []; ['x', 'y'].forEach((v, i) => out.push(i + v)); emit(out);",
     [["0x", "1y"]]),
    ("array_spread_concat",
     "const a = [1, 2]; const b = [0, ...a, 3]; emit(b);", [[0, 1, 2, 3]]),
    ("array_length_prop", "emit([].length); emit([7, 8].length);", [0, 2]),
    # -- string methods --------------------------------------------------------
    ("string_methods",
     "emit(' hi '.trim()); emit('Media/P.JPG'.toLowerCase());"
     "emit('media/x'.startsWith('media/')); emit('a,b,c'.split(','));"
     "emit('a-b-a'.replace('a', 'z'));",
     ["hi", "media/p.jpg", True, ["a", "b", "c"], "z-b-a"]),
    ("string_index_and_slice",
     "emit('abcdef'.slice(2, 4)); emit('abc'[1]); emit('abc'.length);",
     ["cd", "b", 3]),
    ("encode_decode_uri",
     "emit(encodeURIComponent('media/a b.jpg'));"
     "emit(decodeURIComponent('media%2Fp.jpg'));",
     ["media%2Fa%20b.jpg", "media/p.jpg"]),
    # -- objects ---------------------------------------------------------------
    ("object_literals_shorthand",
     "const q = 'dog'; const o = { q, k: 2, 'lit': 3 };"
     "emit(o.q); emit(o.k); emit(o['lit']);",
     ["dog", 2, 3]),
    ("object_mutation_and_missing",
     "const o = {}; o.a = 1; emit(o.a); emit(o.b === undefined);",
     [1, True]),
    ("object_keys_values",
     "const o = { x: 1, y: 2 }; emit(Object.keys(o)); emit(Object.values(o));",
     [["x", "y"], [1, 2]]),
    ("json_roundtrip",
     "const s = JSON.stringify({ q: 'a', referenced_images: ['m/1.jpg'] });"
     "const o = JSON.parse(s); emit(o.q); emit(o.referenced_images[0]);",
     ["a", "m/1.jpg"]),
    # -- math / numbers --------------------------------------------------------
    ("math_min_max_clamp",
     "emit(Math.min(5, Math.max(0.5, 9))); emit(Math.max(-1, -5));",
     [5, -1]),
    ("number_parsing",
     "emit(parseFloat('2.5px' === '2.5px' ? '2.5' : '0')); emit(parseInt('42'));",
     [2.5, 42]),
    ("float_arithmetic", "emit(0.1 + 0.2 < 0.30000000001);", [True]),
]


@pytest.mark.parametrize("name,src,want", CASES, ids=[c[0] for c in CASES])
def test_conformance(name, src, want):
    got = run(src)
    assert got == want, f"{name}: {got!r} != {want!r}"


def test_nan_compares_unequal_everywhere():
    got = run("emit(NaN < 1); emit(NaN > 1); emit(NaN === NaN);")
    assert got == [False, False, False]
    assert math.isnan(run("emit(0 / 0);")[0])


def test_loose_equality_is_a_loud_parse_error():
    """`==`/`!=` coercion is unimplemented; using them must fail at parse
    time, never silently run as strict equality."""
    for src in ("emit(1 == '1');", "emit(1 != 2);"):
        with pytest.raises(JSSyntaxError):
            run(src)


def test_unsupported_syntax_fails_loudly():
    for src in ("class A {}", "emit(a?.b);", "label: emit(1);"):
        with pytest.raises((JSSyntaxError, JSThrow)):
            run(src)


def test_undeclared_variable_is_reference_error():
    with pytest.raises(JSThrow):
        run("emit(not_declared_anywhere);")


# -- mutation check: prove this suite catches evaluator bugs -----------------


def _count_failures():
    fails = 0
    for _name, src, want in CASES:
        try:
            if run(src) != want:
                fails += 1
        except Exception:
            fails += 1
    return fails


def test_mutation_check_suite_has_teeth(monkeypatch):
    """Deliberately break ONE evaluator primitive at a time; the corpus must
    fail without any client involvement (the property round-3 verdict #4
    demanded). Also re-establishes that the unmutated suite is clean."""
    assert _count_failures() == 0

    # mutation 1: Python truthiness instead of JS (NaN/objects differ)
    monkeypatch.setattr(I, "js_truthy", lambda v: bool(v))
    assert _count_failures() > 0
    monkeypatch.undo()

    # mutation 2: Python str() instead of js_str (1.0 -> "1.0", None -> "None")
    monkeypatch.setattr(I, "js_str", lambda v: str(v))
    assert _count_failures() > 0
    monkeypatch.undo()

    # mutation 3: shared (var-style) binding for `let` loop variables — the
    # exact capture bug class the client's per-card handlers would hit
    real_exec = Interpreter.exec_stmt

    def no_per_iter(self, s, env):
        # the loop reads its init declarator's keyword directly, so the
        # mutation must rewrite the `for` node itself
        if s[0] == "for" and s[1] is not None and s[1][0] == "vardecl":
            s = ("for", ("vardecl", "var", s[1][2]), s[2], s[3], s[4])
        return real_exec(self, s, env)

    monkeypatch.setattr(Interpreter, "exec_stmt", no_per_iter)
    assert _count_failures() > 0
