"""Rule loading from files/directories (K6; rule.clj:45-65, utils.clj:143-203).

The reference reads rule maps with the Clojure reader from a file, a
directory, or the classpath. Here the serialized format is JSON — one rule
object or an array of rule objects per `*.json` file — so rule sets can ship
to a cluster alongside the job (spark-submit --files) without code.

JSON cannot distinguish the engine's list-vs-tuple path convention
(plans/compiler.py: Python list = path modifier, tuple = combinator), so the
loader canonicalizes:
  * clauses -> tuples; [":optional", ...] / [":union", ...] / filter-op
    heads -> combinator tuples (filter sub-expressions recursively);
  * predicate position: [":or", ...] / [":inverse", x] -> tuples;
    ["p", "*"|"+"|"?"|n|null ...] -> modifier list; any other array -> a
    sequence tuple;
  * boxed literals (["Bob"], ["Bob","en"], [40,"xsd/integer"]) stay lists;
  * reify specs: {"var": ..., "ln": ["md5", "?/a"], ...} with the ln array
    -> tuple. Callable (:fn) reifiers are code, not data — they cannot
    appear in rule files (same restriction as the reference's non-eval
    reader path, utils.clj:160-171).
"""

from __future__ import annotations

import json
import os

from kr_spark.plans.filters import FILTER_OPS

_MODS = ("*", "+", "?")


def _is_mod(x) -> bool:
    return x in _MODS or x is None or isinstance(x, int)


def _fix_path(p):
    if not isinstance(p, list):
        return p
    if not p:
        raise ValueError("empty path spec")
    if p[0] == ":or":
        return (":or", *[_fix_path(x) for x in p[1:]])
    if p[0] == ":inverse":
        return (":inverse", _fix_path(p[1]))
    if len(p) >= 2 and all(_is_mod(m) for m in p[1:]):
        return [_fix_path(p[0])] + list(p[1:])
    return tuple(_fix_path(x) for x in p)


def _fix_filter(e):
    if isinstance(e, list) and e and isinstance(e[0], str) and e[0] in FILTER_OPS:
        return tuple(_fix_filter(x) for x in e)
    return e  # terms, vars, boxed literals stay as-is


def _fix_clause(c):
    if not isinstance(c, list) or not c:
        return c
    head = c[0]
    if head == ":optional":
        return (":optional", *[_fix_clause(x) for x in c[1:]])
    if head == ":union":
        return (":union", *[[_fix_clause(y) for y in branch] for branch in c[1:]])
    if isinstance(head, str) and head in FILTER_OPS:
        return _fix_filter(c)
    if isinstance(head, list):  # nested group
        return [_fix_clause(x) for x in c]
    if len(c) in (3, 4):
        s, p, o = c[0], _fix_path(c[1]), c[2]
        return (s, p, o) if len(c) == 3 else (s, p, o, c[3])
    raise ValueError(f"unrecognized rule clause {c!r}")


def _fix_reify(spec):
    if isinstance(spec, str):
        return spec
    out = dict(spec)
    ln = out.get("ln")
    if isinstance(ln, list):
        out["ln"] = tuple(ln)
    return out


def canonicalize_rule(rule: dict) -> dict:
    out = dict(rule)
    if "body" in out:
        out["body"] = [_fix_clause(c) for c in out["body"]]
    if "head" in out:
        out["head"] = [_fix_clause(c) for c in out["head"]]
    if "reify" in out:
        out["reify"] = [_fix_reify(s) for s in out["reify"]]
    return out


def rules_from_json(text: str) -> list[dict]:
    data = json.loads(text)
    if isinstance(data, dict):
        data = [data]
    return [canonicalize_rule(r) for r in data]


def load_rule_file(path: str) -> list[dict]:
    with open(path) as f:
        return rules_from_json(f.read())


def load_rules(path: str) -> list[dict]:
    """File or directory (sorted *.json, recursing one level like the
    reference's directory reader) -> rule list."""
    if os.path.isdir(path):
        out: list[dict] = []
        for name in sorted(os.listdir(path)):
            full = os.path.join(path, name)
            if name.endswith(".json") and os.path.isfile(full):
                out.extend(load_rule_file(full))
        return out
    return load_rule_file(path)


def dump_rule_json(rule: dict) -> str:
    """Inverse of canonicalize_rule for round-tripping rule sets to disk
    (tuples serialize as JSON arrays; canonicalize restores them on load)."""

    def enc(x):
        if isinstance(x, tuple):
            return [enc(e) for e in x]
        if isinstance(x, list):
            return [enc(e) for e in x]
        if isinstance(x, dict):
            return {k: enc(v) for k, v in x.items()}
        return x

    return json.dumps(enc(rule), indent=2)
