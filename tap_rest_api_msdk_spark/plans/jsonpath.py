"""Driver-side JSONPath evaluator — the subset the reference actually uses.

The reference extracts tokens/records with ``singer_sdk.helpers.jsonpath.
extract_jsonpath`` (jsonpath_ng.ext) — see pagination.py:37 and
streams.py:576-586 — and its README documents these shapes:

* dotted fields                      ``$.metadata.resultset``
* bracket-quoted fields              ``$['@odata.nextLink']``
* wildcards / indexes                ``$.entry[*].resource``, ``$.a[0]``
* filter predicates                  ``$.link[?(@.relation=='next')].url``
* the ``split`` extension            ``$.link[?(...)].url.`split(?, 1, 1)```
  (README.md:379-385; splits the matched string and takes a segment)

This module evaluates exactly that grammar over plain dicts/lists with no
dependencies, so the offset planner (control plane) and the pandas-UDF
record-extraction fallback (data plane) share one implementation.
``find_all`` mirrors ``extract_jsonpath`` (every match, in document
order); ``find_first`` mirrors the reference's ``next(iter(...), None)``.

Unsupported syntax raises ``ValueError`` at parse time — a config carrying
jsonpath beyond this grammar fails loudly, never silently mis-extracts.
"""

from __future__ import annotations

import re
from typing import Any, Callable, List

_TOKEN = re.compile(
    r"""
      \.?\`split\((?P<sc>[^,)]*),\s*(?P<sseg>-?\d+),\s*(?P<smax>-?\d+)\)\`
    | \.(?P<field>[A-Za-z0-9_@\-]+)
    | \['(?P<qfield>[^']+)'\]
    | \["(?P<dqfield>[^"]+)"\]
    | \[\*\]
    | \[(?P<index>-?\d+)\]
    | \[\?\(\s*@\.(?P<ppath>[A-Za-z0-9_.@\-]+)\s*(?P<pop>==|!=|>=|<=|>|<)\s*
        (?P<pval>'[^']*'|"[^"]*"|-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|true|false|null)\s*\)\]
    """,
    re.X,
)

_OPS: dict[str, Callable[[Any, Any], bool]] = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">=": lambda a, b: a >= b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
}


def _literal(text: str) -> Any:
    if text[:1] in ("'", '"'):
        return text[1:-1]
    if text == "true":
        return True
    if text == "false":
        return False
    if text == "null":
        return None
    try:
        # int first; exponent forms like 1e5 (valid jsonpath_ng literals)
        # are not int()-parseable — fall through to float
        return float(text) if "." in text else int(text)
    except ValueError:
        try:
            return float(text)
        except ValueError:
            raise ValueError(f"unsupported jsonpath syntax: literal {text!r}")


def _dotted_get(obj: Any, parts: List[str]) -> Any:
    for p in parts:
        if isinstance(obj, dict) and p in obj:
            obj = obj[p]
        else:
            return _MISSING
    return obj


_MISSING = object()


def parse(path: str) -> List[Callable[[list], list]]:
    """Compile a jsonpath string into a list of node-set transforms."""
    s = path.strip()
    if s.startswith("$"):
        s = s[1:]
    # normalize: a bare leading field ("a.b") gets its dot back; a trailing
    # dot (present in the reference README's own example) is tolerated
    if s and not s.startswith((".", "[", "`")):
        s = "." + s
    if s.endswith(".") and not s.endswith("`."):
        s = s[:-1]

    steps: List[Callable[[list], list]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            raise ValueError(f"unsupported jsonpath syntax at {s[pos:]!r} in {path!r}")
        pos = m.end()
        g = m.groupdict()
        if g["field"] or g["qfield"] or g["dqfield"]:
            name = g["field"] or g["qfield"] or g["dqfield"]

            def step(nodes, name=name):
                return [n[name] for n in nodes if isinstance(n, dict) and name in n]

        elif g["index"] is not None:
            idx = int(g["index"])

            def step(nodes, idx=idx):
                out = []
                for n in nodes:
                    if isinstance(n, list) and -len(n) <= idx < len(n):
                        out.append(n[idx])
                return out

        elif g["ppath"]:
            parts = g["ppath"].split(".")
            op = _OPS[g["pop"]]
            val = _literal(g["pval"])

            def step(nodes, parts=parts, op=op, val=val):
                # jsonpath_ng parity: filters apply to LIST elements only
                # (a bare dict never matches — verified against the lib)
                out = []
                for n in nodes:
                    if not isinstance(n, list):
                        continue
                    for el in n:
                        got = _dotted_get(el, parts)
                        if got is _MISSING:
                            continue
                        try:
                            if op(got, val):
                                out.append(el)
                        except TypeError:
                            continue
                return out

        elif g["sc"] is not None:
            char, seg, mx = g["sc"], int(g["sseg"]), int(g["smax"])

            def step(nodes, char=char, seg=seg, mx=mx):
                out = []
                for n in nodes:
                    if isinstance(n, str):
                        parts = n.split(char, mx) if mx >= 0 else n.split(char)
                        if -len(parts) <= seg < len(parts):
                            out.append(parts[seg])
                return out

        else:  # [*]

            def step(nodes):
                # jsonpath_ng parity: a wildcard over a LIST yields its
                # elements; over any other non-null value it yields the
                # value ITSELF (so the reference's default records_path
                # "$[*]" on a bare-object response emits one record — the
                # lib's actual behavior, verified in tests)
                out = []
                for n in nodes:
                    if isinstance(n, list):
                        out.extend(n)
                    elif n is not None:
                        out.append(n)
                return out

        steps.append(step)
    return steps


def find_all(path: str, obj: Any) -> list:
    """Every match, document order (``extract_jsonpath`` parity)."""
    nodes = [obj]
    for step in parse(path):
        nodes = step(nodes)
    return nodes


def find_first(path: str, obj: Any) -> Any:
    """First match or None (``next(extract_jsonpath(...), None)`` parity)."""
    matches = find_all(path, obj)
    return matches[0] if matches else None
