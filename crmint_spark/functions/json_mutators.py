"""BigQuery JSON mutator functions: JSON_SET / JSON_REMOVE /
JSON_ARRAY_APPEND / JSON_ARRAY_INSERT / JSON_STRIP_NULLS.

The engine's JSON type is the JSON text itself (dialect.py strips the
typed literal), and these functions take arbitrary JSONPaths — neither
is expressible with Spark builtins, so they run as Arrow-vectorized
Python UDFs (registered in functions.register_engine_udfs; the
dialect's scalar pass rewrites the calls, nesting multi-pair forms
left-to-right exactly as BigQuery applies them).

JSONPath subset: ``$``, ``.key``, ``."quoted key"``, ``[index]`` —
BigQuery's documented JSON_SET path grammar. Lax semantics mirrored:
JSON_SET creates missing object keys and pads arrays with nulls up to
the index; JSON_REMOVE of a missing path is a no-op (removing ``$``
errors, as in BigQuery); JSON_ARRAY_APPEND / INSERT leave the document
unchanged when the path doesn't land on an array. JSON_STRIP_NULLS
implements the defaults (include_arrays => true, remove_empty =>
false). Output is compact-separator JSON (BigQuery's wire form).

Values arrive pre-encoded: the dialect wraps the SQL value expression
as ``to_json(struct(v AS v), map('ignoreNullFields','false'))`` so ANY
input type (numbers, strings, arrays, structs, NULL) reaches the UDF
as the JSON text ``{"v": ...}``. Engine divergence, documented: a
JSON-typed value argument is indistinguishable from a STRING (the
engine has no JSON column type), so it splices as a JSON string.
"""

from __future__ import annotations

import json
import re

_SEG_RE = re.compile(r'"((?:[^"\\]|\\.)*)"|([A-Za-z_][A-Za-z0-9_]*)')


def _parse_path(path: str) -> list:
    p = path.strip()
    if not p.startswith("$"):
        raise ValueError(f"JSONPath must start with $: {path!r}")
    segs: list = []
    i = 1
    n = len(p)
    while i < n:
        if p[i] == ".":
            m = _SEG_RE.match(p, i + 1)
            if not m:
                raise ValueError(f"bad JSONPath key at offset {i}: {path!r}")
            segs.append(
                m.group(2)
                if m.group(2) is not None
                else m.group(1).replace('\\"', '"')
            )
            i = m.end()
        elif p[i] == "[":
            m = re.compile(r"\[(\d+)\]").match(p, i)
            if not m:
                raise ValueError(
                    f"bad JSONPath index at offset {i}: {path!r}"
                )
            segs.append(int(m.group(1)))
            i = m.end()
        else:
            raise ValueError(f"bad JSONPath at offset {i}: {path!r}")
    return segs


def _dumps(obj) -> str:
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)


def _unwrap_value(value_json: str):
    # the dialect encodes the value as {"v": <json>}
    return json.loads(value_json)["v"]


def _descend(cur, seg):
    """Read-only step; None when the segment doesn't resolve."""
    if isinstance(seg, str):
        return cur[seg] if isinstance(cur, dict) and seg in cur else None
    if isinstance(cur, list) and 0 <= seg < len(cur):
        return cur[seg]
    return None


def json_set(doc: str, path: str, value_json: str):
    if doc is None or path is None or value_json is None:
        return None
    obj = json.loads(doc)
    segs = _parse_path(path)
    val = _unwrap_value(value_json)
    if not segs:  # $: replace the whole document
        return _dumps(val)
    cur = obj
    for pos, seg in enumerate(segs[:-1]):
        nxt = segs[pos + 1]
        want = list if isinstance(nxt, int) else dict
        if isinstance(seg, str):
            if not isinstance(cur, dict):
                return _dumps(obj)  # lax: structure mismatch -> no-op
            if not isinstance(cur.get(seg), want):
                cur[seg] = [] if want is list else {}
            cur = cur[seg]
        else:
            if not isinstance(cur, list):
                return _dumps(obj)
            while len(cur) <= seg:
                cur.append(None)
            if not isinstance(cur[seg], want):
                cur[seg] = [] if want is list else {}
            cur = cur[seg]
    last = segs[-1]
    if isinstance(last, str):
        if isinstance(cur, dict):
            cur[last] = val
    else:
        if isinstance(cur, list):
            while len(cur) <= last:
                cur.append(None)
            cur[last] = val
    return _dumps(obj)


def json_remove(doc: str, path: str):
    if doc is None or path is None:
        return None
    obj = json.loads(doc)
    segs = _parse_path(path)
    if not segs:
        raise ValueError("JSON_REMOVE cannot remove the root ($)")
    cur = obj
    for seg in segs[:-1]:
        cur = _descend(cur, seg)
        if cur is None:
            return _dumps(obj)  # missing path -> no-op
    last = segs[-1]
    if isinstance(last, str):
        if isinstance(cur, dict) and last in cur:
            del cur[last]
    elif isinstance(cur, list) and 0 <= last < len(cur):
        del cur[last]
    return _dumps(obj)


def json_array_append(doc: str, path: str, value_json: str):
    if doc is None or path is None or value_json is None:
        return None
    obj = json.loads(doc)
    segs = _parse_path(path)
    val = _unwrap_value(value_json)
    cur = obj
    for seg in segs:
        cur = _descend(cur, seg)
        if cur is None:
            return _dumps(obj)
    if isinstance(cur, list):
        cur.append(val)
    return _dumps(obj)


def json_array_insert(doc: str, path: str, value_json: str):
    if doc is None or path is None or value_json is None:
        return None
    obj = json.loads(doc)
    segs = _parse_path(path)
    if not segs or not isinstance(segs[-1], int):
        raise ValueError(
            f"JSON_ARRAY_INSERT path must end with [index]: {path!r}"
        )
    val = _unwrap_value(value_json)
    cur = obj
    for seg in segs[:-1]:
        cur = _descend(cur, seg)
        if cur is None:
            return _dumps(obj)
    idx = segs[-1]
    if isinstance(cur, list):
        while len(cur) < idx:
            cur.append(None)
        cur.insert(idx, val)
    return _dumps(obj)


def _strip(obj):
    if isinstance(obj, dict):
        return {k: _strip(v) for k, v in obj.items() if v is not None}
    if isinstance(obj, list):
        return [_strip(v) for v in obj if v is not None]
    return obj


def json_strip_nulls(doc: str):
    if doc is None:
        return None
    stripped = _strip(json.loads(doc))
    # BigQuery returns JSON 'null' when everything was stripped away
    # from a null root; empty containers stay (remove_empty => false)
    return _dumps(stripped)
