"""`.diff(other)` / `.patch(changelog)` value algorithms — a pure-Python
re-implementation of the changelog semantics the reference exposes
through the r3labs/diff/v3 package (internal/impl/changelog/bloblang.go),
pinned to that file's own test vectors (bloblang_test.go):

- a changelog is a list of {Type, Path, From, To}, Type one of
  create/update/delete, Path the list of string segments (map keys and
  stringified list indexes) down to the changed LEAF;
- a key ABSENT from one side produces create/delete walked down to each
  leaf; a key PRESENT with a null value produces a single update carrying
  the whole new value (the nil-vs-invalid distinction in the Go library);
- lists match unordered by deep equality (SliceOrdering=false): moved
  elements are no change, unmatched before-elements delete at their
  before-index, unmatched after-elements create at their after-index.

The Spark leg (functions/bloblang.py) runs these over to_json'd columns
in an Arrow-batched pandas UDF — a codec path, never hot-path row logic.
"""

from __future__ import annotations

import copy
from typing import Any

CREATE, UPDATE, DELETE = "create", "update", "delete"


def _change(typ: str, path: tuple, frm: Any, to: Any) -> dict:
    return {"Type": typ, "Path": [str(p) for p in path], "From": frm, "To": to}


def _walk_one_side(value: Any, path: tuple, typ: str) -> list[dict]:
    """create/delete changes for a subtree that exists on one side only:
    recurse to leaves (the Go library diffs against an invalid value,
    which walks structures key by key / element by element)."""
    if isinstance(value, dict) and value:
        out: list[dict] = []
        for k, v in value.items():
            out += _walk_one_side(v, path + (k,), typ)
        return out
    if isinstance(value, list) and value:
        out = []
        for i, v in enumerate(value):
            out += _walk_one_side(v, path + (i,), typ)
        return out
    if typ == CREATE:
        return [_change(CREATE, path, None, value)]
    return [_change(DELETE, path, value, None)]


def _diff_lists(a: list, b: list, path: tuple) -> list[dict]:
    used = [False] * len(b)
    out: list[dict] = []
    for i, ea in enumerate(a):
        for j, eb in enumerate(b):
            if not used[j] and ea == eb:
                used[j] = True
                break
        else:
            out.append(_change(DELETE, path + (i,), ea, None))
    for j, eb in enumerate(b):
        if not used[j]:
            out.append(_change(CREATE, path + (j,), None, eb))
    return out


def diff_values(a: Any, b: Any, path: tuple = ()) -> list[dict]:
    """Changelog turning `a` into `b`. A None root is an empty object for
    key-presence purposes (bloblang_test.go: nil -> {summary: a} is a
    CREATE; {summary: a} -> nil is a DELETE)."""
    if a == b and type(a) is type(b):
        return []
    a_map = a if isinstance(a, dict) else ({} if a is None else None)
    b_map = b if isinstance(b, dict) else ({} if b is None else None)
    if a_map is not None and b_map is not None:
        out: list[dict] = []
        for k, av in a_map.items():
            if k not in b_map:
                out += _walk_one_side(av, path + (k,), DELETE)
                continue
            bv = b_map[k]
            if av == bv and type(av) is type(bv):
                continue
            if isinstance(av, dict) and isinstance(bv, dict):
                out += diff_values(av, bv, path + (k,))
            elif isinstance(av, list) and isinstance(bv, list):
                out += _diff_lists(av, bv, path + (k,))
            else:
                # both keys PRESENT (even if one value is null) -> update
                out.append(_change(UPDATE, path + (k,), av, bv))
        for k, bv in b_map.items():
            if k not in a_map:
                out += _walk_one_side(bv, path + (k,), CREATE)
        return out
    if isinstance(a, list) and isinstance(b, list):
        return _diff_lists(a, b, path)
    if a is None:
        return _walk_one_side(b, path, CREATE)
    if b is None:
        return _walk_one_side(a, path, DELETE)
    return [_change(UPDATE, path, a, b)]


def _container_for(segment: str) -> Any:
    return [] if segment.isdigit() else {}


def patch_values(value: Any, changelog: list[dict]) -> Any:
    """Apply a changelog (the reference wraps diff.Patch; nil input
    passes through as nil there, handled by the caller)."""
    doc = copy.deepcopy(value)
    for ch in changelog or []:
        path = [str(p) for p in (ch.get("Path") or [])]
        typ = str(ch.get("Type") or "")
        if typ not in (CREATE, UPDATE, DELETE):
            raise ValueError(f"patch: unknown change type {typ!r}")
        if not path:
            doc = None if typ == DELETE else ch.get("To")
            continue
        if doc is None:
            doc = _container_for(path[0])
        parent = doc
        for i, seg in enumerate(path[:-1]):
            nxt = path[i + 1]
            if isinstance(parent, list):
                idx = int(seg)
                while len(parent) <= idx:
                    parent.append(_container_for(nxt))
                if parent[idx] is None:
                    parent[idx] = _container_for(nxt)
                parent = parent[idx]
            else:
                if parent.get(seg) is None:
                    parent[seg] = _container_for(nxt)
                parent = parent[seg]
        leaf = path[-1]
        if isinstance(parent, list):
            idx = int(leaf)
            if typ == DELETE:
                # earlier deletes shift later indexes: prefer the element
                # matching From (the Go patcher tracks identity, not index)
                if idx < len(parent) and parent[idx] == ch.get("From"):
                    del parent[idx]
                elif ch.get("From") in parent:
                    parent.remove(ch.get("From"))
                elif idx < len(parent):
                    del parent[idx]
            elif typ == CREATE:
                if idx >= len(parent):
                    parent.append(ch.get("To"))
                else:
                    parent.insert(idx, ch.get("To"))
            else:
                while len(parent) <= idx:
                    parent.append(None)
                parent[idx] = ch.get("To")
        else:
            if typ == DELETE:
                parent.pop(leaf, None)
            else:
                parent[leaf] = ch.get("To")
    return doc
