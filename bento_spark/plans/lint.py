"""Config linting — the reference's `bento lint` command
(/root/reference/internal/cli/lint.go; field-level lints come from the
docs.FieldSpec registry).

Structural, Spark-free checks: a lint must run without a SparkSession (CI
pre-merge, editor integration), so it validates the config SHAPE — known
sections, known processor names, single-key processor maps, required
fields, enum values, parseable durations, resolvable `${VAR}`
interpolations — and leaves expression-level validation to compile time
(Bloblang compiles to Catalyst Columns, which need a session).

The known-name registries are EXTRACTED from the compiler source at
import (the `name == "..."` / `"..." in inp` dispatch patterns), so a new
processor/input section is lintable the moment it is implemented — no
second list to forget to update.
"""

from __future__ import annotations

import inspect
import re
from functools import lru_cache

import yaml

_DUR_KEYS = {"interval", "within", "watermark", "duration", "slide", "gap",
             "lateness", "offset", "trigger", "max_lag"}

_TOP_SECTIONS = {
    "input", "pipeline", "output", "window", "join", "error_handling",
    "tests", "resources", "cache_resources", "rate_limit_resources",
    "metrics", "logger",
}

# sections handled by the compiler but not via the `name == "..."` pattern
_EXTRA_PROCESSORS = {"mapping", "mutation", "bloblang"}

_REQUIRED = {
    # processor -> keys that must be present in its opts
    "cache": ("resource", "key"),
    "cached": ("resource", "key_cols", "processors"),
    "lookup": ("right", "keys"),
    "match_sequence": ("key", "within", "steps"),
    "dedupe": ("keys",),
    "set_error": ("when",),
    "subprocess": ("name",),
    "command": ("name",),
    "http": ("url",),
    "sql_raw": ("dsn", "query"),
    "msgpack_decode": ("schema",),
    "avro_decode": ("schema",),
    "jmespath": ("query",),
    "redis_script": ("script",),
    "aws_lambda": ("function",),
    "aws_dynamodb_partiql": ("query",),
    "aws_s3": ("bucket", "key"),
    "image_resize": ("width", "height"),
    "frame_sample": ("every",),
    "avro_encode": ("columns", "schema"),
    "protobuf_decode": ("message",),
    "protobuf_encode": ("columns", "message"),
}


@lru_cache(maxsize=1)
def known_processors() -> frozenset[str]:
    from bento_spark.plans import compiler

    src = inspect.getsource(compiler.Pipeline._apply_one)
    names = set(re.findall(r'name == "(\w+)"', src))
    for m in re.findall(r'name in \(([^)]*)\)', src):
        names |= set(re.findall(r'"(\w+)"', m))
    return frozenset(names) | _EXTRA_PROCESSORS


@lru_cache(maxsize=1)
def known_inputs() -> frozenset[str]:
    from bento_spark.plans import compiler

    src = inspect.getsource(compiler.Pipeline._input)
    return frozenset(re.findall(r'"(\w+)" in inp', src))


def _lint_duration(path: str, val, issues: list[str]) -> None:
    from bento_spark.streaming.cep import duration_ms

    try:
        duration_ms(str(val))
    except ValueError:
        issues.append(f"{path}: bad duration {val!r} (e.g. '500 ms', '10 seconds')")


def _lint_processor(i: int, p, issues: list[str], path: str = "pipeline.processors") -> None:
    if not isinstance(p, dict) or len(p) != 1:
        issues.append(f"{path}[{i}]: each processor must be a single-key map, got {p!r}")
        return
    name, opts = next(iter(p.items()))
    if name not in known_processors():
        issues.append(f"{path}[{i}]: unknown processor {name!r}")
        return
    for req in _REQUIRED.get(name, ()):
        if not isinstance(opts, dict) or req not in opts:
            issues.append(f"{path}[{i}] ({name}): missing required field {req!r}")
    if isinstance(opts, dict):
        for k, v in opts.items():
            if k in _DUR_KEYS and v is not None:
                _lint_duration(f"{path}[{i}] ({name}).{k}", v, issues)
        for nested in ("processors",):
            for j, child in enumerate(opts.get(nested) or []):
                _lint_processor(j, child, issues, path=f"{path}[{i}].{name}.{nested}")


def lint_yaml(src: str, env: dict | None = None) -> list[str]:
    """Lint a config; returns human-readable issues (empty = clean).
    Raises nothing — every problem becomes an issue string, like the
    reference's lint output."""
    from bento_spark.plans.compiler import interpolate_env

    issues: list[str] = []
    try:
        text = interpolate_env(src, env)
    except ValueError as e:
        return [f"env interpolation: {e}"]
    try:
        conf = yaml.safe_load(text)
    except yaml.YAMLError as e:
        return [f"yaml parse: {e}"]
    if not isinstance(conf, dict):
        return ["config must be a YAML mapping"]

    for k in conf:
        if k not in _TOP_SECTIONS:
            issues.append(f"unknown top-level section {k!r}")

    inp = conf.get("input") or {}
    if isinstance(inp, dict):
        if inp and not (set(inp) & known_inputs()):
            issues.append(f"input: unknown source {sorted(inp)!r}")
    elif inp:
        issues.append("input: must be a mapping")

    procs = (conf.get("pipeline") or {}).get("processors")
    if procs is not None and not isinstance(procs, list):
        issues.append("pipeline.processors must be a list")
    for i, p in enumerate(procs or []):
        _lint_processor(i, p, issues)

    eh = conf.get("error_handling") or {}
    if isinstance(eh, dict):
        if eh.get("strategy", "none") not in ("none", "reject", "retry"):
            issues.append(
                f"error_handling.strategy must be none|reject|retry, got {eh.get('strategy')!r}"
            )
        if eh.get("on_exhausted", "none") not in ("none", "reject"):
            issues.append(
                f"error_handling.on_exhausted must be none|reject, got {eh.get('on_exhausted')!r}"
            )

    win = conf.get("window") or {}
    if isinstance(win, dict):
        if win and win.get("type") not in ("tumbling", "sliding", "session"):
            issues.append(f"window.type must be tumbling|sliding|session, got {win.get('type')!r}")
        for k in ("duration", "slide", "gap", "lateness", "offset"):
            if win.get(k) is not None:
                _lint_duration(f"window.{k}", win[k], issues)

    crs = conf.get("cache_resources")
    if crs is not None and not isinstance(crs, list):
        issues.append("cache_resources must be a list")
    for i, r in enumerate(crs or []):
        if not isinstance(r, dict) or not r.get("label"):
            issues.append(f"cache_resources[{i}]: needs a 'label'")
            continue
        if "file" in r:
            if not isinstance(r["file"], dict) or "directory" not in r["file"]:
                issues.append(f"cache_resources[{i}] (file): missing 'directory'")
            elif r["file"].get("ttl") is not None:
                _lint_duration(f"cache_resources[{i}].file.ttl", r["file"]["ttl"], issues)
        elif "parquet" in r:
            if not isinstance(r["parquet"], dict) or "path" not in r["parquet"]:
                issues.append(f"cache_resources[{i}] (parquet): missing 'path'")
        elif "sqlite" in r:
            if not isinstance(r["sqlite"], dict) or "path" not in r["sqlite"]:
                issues.append(f"cache_resources[{i}] (sqlite): missing 'path'")
        elif "mongodb" in r:
            if not isinstance(r["mongodb"], dict) or "url" not in r["mongodb"]:
                issues.append(f"cache_resources[{i}] (mongodb): missing 'url'")
        elif "redis" in r:
            if not isinstance(r["redis"], dict) or "url" not in r["redis"]:
                issues.append(f"cache_resources[{i}] (redis): missing 'url'")
            elif r["redis"].get("default_ttl") is not None:
                _lint_duration(
                    f"cache_resources[{i}].redis.default_ttl",
                    r["redis"]["default_ttl"], issues,
                )
        elif any(k in r for k in ("memory", "lru", "ttlru")):
            kind = "memory" if "memory" in r else ("lru" if "lru" in r else "ttlru")
            o = r[kind] or {}
            if not isinstance(o, dict):
                issues.append(f"cache_resources[{i}] ({kind}): options must be a mapping")
            else:
                if o.get("cap") is not None and not isinstance(o["cap"], int):
                    issues.append(f"cache_resources[{i}] ({kind}): 'cap' must be an integer")
                if o.get("default_ttl") is not None:
                    _lint_duration(
                        f"cache_resources[{i}].{kind}.default_ttl", o["default_ttl"], issues
                    )
                if o.get("init_values") is not None and not isinstance(o["init_values"], dict):
                    issues.append(
                        f"cache_resources[{i}] ({kind}): 'init_values' must be a mapping"
                    )
        elif "noop" in r:
            pass
        elif "multilevel" in r:
            levels = r["multilevel"]
            if not isinstance(levels, list) or len(levels) < 2:
                issues.append(
                    f"cache_resources[{i}] (multilevel): needs a list of >=2 cache labels"
                )
            else:
                known = {
                    c.get("label") for c in crs or [] if isinstance(c, dict)
                }
                for n in levels:
                    if n == r.get("label"):
                        issues.append(f"cache_resources[{i}] (multilevel): references itself")
                    elif n not in known:
                        issues.append(
                            f"cache_resources[{i}] (multilevel): unknown cache label {n!r}"
                        )
        else:
            issues.append(
                f"cache_resources[{i}]: needs a backend (file: {{directory}}, "
                "parquet: {path}, sqlite: {path}, redis: {url}, "
                "memory/lru/ttlru: {...}, noop: {}, or multilevel: [labels])"
            )

    rls = conf.get("rate_limit_resources")
    if rls is not None and not isinstance(rls, list):
        issues.append("rate_limit_resources must be a list")
    for i, r in enumerate(rls or []):
        if not isinstance(r, dict) or not r.get("label"):
            issues.append(f"rate_limit_resources[{i}]: needs a 'label'")
            continue
        body = r.get("local") or r  # reference nests fields under `local:`
        if not isinstance(body, dict):
            issues.append(f"rate_limit_resources[{i}]: 'local' must be a mapping")
            continue
        if "redis" in body:  # distributed fixed window (redis/rate_limit.go)
            rd = body["redis"]
            if not isinstance(rd, dict) or "url" not in rd:
                issues.append(f"rate_limit_resources[{i}] (redis): missing 'url'")
                continue
            if rd.get("interval") is not None:
                _lint_duration(f"rate_limit_resources[{i}].redis.interval", rd["interval"], issues)
            body = {**body, **{k: rd[k] for k in ("count",) if k in rd}}
        try:
            if int(body.get("count", 1000)) <= 0:
                issues.append(f"rate_limit_resources[{i}]: count must be > 0")
        except (TypeError, ValueError):
            issues.append(f"rate_limit_resources[{i}]: count must be an integer")
        if body.get("interval") is not None:
            _lint_duration(f"rate_limit_resources[{i}].interval", body["interval"], issues)

    out = conf.get("output") or {}
    if isinstance(out, dict) and out.get("trigger") is not None:
        _lint_duration("output.trigger", out["trigger"], issues)
    return issues
