"""`opensnowcat` processor: Snowplow/OpenSnowcat enriched-TSV events —
drop filters, PII field transforms, and TSV->flattened-JSON conversion.

Reference (/root/reference/internal/impl/opensnowcat/processor_opensnowcat.go):
parse the 131-column enriched TSV (the public canonical-event format,
https://docs.snowplow.io/docs/fundamentals/canonical-event/), drop events
whose field values match any `contains` criterion (OR logic, case
insensitive; :493-521), transform sensitive columns in place — salted
hash MD5/SHA-1/SHA-256/SHA-384/SHA-512 (:707-742), fixed-string redact,
anonymize_ip masking the last N IPv4 octets / N non-empty IPv6 segments
(:655-704) — then emit either the reconstructed TSV or the flattened JSON
the Snowplow analytics SDK produces (ParseEvent().ToMap(); :477-487).

Spark-first layout: the line splits ONCE into an array column; drop
criteria on direct columns and every hash/redact transform compile to
Catalyst expressions (F.sha2/F.md5/F.sha1 over element_at — whole-stage
codegen, no Python). Rebuilding the TSV after a transform is slice/concat
surgery at the configured index, preserving the line's original column
count like the reference (short lines pass through untouched). Only two
pieces drop to Arrow-batched pandas UDFs, both config-gated: schema
property paths (`com.vendor.schema.prop` filters need a recursive JSON
search, :562-622) and `anonymize_ip` (IPv6 "mask last N non-empty
segments" is positional; one UDF covers both families). JSON output is a
per-line conversion implementing the PUBLIC analytics-SDK contract
(snowplow-golang-analytics-sdk event.go): typed columns, empty fields
omitted, `iglu:` self-describing contexts/unstruct flattened into
`contexts_<vendor>_<name>_<model>` arrays / `unstruct_event_...` objects,
and the derived `geo_location` "lat,lon" field.

Documented deltas: unknown filter/transform field names raise at PLAN
time (the reference logs a per-message warning and skips); dropped-event
counts surface through Spark metrics rather than a named counter.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bento_spark.operators.errors import ERROR_COL, ensure_error_col

# Snowplow/OpenSnowcat enriched TSV column order (public spec, 131 columns;
# processor_opensnowcat.go:28 carries the same list from the same doc).
COLUMNS = [
    "app_id", "platform", "etl_tstamp", "collector_tstamp", "dvce_created_tstamp",
    "event", "event_id", "txn_id", "name_tracker", "v_tracker",
    "v_collector", "v_etl", "user_id", "user_ipaddress", "user_fingerprint",
    "domain_userid", "domain_sessionidx", "network_userid", "geo_country", "geo_region",
    "geo_city", "geo_zipcode", "geo_latitude", "geo_longitude", "geo_region_name",
    "ip_isp", "ip_organization", "ip_domain", "ip_netspeed", "page_url",
    "page_title", "page_referrer", "page_urlscheme", "page_urlhost", "page_urlport",
    "page_urlpath", "page_urlquery", "page_urlfragment", "refr_urlscheme", "refr_urlhost",
    "refr_urlport", "refr_urlpath", "refr_urlquery", "refr_urlfragment", "refr_medium",
    "refr_source", "refr_term", "mkt_medium", "mkt_source", "mkt_term",
    "mkt_content", "mkt_campaign", "contexts", "se_category", "se_action",
    "se_label", "se_property", "se_value", "unstruct_event", "tr_orderid",
    "tr_affiliation", "tr_total", "tr_tax", "tr_shipping", "tr_city",
    "tr_state", "tr_country", "ti_orderid", "ti_sku", "ti_name",
    "ti_category", "ti_price", "ti_quantity", "pp_xoffset_min", "pp_xoffset_max",
    "pp_yoffset_min", "pp_yoffset_max", "useragent", "br_name", "br_family",
    "br_version", "br_type", "br_renderengine", "br_lang", "br_features_pdf",
    "br_features_flash", "br_features_java", "br_features_director", "br_features_quicktime",
    "br_features_realplayer", "br_features_windowsmedia", "br_features_gears", "br_features_silverlight",
    "br_cookies", "br_colordepth", "br_viewwidth", "br_viewheight", "os_name",
    "os_family", "os_manufacturer", "os_timezone", "dvce_type", "dvce_ismobile",
    "dvce_screenwidth", "dvce_screenheight", "doc_charset", "doc_width", "doc_height",
    "tr_currency", "tr_total_base", "tr_tax_base", "tr_shipping_base", "ti_currency",
    "ti_price_base", "base_currency", "geo_timezone", "mkt_clickid", "mkt_network",
    "etl_tags", "dvce_sent_tstamp", "refr_domain_userid", "refr_dvce_tstamp", "derived_contexts",
    "domain_sessionid", "derived_tstamp", "event_vendor", "event_name", "event_format",
    "event_version", "event_fingerprint", "true_tstamp",
]
_IDX = {c: i for i, c in enumerate(COLUMNS)}

# analytics-SDK typed-field sets (snowplow-golang-analytics-sdk event.go —
# the public ParseEvent contract the reference delegates JSON output to)
_INT_FIELDS = {
    "txn_id", "domain_sessionidx", "page_urlport", "refr_urlport",
    "pp_xoffset_min", "pp_xoffset_max", "pp_yoffset_min", "pp_yoffset_max",
    "br_viewwidth", "br_viewheight", "dvce_screenwidth", "dvce_screenheight",
    "doc_width", "doc_height", "ti_quantity",
}
_DOUBLE_FIELDS = {
    "geo_latitude", "geo_longitude", "se_value", "tr_total", "tr_tax",
    "tr_shipping", "ti_price", "tr_total_base", "tr_tax_base",
    "tr_shipping_base", "ti_price_base",
}
_BOOL_FIELDS = {
    "br_features_pdf", "br_features_flash", "br_features_java",
    "br_features_director", "br_features_quicktime", "br_features_realplayer",
    "br_features_windowsmedia", "br_features_gears", "br_features_silverlight",
    "br_cookies", "dvce_ismobile",
}
_TSTAMP_FIELDS = {
    "etl_tstamp", "collector_tstamp", "dvce_created_tstamp",
    "dvce_sent_tstamp", "refr_dvce_tstamp", "derived_tstamp", "true_tstamp",
}
_JSON_FIELDS = {"contexts", "derived_contexts", "unstruct_event"}

_IGLU_RE = re.compile(r"^iglu:([^/]+)/([^/]+)/[^/]+/(\d+)")
_CAMEL_RE = re.compile(r"([^A-Z_])([A-Z])")


def _is_schema_path(name: str) -> bool:
    """Dotted names are iglu schema property paths UNLESS they use the
    geo./metrics./site. prefixes the reference carves out as plain columns
    (processor_opensnowcat.go:349)."""
    return "." in name and not name.startswith(("geo.", "metrics.", "site."))


def _fix_schema(prefix: str, schema_uri: str) -> str | None:
    """iglu:com.acme/my_schema/jsonschema/1-0-2 ->
    prefix_com_acme_my_schema_1 (SDK fixSchema: vendor dots, camelCase
    name, and dashes all collapse to snake_case; model = major version)."""
    m = _IGLU_RE.match(schema_uri)
    if not m:
        return None
    vendor, name, model = m.groups()
    vendor = vendor.replace(".", "_").replace("-", "_")
    name = _CAMEL_RE.sub(r"\1_\2", name).replace(".", "_").replace("-", "_")
    return f"{prefix}_{vendor}_{name}_{model}".lower()


def _search_schema_property(data, schema_path: str) -> str:
    """Recursive find-anywhere search for an iglu self-describing object
    whose vendor.name prefixes `schema_path`; returns the dotted property
    under its `data` as a string ('' = absent), matching
    processor_opensnowcat.go:573-622 exactly (first hit wins, bools as
    true/false, numbers via repr)."""
    if isinstance(data, dict):
        schema_val = data.get("schema")
        if isinstance(schema_val, str) and schema_val.startswith("iglu:"):
            parts = schema_val[len("iglu:"):].split("/", 1)
            if len(parts) == 2:
                full = parts[0] + "." + parts[1].split("/", 1)[0]
                if schema_path.startswith(full + "."):
                    prop_path = schema_path[len(full) + 1:]
                    obj = data.get("data")
                    if isinstance(obj, dict):
                        cur = obj
                        for part in prop_path.split("."):
                            if isinstance(cur, dict):
                                cur = cur.get(part)
                            else:
                                return ""
                        if cur is None:
                            return ""
                        if isinstance(cur, bool):
                            return "true" if cur else "false"
                        if isinstance(cur, str):
                            return cur
                        return f"{cur}"
        for value in data.values():
            hit = _search_schema_property(value, schema_path)
            if hit:
                return hit
    elif isinstance(data, list):
        for item in data:
            hit = _search_schema_property(item, schema_path)
            if hit:
                return hit
    return ""


def _anonymize_ip(ip: str, octets: int, segments: int) -> str:
    """Mask the last N IPv4 octets / last N non-empty IPv6 segments with
    'x' (processor_opensnowcat.go:655-704; malformed IPv4 passes through)."""
    if ":" in ip:
        if segments <= 0:
            return ip
        parts = ip.split(":")
        masked = 0
        for i in range(len(parts) - 1, -1, -1):
            if masked >= segments:
                break
            if parts[i] != "":
                parts[i] = "x"
                masked += 1
        return ":".join(parts)
    if octets <= 0:
        return ip
    parts = ip.split(".")
    if len(parts) != 4:
        return ip
    for i in range(max(0, 4 - octets), 4):
        parts[i] = "x"
    return ".".join(parts)


def _parse_event_map(line: str) -> dict:
    """The analytics-SDK ParseEvent().ToMap() contract: typed columns,
    empty fields omitted, contexts/derived_contexts flattened to
    contexts_* arrays, unstruct_event to an unstruct_event_* object,
    timestamps ISO-8601 Z, plus the derived geo_location field."""
    cols = line.split("\t")
    if len(cols) != len(COLUMNS):
        raise ValueError(
            f"enriched event expected {len(COLUMNS)} TSV columns, got {len(cols)}"
        )
    out: dict = {}
    for name, raw in zip(COLUMNS, cols):
        if raw == "":
            continue
        if name in _JSON_FIELDS:
            doc = json.loads(raw)
            if name == "unstruct_event":
                inner = doc.get("data") if isinstance(doc, dict) else None
                if not isinstance(inner, dict):
                    raise ValueError("unstruct_event is not self-describing")
                key = _fix_schema("unstruct_event", str(inner.get("schema", "")))
                if key is None:
                    raise ValueError("unstruct_event schema is not an iglu URI")
                out[key] = inner.get("data")
            else:
                items = doc.get("data") if isinstance(doc, dict) else None
                if not isinstance(items, list):
                    raise ValueError(f"{name} is not a self-describing array")
                for ctx in items:
                    key = _fix_schema("contexts", str(ctx.get("schema", "")))
                    if key is None:
                        raise ValueError(f"{name} entry schema is not an iglu URI")
                    out.setdefault(key, []).append(ctx.get("data"))
        elif name in _INT_FIELDS:
            out[name] = int(raw)
        elif name in _DOUBLE_FIELDS:
            out[name] = float(raw)
        elif name in _BOOL_FIELDS:
            if raw not in ("0", "1"):
                raise ValueError(f"{name}: boolean column expects 0/1, got {raw!r}")
            out[name] = raw == "1"
        elif name in _TSTAMP_FIELDS:
            out[name] = raw.replace(" ", "T", 1) + "Z"
        else:
            out[name] = raw
    if "geo_latitude" in out and "geo_longitude" in out:
        out["geo_location"] = f"{out['geo_latitude']},{out['geo_longitude']}"
    return out


def _norm_field(name: str) -> str:
    return name if _is_schema_path(name) else name.lower()


def _hash_expr(v: Column, algo: str, salt: str) -> Column:
    """Salted hex digest, JVM-side (hashValue :707-742; input = value+salt)."""
    payload = F.concat(v, F.lit(salt)) if salt else v
    a = algo.upper()
    if a == "MD5":
        return F.md5(payload)
    if a == "SHA-1":
        return F.sha1(payload)
    if a in ("SHA-256", ""):
        return F.sha2(payload, 256)
    if a == "SHA-384":
        return F.sha2(payload, 384)
    if a == "SHA-512":
        return F.sha2(payload, 512)
    raise ValueError(f"opensnowcat: unknown hash algorithm {algo!r}")


def opensnowcat(
    df: DataFrame,
    col: str = "line",
    output_format: str = "tsv",
    drop: dict | None = None,
    transform: dict | None = None,
) -> DataFrame:
    """Apply the opensnowcat processor to a TSV-line column.

    `drop`: {field_or_schema_path: {"contains": [..]}} — matching rows are
    REMOVED (reference drops the message). `transform`: {"salt": str,
    "hash_algo": str, "fields": {column: {"strategy": hash|redact|
    anonymize_ip, ...}}}. `output_format` tsv keeps the line in `col`;
    json replaces it with the flattened-JSON document (parse errors follow
    the error-column protocol, content unchanged)."""
    if output_format not in ("tsv", "json"):
        raise ValueError("opensnowcat: output_format must be tsv or json")
    tmp = "_osc_arr"
    df = df.withColumn(tmp, F.split(F.col(col), "\t"))
    arr = F.col(tmp)

    # ---- drop filters (OR across criteria; contains is case-insensitive)
    if drop:
        crit = F.lit(False)
        schema_filters: list[tuple[str, list[str]]] = []
        for raw_name, criteria in drop.items():
            contains = [str(s) for s in (criteria or {}).get("contains", [])]
            if not contains:
                continue
            name = _norm_field(str(raw_name))
            if _is_schema_path(name):
                schema_filters.append((name, contains))
                continue
            if name not in _IDX:
                raise ValueError(f"opensnowcat: unknown filter field {raw_name!r}")
            v = F.lower(F.get(arr, _IDX[name]))
            for s in contains:
                crit = crit | F.coalesce(v.contains(s.lower()), F.lit(False))
        if schema_filters:
            crit = crit | F.coalesce(
                _schema_filter_udf(schema_filters)(
                    F.get(arr, _IDX["contexts"]),
                    F.get(arr, _IDX["derived_contexts"]),
                    F.get(arr, _IDX["unstruct_event"]),
                ),
                F.lit(False),
            )
        df = df.filter(~crit)
        arr = F.col(tmp)

    # ---- field transforms (in-place on the split array; slice surgery
    # preserves the line's original column count like the reference)
    fields = (transform or {}).get("fields") or {}
    if fields:
        g_salt = str((transform or {}).get("salt", "") or "")
        g_algo = str((transform or {}).get("hash_algo", "SHA-256") or "SHA-256")
        anon_udf = None
        for raw_name, cfg in fields.items():
            name = _norm_field(str(raw_name))
            if name not in _IDX:
                raise ValueError(
                    f"opensnowcat: transform field {raw_name!r} is not an "
                    "enriched-TSV column (schema-path transforms are not "
                    "supported, matching the reference)"
                )
            cfg = cfg or {}
            idx = _IDX[name]
            v = F.get(arr, idx)
            strategy = str(cfg.get("strategy", ""))
            if strategy == "hash":
                new = _hash_expr(
                    v,
                    str(cfg.get("hash_algo") or g_algo),
                    # `or`, not `is not None`: the reference (hashValue) falls
                    # back to the global salt when the field salt is the
                    # EMPTY STRING too (ADVICE r05)
                    str(cfg.get("salt") or g_salt),
                )
            elif strategy == "redact":
                new = F.lit(str(cfg.get("redact_value", "[REDACTED]")))
            elif strategy == "anonymize_ip":
                if anon_udf is None:
                    anon_udf = _anon_ip_udf()
                new = anon_udf(
                    v,
                    F.lit(int(cfg.get("anon_octets", 2))),
                    F.lit(int(cfg.get("anon_segments", 4))),
                )
            else:
                raise ValueError(
                    f"opensnowcat: unknown transform strategy {strategy!r}"
                )
            # skip empty values (:745); short lines pass through untouched
            new = F.when(v == "", v).otherwise(new)
            surgery = F.concat(
                F.slice(arr, 1, idx),
                F.array(new),
                F.slice(arr, idx + 2, 1 << 30),
            )
            df = df.withColumn(
                tmp, F.when(F.size(arr) > idx, surgery).otherwise(arr)
            )
            arr = F.col(tmp)

    df = df.withColumn(col, F.array_join(arr, "\t")).drop(tmp)
    if output_format == "tsv":
        return df
    return _to_json(df, col)


def _schema_filter_udf(filters: list[tuple[str, list[str]]]):
    """Arrow-batched matcher over the three self-describing JSON columns.
    Created lazily (pandas_udf parses its DDL against the active session)."""
    from pyspark.sql.functions import pandas_udf

    lowered = [(path, [s.lower() for s in subs]) for path, subs in filters]

    @pandas_udf("boolean")
    def match(contexts: pd.Series, derived: pd.Series, unstruct: pd.Series) -> pd.Series:
        import json as _json

        out = []
        for cx, dx, ux in zip(contexts, derived, unstruct):
            hit = False
            for path, subs in lowered:
                for blob in (cx, dx, ux):
                    if not blob:
                        continue
                    try:
                        doc = _json.loads(blob)
                    except ValueError:
                        continue
                    val = _search_schema_property(doc, path)
                    if val and any(s in val.lower() for s in subs):
                        hit = True
                        break
                if hit:
                    break
            out.append(hit)
        return pd.Series(out)

    return match


def _anon_ip_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def anon(ip: pd.Series, octets: pd.Series, segments: pd.Series) -> pd.Series:
        o = int(octets.iloc[0]) if len(octets) else 0
        s = int(segments.iloc[0]) if len(segments) else 0
        return pd.Series(
            [None if v is None else _anonymize_ip(v, o, s) for v in ip],
            dtype=object,
        )

    return anon


def _to_json(df: DataFrame, col: str) -> DataFrame:
    """TSV line -> flattened JSON document (SDK ToMap contract); parse
    failures follow the error-column protocol with content unchanged."""
    from pyspark.sql.functions import pandas_udf

    df = ensure_error_col(df)

    @pandas_udf("out string, err string")
    def conv(lines: pd.Series) -> pd.DataFrame:
        outs, errs = [], []
        for line in lines:
            if line is None:
                outs.append(None)
                errs.append(None)
                continue
            try:
                outs.append(json.dumps(_parse_event_map(line), sort_keys=True,
                                       separators=(",", ":")))
                errs.append(None)
            except (ValueError, TypeError) as e:
                outs.append(None)
                errs.append(f"opensnowcat: {e}")
        return pd.DataFrame({"out": outs, "err": errs})

    res = conv(F.col(col))
    return (
        df.withColumn("_osc_res", res)
        .withColumn(
            ERROR_COL,
            F.coalesce(F.col(ERROR_COL), F.col("_osc_res.err")),
        )
        .withColumn(
            col,
            F.when(F.col("_osc_res.out").isNotNull(), F.col("_osc_res.out"))
            .otherwise(F.col(col)),
        )
        .drop("_osc_res")
    )
