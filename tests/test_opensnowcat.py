"""`opensnowcat` processor: enriched-TSV drop filters, PII transforms,
and the analytics-SDK JSON flattening (reference
internal/impl/opensnowcat/processor_opensnowcat.go + the public Snowplow
canonical-event / analytics-SDK contracts)."""

from __future__ import annotations

import hashlib
import json

import pytest

from bento_spark.operators.opensnowcat import (
    COLUMNS,
    _anonymize_ip,
    _fix_schema,
    _parse_event_map,
    opensnowcat,
)
from bento_spark.plans.compiler import compile_yaml


def _line(**fields) -> str:
    cols = [""] * len(COLUMNS)
    for k, v in fields.items():
        cols[COLUMNS.index(k)] = v
    return "\t".join(cols)


def _run(spark, lines, **kw):
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    return opensnowcat(df, col="line", **kw).collect()


_UA_CTX = json.dumps({
    "schema": "iglu:com.snowplowanalytics.snowplow/contexts/jsonschema/1-0-0",
    "data": [{
        "schema": "iglu:com.snowplowanalytics.snowplow/ua_parser_context/jsonschema/1-0-0",
        "data": {"useragentFamily": "Chrome", "osFamily": "Linux"},
    }],
})


# ------------------------------------------------------------ drop filters


def test_drop_contains_is_case_insensitive_or_logic(spark):
    rows = _run(
        spark,
        [_line(app_id="web", user_ipaddress="10.0.0.7"),
         _line(app_id="web", user_ipaddress="203.0.113.9"),
         _line(app_id="Internal-QA", user_ipaddress="203.0.113.10")],
        drop={"user_ipaddress": {"contains": ["10.0."]},
              "app_id": {"contains": ["internal"]}},
    )
    assert [r.line.split("\t")[13] for r in rows] == ["203.0.113.9"]


def test_drop_schema_property_path(spark):
    rows = _run(
        spark,
        [_line(app_id="a", derived_contexts=_UA_CTX),
         _line(app_id="b")],
        drop={"com.snowplowanalytics.snowplow.ua_parser_context.useragentFamily":
              {"contains": ["chrome"]}},
    )
    assert [r.line.split("\t")[0] for r in rows] == ["b"]


def test_unknown_filter_field_raises_at_plan_time(spark):
    df = spark.createDataFrame([(_line(),)], "line string")
    with pytest.raises(ValueError, match="unknown filter field"):
        opensnowcat(df, drop={"nonexistent_col": {"contains": ["x"]}})


# -------------------------------------------------------------- transforms


def test_hash_salted_sha256_and_md5_override(spark):
    rows = _run(
        spark,
        [_line(user_id="ada", user_fingerprint="fp1")],
        transform={"salt": "s3cr3t", "hash_algo": "SHA-256",
                   "fields": {"user_id": {"strategy": "hash"},
                              "user_fingerprint": {"strategy": "hash",
                                                   "hash_algo": "MD5",
                                                   "salt": "other"}}},
    )
    cols = rows[0].line.split("\t")
    assert len(cols) == len(COLUMNS)
    assert cols[12] == hashlib.sha256(b"adas3cr3t").hexdigest()
    assert cols[14] == hashlib.md5(b"fp1other").hexdigest()


def test_redact_and_empty_value_skip(spark):
    rows = _run(
        spark,
        [_line(network_userid="nid-1", user_id="")],
        transform={"fields": {"network_userid": {"strategy": "redact",
                                                 "redact_value": "GONE"},
                              "user_id": {"strategy": "hash"}}},
    )
    cols = rows[0].line.split("\t")
    assert cols[17] == "GONE" and cols[12] == ""


def test_anonymize_ipv4_and_ipv6(spark):
    rows = _run(
        spark,
        [_line(user_ipaddress="192.168.34.56"),
         _line(user_ipaddress="2001:db8::8a2e:370:7334"),
         _line(user_ipaddress="not-an-ip")],
        transform={"fields": {"user_ipaddress": {"strategy": "anonymize_ip",
                                                 "anon_octets": 2,
                                                 "anon_segments": 3}}},
    )
    got = sorted(r.line.split("\t")[13] for r in rows)
    assert got == sorted(["192.168.x.x", "2001:db8::x:x:x", "not-an-ip"])


def test_anonymize_ip_pure_edge_cases():
    # masking more octets than exist clamps; 0 is identity (go impl :664)
    assert _anonymize_ip("1.2.3.4", 9, 0) == "x.x.x.x"
    assert _anonymize_ip("1.2.3.4", 0, 0) == "1.2.3.4"
    assert _anonymize_ip("::1", 0, 1) == "::x"


def test_short_line_passes_through_untouched(spark):
    rows = _run(
        spark,
        ["only\tfive\tcols\there\tnow"],
        transform={"fields": {"user_id": {"strategy": "redact"}}},
    )
    assert rows[0].line == "only\tfive\tcols\there\tnow"


def test_transform_preserves_column_count(spark):
    rows = _run(
        spark,
        [_line(user_id="u", true_tstamp="2024-01-01 00:00:00.000")],
        transform={"fields": {"user_id": {"strategy": "hash"},
                              "true_tstamp": {"strategy": "redact"}}},
    )
    cols = rows[0].line.split("\t")
    assert len(cols) == len(COLUMNS) and cols[-1] == "[REDACTED]"


# ------------------------------------------------------------- json output


def test_json_flattening_types_contexts_unstruct_geo(spark):
    unstruct = json.dumps({
        "schema": "iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0",
        "data": {
            "schema": "iglu:com.acme/link_click/jsonschema/2-0-1",
            "data": {"targetUrl": "https://x.example"},
        },
    })
    rows = _run(
        spark,
        [_line(app_id="web", collector_tstamp="2021-04-07 12:01:01.999",
               txn_id="42", geo_latitude="37.77", geo_longitude="-122.41",
               br_cookies="1", dvce_ismobile="0",
               contexts=_UA_CTX, unstruct_event=unstruct)],
        output_format="json",
    )
    assert rows[0].error is None
    doc = json.loads(rows[0].line)
    assert doc["app_id"] == "web"
    assert doc["collector_tstamp"] == "2021-04-07T12:01:01.999Z"
    assert doc["txn_id"] == 42
    assert doc["br_cookies"] is True and doc["dvce_ismobile"] is False
    assert doc["geo_location"] == "37.77,-122.41"
    assert doc["contexts_com_snowplowanalytics_snowplow_ua_parser_context_1"] == [
        {"useragentFamily": "Chrome", "osFamily": "Linux"}
    ]
    assert doc["unstruct_event_com_acme_link_click_2"] == {
        "targetUrl": "https://x.example"
    }
    assert "user_id" not in doc  # empty fields omitted


def test_json_bad_line_follows_error_protocol(spark):
    rows = _run(spark, ["too\tfew\tcolumns"], output_format="json")
    assert rows[0].error and "opensnowcat" in rows[0].error
    assert rows[0].line == "too\tfew\tcolumns"  # content unchanged


def test_fix_schema_camel_and_dashes():
    assert (_fix_schema("contexts", "iglu:com.my-vendor/WebPage/jsonschema/1-0-0")
            == "contexts_com_my_vendor_web_page_1")
    assert _fix_schema("contexts", "not-iglu") is None


def test_parse_event_map_merges_derived_contexts():
    line = _line(contexts=_UA_CTX, derived_contexts=_UA_CTX)
    doc = _parse_event_map(line)
    key = "contexts_com_snowplowanalytics_snowplow_ua_parser_context_1"
    assert len(doc[key]) == 2


# ------------------------------------------------------------------- YAML


def test_yaml_opensnowcat_processor(spark, tmp_path):
    src = tmp_path / "in"
    spark.createDataFrame(
        [(_line(user_id="ada", user_ipaddress="10.1.2.3"),),
         (_line(user_id="bob", user_ipaddress="203.0.113.7"),)],
        "line string",
    ).write.parquet(str(src))
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - opensnowcat:
        output_format: tsv
        filters:
          drop:
            user_ipaddress:
              contains: ["10."]
          transform:
            salt: pepper
            fields:
              user_id:
                strategy: hash
""")
    rows = p.build_batch(spark).collect()
    assert len(rows) == 1
    assert rows[0].line.split("\t")[12] == hashlib.sha256(b"bobpepper").hexdigest()


def test_lint_knows_opensnowcat():
    from bento_spark.plans.lint import known_processors

    assert "opensnowcat" in known_processors()
