"""Dependency-free protobuf codec: proto3 wire vectors straight from the
published encoding spec, the reference repo's own test schemas
(config/test/protobuf/schema/*.proto), and the DataFrame/YAML surface."""

from __future__ import annotations

import math

import pytest

from bento_spark.operators.protobuf_codec import (
    decode_message,
    encode_message,
    parse_proto,
    proto_to_ddl,
    protobuf_record_decode,
    protobuf_record_encode,
)

# the reference's schemas, verbatim (person.proto + house.proto)
PERSON_PROTO = """
syntax = "proto3";
package testing;

import "google/protobuf/timestamp.proto";

message Person {
  string first_name = 1;
  string last_name = 2;
  string full_name = 3;
  int32 age = 4;
  int32 id = 5;  // Unique ID number for this person.
  string email = 6;

  google.protobuf.Timestamp last_updated = 7;
}

message House {
  message Mailbox {
    string color = 1;
    string identifier = 2;
  }
  repeated testing.Person people = 1;
  string address = 2;
  Mailbox mailbox = 3;
}
"""


def _reg(src):
    return parse_proto(src)


def test_spec_wire_vectors():
    """The worked examples from the protobuf encoding documentation."""
    reg = _reg("""
message Test1 { int32 a = 1; }
message Test2 { string b = 2; }
message Test3 { Test1 c = 3; }
message Test4 { repeated int32 d = 4; }
""")
    assert encode_message({"a": 150}, "Test1", reg) == bytes.fromhex("089601")
    assert encode_message({"b": "testing"}, "Test2", reg) == b"\x12\x07testing"
    assert encode_message({"c": {"a": 150}}, "Test3", reg) == bytes.fromhex("1a03089601")
    # packed repeated varints
    assert encode_message({"d": [3, 270, 86942]}, "Test4", reg) == bytes.fromhex(
        "2206038e029ea705")
    # negative int32 -> 10-byte two's-complement varint
    assert encode_message({"a": -2}, "Test1", reg) == bytes.fromhex(
        "08feffffffffffffffff01")
    assert decode_message(bytes.fromhex("08feffffffffffffffff01"), "Test1", reg) == {"a": -2}


def test_zigzag_and_fixed():
    reg = _reg("""
message S { sint32 a = 1; sint64 b = 2; fixed32 c = 3; sfixed64 d = 4;
            double e = 5; float f = 6; bool g = 7; bytes h = 8; }
""")
    # zigzag: 0->0, -1->1, 1->2, -2->3
    assert encode_message({"a": -1}, "S", reg) == b"\x08\x01"
    assert encode_message({"a": -2}, "S", reg) == b"\x08\x03"
    v = {"a": -40, "b": -(1 << 40), "c": 4_000_000_000, "d": -7,
         "e": 2.5, "f": -1.5, "g": True, "h": b"\x00\xff"}
    back = decode_message(encode_message(v, "S", reg), "S", reg)
    assert back == v
    # proto3 defaults: an empty message decodes to explicit defaults
    empty = decode_message(b"", "S", reg)
    assert empty == {"a": 0, "b": 0, "c": 0, "d": 0, "e": 0.0, "f": 0.0,
                     "g": False, "h": b""}


def test_unknown_fields_skipped_and_unpacked_accepted():
    reg = _reg("message T { repeated int32 d = 4; }")
    # unknown field 1 (varint) + unknown field 2 (length-delim), then
    # UNPACKED repeated entries for field 4 (wire type 0, one per element)
    buf = bytes.fromhex("089601") + b"\x12\x03abc" + bytes.fromhex("2003") + bytes.fromhex("208e02")
    assert decode_message(buf, "T", reg) == {"d": [3, 270]}


def test_reference_schemas_roundtrip():
    reg = _reg(PERSON_PROTO)
    assert "testing.Person" in reg and "testing.House.Mailbox" in reg
    person = {"first_name": "john", "last_name": "oates", "full_name": "",
              "age": 10, "id": 0, "email": "",
              "last_updated": {"seconds": 1700000000, "nanos": 500}}
    blob = encode_message(person, "testing.Person", reg)
    assert decode_message(blob, "testing.Person", reg) == person
    house = {"people": [person,
                        {**person, "first_name": "daryl", "last_name": "hall",
                         "last_updated": None}],
             "address": "123 Main St",
             "mailbox": {"color": "red", "identifier": "mb-1"}}
    back = decode_message(encode_message(house, "testing.House", reg), "testing.House", reg)
    assert back["address"] == "123 Main St"
    assert back["mailbox"] == {"color": "red", "identifier": "mb-1"}
    assert [p["first_name"] for p in back["people"]] == ["john", "daryl"]
    # absent sub-message stays absent (presence semantics)
    assert back["people"][1]["last_updated"] is None
    # DDL derivation covers nesting
    ddl = proto_to_ddl("testing.House", reg)
    assert "people array<struct<" in ddl and "mailbox struct<color string" in ddl


def test_enum_map_oneof():
    reg = _reg("""
syntax = "proto3";
package shop;
enum Status { UNKNOWN = 0; OPEN = 1; CLOSED = 2; }
message Order {
  Status status = 1;
  map<string, int64> counts = 2;
  oneof payment {
    string card = 3;
    string iban = 4;
  }
  map<int32, Item> items = 5;
}
message Item { string sku = 1; double price = 2; }
""")
    v = {"status": "CLOSED", "counts": {"a": 1, "b": -5},
         "card": "visa", "iban": None,
         "items": {7: {"sku": "x1", "price": 9.5}}}
    back = decode_message(encode_message(v, "shop.Order", reg), "shop.Order", reg)
    assert back["status"] == "CLOSED" and back["counts"] == {"a": 1, "b": -5}
    # oneof branches keep explicit presence: the unset branch is ABSENT
    assert back["card"] == "visa" and "iban" not in back
    # a zero-valued SET branch still goes on the wire (tag present)
    raw = encode_message({"iban": ""}, "shop.Order", reg)
    assert raw and decode_message(raw, "shop.Order", reg)["iban"] == ""
    assert back["items"] == {7: {"sku": "x1", "price": 9.5}}
    # enum wire value is the number; unknown numbers decode as ints
    reg2 = _reg("package shop; message O2 { int32 status = 1; }")
    raw = encode_message({"status": 9}, "shop.O2", reg2)
    assert decode_message(raw, "shop.Order", reg)["status"] == 9
    # default enum renders as its zero name
    assert decode_message(b"", "shop.Order", reg)["status"] == "UNKNOWN"


def test_parse_errors():
    with pytest.raises(ValueError, match="unresolved type"):
        reg = _reg("message A { Missing m = 1; }")
        encode_message({"m": {}}, "A", reg)
    with pytest.raises(ValueError, match="invalid map key"):
        _reg("message A { map<double, int32> m = 1; }")
    with pytest.raises(ValueError, match="not found"):
        protobuf_record_encode(None, [], "message A {}", "B")


def test_dataframe_roundtrip(spark):
    proto = """
package wire;
message Event {
  int64 event_id = 1;
  int64 user_id = 2;
  string event_type = 3;
  double value = 4;
  repeated int32 tags = 5;
}
"""
    df = spark.createDataFrame(
        [(1, 10, "click", 1.5, [1, 2]), (2, 20, "", 0.0, []), (3, None, "view", -2.25, [7])],
        "event_id bigint, user_id bigint, event_type string, value double, tags array<int>",
    )
    enc = protobuf_record_encode(
        df, ["event_id", "user_id", "event_type", "value", "tags"], proto, "wire.Event")
    dec = protobuf_record_decode(enc, "proto_blob", proto, "wire.Event")
    rows = {r.event_id: r for r in dec.collect()}
    assert rows[1].event_type == "click" and rows[1].value == 1.5 and rows[1].tags == [1, 2]
    # proto3 defaults survive the roundtrip as defaults
    assert rows[2].event_type == "" and rows[2].value == 0.0 and rows[2].tags == []
    # NULL encodes as absent -> decodes as 0
    assert rows[3].user_id == 0 and math.isclose(rows[3].value, -2.25)


def test_yaml_protobuf_pipeline(spark, tmp_path):
    pfile = tmp_path / "ev.proto"
    pfile.write_text("package wire; message Ev { int64 id = 1; string kind = 2; }")
    from bento_spark.plans.compiler import compile_yaml

    p = compile_yaml(f"""
input:
  generate:
    count: 5
    mapping: |
        root.id = this.id
        root.kind = "k-%d".format(this.id % 2)
pipeline:
  processors:
    - protobuf_encode:
        columns: [id, kind]
        proto_file: {pfile}
        message: wire.Ev
    - protobuf_decode:
        column: proto_bytes
        proto_file: {pfile}
        message: wire.Ev
""")
    rows = p.build_batch(spark).collect()
    assert len(rows) == 5
    assert sorted(r.id for r in rows) == [0, 1, 2, 3, 4]
    assert all(r.kind == f"k-{r.id % 2}" for r in rows)


def test_yaml_protobuf_requires_schema(spark):
    from bento_spark.plans.compiler import compile_yaml

    p = compile_yaml("""
input:
  generate: {count: 1, mapping: "root.id = this.id"}
pipeline:
  processors:
    - protobuf_encode: {columns: [id], message: wire.Ev}
""")
    with pytest.raises(ValueError, match="needs a schema"):
        p.build_batch(spark)
