"""Per-type payload schema registry (README.md:310): merged-schema parse,
registry-driven typed projections, conflict detection."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from http_feeds_spark import schema as S


@pytest.fixture(autouse=True)
def clean_registry():
    saved = dict(S._PAYLOAD_SCHEMAS)
    S._PAYLOAD_SCHEMAS.clear()
    yield
    S._PAYLOAD_SCHEMAS.clear()
    S._PAYLOAD_SCHEMAS.update(saved)


def test_merged_schema_unions_fields(spark):
    S.register_payload_schema("t.a", T.StructType([T.StructField("k", T.LongType())]))
    S.register_payload_schema(
        "t.b",
        T.StructType([T.StructField("k", T.LongType()), T.StructField("name", T.StringType())]),
    )
    merged = S.merged_payload_schema()
    assert [f.name for f in merged.fields] == ["k", "name"]


def test_conflicting_field_types_raise():
    S.register_payload_schema("t.a", T.StructType([T.StructField("k", T.LongType())]))
    S.register_payload_schema("t.b", T.StructType([T.StructField("k", T.StringType())]))
    with pytest.raises(TypeError, match="conflicting"):
        S.merged_payload_schema()


def test_parse_and_typed_projection(spark):
    S.register_payload_schema("t.purchase", T.StructType([T.StructField("k", T.LongType())]))
    S.register_payload_schema("t.signup", T.StructType([T.StructField("name", T.StringType())]))
    df = spark.createDataFrame(
        [
            ("t.purchase", '{"k": 7}'),
            ("t.signup", '{"name": "x"}'),
            ("t.unregistered", '{"z": 1}'),
        ],
        "type string, data string",
    )
    out = S.parse_payloads(df).select("type", *S.typed_payload_columns()).collect()
    by_type = {r.type: r for r in out}
    assert by_type["t.purchase"].purchase_k == 7
    assert by_type["t.purchase"].signup_name is None
    assert by_type["t.signup"].signup_name == "x"
    # unregistered types still parse (one JsonToStructs for the whole feed)
    assert by_type["t.unregistered"].purchase_k is None


def test_single_json_parse_in_plan(spark):
    """At 100 registered schemas the plan must still contain exactly one
    from_json, not a per-type conditional parse."""
    for i in range(100):
        S.register_payload_schema(
            f"t.many{i}", T.StructType([T.StructField(f"f{i}", T.LongType())])
        )
    df = spark.createDataFrame([("t.many0", '{"f0": 1}')], "type string, data string")
    out = S.parse_payloads(df).select("type", *S.typed_payload_columns())
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("from_json") == 1


def test_variant_path_equals_registry_path(spark):
    """SURVEY §1.3 names `variant` as the payload option for
    never-registered types. Contract: for fields the registry CAN see,
    variant_get extraction returns exactly the registry-parsed values —
    and the variant path additionally serves types with no registered
    schema at all."""
    S.register_payload_schema("t.purchase", T.StructType([T.StructField("k", T.LongType())]))
    df = spark.createDataFrame(
        [
            ("t.purchase", '{"k": 7}'),
            ("t.purchase", '{"k": -3}'),
            ("t.never", '{"z": {"nested": "deep"}, "n": 2.5}'),
        ],
        "type string, data string",
    )
    both = S.parse_payload_variant(S.parse_payloads(df))
    rows = both.select(
        "type",
        F.col("payload.k").alias("reg_k"),
        S.variant_field("k", "bigint").alias("var_k"),
        S.variant_field("z.nested", "string").alias("var_nested"),
        S.variant_field("n", "double").alias("var_n"),
    ).collect()
    for r in rows:
        assert r.var_k == r.reg_k  # registry ≡ variant on shared fields
    by_type = {r.type: r for r in rows}
    # the never-registered type is fully navigable via variant alone
    assert by_type["t.never"].var_nested == "deep"
    assert by_type["t.never"].var_n == 2.5
    assert by_type["t.never"].reg_k is None


def test_variant_try_parse_tolerates_junk(spark):
    df = spark.createDataFrame(
        [("t.x", '{"ok": 1}'), ("t.x", "{not json"), ("t.x", None)],
        "type string, data string",
    )
    out = S.try_parse_payload_variant(df).select(
        S.variant_field("ok", "bigint").alias("ok")
    ).collect()
    assert sorted((r.ok for r in out), key=lambda v: (v is None, v)) == [1, None, None]
