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
