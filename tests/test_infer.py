"""F4/F5 parity — golden inference fixture from
/root/reference/tests/test_tap.py:11-18 and tests/schema.json.
"""

import json

from pyspark.sql import types as T

from tap_rest_api_msdk_spark.functions.flatten import flatten_record
from tap_rest_api_msdk_spark.functions.infer import (
    infer_schema_from_flat_records,
    infer_schema_from_payloads,
    json_schema_to_struct,
    merge_schemas,
)

# mocked API page from /root/reference/tests/test_streams.py:36-59 (FX1)
RECORDS = [
    {"key1": "this", "key2": "that", "key3": "foo", "field1": "I"},
    {"key1": "foo", "key2": "bar", "key3": "spam", "field2": 8},
]


def test_inference_matches_reference_golden():
    schema = infer_schema_from_flat_records(iter(RECORDS), inference_records=50)
    want = {
        "key1": {"type": "string"},
        "key2": {"type": "string"},
        "key3": {"type": "string"},
        "field1": {"type": "string"},
        "field2": {"type": "integer"},
    }
    assert schema["properties"] == want
    assert schema["required"] == ["key1", "key2", "key3"]


def test_inference_off_by_one_consumes_n_plus_1():
    # reference breaks only when i >= N (tap.py:636-637) -> consumes N+1
    seen = []

    def gen():
        for i in range(10):
            seen.append(i)
            yield {"k": i}

    infer_schema_from_flat_records(gen(), inference_records=3)
    assert len(seen) == 4


def test_inference_int_number_conflict_widens():
    schema = infer_schema_from_flat_records(iter([{"v": 1}, {"v": 1.5}]))
    assert schema["properties"]["v"]["type"] == ["integer", "number"]
    struct = json_schema_to_struct(schema)
    assert struct["v"].dataType == T.DoubleType()


def test_inference_non_dict_raises():
    import pytest

    with pytest.raises(ValueError):
        infer_schema_from_flat_records(iter([["not", "a", "dict"]]))


def test_json_schema_to_struct_types():
    struct = json_schema_to_struct(
        {
            "properties": {
                "s": {"type": "string"},
                "i": {"type": "integer"},
                "n": {"type": "number"},
                "b": {"type": "boolean"},
                "ni": {"type": ["null", "integer"]},
            }
        }
    )
    assert [f.dataType for f in struct.fields] == [
        T.StringType(),
        T.LongType(),
        T.DoubleType(),
        T.BooleanType(),
        T.LongType(),
    ]
    assert all(f.nullable for f in struct.fields)


def test_merge_schemas_additive_and_widening():
    target = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    batch = T.StructType(
        [T.StructField("a", T.DoubleType()), T.StructField("c", T.BooleanType())]
    )
    merged = merge_schemas(target, batch)
    assert [f.name for f in merged.fields] == ["a", "b", "c"]
    assert merged["a"].dataType == T.DoubleType()  # widened
    # never narrow: double target + long batch keeps double
    again = merge_schemas(merged, T.StructType([T.StructField("a", T.LongType())]))
    assert again["a"].dataType == T.DoubleType()


def test_infer_from_payload_column(spark):
    df = spark.createDataFrame([(json.dumps(r),) for r in RECORDS], "payload string")
    schema = infer_schema_from_payloads(df, "payload", flatten_record, inference_records=50)
    assert schema["required"] == ["key1", "key2", "key3"]
    assert schema["properties"]["field2"] == {"type": "integer"}


def test_store_raw_json_collapses_required_like_genson():
    schema = infer_schema_from_flat_records(
        iter(RECORDS), inference_records=50, store_raw_json_message=True
    )
    # genson intersects required across ALL added objects incl. the separate
    # {"_sdc_raw_json": {}} object (tap.py:632-634) -> empty required
    assert schema["required"] == []
    assert "_sdc_raw_json" in schema["properties"]
