"""F4/F5 — dynamic schema inference + additive schema evolution.

The reference infers a JSON schema from the first ``num_inference_records``
flattened records via ``genson.SchemaBuilder``
(/root/reference/tap_rest_api_msdk/tap.py:557-640); genson is not available
in this sandbox, so :class:`SchemaAccumulator` implements the observable
subset the reference exercises (golden: /root/reference/tests/schema.json):

* scalar JSON types per flattened leaf: string / integer / number / boolean
* conflicting integer+number -> ["integer", "number"] (genson keeps both;
  the engine's Spark mapping widens to double)
* ``required`` = keys present in **every** sampled record
* inference consumes N+1 records — the reference loop breaks only when
  ``i >= inference_records`` (tap.py:636-637); we preserve the off-by-one.

Spark-side, :func:`json_schema_to_struct` maps the JSON schema to a
``StructType`` and :func:`merge_schemas` implements the sink's additive
evolution contract (SURVEY §4.2): new columns appended nullable; widening
int->double only; never narrowing.
"""

from __future__ import annotations

import json
from typing import Iterable, Optional

from pyspark.sql import types as T

_JSON_TYPE = {
    str: "string",
    bool: "boolean",  # must test before int (bool is an int subclass)
    int: "integer",
    float: "number",
    type(None): "null",
}

_SPARK_TYPE = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
    "null": T.StringType(),
    "object": T.StringType(),  # _sdc_raw_json & friends carried as JSON text
}


def _jtype(value) -> str:
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, dict):
        return "object"
    for py, name in _JSON_TYPE.items():
        if type(value) is py:
            return name
    return "string"


class SchemaAccumulator:
    """genson-parity accumulator over flattened records (driver-side)."""

    def __init__(self) -> None:
        self._types: dict[str, set] = {}
        self._seen_in_all: Optional[set] = None
        self._order: list[str] = []

    def add_record(self, flat: dict) -> None:
        for key, value in flat.items():
            if key not in self._types:
                self._types[key] = set()
                self._order.append(key)
            self._types[key].add(_jtype(value))
        keys = set(flat)
        self._seen_in_all = keys if self._seen_in_all is None else (self._seen_in_all & keys)

    def to_json_schema(self) -> dict:
        props = {}
        for key in self._order:
            types = sorted(self._types[key] - {"null"}) or ["null"]
            props[key] = {"type": types[0] if len(types) == 1 else types}
        required = sorted(self._seen_in_all or set())
        return {
            "$schema": "http://json-schema.org/schema#",
            "type": "object",
            "properties": props,
            "required": required,
        }

    def to_struct(self) -> T.StructType:
        return json_schema_to_struct(self.to_json_schema())


def infer_schema_from_flat_records(
    records: Iterable[dict],
    inference_records: int = 50,
    store_raw_json_message: bool = False,
) -> dict:
    """Reference F4 inference loop over already-flattened records.

    Preserves the N+1 off-by-one (tap.py:636-637) and the optional empty
    ``_sdc_raw_json`` object added per record (tap.py:632-634).
    """
    acc = SchemaAccumulator()
    for i, record in enumerate(records):
        if type(record) is not dict:
            raise ValueError("Input must be a dict object.")
        acc.add_record(record)
        if store_raw_json_message:
            # the reference adds this as a SEPARATE genson object
            # (tap.py:632-634), which collapses `required` to the
            # intersection with {_sdc_raw_json} — faithfully mirrored.
            acc.add_record({"_sdc_raw_json": {}})
        if i >= inference_records:
            break
    return acc.to_json_schema()


def infer_schema_from_payloads(
    spark_df,
    payload_col: str,
    flattener,
    inference_records: int = 50,
) -> dict:
    """Sample N+1 payload strings from a DataFrame and infer the schema.

    Uses ``limit(N+1)`` so the scan short-circuits (mirrors the reference
    sampling one page, tap.py:608-618) — never a full collect.
    """
    rows = spark_df.select(payload_col).limit(inference_records + 1).collect()
    flats = (flattener(json.loads(r[0])) for r in rows if r[0] is not None)
    return infer_schema_from_flat_records(flats, inference_records)


def json_schema_to_struct(schema: dict) -> T.StructType:
    """JSON schema (flat properties) -> Spark StructType (F5).

    Type lists containing integer+number widen to double; anything else
    mixed falls back to string. All fields nullable (the tap never
    re-validates rows against the discovered schema, streams.py:588-603).
    """
    fields = []
    for name, prop in schema.get("properties", {}).items():
        jt = prop.get("type", "string")
        if isinstance(jt, list):
            nonnull = [t for t in jt if t != "null"]
            if set(nonnull) <= {"integer", "number"} and nonnull:
                spark_t = T.DoubleType() if "number" in nonnull else T.LongType()
            elif len(nonnull) == 1:
                spark_t = _SPARK_TYPE.get(nonnull[0], T.StringType())
            else:
                spark_t = T.StringType()
        else:
            spark_t = _SPARK_TYPE.get(jt, T.StringType())
        fields.append(T.StructField(name, spark_t, nullable=True))
    return T.StructType(fields)


def struct_from_file(path: str) -> T.StructType:
    """F5 schema-from-file bypass (tap.py:481-484)."""
    with open(path) as fh:
        return json_schema_to_struct(json.load(fh))


_WIDEN_OK = {
    # (from, to) pairs the additive-evolution contract allows
    (T.LongType(), T.DoubleType()),
    (T.IntegerType(), T.LongType()),
    (T.IntegerType(), T.DoubleType()),
    (T.FloatType(), T.DoubleType()),
}


def merge_struct_types(a: T.DataType, b: T.DataType) -> T.DataType:
    """Recursive additive merge of (possibly nested) Spark types.

    Structs merge field-wise (new fields appended nullable); arrays merge
    element types; atomic types widen per ``_WIDEN_OK``; otherwise the
    LEFT type wins (never narrow, never change shape). Used for payload
    schema drift between micro-batches (FX6 evolution semantics).
    """
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        by_name = {f.name: f for f in a.fields}
        out = []
        for f in a.fields:
            bf = next((x for x in b.fields if x.name == f.name), None)
            if bf is None:
                out.append(f)
            else:
                out.append(
                    T.StructField(f.name, merge_struct_types(f.dataType, bf.dataType), True)
                )
        for bf in b.fields:
            if bf.name not in by_name:
                out.append(T.StructField(bf.name, bf.dataType, True))
        return T.StructType(out)
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(merge_struct_types(a.elementType, b.elementType), True)
    if a != b and (a, b) in _WIDEN_OK:
        return b
    return a


def merge_schemas(target: T.StructType, batch: T.StructType) -> T.StructType:
    """Additive evolution: target ∪ batch (SURVEY §4.2).

    New batch columns appended nullable; int->double widening allowed;
    narrowing or incompatible change keeps the target type (row values that
    do not fit are cast, mirroring genson's union-not-replace merge).
    """
    by_name = {f.name: f for f in target.fields}
    out = list(target.fields)
    for bf in batch.fields:
        tf = by_name.get(bf.name)
        if tf is None:
            out.append(T.StructField(bf.name, bf.dataType, nullable=True))
        elif tf.dataType != bf.dataType:
            if (tf.dataType, bf.dataType) in _WIDEN_OK:
                idx = out.index(tf)
                out[idx] = T.StructField(tf.name, bf.dataType, nullable=True)
            # else: keep target type (never narrow)
    return T.StructType(out)
