"""F1/F2 — nested-JSON flattening.

Semantics preserved from the reference (cited, not copied):

* ``flatten_json`` — /root/reference/tap_rest_api_msdk/utils.py:7-75
  - nested dict path keys joined with ``_``
  - output key names translated: ``-`` and ``.`` -> ``_``
  - ``except_keys`` matched against the *untranslated* joined path; the
    matched subtree is serialized with ``json.dumps``
  - any list (at any depth) is serialized with ``json.dumps``
  - scalars pass through unchanged
  - an empty nested dict contributes no keys (reference loop never emits)
  - ``store_raw_json_message`` adds ``_sdc_raw_json`` holding the raw object
* ``unnest_dict`` — /root/reference/tap_rest_api_msdk/utils.py:78-96
  - collapse nested dicts keeping leaf keys only; deepest/last wins

Three execution paths:

1. :func:`flatten_record` — pure-Python kernel (driver-side helper and the
   unit of semantic truth; golden-tested against the reference fixture
   /root/reference/tests/test_utils.py:6-21).
2. :func:`make_flatten_udf` — Arrow-vectorized pandas UDF over a raw
   JSON string column; emits canonical flattened JSON (dynamic keys).  This
   is the *only* Python that touches row data, and it is batch-vectorized —
   no per-row Python UDFs anywhere (BASELINE input_hint).
3. :func:`flatten_projection` — when the payload schema is *known*, a pure
   native column projection (``col("a.b").alias("a_b")``, ``to_json`` for
   arrays/excepted subtrees).  Stays fully inside Catalyst/whole-stage
   codegen: at 100 TB this is the hot path; the pandas UDF only runs for
   schema discovery or truly dynamic keys.
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Optional

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TRANSLATE = str.maketrans("-.", "__")


def translate_key(key: str) -> str:
    """DB-friendly column name: ``-`` and ``.`` -> ``_`` (utils.py:32-43)."""
    return key.translate(_TRANSLATE)


def flatten_record(
    obj: dict,
    except_keys: Optional[list] = None,
    store_raw_json_message: bool = False,
) -> dict:
    """Flatten one record dict exactly like the reference F1 operator."""
    except_set = frozenset(except_keys or ())
    out: dict = {}

    def walk(node: Any, prefix: str) -> None:
        if type(node) is dict:
            for key, value in node.items():
                joined = prefix + key
                if joined in except_set:
                    # match on UNtranslated path, translate only the output key
                    out[translate_key(joined)] = json.dumps(value)
                else:
                    walk(value, joined + "_")
        elif type(node) is list:
            out[translate_key(prefix[:-1])] = json.dumps(node)
        else:
            out[translate_key(prefix[:-1])] = node

    walk(obj, "")
    if store_raw_json_message:
        out["_sdc_raw_json"] = obj
    return out


def unnest_dict(d: dict) -> dict:
    """Collapse nested dicts keeping leaf keys; last writer wins (F2)."""
    result: dict = {}
    for key, value in d.items():
        if isinstance(value, dict):
            result.update(unnest_dict(value))
        else:
            result[key] = value
    return result


# ---------------------------------------------------------------------------
# Path 2: dynamic-schema vectorized kernel (Arrow batches)
# ---------------------------------------------------------------------------

def flatten_json_string(
    payload: Optional[str],
    except_keys: Optional[list] = None,
    store_raw_json_message: bool = False,
) -> Optional[str]:
    """Flatten a raw JSON string -> canonical flattened JSON string.

    Keys are emitted in reference insertion order; ``_sdc_raw_json`` holds
    the raw object (utils.py:72-74). Non-dict top level raises ValueError,
    mirroring streams.py:576-586 / tap.py:622-625.
    """
    if payload is None:
        return None
    obj = json.loads(payload)
    if type(obj) is not dict:
        raise ValueError("Input must be a dict object.")
    return json.dumps(flatten_record(obj, except_keys, store_raw_json_message))


def make_flatten_udf(
    except_keys: Optional[list] = None,
    store_raw_json_message: bool = False,
):
    """Return an Arrow-vectorized pandas UDF: json string -> flattened json.

    One Python round-trip per Arrow batch (not per row). Downstream, parse
    the result natively with ``from_json(col, inferred_schema)``.
    """
    from pyspark.sql.functions import pandas_udf

    keys = list(except_keys or ())
    raw = bool(store_raw_json_message)

    @pandas_udf(T.StringType())
    def _flatten(s: pd.Series) -> pd.Series:
        return s.map(lambda p: flatten_json_string(p, keys, raw))

    return _flatten


# ---------------------------------------------------------------------------
# Path 3: known-schema native projection (zero Python on the hot path)
# ---------------------------------------------------------------------------

def flatten_columns(
    schema: T.StructType,
    except_keys: Optional[Iterable[str]] = None,
    prefix: str = "",
    col_prefix: str = "",
) -> list[Column]:
    """Generate the native flatten projection for a *known* struct schema.

    Mirrors F1 semantics on Spark types: StructType ~ dict (recurse),
    ArrayType ~ list (``to_json``), except-path subtrees ``to_json``.
    Notes:
    * JSON string columns produced here use Spark's compact ``to_json``
      formatting; the pandas kernel uses Python ``json.dumps`` (which
      inserts spaces). Tests compare them JSON-parsed, not byte-equal.
    * Colliding flattened names (``{"a": {"b": 1}, "a_b": 2}`` — or via
      ``-``/``.`` translation) keep the LAST occurrence in field order,
      exactly like the reference's dict overwrite (utils.py:55-69).
    """
    except_set = frozenset(except_keys or ())
    by_name: dict[str, Column] = {}

    def walk(struct: T.StructType, joined: str, path: str) -> None:
        for field in struct.fields:
            jpath = joined + field.name
            cpath = (path + "." if path else "") + f"`{field.name}`"
            out_name = translate_key(jpath)
            if jpath in except_set:
                by_name[out_name] = F.to_json(F.col(cpath)).alias(out_name)
            elif isinstance(field.dataType, T.StructType):
                walk(field.dataType, jpath + "_", cpath)
            elif isinstance(field.dataType, (T.ArrayType, T.MapType)):
                by_name[out_name] = F.to_json(F.col(cpath)).alias(out_name)
            else:
                by_name[out_name] = F.col(cpath).alias(out_name)

    walk(schema, prefix, col_prefix)
    return list(by_name.values())


def flatten_dataframe(
    df: DataFrame,
    payload_col: str,
    payload_schema: T.StructType,
    except_keys: Optional[Iterable[str]] = None,
    keep_cols: Optional[list[str]] = None,
    store_raw_json_message: bool = False,
) -> DataFrame:
    """Flatten a JSON-string OR pre-shredded struct column, fully natively.

    JSON string: ``from_json`` -> struct -> generated projection (Catalyst
    prunes unused nested fields from the parse). Struct (the shredded
    columnar WAL format): the projection reads the struct directly — no
    parse at all, and parquet only materializes the referenced subfields.
    Either way the whole stage stays in codegen.
    """
    keep = [F.col(c) for c in (keep_cols or [c for c in df.columns if c != payload_col])]
    is_struct = isinstance(df.schema[payload_col].dataType, T.StructType)
    if is_struct:
        parsed = df.withColumn("__rec", F.col(payload_col))
    else:
        parsed = df.withColumn("__rec", F.from_json(F.col(payload_col), payload_schema))
    flat = flatten_columns(payload_schema, except_keys, col_prefix="__rec")
    if store_raw_json_message:
        raw = F.to_json(F.col(payload_col)) if is_struct else F.col(payload_col)
        flat = flat + [raw.alias("_sdc_raw_json")]
    return parsed.select(*keep, *flat)
