"""Full-grammar jsonpath: evaluator parity with the reference's documented
usage (README.md:376-385), the two previously-dead pagination knobs
(offset_records_jsonpath, pagination_initial_offset), and the pandas-UDF
records_path fallback."""

import pytest

from tap_rest_api_msdk_spark.plans.jsonpath import find_all, find_first, parse
from tap_rest_api_msdk_spark.plans.planner import (
    WalPage,
    plan_hateoas,
    plan_offset,
    plan_page_number,
    plan_simple_offset,
)

FHIR = {
    "resourceType": "Bundle",
    "total": 63,
    "link": [
        {"relation": "self", "url": "https://api/base?_count=10&_getpageoffset=10"},
        {"relation": "next", "url": "https://api/base?_getpages=44f2&_count=10"},
    ],
    "entry": [
        {"fullUrl": "u1", "resource": {"resourceType": "Svc", "id": "svc-1"}},
        {"fullUrl": "u2", "resource": {"resourceType": "Svc", "id": "svc-2"}},
    ],
}


def test_predicate_path_readme_example():
    # README.md:379 — the exact documented path (incl. its trailing dot)
    assert find_first("$.link[?(@.relation=='next')].url.", FHIR) == (
        "https://api/base?_getpages=44f2&_count=10"
    )
    assert find_first("$.link[?(@.relation=='self')].url", FHIR).endswith("offset=10")


def test_split_extension_readme_example():
    # README.md:384 — split the next URL on '?' and keep the params segment
    got = find_first("$.link[?(@.relation=='next')].url.`split(?, 1, 1)`", FHIR)
    assert got == "_getpages=44f2&_count=10"


def test_records_path_wildcard_and_bracket():
    assert [r["id"] for r in find_all("$.entry[*].resource", FHIR)] == ["svc-1", "svc-2"]
    assert find_first("$['@odata.nextLink']", {"@odata.nextLink": "n2"}) == "n2"
    assert find_first("$.entry[1].fullUrl", FHIR) == "u2"
    assert find_first("$.metadata.resultset", {"metadata": {"resultset": {"o": 1}}}) == {"o": 1}


def test_numeric_predicate_and_misses():
    data = {"items": [{"n": 1, "v": "a"}, {"n": 5, "v": "b"}]}
    assert [m["v"] for m in find_all("$.items[?(@.n>=5)]", data)] == ["b"]
    assert find_first("$.nope.deeper", data) is None
    assert find_all("$.items[?(@.missing=='x')]", data) == []


def test_unsupported_syntax_raises():
    with pytest.raises(ValueError, match="unsupported jsonpath"):
        parse("$.a[?(@.x =~ 'regex')]")


def test_plan_hateoas_with_configured_predicate_path():
    pages = [
        WalPage(index=0, body=FHIR),
        WalPage(index=1, body={"link": [{"relation": "self", "url": "u"}]}),
        WalPage(index=2, body={}),
    ]
    planned = plan_hateoas(iter(pages), next_page_token_path="$.link[?(@.relation=='next')].url")
    assert [p.index for p in planned] == [0, 1]


def test_simple_offset_records_jsonpath():
    # P9 counts len(first match) — pagination.py:104-112
    full = {"contacts": [{"i": i} for i in range(3)]}
    short = {"contacts": [{"i": 0}]}
    pages = [WalPage(0, body=full), WalPage(1, body=full), WalPage(2, body=short),
             WalPage(3, body=full)]
    planned = plan_simple_offset(
        iter(pages), page_size=3, offset_records_jsonpath="$.contacts"
    )
    assert [p.index for p in planned] == [0, 1, 2]
    # no match at all -> 0 records -> short page -> stop after first
    planned = plan_simple_offset(
        iter(pages), page_size=3, offset_records_jsonpath="$.wrong"
    )
    assert [p.index for p in planned] == [0]


def test_offset_initial_offset_token_sequence():
    # P5 start_value parity (streams.py:312-321): tokens initial + i*size
    body = {"pagination": {"offset": 0, "limit": 10, "total": 100}}
    pages = [WalPage(i, body=dict(body)) for i in range(3)]
    planned = plan_offset(iter(pages), page_size=10, initial_offset=5)
    assert [p.next_token for p in planned] == [15, 25, 35]


def test_page_number_initial_offset_token_sequence():
    pages = [WalPage(0, body={"hasMore": True}), WalPage(1, body={"hasMore": False})]
    planned = plan_page_number(iter(pages), initial_offset=3)
    assert [p.next_token for p in planned] == [4, 5]


def test_bridge_binds_all_pagination_knobs():
    from tap_rest_api_msdk_spark.bridge import build_pipelines

    cfg = {
        "streams": [{"name": "s", "primary_keys": ["id"], "replication_key": "seq"}],
        "pagination_request_style": "simple_offset_paginator",
        "pagination_page_size": 3,
        "offset_records_jsonpath": "$.contacts",
        "pagination_initial_offset": 7,
    }
    (_, _, planner), = build_pipelines(cfg)
    full = {"contacts": [{}, {}, {}]}
    pages = [WalPage(0, body=full), WalPage(1, body={"contacts": [{}]}), WalPage(2, body=full)]
    assert [p.index for p in planner(iter(pages))] == [0, 1]


def test_extract_records_jsonpath_udf(spark):
    import json

    from tap_rest_api_msdk_spark.sources.reader import (
        extract_records_auto,
        extract_records_jsonpath,
        records_path_is_native,
    )

    assert records_path_is_native("$.data[*]") and records_path_is_native("$.a.b")
    assert not records_path_is_native("$.entry[?(@.k=='v')].r")

    rows = [(i, json.dumps(FHIR)) for i in range(4)]
    df = spark.createDataFrame(rows, "page long, payload string")
    out = extract_records_jsonpath(df, "payload", "$.entry[*].resource")
    got = out.collect()
    assert len(got) == 8 and set(out.columns) == {"page", "record"}
    assert json.loads(got[0].record)["resourceType"] == "Svc"

    # predicate path through the auto dispatcher (falls back to the kernel)
    out2 = extract_records_auto(df, "payload", "$.link[?(@.relation=='next')].url")
    assert out2.count() == 4
    assert json.loads(out2.first().record).startswith("https://api/base?_getpages")

    with pytest.raises(ValueError, match="unsupported jsonpath"):
        extract_records_jsonpath(df, "payload", "$.a[?(@.x =~ 'r')]")
