"""THE migration claim, literally: the reference repo's own
config.sample.json (a FHIR API tap config) must resolve, build pipelines,
plan pages with its predicate jsonpath, extract its records_path, and
render its search query — unchanged."""

import json

from tap_rest_api_msdk_spark.bridge import build_pipelines
from tap_rest_api_msdk_spark.plans.planner import WalPage, build_scan_params
from tap_rest_api_msdk_spark.sources.reader import render_search_query

SAMPLE = "/root/reference/config.sample.json"

FHIR_BODY = {
    "resourceType": "Bundle",
    "total": 2,
    "link": [
        {"relation": "self", "url": "https://api/base?_count=100"},
        {"relation": "next", "url": "https://api/base?_getpages=tok&_count=100"},
    ],
    "entry": [
        {"fullUrl": "u1", "resource": {"id": "a", "meta_lastUpdated": "2024-01-01"}},
        {"fullUrl": "u2", "resource": {"id": "b", "meta_lastUpdated": "2024-01-02"}},
    ],
}


def load():
    with open(SAMPLE) as fh:
        return json.load(fh)


def test_sample_config_builds_pipelines():
    (stream, conf, planner), = build_pipelines(load())
    assert stream.name == "my_sample_table_name"
    assert conf.keys == ["id"]
    assert conf.replication_key == "meta_lastUpdated"
    assert stream.records_path == "$.entry[*].resource"
    assert stream.headers["X-API-KEY"].startswith("my_secret")
    # its predicate next_page_token_path drives the (pre-bound) planner
    pages = [
        WalPage(0, body=FHIR_BODY),
        WalPage(1, body={"link": [{"relation": "self", "url": "u"}]}),
        WalPage(2, body={}),
    ]
    assert [p.index for p in planner(iter(pages))] == [0, 1]


def test_sample_config_records_path_extracts(spark):
    cfg = load()
    records_path = cfg["streams"][0]["records_path"]
    df = spark.createDataFrame([(json.dumps(FHIR_BODY),)], "payload string")
    from tap_rest_api_msdk_spark.sources.reader import extract_records_auto

    out = extract_records_auto(df, "payload", records_path)
    recs = [json.loads(r.record) for r in out.collect()]
    assert [r["id"] for r in recs] == ["a", "b"]


def test_sample_config_search_query_and_params():
    cfg = load()
    s = cfg["streams"][0]
    rendered = render_search_query(s["source_search_query"], "2024-05-01T00:00:00")
    assert rendered == "gt2024-05-01T00:00:00"
    # hateoas_body response style consumes the next URL's query params
    out = build_scan_params(
        cfg["pagination_response_style"],
        token="https://api/base?_getpages=tok&_count=100",
        params=s["params"],
        page_size=cfg["pagination_page_size"],
    )
    assert out["params"]["_getpages"] == "tok"
    assert out["params"]["services-provided-type"] == "MY_INITIAL_EXAMPLE_SERVICE"
