"""P1-P9 / H1-H4 offset-planner parity.

Golden: the two-page sync of /root/reference/tests/test_streams.py:108-135
(page 1 carries next_page=next_page_token -> page 2 requested with
page=next_page_token -> stop), plus each style's stop conditions from
pagination.py.
"""

import pytest

from tap_rest_api_msdk_spark.plans.planner import (
    PlannerError,
    WalPage,
    build_scan_params,
    get_planner,
    jsonpath_get,
    pages_to_slices,
    plan_offset,
    plan_page_number,
    plan_restapi_header_link,
    plan_simple_offset,
)


def test_two_page_golden_jsonpath_default():
    """FX3: page 1 has $.next_page token, page 2 terminates -> 2 pages,
    4 records, page order preserved, and H1 builds page=<token>."""
    pages = [
        WalPage(0, n_records=2, body={"next_page": "next_page_token"}, seq_range=(-1, 2)),
        WalPage(1, n_records=2, body={}, seq_range=(2, 4)),
    ]
    planner = get_planner("jsonpath_paginator")
    planned = planner(iter(pages))
    assert [p.index for p in planned] == [0, 1]
    assert sum(p.n_records for p in planned) == 4
    assert pages_to_slices(planned) == [(-1, 2), (2, 4)]
    # H1 param building: token -> page param (streams.py:348-392)
    out = build_scan_params("default", "next_page_token")
    assert out["params"] == {"page": "next_page_token"}


def test_unknown_request_style_raises_unknown_response_silent():
    with pytest.raises(PlannerError):
        get_planner("nope_paginator")  # streams.py:338-346
    # unknown RESPONSE style silently behaves as page (streams.py:155-161)
    out = build_scan_params("totally_unknown", 3)
    assert out["params"] == {"page": 3}


def test_jsonpath_custom_token_path():
    pages = [
        WalPage(0, body={"meta": {"next": "t1"}}),
        WalPage(1, body={"meta": {}}),
        WalPage(2, body={"meta": {"next": "t3"}}),  # never reached
    ]
    planned = get_planner("default")(iter(pages), next_page_token_path="$.meta.next")
    assert [p.index for p in planned] == [0, 1]


def test_simple_header_paginator_jsonpath_precedence():
    pages = [
        WalPage(0, headers={"X-Next-Page": "2"}),
        WalPage(1, headers={}),
    ]
    assert [p.index for p in get_planner("simple_header_paginator")(iter(pages))] == [0, 1]
    # configured jsonpath takes precedence (streams.py:296-301)
    pages2 = [
        WalPage(0, body={"nxt": "a"}, headers={}),
        WalPage(1, body={}, headers={"X-Next-Page": "9"}),
        WalPage(2),
    ]
    planned = get_planner("simple_header_paginator")(
        iter(pages2), next_page_token_path="$.nxt"
    )
    # page 1 has no jsonpath token but has header -> continues
    assert [p.index for p in planned] == [0, 1, 2]


def test_header_link_paginator():
    pages = [
        WalPage(0, links={"next": {"url": "http://x/p2"}}),
        WalPage(1, links={}),
    ]
    assert [p.index for p in get_planner("header_link_paginator")(iter(pages))] == [0, 1]


def test_restapi_header_link_stop_conditions():
    # stop on page-count * page_size >= results_limit (pagination.py:152-161)
    pages = [
        WalPage(i, n_records=2, body={"items": [{"x": 1}]}, links={"next": {"url": "u"}})
        for i in range(10)
    ]
    planned = plan_restapi_header_link(iter(pages), page_size=2, results_limit=6)
    assert len(planned) == 3
    # stop on empty items even with next link (pagination.py:171-180)
    pages = [
        WalPage(0, body={"items": []}, links={"next": {"url": "u"}}),
        WalPage(1, body={"items": [{"x": 1}]}, links={"next": {"url": "u"}}),
    ]
    assert len(plan_restapi_header_link(iter(pages))) == 1
    # stop on missing url (pagination.py:163-169)
    pages = [WalPage(0, body={"items": [{"x": 1}]}, links={"next": {}})]
    assert len(plan_restapi_header_link(iter(pages))) == 1


def test_restapi_header_link_desc_early_exit():
    """fake_since + direction=desc: stop once last record's replication
    date < since (pagination.py:182-218)."""
    mk = lambda i, date: WalPage(
        i,
        body={"items": [{"updated_at": date}]},
        links={"next": {"url": "u"}},
        request_url=f"http://x/?fake_since=2024-01-05T00:00:00&direction=desc&page={i}",
    )
    pages = [mk(0, "2024-01-09T00:00:00"), mk(1, "2024-01-03T00:00:00"), mk(2, "2024-01-01T00:00:00")]
    planned = plan_restapi_header_link(
        iter(pages), replication_key="updated_at", use_fake_since=True
    )
    assert [p.index for p in planned] == [0, 1]
    # ascending (no direction=desc): no early exit
    pages = [
        WalPage(
            0,
            body={"items": [{"updated_at": "2024-01-01"}]},
            links={"next": {"url": "u"}},
            request_url="http://x/?fake_since=2024-01-05",
        ),
        WalPage(1, body={"items": [{"updated_at": "2024-01-02"}]}, links={}),
    ]
    planned = plan_restapi_header_link(
        iter(pages), replication_key="updated_at", use_fake_since=True
    )
    assert len(planned) == 2


def test_offset_paginator_semantics():
    """Continue while offset+limit <= total; nested pagination node is
    unnest_dict'd; missing total param -> 0 (pagination.py:42-77)."""
    mk = lambda i, off, lim, tot: WalPage(
        i, body={"pagination": {"cursors": {"offset": off}, "limit": lim, "total": tot}}
    )
    pages = [mk(0, 0, 2, 5), mk(1, 2, 2, 5), mk(2, 4, 2, 5), mk(3, 6, 2, 5)]
    planned = plan_offset(iter(pages))
    # offsets 0,2 continue (0+2<=5, 2+2<=5); 4+2>5 stops at page 2
    assert [p.index for p in planned] == [0, 1, 2]
    # missing total -> 0 -> stop immediately after first page
    pages = [WalPage(0, body={"pagination": {"offset": 0, "limit": 2}}), WalPage(1)]
    assert len(plan_offset(iter(pages))) == 1
    # custom total param name (pagination_total_limit_param)
    pages = [
        WalPage(0, body={"pagination": {"offset": 0, "limit": 2, "grand_total": 3}}),
        WalPage(1, body={"pagination": {"offset": 2, "limit": 2, "grand_total": 3}}),
    ]
    assert len(plan_offset(iter(pages), total_limit_param="grand_total")) == 2


def test_hateoas_paginator():
    pages = [
        WalPage(0, body={"link": [{"relation": "next", "url": "http://x/page/2?a=1"}]}),
        WalPage(1, body={"link": [{"relation": "self", "url": "http://x/page/2"}]}),
    ]
    assert [p.index for p in get_planner("hateoas_paginator")(iter(pages))] == [0, 1]


def test_single_page_paginator():
    pages = [WalPage(0, body={"next_page": "t"}), WalPage(1)]
    assert [p.index for p in get_planner("single_page_paginator")(iter(pages))] == [0]
    assert get_planner("single_page_paginator")(iter([])) == []


def test_page_number_paginator():
    pages = [
        WalPage(0, body={"hasMore": True}),
        WalPage(1, body={"hasMore": False}),
        WalPage(2, body={"hasMore": True}),
    ]
    assert [p.index for p in plan_page_number(iter(pages))] == [0, 1]
    # jsonpath override (pagination.py:36-39)
    pages = [WalPage(0, body={"meta": {"more": True}}), WalPage(1, body={"meta": {}})]
    assert len(plan_page_number(iter(pages), has_more_jsonpath="$.meta.more")) == 2


def test_simple_offset_drain_until_short_page():
    pages = [WalPage(0, n_records=25), WalPage(1, n_records=25), WalPage(2, n_records=7), WalPage(3, n_records=25)]
    assert [p.index for p in plan_simple_offset(iter(pages))] == [0, 1, 2]
    # custom page size
    pages = [WalPage(0, n_records=3), WalPage(1, n_records=2)]
    assert len(plan_simple_offset(iter(pages), page_size=3)) == 2


def test_build_scan_params_offset_style():
    out = build_scan_params("offset", 50, page_size=25)
    assert out["params"] == {"offset": 50, "limit": 25}
    out = build_scan_params(
        "style1", 50, page_size=25, next_page_param="from", limit_per_page_param="size"
    )
    assert out["params"] == {"from": 50, "size": 25}


def test_build_scan_params_header_link_query_string():
    # token = query string of next URL (pagination.py:220-226); parse_qs
    # values stay lists exactly like the reference (streams.py:475-478)
    out = build_scan_params("header_link", "page=3&per_page=25", page_size=25)
    assert out["params"]["page"] == ["3"]
    assert out["params"]["per_page"] == ["25"]


def test_build_scan_params_h1_h2_incremental_block():
    # search template substituted into the search field (streams.py:373-390)
    out = build_scan_params(
        "default", None, replication_key="updated",
        source_search_field="q", source_search_query="updated>$last_run_date",
        last_run_date="2024-01-01T00:00:00",
    )
    assert out["params"]["q"] == "updated>2024-01-01T00:00:00"
    # request-body mode parses the substituted query as JSON
    out = build_scan_params(
        "offset", 10, page_size=5, replication_key="u",
        source_search_field="query",
        source_search_query='{"range": {"u": {"gt": "$last_run_date"}}}',
        last_run_date="2024-06-01", use_request_body_not_params=True,
    )
    assert out["params"]["query"] == {"range": {"u": {"gt": "2024-06-01"}}}
    assert out["params"]["offset"] == 10 and out["params"]["limit"] == 5
    # no template -> server-side ascending sort (streams.py:388-390)
    out = build_scan_params("default", None, replication_key="updated")
    assert out["params"] == {"sort": "asc", "order_by": "updated"}


def test_build_scan_params_header_link_github_rules():
    import datetime as dt

    since = dt.datetime(2024, 1, 2, 3, 4, 5, tzinfo=dt.timezone.utc)
    out = build_scan_params(
        "header_link", None, replication_key="updated_at", since=since
    )
    assert out["params"]["sort"] == "updated" and out["params"]["direction"] == "asc"
    assert out["params"]["since"] == since
    assert "If-modified-since" in out["headers"]  # streams.py:502-508
    # fake_since flips to desc + the workaround param (streams.py:480-494)
    out = build_scan_params(
        "header_link", None, replication_key="updated_at",
        since=since, use_fake_since=True,
    )
    assert out["params"]["direction"] == "desc" and "fake_since" in out["params"]
    out = build_scan_params("header_link", None, replication_key="starred_at")
    assert out["params"]["sort"] == "created" and out["params"]["direction"] == "desc"
    out = build_scan_params("header_link", None, replication_key="commit_timestamp")
    assert out["params"]["direction"] == "desc" and "sort" not in out["params"]


def test_build_scan_params_hateoas_fallbacks():
    # no token + search field but no template -> "gt"+last_run_date
    out = build_scan_params(
        "hateoas_body", None, replication_key="modified",
        source_search_field="modified", last_run_date="2024-03-04",
    )
    assert out["params"]["modified"] == "gt2024-03-04"
    # bare query-string token: path == token -> path reset (streams.py:548-553)
    out = build_scan_params("hateoas_body", "cursor=abc", current_path="/v1")
    assert out["params"]["cursor"] == "abc" and out["path"] == ""
    # page-size only applied when BOTH knobs configured (streams.py:541-543)
    out = build_scan_params("hateoas_body", None, page_size=10)
    assert "limit" not in out["params"] and out["params"] == {}
    out = build_scan_params(
        "hateoas_body", None, page_size=10, limit_per_page_param="count"
    )
    assert out["params"] == {"count": 10}


def test_build_scan_params_hateoas_path_mutation():
    out = build_scan_params(
        "hateoas_body", "http://api/v2/items?cursor=abc", current_path="/v1/items"
    )
    assert out["params"] == {"cursor": "abc"}
    assert out["path"] == "/v2/items"  # streams.py:545-555


def test_jsonpath_get_subset():
    assert jsonpath_get("$.a.b", {"a": {"b": 3}}) == 3
    assert jsonpath_get("a.b", {"a": {"b": 3}}) == 3
    assert jsonpath_get("$.a.b", {"a": {}}) is None
    assert jsonpath_get(None, {"a": 1}) is None
