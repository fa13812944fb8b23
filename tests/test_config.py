"""F6 parity — config resolution fixture from
/root/reference/tests/test_tap.py:39-63 (two streams resolve independently;
records_path default; params/headers dict-merge with stream winning).
"""

from tap_rest_api_msdk_spark.config import DEFAULT_RECORDS_PATH, resolve_streams


def test_multiple_streams_resolve_independently():
    config = {
        "api_url": "http://example.com",
        "pagination_request_style": "default",
        "pagination_response_style": "default",
        "streams": [
            {
                "name": "one",
                "path": "/one",
                "primary_keys": ["k1"],
                "replication_key": "rk1",
                "records_path": "$.data[*]",
            },
            {
                "name": "two",
                "path": "/two",
                "primary_keys": ["k2"],
            },
        ],
    }
    streams = resolve_streams(config)
    assert [s.name for s in streams] == ["one", "two"]
    assert streams[0].records_path == "$.data[*]"
    assert streams[1].records_path == DEFAULT_RECORDS_PATH  # tap.py:457-459
    assert streams[0].primary_keys == ["k1"]
    assert streams[1].replication_key == ""


def test_params_headers_dict_merge_stream_wins():
    config = {
        "params": {"a": 1, "b": 2},
        "headers": {"h": "top"},
        "streams": [{"name": "s", "params": {"b": 20, "c": 3}, "headers": {"h": "stream"}}],
    }
    s = resolve_streams(config)[0]
    assert s.params == {"a": 1, "b": 20, "c": 3}  # tap.py:462-463
    assert s.headers == {"h": "stream"}


def test_top_level_fallback_and_pagination_top_only():
    config = {
        "replication_key": "updated",
        "pagination_request_style": "offset_paginator",
        "pagination_page_size": 100,
        "streams": [{"name": "s", "pagination_page_size": 7}],  # ignored: top-level-only
    }
    s = resolve_streams(config)[0]
    assert s.replication_key == "updated"
    assert s.pagination_request_style == "offset_paginator"
    assert s.pagination_page_size == 100


def test_schema_file_vs_inline():
    config = {
        "streams": [
            {"name": "f", "schema": "/tmp/schema.json"},
            {"name": "o", "schema": {"properties": {"x": {"type": "string"}}}},
            {"name": "i"},
        ]
    }
    f, o, i = resolve_streams(config)
    assert f.schema_file == "/tmp/schema.json" and f.schema is None
    assert o.schema == {"properties": {"x": {"type": "string"}}}
    assert i.schema is None and i.schema_file is None


def test_user_agent_becomes_header_with_override():
    """A6: user_agent -> User-Agent header, set BEFORE the headers merge so
    explicit headers win (streams.py:227-236 ordering)."""
    from tap_rest_api_msdk_spark.config import resolve_streams

    cfg = {
        "user_agent": "acme-tap/1.0",
        "headers": {"X-Top": "1"},
        "streams": [
            {"name": "a"},
            {"name": "b", "headers": {"User-Agent": "override/2.0"}},
        ],
    }
    a, b = resolve_streams(cfg)
    assert a.headers == {"User-Agent": "acme-tap/1.0", "X-Top": "1"}
    assert b.headers["User-Agent"] == "override/2.0"


def test_backoff_wait_parity():
    """A7: wait computation mirrors streams.py:239-277 exactly."""
    import pytest

    from tap_rest_api_msdk_spark.config import backoff_wait_seconds, resolve_streams

    # header style: Retry-After + extension; missing header -> 0 + ext
    assert backoff_wait_seconds("header", {"Retry-After": "30"},
                                backoff_time_extension=5) == 35
    assert backoff_wait_seconds("header", {}, backoff_time_extension=5) == 5
    assert backoff_wait_seconds("header", {"X-Wait": "9"},
                                backoff_param="X-Wait") == 9
    # message style: LARGEST integer in the message
    assert backoff_wait_seconds(
        "message", response_message="rate limited, retry in 120 seconds (code 429)"
    ) == 120  # "429)" is not isdigit(); max over clean integer tokens
    assert backoff_wait_seconds(
        "message", response_message="retry in 30 or 600 seconds"
    ) == 600  # the reference takes the LARGEST integer — quirk preserved
    # reference quirk: digit-free message -> max([]) raises
    with pytest.raises(ValueError):
        backoff_wait_seconds("message", response_message="slow down please")
    # anything else -> None (default policy)
    assert backoff_wait_seconds(None) is None
    assert backoff_wait_seconds("exotic") is None

    # the config keys resolve (no silently-dropped knob)
    (s,) = resolve_streams({"streams": [{"name": "s"}], "backoff_type": "header",
                            "backoff_param": "X-RL", "backoff_time_extension": 3})
    assert (s.backoff_type, s.backoff_param, s.backoff_time_extension) == ("header", "X-RL", 3)
