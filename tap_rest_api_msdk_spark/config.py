"""F6 — pipeline / stream config resolution.

Mirrors the reference's ``discover_streams`` precedence rules
(/root/reference/tap_rest_api_msdk/tap.py:445-555):

* per-stream config overrides top-level config
* ``params`` and ``headers`` are DICT-MERGED, stream entries winning
  (tap.py:462-463)
* ``records_path`` defaults to ``"$[*]"`` (tap.py:457-459)
* pagination knobs resolve from top-level only (tap.py:520-541), except
  ``num_inference_records`` / ``offset_records_jsonpath`` which have
  per-stream overrides
* unknown ``pagination_request_style`` raises ValueError
  (streams.py:338-346); unknown ``pagination_response_style`` silently
  falls back to "page" style (streams.py:155-161) — both quirks preserved
  in plans/planner.py.

In the Spark engine a "stream" is one WAL source (directory/table) feeding
one lake table; the HTTP fields become source/sink identifiers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

DEFAULT_RECORDS_PATH = "$[*]"
DEFAULT_NUM_INFERENCE_RECORDS = 50  # tap.py:92-99
DEFAULT_PAGE_SIZE = 25  # pagination.py:92-96, streams.py:459

REQUEST_STYLES = {
    "jsonpath_paginator",
    "default",
    "simple_header_paginator",
    "header_link_paginator",
    "restapi_header_link_paginator",
    "offset_paginator",
    "style1",
    "hateoas_paginator",
    "single_page_paginator",
    "page_number_paginator",
    "simple_offset_paginator",
}

RESPONSE_STYLES = {"page", "default", "offset", "style1", "header_link", "hateoas_body"}

AUTH_METHODS = {"api_key", "basic", "oauth", "bearer_token", "aws", "no_auth"}

# credential keys the reference's authenticators read (auth.py:144-153,
# 225-275) — carried through as source/sink credential options
_AUTH_KEYS = (
    "auth_method", "api_keys", "username", "password", "bearer_token",
    "access_token_url", "client_id", "client_secret", "refresh_token",
    "grant_type", "scope", "redirect_uri", "oauth_extras",
    "oauth_expiration_secs", "aws_credentials",
)


def validate_auth(config: dict) -> Optional[dict]:
    """A2-A5 config-surface parity (validate-and-map; no HTTP here).

    The engine performs no HTTP, but a tap config carrying ``auth_method``
    must not be silently ignored: this validates it with the reference's
    exact rules and error text — unknown method raises
    (auth.py:276-284), OAuth grant types check their mandatory parameters
    (auth.py:156-179) — and returns the credential options dict a real
    deployment maps onto its source/sink connection (e.g. Kafka SASL,
    object-store credentials). Returns None when no auth is configured.
    """
    method = config.get("auth_method", "")
    if not method:
        return None
    if method == "no_auth":
        # the reference's select_authenticator falls through its
        # elif-chain for "no_auth" and returns no authenticator
        # (auth.py:235-284) — mirror that: no credential dict
        return None
    if method not in AUTH_METHODS:
        raise ValueError(
            f"Unknown authentication method {method}. Use api_key, basic, oauth, "
            f"bearer_token, or aws."
        )
    if method == "oauth":
        grant_type = config.get("grant_type")
        if not grant_type:
            raise ValueError("Missing grant type for OAuth Token.")
        if grant_type == "client_credentials" and not (
            config.get("client_id") and config.get("client_secret")
        ):
            raise ValueError(
                "Missing either client_id or client_secret for "
                "'client_credentials' grant_type."
            )
        if grant_type == "password" and not (
            config.get("username") and config.get("password")
        ):
            raise ValueError(
                "Missing either username or password for 'password' grant_type."
            )
        if grant_type == "refresh_token" and not config.get("refresh_token"):
            raise ValueError(
                "Missing either refresh_token for 'refresh_token' grant_type."
            )
    return {k: config[k] for k in _AUTH_KEYS if k in config}


@dataclass
class StreamConfig:
    """Resolved per-stream configuration (the engine's pipeline unit)."""

    name: str
    path: str = ""
    params: dict = field(default_factory=dict)
    headers: dict = field(default_factory=dict)
    records_path: str = DEFAULT_RECORDS_PATH
    primary_keys: list = field(default_factory=list)
    replication_key: str = ""
    except_keys: list = field(default_factory=list)
    schema: Optional[dict] = None
    schema_file: Optional[str] = None
    start_date: Any = ""
    num_inference_records: int = DEFAULT_NUM_INFERENCE_RECORDS
    source_search_field: str = ""
    source_search_query: str = ""
    offset_records_jsonpath: Optional[str] = None
    next_page_token_path: Optional[str] = None
    pagination_request_style: str = "default"
    pagination_response_style: str = "default"
    pagination_page_size: Optional[int] = None
    pagination_results_limit: Optional[int] = None
    pagination_next_page_param: Optional[str] = None
    pagination_limit_per_page_param: Optional[str] = None
    pagination_total_limit_param: Optional[str] = None
    pagination_initial_offset: int = 1
    use_request_body_not_params: bool = False
    store_raw_json_message: bool = False
    # validated credential options (A2-A5 surface); None = no auth config
    auth: Optional[dict] = None
    # A7 backoff knobs (tap.py:311-340); consumed by backoff_wait_seconds
    backoff_type: Optional[str] = None
    backoff_param: str = "Retry-After"
    backoff_time_extension: int = 0


# keys resolved stream-first with a plain top-level fallback (tap.py:456-477)
_STREAM_OVERRIDABLE = {
    "records_path": DEFAULT_RECORDS_PATH,
    "except_keys": [],
    "path": "",
    "start_date": "",
    "replication_key": "",
    "source_search_field": "",
    "source_search_query": "",
    "offset_records_jsonpath": None,
    "primary_keys": [],
    "num_inference_records": DEFAULT_NUM_INFERENCE_RECORDS,
}

# keys read from the top-level config only (tap.py:520-541)
_TOP_LEVEL_ONLY = {
    "next_page_token_path": None,
    "pagination_request_style": "default",
    "pagination_response_style": "default",
    "pagination_page_size": None,
    "pagination_results_limit": None,
    "pagination_next_page_param": None,
    "pagination_limit_per_page_param": None,
    "pagination_total_limit_param": None,
    "pagination_initial_offset": 1,
    "use_request_body_not_params": False,
    "store_raw_json_message": False,
    "backoff_type": None,
    "backoff_param": "Retry-After",
    "backoff_time_extension": 0,
}


def backoff_wait_seconds(
    backoff_type: Optional[str],
    response_headers: Optional[dict] = None,
    response_message: Optional[str] = None,
    backoff_param: str = "Retry-After",
    backoff_time_extension: int = 0,
) -> Optional[float]:
    """A7 wait-computation parity (streams.py:239-277): how long a throttled
    source asks us to back off.

    * ``"header"`` — int(headers[backoff_param] or 0) + extension
    * ``"message"`` — the LARGEST whitespace-separated integer in the
      response message + extension (the reference's heuristic; like the
      reference, a message with no digits raises ValueError from max([]))
    * anything else (incl. None) — None: caller uses its default policy
      (the reference falls through to the SDK generator; this engine maps
      it to Spark task-retry / trigger pacing — see SCALE.md disposition)
    """
    if backoff_type == "header":
        return int((response_headers or {}).get(backoff_param, 0)) + backoff_time_extension
    if backoff_type == "message":
        res = [int(i) for i in str(response_message or 0).split() if i.isdigit()]
        return int(max(res)) + backoff_time_extension
    return None


def resolve_streams(config: dict) -> list[StreamConfig]:
    """Resolve the raw tap-style config into per-stream configs (F6)."""
    resolved = []
    for stream in config["streams"]:
        kwargs: dict[str, Any] = {"name": stream["name"]}
        for key, default in _STREAM_OVERRIDABLE.items():
            kwargs[key] = stream.get(key, config.get(key, default))
        for key, default in _TOP_LEVEL_ONLY.items():
            val = config.get(key, default)
            kwargs[key] = default if val is None and default is not None else val
        # dict-merge with the stream winning (tap.py:462-463); user_agent
        # becomes the User-Agent header FIRST so explicit headers can
        # override it (streams.py:227-236 ordering)
        kwargs["params"] = {**config.get("params", {}), **stream.get("params", {})}
        ua = stream.get("user_agent", config.get("user_agent"))
        base_headers = {"User-Agent": ua} if ua is not None else {}
        kwargs["headers"] = {
            **base_headers,
            **config.get("headers", {}),
            **stream.get("headers", {}),
        }
        # auth: the reference picks the TAP config WHOLESALE whenever it is
        # present (`if self.config: my_config = self.config elif
        # self._config:`, auth.py:220-223) — the stream-level auth keys only
        # apply when the tap level carries none. Mirror that: tap auth-key
        # set wins as a unit (no per-key merge). Validated HERE so a bad
        # auth config fails at resolve time.
        tap_auth = {k: v for k, v in config.items() if k in _AUTH_KEYS}
        stream_auth = {k: v for k, v in stream.items() if k in _AUTH_KEYS}
        kwargs["auth"] = validate_auth(tap_auth if tap_auth else stream_auth)
        schema_config = stream.get("schema")
        if isinstance(schema_config, str):
            kwargs["schema_file"] = schema_config
        elif isinstance(schema_config, dict):
            kwargs["schema"] = schema_config
        resolved.append(StreamConfig(**kwargs))
    return resolved
