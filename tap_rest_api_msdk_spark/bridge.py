"""Bridge: tap-style JSON config -> runnable Spark pipelines.

A user of the reference carries a ``config.json`` with top-level settings
and a ``streams`` array (README.md:100-170). ``build_pipelines`` resolves
it with the reference's exact precedence rules (config.py / F6) and maps
each stream onto this engine's execution config:

| tap config field | engine meaning |
|---|---|
| ``api_url`` + ``path`` | WAL source directory/table for the stream |
| ``primary_keys`` | merge keys (LWW identity, F9) |
| ``replication_key`` | bookmark / incremental filter column (F10) |
| ``except_keys`` / ``store_raw_json_message`` | flatten options (F1/F12) |
| ``schema`` (file/inline) | fixed record schema (F5) — skips discovery |
| ``start_date`` | bookmark seed (F3) |
| ``pagination_results_limit`` | result cap (F11) |
| ``pagination_*`` styles | offset planner policy (plans/planner.py) |
"""

from __future__ import annotations

import datetime as dt

from tap_rest_api_msdk_spark.config import StreamConfig, resolve_streams
from tap_rest_api_msdk_spark.functions.infer import json_schema_to_struct, struct_from_file
from tap_rest_api_msdk_spark.plans.planner import get_planner
from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig


def pipeline_config_for(stream: StreamConfig, payload_col: str = "payload") -> PipelineConfig:
    """Map one resolved tap stream onto the engine's PipelineConfig."""
    payload_schema = None
    if stream.schema_file:
        payload_schema = struct_from_file(stream.schema_file)
    elif stream.schema:
        payload_schema = json_schema_to_struct(stream.schema)

    start_date = stream.start_date
    if isinstance(start_date, str) and start_date:
        try:
            start_date = dt.datetime.fromisoformat(start_date)
        except ValueError:
            pass  # keep raw value (get_starting_replication_key_value path)

    keys = list(stream.primary_keys) or ["repo", "path"]
    rk = stream.replication_key or "seq"
    return PipelineConfig(
        stream=stream.name,
        keys=keys,
        replication_key=rk,
        order_by=[rk],
        op_col=None,  # reference streams carry no delete ops; CDC mode opts in
        payload_col=payload_col,
        payload_schema=payload_schema,
        except_keys=list(stream.except_keys),
        store_raw_json_message=bool(stream.store_raw_json_message),
        start_date=start_date,
        result_limit=stream.pagination_results_limit,
        inference_records=stream.num_inference_records,
    )


def planner_kwargs_for(stream: StreamConfig) -> dict:
    """Every pagination knob the config resolved, mapped onto planner
    parameters — no config key is accepted-then-ignored. Planners take
    ``**kw``, so the superset is safe to bind for any style:

    * ``next_page_token_path`` serves P1/P2/P6 directly, P5's pagination
      node (``jsonpath=self.next_page_token_jsonpath``, streams.py:316) and
      P8's hasMore path (streams.py:329) — exactly the reference's reuse.
    * ``pagination_initial_offset`` -> P5/P8 ``start_value``
      (streams.py:313,328).
    * ``offset_records_jsonpath`` -> P9 record counting
      (pagination.py:104-112).
    """
    from tap_rest_api_msdk_spark.config import DEFAULT_PAGE_SIZE as _PS

    return {
        "page_size": stream.pagination_page_size or _PS,
        "results_limit": stream.pagination_results_limit,
        "next_page_token_path": stream.next_page_token_path,
        "pagination_jsonpath": stream.next_page_token_path,
        "has_more_jsonpath": stream.next_page_token_path,
        "total_limit_param": stream.pagination_total_limit_param or "total",
        "initial_offset": stream.pagination_initial_offset,
        "offset_records_jsonpath": stream.offset_records_jsonpath,
        "replication_key": stream.replication_key,
    }


def build_pipelines(tap_config: dict) -> list[tuple[StreamConfig, PipelineConfig, object]]:
    """Resolve a full tap config -> [(stream, pipeline conf, planner fn)].

    The planner function implements the stream's pagination style over WAL
    pages with the stream's resolved knobs pre-bound (``planner(pages)``
    just works); unknown request styles raise (streams.py:338-346 parity)
    at build time, not at run time.
    """
    import functools

    out = []
    for stream in resolve_streams(tap_config):
        planner = get_planner(stream.pagination_request_style)
        bound = functools.partial(planner, **planner_kwargs_for(stream))
        out.append((stream, pipeline_config_for(stream), bound))
    return out
