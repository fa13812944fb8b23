"""P1-P9 / H1-H4 — micro-batch offset planning over the WAL.

In the reference, pagination decides *which request comes next and when to
stop* (streams.py:279-346 dispatch; pagination.py stop conditions). In this
engine the WAL directory plays the API: each slice file is a "page", its
sidecar metadata the "response envelope". The planner walks pages with
exactly the reference's per-style stop rules and emits the ordered scan
list — which the pipeline turns into micro-batch (start, end] seq ranges.

Semantic quirks preserved:
* unknown **request** style -> ``ValueError`` (streams.py:338-346)
* unknown **response** style silently falls back to "page" behavior
  (streams.py:155-161)
* P4: stops on page-count limit, missing/empty next link, empty items,
  and the descending ``fake_since`` early exit (pagination.py:152-218)
* P5: continue while ``offset + limit <= total`` where ``total`` comes
  from ``pagination_total_limit_param`` (default ``total``), missing -> 0,
  and the pagination node is ``unnest_dict``-flattened first
  (pagination.py:64-77)
* P9: continue while the page is FULL (len == page_size, default 25)
  (pagination.py:104-112)
* P8: ``hasMore`` body key, or jsonpath override (pagination.py:36-39)
* driver-side jsonpath subset: dotted ``$.a.b`` paths (the reference's
  token paths in practice; filter-expressions are out of scope here).

These planners are pure driver-side control plane: they never touch row
data, so at 100 TB their cost is O(pages) metadata reads.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional
from urllib.parse import parse_qs, urlparse

from tap_rest_api_msdk_spark.functions.flatten import unnest_dict

DEFAULT_PAGE_SIZE = 25


@dataclass
class WalPage:
    """One WAL slice + its response-envelope metadata.

    ``body``   — the envelope dict (tokens, pagination node, hasMore, items)
    ``headers``— header-channel tokens (X-Next-Page, link rel=next)
    ``links``  — parsed link header: {"next": {"url": ...}}
    ``n_records`` — record count in the slice
    ``seq_range`` — (start_seq, end_seq] the slice covers in the WAL
    """

    index: int
    n_records: int = 0
    body: dict = field(default_factory=dict)
    headers: dict = field(default_factory=dict)
    links: dict = field(default_factory=dict)
    seq_range: Optional[tuple] = None
    request_url: str = ""
    # set by offset/page-number planners: the continuation token the NEXT
    # request would carry (start_value=pagination_initial_offset parity,
    # streams.py:312-321,327-330); consumed by build_scan_params
    next_token: Any = None


def jsonpath_get(path: Optional[str], obj: Any) -> Any:
    """First jsonpath match (full grammar: dotted/bracket fields, ``[*]``,
    indexes, ``[?(@.field=='v')]`` predicates, the ``split`` extension —
    see plans/jsonpath.py). ``next(extract_jsonpath(...), None)`` parity."""
    if not path:
        return None
    from tap_rest_api_msdk_spark.plans.jsonpath import find_first

    return find_first(path, obj)


# ---------------------------------------------------------------------------
# request-style planners: page stream -> ordered list of scanned pages
# ---------------------------------------------------------------------------

class PlannerError(ValueError):
    pass


def _token_chain(pages, token_fn: Callable[[WalPage], Any], limit_records=None):
    """Shared walk: scan page, extract continuation token, stop on None."""
    out = []
    total = 0
    for page in pages:
        out.append(page)
        total += page.n_records
        if limit_records and total >= limit_records:
            break
        if token_fn(page) is None:
            break
    return out


def plan_jsonpath(pages, next_page_token_path: Optional[str] = None, **kw):
    """P1 — default token path ``$.next_page`` (streams.py:126-134)."""
    path = next_page_token_path or "$.next_page"
    return _token_chain(pages, lambda p: jsonpath_get(path, p.body), kw.get("results_limit"))


def plan_simple_header(pages, next_page_token_path: Optional[str] = None, **kw):
    """P2 — header ``X-Next-Page``; configured jsonpath takes precedence
    (streams.py:296-301)."""
    def token(p: WalPage):
        if next_page_token_path:
            t = jsonpath_get(next_page_token_path, p.body)
            if t is not None:
                return t
        return p.headers.get("X-Next-Page")

    return _token_chain(pages, token, kw.get("results_limit"))


def plan_header_link(pages, **kw):
    """P3 — RFC-5988 Link rel=next."""
    return _token_chain(
        pages, lambda p: (p.links.get("next") or {}).get("url"), kw.get("results_limit")
    )


def _rep_date_before(rep_date, since) -> bool:
    """P4 early-exit comparison: parse both sides as datetimes (the
    reference parses with dateutil, pagination.py:212-218) so timestamps
    with differing offsets/formats order correctly; fall back to string
    comparison only when either side doesn't parse."""
    from datetime import datetime

    def _parse(v):
        s = str(v).strip().replace("Z", "+00:00")
        try:
            return datetime.fromisoformat(s)
        except ValueError:
            return None

    a, b = _parse(rep_date), _parse(since)
    if a is not None and b is not None:
        try:
            return a < b
        except TypeError:  # aware vs naive mix: fall back to strings
            pass
    return str(rep_date) < str(since)


def plan_restapi_header_link(
    pages,
    page_size: int = DEFAULT_PAGE_SIZE,
    results_limit: Optional[int] = None,
    replication_key: Optional[str] = None,
    use_fake_since: bool = False,
    **kw,
):
    """P4 — GitHub-style header-link with early exits (pagination.py:115-226)."""
    out = []
    page_count = 0
    for page in pages:
        out.append(page)
        page_count += 1
        # record-limit clean exit (pagination.py:152-161)
        if results_limit and page_count * page_size >= results_limit:
            break
        nxt = (page.links.get("next") or {}).get("url")
        if not nxt:
            break
        items = page.body if isinstance(page.body, list) else page.body.get("items")
        if not items:
            break
        if replication_key and use_fake_since:
            q = parse_qs(str(urlparse(page.request_url).query))
            since = q.get("fake_since", [""])[0].replace(" ", "+")
            direction = q.get("direction", [None])[0]
            last = items[-1]
            rep_date = (
                last.get("commit", {}).get("committer", {}).get("date")
                if replication_key == "commit_timestamp"
                else last.get(replication_key)
            )
            if since and direction == "desc" and rep_date is not None and _rep_date_before(rep_date, since):
                break
    return out


def plan_offset(
    pages,
    page_size: int = DEFAULT_PAGE_SIZE,
    total_limit_param: str = "total",
    pagination_jsonpath: Optional[str] = None,
    initial_offset: int = 1,
    **kw,
):
    """P5 — offset+limit vs total (pagination.py:42-77).

    ``initial_offset`` mirrors ``RestAPIOffsetPaginator(start_value=
    pagination_initial_offset)`` (streams.py:312-321): the offset token the
    (i+1)-th request carries is ``initial_offset + (i+1) * page_size``
    (BaseOffsetPaginator.get_next = current + page_size), annotated on each
    planned page as ``next_token`` for build_scan_params.
    """
    out = []
    for i, page in enumerate(pages):
        page.next_token = initial_offset + (i + 1) * page_size
        out.append(page)
        node = (
            jsonpath_get(pagination_jsonpath, page.body)
            if pagination_jsonpath
            else page.body.get("pagination")
        )
        if node:
            node = unnest_dict(node)
        if not (node and all(x in node for x in ("offset", "limit"))):
            break
        if node["offset"] + node["limit"] > node.get(total_limit_param, 0):
            break
    return out


def plan_hateoas(pages, next_page_token_path: Optional[str] = None, **kw):
    """P6 — full next URL in body (streams.py:322-323; README.md:391-425).

    A configured ``next_page_token_path`` is evaluated with the full
    jsonpath grammar (predicates + split, e.g. the README's own
    ``$.link[?(@.relation=='next')].url``); the default walks the FHIR
    ``link[].relation=='next'`` shape — the same selection.
    """
    def token(p: WalPage):
        if next_page_token_path:
            return jsonpath_get(next_page_token_path, p.body)
        for link in p.body.get("link", []):
            if link.get("relation") == "next":
                return link.get("url")
        return None

    return _token_chain(pages, token, kw.get("results_limit"))


def plan_single_page(pages, **kw):
    """P7 — exactly one request."""
    for page in pages:
        return [page]
    return []


def plan_page_number(
    pages, has_more_jsonpath: Optional[str] = None, initial_offset: int = 1, **kw
):
    """P8 — continue while hasMore (pagination.py:17-39).

    ``initial_offset`` mirrors ``RestAPIBasePageNumberPaginator(
    start_value=pagination_initial_offset)`` (streams.py:327-330): page
    tokens run initial+1, initial+2, ... (get_next = current + 1),
    annotated as ``next_token``.
    """
    def token(p: WalPage):
        more = (
            jsonpath_get(has_more_jsonpath, p.body)
            if has_more_jsonpath
            else p.body.get("hasMore", None)
        )
        return True if more else None

    out = _token_chain(pages, token, kw.get("results_limit"))
    for i, page in enumerate(out):
        page.next_token = initial_offset + i + 1
    return out


def plan_simple_offset(
    pages,
    page_size: int = DEFAULT_PAGE_SIZE,
    offset_records_jsonpath: Optional[str] = None,
    **kw,
):
    """P9 — drain until a short page (pagination.py:80-112).

    With ``offset_records_jsonpath`` configured, the record count is
    ``len(first jsonpath match)`` in the response body — exactly
    ``SimpleOffsetPaginator.has_more`` (pagination.py:104-112). No match
    counts as 0 records (a short page -> stop; the reference would hit
    ``len(0)`` -> TypeError on its ``next(..., 0)`` default — we stop
    cleanly instead of crashing). Without it, the slice's own record count
    is used.
    """
    out = []
    for page in pages:
        out.append(page)
        if offset_records_jsonpath:
            recs = jsonpath_get(offset_records_jsonpath, page.body)
            n = len(recs) if isinstance(recs, (list, dict, str)) else 0
        else:
            n = page.n_records
        if n != page_size:
            break
    return out


_REQUEST_PLANNERS = {
    "jsonpath_paginator": plan_jsonpath,
    "default": plan_jsonpath,
    "simple_header_paginator": plan_simple_header,
    "header_link_paginator": plan_header_link,
    "restapi_header_link_paginator": plan_restapi_header_link,
    "offset_paginator": plan_offset,
    "style1": plan_offset,
    "hateoas_paginator": plan_hateoas,
    "single_page_paginator": plan_single_page,
    "page_number_paginator": plan_page_number,
    "simple_offset_paginator": plan_simple_offset,
}


def get_planner(pagination_request_style: str) -> Callable:
    """Dispatch on request style; unknown -> ValueError (streams.py:338-346)."""
    try:
        return _REQUEST_PLANNERS[pagination_request_style]
    except KeyError:
        raise PlannerError(
            f"Unknown pagination_request_style: {pagination_request_style}"
        ) from None


# ---------------------------------------------------------------------------
# response-style param builders (H1-H4): token -> next-scan parameters
# ---------------------------------------------------------------------------

def _incremental_params(
    params: dict,
    replication_key: str,
    last_run_date: Any,
    source_search_field: str,
    source_search_query: str,
    use_request_body_not_params: bool,
) -> None:
    """Shared H1/H2 incremental-filter block (streams.py:373-390,426-443):
    a configured search template is ``$last_run_date``-substituted into the
    search field (JSON-parsed in request-body mode); otherwise ask the
    server to sort ascending by the replication key."""
    import json as _json
    from string import Template

    if not replication_key:
        return
    if source_search_field and source_search_query and last_run_date:
        rendered = Template(source_search_query).substitute(last_run_date=last_run_date)
        params[source_search_field] = (
            _json.loads(rendered) if use_request_body_not_params else rendered
        )
    else:
        params["sort"] = "asc"
        params["order_by"] = replication_key


def build_scan_params(
    pagination_response_style: str,
    token: Any,
    params: Optional[dict] = None,
    page_size: Optional[int] = None,
    next_page_param: Optional[str] = None,
    limit_per_page_param: Optional[str] = None,
    current_path: str = "",
    replication_key: str = "",
    last_run_date: Any = None,
    source_search_field: str = "",
    source_search_query: str = "",
    use_request_body_not_params: bool = False,
    use_fake_since: bool = False,
    since: Any = None,
) -> dict:
    """Next-request parameters from a continuation token — a faithful
    mirror of the reference's per-response-style URL-param builders.

    H1 page (streams.py:348-392), H2 offset (394-445), H3 header_link
    (447-510, incl. GitHub sort/direction rules per replication key and
    the since / If-modified-since conditional-request header), H4
    hateoas_body (512-574, incl. the stateful path mutation and the
    ``"gt"+last_run_date`` fallback). Unknown style -> H1 silently
    (streams.py:155-161).

    Returns {"params", "path", "headers"}.
    """
    import email.utils

    style = pagination_response_style
    out: dict[str, Any] = dict(params or {})
    headers: dict[str, str] = {}
    path = current_path

    if style in ("offset", "style1"):
        if token is not None:
            out[next_page_param or "offset"] = token
        if page_size is not None:
            out[limit_per_page_param or "limit"] = page_size
        _incremental_params(
            out, replication_key, last_run_date,
            source_search_field, source_search_query, use_request_body_not_params,
        )
    elif style == "header_link":
        out[limit_per_page_param or "per_page"] = page_size or DEFAULT_PAGE_SIZE
        if token:
            # token = query string of the next URL (pagination.py:220-226);
            # parse_qs values stay LISTS, as the reference passes them
            for k, v in parse_qs(str(token)).items():
                out[k] = v
        if replication_key == "updated_at":
            out["sort"] = "updated"
            out["direction"] = "desc" if use_fake_since else "asc"
        elif replication_key in ("starred_at", "created_at"):
            out["sort"] = "created"
            out["direction"] = "desc"
        elif replication_key == "commit_timestamp":
            out["direction"] = "desc"
        # else: reference only warns (streams.py:495-501)
        if replication_key and since:
            out["fake_since" if use_fake_since else "since"] = since
            # conditional requests save API quota (streams.py:502-508)
            headers["If-modified-since"] = email.utils.format_datetime(since)
    elif style == "hateoas_body":
        if page_size and limit_per_page_param:
            out[limit_per_page_param] = page_size
        if token:
            from urllib.parse import parse_qsl

            parsed = urlparse(str(token))
            if parsed.query:
                out.update(parse_qsl(parsed.query))
            else:
                out.update(parse_qsl(parsed.path))
            # stateful scan-target switch (streams.py:545-555)
            path = "" if parsed.path == str(token) else parsed.path
        elif replication_key:
            if source_search_field and source_search_query and last_run_date:
                _incremental_params(
                    out, replication_key, last_run_date,
                    source_search_field, source_search_query, use_request_body_not_params,
                )
            elif source_search_field and last_run_date:
                out[source_search_field] = "gt" + str(last_run_date)
    else:  # "page", "default", and any UNKNOWN style (silent fallback)
        if token is not None:
            out[next_page_param or "page"] = token
        _incremental_params(
            out, replication_key, last_run_date,
            source_search_field, source_search_query, use_request_body_not_params,
        )
    return {"params": out, "path": path, "headers": headers}


def pages_to_slices(pages: list[WalPage]) -> list[tuple]:
    """Planned pages -> (start_seq, end_seq] micro-batch ranges for
    pipeline.run_batch_replay."""
    return [p.seq_range for p in pages if p.seq_range is not None]


def scan_wal_pages(wal_dir: str) -> list[WalPage]:
    """Materialized page stream: each ``page-NNNNN.parquet`` slice may carry
    a ``page-NNNNN.meta.json`` sidecar holding its response envelope
    (body / headers / links / n_records / seq_range / request_url) — the
    on-disk analog of an API response the paginator inspects."""
    import json as _json
    import os as _os

    pages = []
    names = sorted(
        f for f in _os.listdir(wal_dir) if f.endswith(".parquet")
    )
    for i, fname in enumerate(names):
        meta = {}
        mpath = _os.path.join(wal_dir, fname.rsplit(".parquet", 1)[0] + ".meta.json")
        if _os.path.exists(mpath):
            with open(mpath) as fh:
                meta = _json.load(fh)
        pages.append(
            WalPage(
                index=i,
                n_records=meta.get("n_records", 0),
                body=meta.get("body", {}),
                headers=meta.get("headers", {}),
                links=meta.get("links", {}),
                seq_range=tuple(meta["seq_range"]) if meta.get("seq_range") else None,
                request_url=meta.get("request_url", ""),
            )
        )
    return pages
