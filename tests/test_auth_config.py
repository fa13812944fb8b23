"""A2-A5 auth config-surface parity: validation rules and error text
mirror /root/reference/tap_rest_api_msdk/auth.py (select_authenticator
auth.py:276-284, oauth_request_body auth.py:156-179)."""

import pytest

from tap_rest_api_msdk_spark.config import resolve_streams, validate_auth


def _cfg(**top):
    return {"streams": [{"name": "s"}], **top}


def test_no_auth_config_is_none():
    (s,) = resolve_streams(_cfg())
    assert s.auth is None


def test_unknown_method_raises_reference_error():
    with pytest.raises(ValueError, match="Unknown authentication method bogus"):
        resolve_streams(_cfg(auth_method="bogus"))


def test_no_auth_method_yields_no_authenticator():
    # reference parity (ADVICE r2): select_authenticator falls through its
    # elif-chain for "no_auth" and returns no authenticator (auth.py:235-284)
    (s,) = resolve_streams(_cfg(auth_method="no_auth"))
    assert s.auth is None


@pytest.mark.parametrize(
    "grant,extra,msg",
    [
        (None, {}, "Missing grant type for OAuth Token."),
        ("client_credentials", {"client_id": "x"},
         "client_id or client_secret for .client_credentials."),
        ("password", {"username": "u"}, "username or password for .password."),
        ("refresh_token", {}, "refresh_token for .refresh_token."),
    ],
)
def test_oauth_mandatory_params(grant, extra, msg):
    cfg = {"auth_method": "oauth", **extra}
    if grant:
        cfg["grant_type"] = grant
    with pytest.raises(ValueError, match=msg):
        validate_auth(cfg)


def test_oauth_valid_client_credentials():
    out = validate_auth(
        {"auth_method": "oauth", "grant_type": "client_credentials",
         "client_id": "i", "client_secret": "s", "scope": "r"}
    )
    assert out["grant_type"] == "client_credentials" and out["scope"] == "r"


def test_tap_auth_wins_over_stream_auth():
    # reference parity (ADVICE r2): select_authenticator reads the TAP
    # config WHOLESALE whenever it is present (auth.py:220-223) — the
    # stream-level auth keys only apply when the tap carries none
    cfg = {
        "auth_method": "bearer_token",
        "bearer_token": "tok-top",
        "streams": [
            {"name": "a"},
            {"name": "b", "auth_method": "basic", "username": "u", "password": "p"},
        ],
    }
    a, b = resolve_streams(cfg)
    assert a.auth["auth_method"] == "bearer_token"
    assert b.auth["auth_method"] == "bearer_token" and "username" not in b.auth


def test_stream_auth_applies_when_tap_has_none():
    cfg = {
        "streams": [
            {"name": "b", "auth_method": "basic", "username": "u", "password": "p"},
        ],
    }
    (b,) = resolve_streams(cfg)
    assert b.auth["auth_method"] == "basic" and b.auth["username"] == "u"


def test_bad_stream_auth_fails_at_resolve_time():
    cfg = {"streams": [{"name": "a", "auth_method": "oauth"}]}
    with pytest.raises(ValueError, match="Missing grant type"):
        resolve_streams(cfg)
