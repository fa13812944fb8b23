"""Property-based parity: the engine's flatten kernel vs the REFERENCE
implementation itself (imported read-only from /root/reference — test-only;
no engine code depends on it). Any divergence on arbitrary nested JSON is
a parity bug by definition.
"""

import sys

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/reference")

try:
    from tap_rest_api_msdk.utils import flatten_json as reference_flatten
    from tap_rest_api_msdk.utils import unnest_dict as reference_unnest
except Exception:  # pragma: no cover - reference not present on a cluster
    reference_flatten = None

from tap_rest_api_msdk_spark.functions.flatten import flatten_record, unnest_dict

pytestmark = pytest.mark.skipif(
    reference_flatten is None, reason="reference repo not available"
)

keys = st.text(
    alphabet="abcxyz_-.0", min_size=1, max_size=6
)  # includes the -/. translation chars and digits
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-10**6, max_value=10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=8),
)
json_values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(keys, children, max_size=4),
    ),
    max_leaves=25,
)
json_objects = st.dictionaries(keys, json_values, max_size=6)


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(obj=json_objects, raw=st.booleans())
def test_flatten_kernel_matches_reference(obj, raw):
    assert flatten_record(obj, store_raw_json_message=raw) == reference_flatten(
        obj, store_raw_json_message=raw
    )


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(obj=json_objects, data=st.data())
def test_flatten_kernel_matches_reference_with_except_keys(obj, data):
    # pick except keys from actual joined paths so they sometimes hit
    paths = []

    def collect(o, prefix=""):
        if isinstance(o, dict):
            for k, v in o.items():
                paths.append(prefix + k)
                collect(v, prefix + k + "_")

    collect(obj)
    ek = data.draw(
        st.lists(st.sampled_from(paths), max_size=3) if paths else st.just([])
    )
    assert flatten_record(obj, except_keys=ek) == reference_flatten(obj, except_keys=ek)


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.dictionaries(keys, st.recursive(
    scalars, lambda c: st.dictionaries(keys, c, max_size=3), max_leaves=12
), max_size=5))
def test_unnest_dict_matches_reference(d):
    assert unnest_dict(d) == reference_unnest(d)
