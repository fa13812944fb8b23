"""Property-based LWW consistency: aggregate, window, and salted forms must
agree with a pure-Python argmax oracle on arbitrary event sets."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tap_rest_api_msdk_spark.operators.dedup import (
    lww_dedup,
    lww_dedup_salted,
    lww_dedup_window,
)

# non-null keys and order columns (the engine's documented precondition:
# order_by must be a non-null total order per key)
events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),   # seq
        st.sampled_from(["r1", "r2", "r3"]),          # repo
        st.sampled_from(["a", "b"]),                  # path
        st.text(alphabet="abcdef0123456789", min_size=1, max_size=6),  # commit
        st.one_of(st.none(), st.text(max_size=8)),    # content (nullable ok)
    ),
    min_size=1,
    max_size=60,
)


def py_oracle(rows):
    best = {}
    for seq, repo, path, commit, content in rows:
        k = (repo, path)
        cand = (seq, commit)
        if k not in best or cand > (best[k][0], best[k][3]):
            best[k] = (seq, repo, path, commit, content)
    return {
        (r, p): (s, c) for (r, p), (s, _, __, c, ___) in best.items()
    }


_spark = [None]


def get_session():
    if _spark[0] is None:
        from tap_rest_api_msdk_spark.session import get_spark

        _spark[0] = get_spark("prop-tests", cores=4, shuffle_partitions=4)
        _spark[0].sparkContext.setLogLevel("ERROR")
    return _spark[0]


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events)
def test_lww_forms_agree_with_oracle(rows):
    spark = get_session()
    df = spark.createDataFrame(
        rows, "seq long, repo string, path string, commit string, content string"
    )
    want = py_oracle(rows)

    def got(result_df):
        return {(r.repo, r.path): (r.seq, r.commit) for r in result_df.collect()}

    assert got(lww_dedup(df, ["repo", "path"], ["seq", "commit"])) == want
    assert got(lww_dedup_window(df, ["repo", "path"], ["seq", "commit"])) == want
    assert got(lww_dedup_salted(df, ["repo", "path"], ["seq", "commit"], 4)) == want
