"""r7: the char-entropy Arrow kernel must be bit-identical to the
expression formulation it replaced (the query's oracle SQL is frozen, so
kernel == expression == oracle)."""

import tempfile

from tap_rest_api_msdk_spark.queries import (
    _text_char_entropy_expr,
    q_text_char_entropy,
)

EDGE_DOCS = [
    (1, "hello world"),
    (2, None),                     # null text: absent from output
    (3, ""),                       # empty: absent
    (4, "\n\n\r\n"),               # only line terminators: absent
    (5, "a"),                      # single char, entropy 0
    (6, "aaaa bbbb aaaa"),
    (7, "café ☃ ☃ snow man"),  # unicode + U+2028 term
    (8, "x" * 5000),
    (9, "line one\nline two\nline one\n"),
    (10, "tab\tand  spaces"),
    (11, "a\rb\u0085c\nd"),     # the java-regex line-terminator set
]


def _edge_dir(spark) -> str:
    d = tempfile.mkdtemp(prefix="entropy-edge-")
    spark.createDataFrame(EDGE_DOCS, "doc_id long, text string").coalesce(
        2
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _assert_identical(spark, sf_dir):
    a = _text_char_entropy_expr(spark, sf_dir)
    b = q_text_char_entropy(spark, sf_dir)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_char_entropy_kernel_matches_expression_edge_cases(spark):
    _assert_identical(spark, _edge_dir(spark))


def test_char_entropy_kernel_matches_expression_sf(spark):
    _assert_identical(spark, "/root/testdata/sf0.01")


def test_char_entropy_kernel_plan_is_one_scan_no_agg_exchange(spark):
    plan = (
        q_text_char_entropy(spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only allowed exchange is spread_input's round-robin scan widener
    # (a no-op at scale); the 40M-row explode + hash aggregate are gone
    assert "hashpartitioning" not in plan
    assert "HashAggregate" not in plan and "Generate" not in plan
    assert "MapInPandas" in plan
