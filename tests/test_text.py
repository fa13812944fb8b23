"""Text-analysis operators on the real documents table + DuckDB parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.functions.text import analyze

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_analyze_schema_and_ranges(docs):
    out = analyze(docs).cache()
    rows = out.limit(2000).collect()
    assert rows
    for r in rows:
        assert r.n_tokens > 0
        assert r.n_bpe_tokens >= r.n_tokens - 1  # lexer splits at least as fine
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.quality <= 1.0
        assert r.lang_pred in {"en", "fr", "de", "es", "und"}
        assert len(r.fingerprint) == 32
    out.unpersist()


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " HELLO\tWORLD \n")],
        "doc_id long, text string",
    )
    fps = [r.fingerprint for r in analyze(df).select("fingerprint").collect()]
    assert len(set(fps)) == 1


def test_token_count_matches_duckdb(docs):
    got = {
        r.doc_id: r.n_tokens
        for r in analyze(docs).select("doc_id", "n_tokens").collect()
    }
    want = dict(
        duckdb.sql(
            f"""
            select doc_id,
                   len(regexp_split_to_array(lower(trim(text)), '\\s+')) as n
            from read_parquet('{SF_DIR}/documents.parquet')
            """
        ).fetchall()
    )
    assert got == want


def test_lang_id_on_planted_text(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of to in is that"),
            (2, "le chat et la maison de que pour une"),
            (3, "der hund und die katze ist von mit"),
            (4, "el gato y la casa es que por un una"),
            (5, "zzzz qqqq xxxx"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_pred for r in analyze(df).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "und"}


def test_quality_prefers_clean_prose(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and it is a fine day for running in the field " * 5),
            (2, "!!! ??? ... ;;; :::"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.quality for r in analyze(df).collect()}
    assert got[1] > got[2]


def test_text_analysis_plan_is_native(docs):
    plan = analyze(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_gopher_quality_flags_discriminate(spark):
    from pyspark.sql import functions as F

    from tap_rest_api_msdk_spark.functions.text import gopher_quality_flags

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it was good for the whole day today ok fine"),
            (1, "short"),                                     # word-count fail
            (2, "# # # " * 10 + "the it for is that and was"),  # symbol-ratio fail
            (3, " ".join(["zz"] * 30)),                       # stopword + mean-len fail
            (4, " ".join(["1234567"] * 30)),                  # alpha-ratio fail
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.q for r in
           docs.select("doc_id", gopher_quality_flags(F.col("text")).alias("q")).collect()}
    assert out[0]["pass"] is True
    assert out[1]["ok_word_count"] is False
    assert out[2]["ok_symbol_ratio"] is False
    assert out[3]["ok_stopwords"] is False
    assert out[4]["ok_alpha_ratio"] is False
    assert all(not out[i]["pass"] for i in (1, 2, 3, 4))


def test_unigram_surprisal_orders_common_vs_rare(spark):
    """A doc of corpus-common tokens must score LOWER mean surprisal than
    a doc of corpus-rare tokens (the quality-filter contract)."""
    from tap_rest_api_msdk_spark.queries import q_text_unigram_surprisal
    import tempfile, os

    d = tempfile.mkdtemp(prefix="surp-")
    rows = [(i, "common words common words common", "en", "s", 30) for i in range(20)]
    rows += [(100, "common words common words common", "en", "s", 30),
             (101, "zyx qwv jkl pqr stu", "en", "s", 19)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r["mean_surprisal"] for r in q_text_unigram_surprisal(spark, d).collect()}
    assert out[101] > out[100]
