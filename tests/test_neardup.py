"""Dedup operators: exact, n-gram Jaccard (vs DuckDB relational oracle),
MinHash LSH (recall vs exact pairs), SimHash.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.operators.neardup import (
    exact_dedup,
    jaccard_pairs,
    minhash_dedup,
    minhash_lsh_candidates,
    simhash,
    simhash_neardups,
    word_shingles,
)

BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "a completely different document about spark query engines and shuffles",
    "binary trees and hash tables are classic data structures in courses",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i, t in enumerate(BASE):
        rows.append((i * 10, t))
        # near-dup: one word changed
        rows.append((i * 10 + 1, t.replace(t.split()[2], "xyz")))
    rows.append((100, BASE[0]))  # exact dup of doc 0
    rows.append((101, "totally unrelated short text"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, corpus):
    out = exact_dedup(corpus, "doc_id", "text")
    dups = {r.keep_id: r.n_dups for r in out.filter(F.col("n_dups") > 1).collect()}
    assert dups == {0: 2}  # doc 0 and 100 identical; survivor = min id
    assert out.count() == corpus.count() - 1


def test_jaccard_pairs_finds_planted_neardups(spark, corpus):
    pairs = {(r.id_a, r.id_b) for r in jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.45).collect()}
    assert (0, 100) in pairs  # exact dup -> jaccard 1.0
    assert (0, 1) in pairs and (10, 11) in pairs and (20, 21) in pairs
    assert not any({a, b} == {0, 10} for a, b in pairs)


def test_jaccard_pairs_matches_duckdb_oracle(spark, corpus, tmp_path):
    p = str(tmp_path / "docs.parquet")
    corpus.coalesce(1).write.mode("overwrite").parquet(p)
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.3).collect()
    }
    want = set(
        duckdb.sql(
            f"""
            with tok as (
                select doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') as w
                from read_parquet('{p}/*.parquet')
            ), sh as (
                select distinct doc_id,
                       array_to_string(w[i:i+2], ' ') as shingle
                from tok, unnest(generate_series(1, greatest(len(w)-2, 1))) as t(i)
            ), sizes as (
                select doc_id, count(*) as sz from sh group by doc_id
            ), inter as (
                select a.doc_id as id_a, b.doc_id as id_b, count(*) as inter
                from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
                group by 1, 2
            )
            select id_a, id_b,
                   round(inter / (sa.sz + sb.sz - inter), 6) as jaccard
            from inter
            join sizes sa on sa.doc_id = id_a
            join sizes sb on sb.doc_id = id_b
            where inter / (sa.sz + sb.sz - inter) >= 0.3
            """
        ).fetchall()
    )
    assert got == want


def test_minhash_recall_and_no_false_positives(spark, corpus):
    exact = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.7).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in minhash_dedup(corpus, "doc_id", "text", n=3, k=32, bands=16, threshold=0.7).collect()
    }
    # verification step guarantees no false positives
    assert approx <= exact
    # 16 bands of 2 rows: P(catch at tau=0.7) ≈ 1-(1-0.49)^16 ≈ 1.0
    assert approx == exact


def test_minhash_candidates_far_fewer_than_all_pairs(spark):
    n = 200
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"w{j}_"), (F.col("id") / 40).cast("int")) for j in range(12)],
        ).alias("text"),
    )
    cands = minhash_lsh_candidates(docs, "doc_id", "text", n=2, k=16, bands=4).count()
    # 5 groups of 40 identical docs -> candidates ~ 5 * C(40,2) = 3900 << C(200,2)
    assert cands < n * (n - 1) / 4


def test_simhash_properties(spark, corpus):
    sigs = {r.doc_id: r.sig for r in corpus.select("doc_id", simhash(F.col("text")).alias("sig")).collect()}
    assert sigs[0] == sigs[100]  # identical text -> identical signature
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_neardups(spark.createDataFrame(
            [(i, t) for i, t in [(0, BASE[0]), (1, BASE[0].replace("fox", "cat")), (2, BASE[1])]],
            "doc_id long, text string",
        ), "doc_id", "text", max_hamming=16, prefix_bits=4).collect()
    }
    if (0, 1) in pairs and (0, 2) in pairs:
        assert pairs[(0, 1)] < pairs[(0, 2)]


def test_shingles_short_text(spark):
    df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    rows = df.select(word_shingles(F.col("text"), 3).alias("sh")).collect()
    assert rows[0].sh == ["one two"]  # shorter than n -> single shingle


def test_minhash_lanes_are_independent(spark):
    """Regression: PySpark binds the array index to a second lambda param,
    so a `lambda x, i=i:` lane closure silently collapses all k lanes to
    one effective hash. Lanes must differ per seed/constants."""
    from pyspark.sql import functions as F

    from tap_rest_api_msdk_spark.operators.neardup import minhash_signature, word_shingles

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")], "doc_id long, text string"
    )
    for portable in (True, False):
        sig = docs.select(
            minhash_signature(word_shingles(F.col("text"), 3), 8, portable=portable).alias("s")
        ).first().s
        assert len(set(sig)) == 8, f"lanes collapsed (portable={portable}): {sig}"


def test_connected_components_chains_and_cycles(spark):
    """Pairs chain (A~B, B~C without A~C): components must merge them;
    cycles and disjoint clusters stay separate."""
    from tap_rest_api_msdk_spark.operators.neardup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain -> comp 1
         (10, 11), (11, 10),          # cycle (duplicate edge) -> comp 10
         (20, 21)],                   # pair -> comp 20
        "id_a long, id_b long",
    )
    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_dedup_components_groups_transitive_neardups(spark):
    from tap_rest_api_msdk_spark.operators.neardup import dedup_components

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    docs = spark.createDataFrame(
        [(0, base), (1, base + " x"), (2, base + " x y"),
         (50, "completely different text about sparkling distributed engines here"),
         (51, "completely different text about sparkling distributed engines here now")],
        "doc_id long, text string",
    )
    out = {r.component: r.n_docs for r in
           dedup_components(docs, "doc_id", "text", threshold=0.4, portable=True).collect()}
    assert out.get(0) == 3 and out.get(50) == 2


def test_contained_docs_finds_planted_containment(spark):
    from tap_rest_api_msdk_spark.operators.neardup import contained_docs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "prefix words alpha beta gamma delta epsilon suffix words"),
            (3, "completely different content here entirely"),
            (4, "alpha beta gamma"),  # contained in 1 AND 2
        ],
        "doc_id long, text string",
    )
    got = {
        (r["contained_id"], r["container_id"])
        for r in contained_docs(docs, "doc_id", "text", n=3).collect()
    }
    assert (1, 2) in got
    assert (4, 1) in got and (4, 2) in got
    assert all(a != 3 and b != 3 for a, b in got)


def test_contained_docs_skew_guard_bounds_anchor(spark):
    """A doc made entirely of ultra-common shingles cannot anchor — the
    documented recall bound that keeps the join skew-safe."""
    from tap_rest_api_msdk_spark.operators.neardup import contained_docs

    common = "the quick brown fox"
    docs = spark.createDataFrame(
        [(i, common) for i in range(20)] + [(100, f"{common} unique tail {100}")],
        "doc_id long, text string",
    )
    out = contained_docs(docs, "doc_id", "text", n=3, max_shingle_freq=5)
    # all 20 identical docs' shingles exceed the df cap -> no anchors -> no
    # pairs (exact_dedup owns identical docs); the query must not explode
    assert out.count() == 0


def test_small_graph_fast_path_matches_distributed(spark):
    """The driver union-find fast path and the distributed min-label
    loop must produce the identical (node, comp) labeling — including
    chained merges and out-of-order edges."""
    import random

    from tap_rest_api_msdk_spark.operators.neardup import connected_components

    rng = random.Random(7)
    edges = []
    for base in range(0, 500, 50):  # 10 clusters of chained nodes
        members = [base * 101 + j for j in range(rng.randint(2, 9))]
        rng.shuffle(members)
        edges += list(zip(members[:-1], members[1:]))
    rng.shuffle(edges)
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    dist = {
        r["node"]: r["comp"]
        for r in connected_components(pairs, small_graph_edges=0).collect()
    }
    assert fast and fast == dist
