"""Parity fuzz: plans/jsonpath.py vs jsonpath_ng.ext — the EXACT library
the reference extracts with (singer_sdk.helpers.jsonpath wraps it,
pagination.py:37) — over generated documents and grammar-covering paths.
Plus a union-find property oracle for connected_components."""

from __future__ import annotations

import random

import pytest

jsonpath_ng = pytest.importorskip("jsonpath_ng.ext")

from tap_rest_api_msdk_spark.plans.jsonpath import find_all  # noqa: E402


def _rand_doc(rng: random.Random, depth: int = 3):
    if depth == 0 or rng.random() < 0.25:
        return rng.choice([rng.randint(0, 9), "s" + str(rng.randint(0, 5)), True, None])
    if rng.random() < 0.5:
        return {
            k: _rand_doc(rng, depth - 1)
            for k in rng.sample(["a", "b", "c", "relation", "url", "n"], rng.randint(1, 4))
        }
    return [_rand_doc(rng, depth - 1) for _ in range(rng.randint(0, 4))]


PATHS = [
    "$.a", "$.a.b", "$.a.b.c", "$['a']",
    "$.a[*]", "$[*]", "$.a[*].b", "$.a[0]", "$.a[1].b",
    "$.a[?(@.n==3)]", "$.a[?(@.relation=='next')].url",
    "$.a[?(@.n>=5)]", "$.a[?(@.n!=2)].b",
]


@pytest.mark.parametrize("seed", range(30))
def test_fuzz_parity_with_jsonpath_ng(seed):
    rng = random.Random(seed)
    doc = _rand_doc(rng, 4)
    for path in PATHS:
        try:
            ref = [m.value for m in jsonpath_ng.parse(path).find(doc)]
        except Exception:
            # jsonpath_ng raises on e.g. integer index into a dict; this
            # engine degrades to no-match instead of crashing a stream
            assert find_all(path, doc) == []
            continue
        got = find_all(path, doc)
        assert got == ref, (path, doc, got, ref)


def test_split_extension_parity():
    doc = {"link": [{"relation": "next", "url": "https://h/p?x=1&y=2"}]}
    path = "$.link[?(@.relation=='next')].url.`split(?, 1, 1)`"
    ref = [m.value for m in jsonpath_ng.parse(path).find(doc)]
    assert find_all(path, doc) == ref == ["x=1&y=2"]


def test_connected_components_vs_union_find(spark):
    """Property: Spark min-label propagation == a driver-side union-find
    over the same random edge lists."""

    def uf_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    from tap_rest_api_msdk_spark.operators.neardup import connected_components

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        nodes = list(range(rng.randint(5, 40)))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(rng.randint(3, 60))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.node: r.comp for r in connected_components(df).collect()}
        want = uf_components(edges)
        assert got == want, (seed, sorted(got.items()), sorted(want.items()))
