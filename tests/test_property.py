"""Property-based tests (Hypothesis): randomized inputs against
brute-force Python oracles — the layer that catches edge cases neither
the driver data nor hand-written fixtures contain (SURVEY.md §5.2)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from modforms_db_spark.llm.dedup import jaccard_pairs

TOKENS = ["a", "b", "c", "d", "e", "f"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(TOKENS), min_size=1, max_size=6),
    min_size=2,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(docs=docs_strategy)
def test_jaccard_pairs_matches_bruteforce(spark, docs):
    """jaccard_pairs(threshold=0) over random token bags ≡ brute-force
    set-Jaccard over all pairs with non-empty intersection."""
    rows = [(i, "en", toks) for i, toks in enumerate(docs)]
    toks = spark.createDataFrame(
        rows, "doc_id long, lang string, toks array<string>"
    ).select("doc_id", "lang", F.explode(F.array_distinct("toks")).alias("tok"))

    got = {
        (r.d1, r.d2): r.jac for r in jaccard_pairs(toks, 0.0).collect()
    }

    sets = {i: set(t) for i, (_, _, t) in enumerate(rows)}
    want = {}
    for i in sets:
        for j in sets:
            if i < j and sets[i] & sets[j]:
                want[(i, j)] = round(
                    len(sets[i] & sets[j]) / len(sets[i] | sets[j]), 4
                )
    assert got == want
