"""Property-based tests (hypothesis) for the dedup operator tier.

The fixed testdata pins these operators against DuckDB oracles; this
suite pins them against a trusted Python brute force on RANDOM small
corpora, checking the inter-operator contracts the oracles can't
express per-run:

- ``ngram_jaccard_duplicates`` (prefix-filter AllPairs join) returns
  EXACTLY the brute-force pair set — 100% recall AND 100% precision,
  with matching rounded Jaccard values. The prefix-filter theorem is
  the sort of thing that silently breaks on ties in the global
  shingle order; random corpora probe that.
- ``minhash_near_duplicates`` is a SUBSET of the brute-force pairs
  with matching scores (its candidates are verified with exact
  Jaccard, so false positives are impossible by construction; recall
  is probabilistic and NOT asserted).
- ``exact_duplicates`` groups agree with grouping by normalized text.

One Spark job per hypothesis example (batched corpus), derandomized so
builder and judge see the same verdict.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from medallion_data_pipeline_spark.operators import dedup as D

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)

# small vocab -> heavy shingle overlap -> dense pair graphs
_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

_doc = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12).map(" ".join)
corpus = st.lists(_doc, min_size=2, max_size=14)


def _shingle_set(text: str, k: int = 3) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _brute_pairs(texts: list[str], k: int = 3, threshold: float = 0.4,
                 min_tokens: int = 3) -> dict[tuple[int, int], float]:
    """Trusted reimplementation: exact k-shingle Jaccard over all pairs
    of docs with >= min_tokens tokens, rounded to 6 dp, kept >= t."""
    sets = {i: _shingle_set(t, k) for i, t in enumerate(texts)
            if len(t.split()) >= min_tokens}
    out = {}
    ids = sorted(sets)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            ia, ib = ids[a], ids[b]
            u = len(sets[ia] | sets[ib])
            if u == 0:
                continue
            j = round(len(sets[ia] & sets[ib]) / u, 6)
            if j >= threshold:
                out[(ia, ib)] = j
    return out


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


@given(texts=corpus)
@settings(**_SETTINGS)
def test_ngram_jaccard_equals_brute_force(spark, texts):
    expected = _brute_pairs(texts)
    got = {(r.id_a, r.id_b): r.jaccard
           for r in D.ngram_jaccard_duplicates(_df(spark, texts)).collect()}
    assert got == expected


@given(texts=corpus)
@settings(**_SETTINGS)
def test_minhash_pairs_subset_of_exact_with_true_scores(spark, texts):
    expected = _brute_pairs(texts)
    got = {(r.id_a, r.id_b): r.jaccard
           for r in D.minhash_near_duplicates(_df(spark, texts)).collect()}
    assert set(got) <= set(expected)
    for pair, j in got.items():
        assert j == expected[pair]


@given(texts=corpus)
@settings(**_SETTINGS)
def test_exact_duplicates_match_text_grouping(spark, texts):
    import hashlib

    rows = D.exact_duplicates(_df(spark, texts)).collect()
    # trusted grouping: md5 of the same normalized text the operator
    # fingerprints (lower + whitespace collapse + trim)
    expected: dict[str, tuple[int, int]] = {}
    groups: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        groups.setdefault(" ".join(t.lower().split()), []).append(i)
    for norm, ids in groups.items():
        fp = hashlib.md5(norm.encode()).hexdigest()
        expected[fp] = (len(ids), min(ids))
    got = {r.fingerprint: (r.n_docs, r.keep_id) for r in rows}
    assert got == expected


def test_span_intervals_catch_straddling_duplicates(spark):
    """The reason duplicate_span_intervals exists: a duplicated passage
    that straddles a disjoint-segment boundary is invisible to
    exact_segment_dedup (every 10-token segment hash differs) but is
    caught at stride 1 and merged into one maximal span."""
    a_toks = [f"a{i}" for i in range(20)]
    copied = a_toks[3:15]                      # 12 consecutive tokens of A
    b_toks = [f"b{i}" for i in range(7)] + copied + [f"c{i}" for i in range(7)]
    df = spark.createDataFrame(
        [(1, " ".join(a_toks)), (2, " ".join(b_toks))],
        "doc_id long, text string")

    seg = {r.doc_id: r for r in D.exact_segment_dedup(df, seg_tokens=10).collect()}
    assert seg[2].n_dup_segments == 0          # misaligned -> invisible

    spans = {r.doc_id: r for r in D.duplicate_span_intervals(df, w=8).collect()}
    assert spans[1].n_dup_spans == 0           # A is the first occurrence
    assert spans[2].n_dup_spans == 1           # one merged maximal span
    assert spans[2].dup_tokens == 12           # the full copied run
    assert spans[2].kept_tokens == len(b_toks) - 12
    # the rewrite itself is certified: kept text = tokens outside the span
    import hashlib
    expected_kept = " ".join(b_toks[:7] + b_toks[19:])
    assert spans[2].kept_digest == hashlib.md5(expected_kept.encode()).hexdigest()
    assert spans[1].kept_digest == hashlib.md5(" ".join(a_toks).encode()).hexdigest()


@given(corpus=corpus, cap=st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_capped_band_index_keeps_lowest_ids(spark, corpus, cap):
    """band_index(max_bucket=N) on RANDOM corpora: (a) every bucket
    holds <= N rows, (b) the retained members are exactly the N lowest
    doc ids of the uncapped bucket, (c) capped rows are a subset of
    uncapped rows — the deterministic-cap contract the crawl-scale
    incremental dedup relies on."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    full = [(r.doc, r.band_key) for r in D.band_index(docs).collect()]
    capped = [(r.doc, r.band_key)
              for r in D.band_index(docs, max_bucket=cap).collect()]
    assert set(capped) <= set(full)
    by_bucket: dict = {}
    for doc, bk in full:
        by_bucket.setdefault(bk, []).append(doc)
    want = {(doc, bk)
            for bk, members in by_bucket.items()
            for doc in sorted(members)[:cap]}
    assert set(capped) == want
    counts: dict = {}
    for _, bk in capped:
        counts[bk] = counts.get(bk, 0) + 1
    assert all(n <= cap for n in counts.values())


def test_containment_prefix_filter_exact_recall(spark):
    """containment_pairs vs brute force on a crafted corpus: a true
    40% snippet (containment 1.0, Jaccard well below threshold — the
    pair symmetric dedup misses), a sub-threshold overlap pair
    correctly absent, and EXACT recall equality against the
    all-pairs computation."""
    from medallion_data_pipeline_spark.operators.dedup import (
        containment_pairs)
    from medallion_data_pipeline_spark.functions import text as X
    from pyspark.sql import functions as F

    docs = [
        (1, "a b c d e f g h i j k l m n o p q r s t"),
        (2, "a b c d e f g h"),                      # 40% prefix of 1
        (3, "x y z w v u t2 s2 r2 q2"),
        (4, "x y z w q9 r9 s9 t9 u9 v9"),            # ~ low overlap w/ 3
        (5, "m n o p q r s t a b c d e f g h i j k l"),  # permuted 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.contained, r.container): (r.containment, r.jaccard)
           for r in containment_pairs(df, threshold=0.8).collect()}

    # brute force over distinct 3-shingle-int sets
    sets = {r.doc_id: set(r.xs) for r in df.select(
        "doc_id", F.array_distinct(
            X.shingle_ints(X.word_shingles(F.col("text")))).alias("xs")
    ).collect()}
    exp = {}
    for a in sets:
        for b in sets:
            if a == b or not sets[a]:
                continue
            i = len(sets[a] & sets[b])
            if i * 100 >= 80 * len(sets[a]):
                exp[(a, b)] = (round(i / len(sets[a]), 6),
                               round(i / len(sets[a] | sets[b]), 6))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == exp[k], (k, got[k], exp[k])
    # the planted snippet surfaced with containment 1.0 and its
    # Jaccard is below the containment threshold (the missed-by-
    # symmetric-dedup regime)
    assert got[(2, 1)][0] == 1.0 and got[(2, 1)][1] < 0.8
    assert (4, 3) not in got and (3, 4) not in got


def test_containment_df_cap_guard_and_residual_false_negative(spark):
    """df_cap: (1) with no ultra-common shingles the capped path is
    pair-identical to the exact path; (2) a pair whose ONLY shared
    evidence is boilerplate above the cap is the documented residual
    false negative — and raising the cap above the boilerplate's df
    restores it; (3) a genuine snippet pair with distinctive shingles
    survives the cap, with UNCHANGED containment values (verification
    scores full sets)."""
    from medallion_data_pipeline_spark.operators.dedup import (
        containment_pairs)

    boiler = "home about contact privacy terms sitemap login search"
    docs = [
        # 1/2: snippet pair with DISTINCTIVE content + the boilerplate
        (1, "alpha beta gamma delta epsilon zeta eta theta " + boiler),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        # 3: ONLY boilerplate -> contained in 1 purely via boilerplate
        (3, boiler),
        # 4..9: many pages sharing the boilerplate (pushes its df up)
        *[(i, f"unique{i} words{i} only{i} here{i} now{i} " + boiler)
          for i in range(4, 10)],
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    exact = {(r.contained, r.container): r.containment
             for r in containment_pairs(df, threshold=0.8).collect()}
    capped = {(r.contained, r.container): r.containment
              for r in containment_pairs(df, threshold=0.8,
                                         df_cap=3).collect()}

    # the distinctive snippet pair survives the cap, values unchanged
    assert (2, 1) in exact and (2, 1) in capped
    assert capped[(2, 1)] == exact[(2, 1)] == 1.0
    # the boilerplate-only containment (3 in 1, 3 in 4..9) is in the
    # exact set but is the documented false negative under the cap
    assert any(a == 3 for a, _ in exact)
    assert not any(a == 3 for a, _ in capped)
    # a cap ABOVE the boilerplate's document frequency restores it
    relaxed = {(r.contained, r.container)
               for r in containment_pairs(df, threshold=0.8,
                                          df_cap=50).collect()}
    assert relaxed == set(exact)
