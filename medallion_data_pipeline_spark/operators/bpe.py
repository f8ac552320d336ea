"""Distributed BPE vocabulary training (Sennrich et al. 2016) — the
real merge-learning loop, not a regex approximation.

Representation: a word's segmentation is the string of its symbols
joined by ONE SPACE. Corpus tokens come from functions/text.py::words
(whitespace tokenization of normalized text), so tokens can never
contain a space — the separator is unambiguous — and a merge is a
plain non-overlapping left-to-right ``replace('a b' -> 'ab')``, which
is exactly the BPE apply rule and has identical semantics in Spark,
DuckDB, and Python's ``str.replace`` (the gated query's oracle unrolls
the same loop as chained CTEs; the unit test checks the trainer
against a pure-Python reference).

Scale shape: training runs on the DISTINCT-WORD table (word, count) —
Heaps-law-small relative to the corpus — cached once; each merge
iteration is one adjacent-pair count shuffle + a 1-row argmax
collect, the same bounded-driver-round-trip pattern as the k-means /
PageRank tiers. Pair statistics count every adjacent occurrence
(overlaps included, the classic Sennrich counting rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def segment_chars(col) -> Column:
    """'spark' -> 's p a r k' (initial character segmentation)."""
    return F.trim(F.regexp_replace(col, "(.)", "$1 "))


def pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, n): adjacent symbol pairs over segmented words weighted
    by word count. Map-only explode + one shuffle."""
    syms = F.split(F.col("w"), " ")
    idx = F.when(
        F.size(syms) > 1,
        F.sequence(F.lit(1), F.size(syms) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = words.select(
        "cnt",
        F.explode(F.transform(idx, lambda i: F.struct(
            F.element_at(syms, i).alias("a"),
            F.element_at(syms, i + 1).alias("b")))).alias("p"))
    return pairs.groupBy("p.a", "p.b").agg(F.sum("cnt").alias("n"))


#: fold-state separator (never appears in symbols — tokens are
#: whitespace-split text, segmentations use spaces)
_RS = "\x1e"


def merge_pair(seg: Column, a: str, b: str) -> Column:
    """TRUE left-to-right BPE merge of pair (a, b) in a space-joined
    segmentation — a FOLD over the symbol array, not a substring
    replace. A plain replace('a b' -> 'ab') matches ACROSS symbol
    boundaries: in 'w es t' the pair (s, t) would corrupt symbol 'es'
    into 'w est' (regression-pinned in tests), and padded-separator
    variants mis-handle adjacent repeats. The fold carries
    state = emitted-output || RS || carry-symbol: when carry == a and
    the next symbol == b, emit the merged symbol and clear the carry
    (so overlapping matches cannot chain — exact on a == b runs:
    'a a a' -> 'aa a'); otherwise flush the carry and keep scanning.
    The DuckDB oracle runs the IDENTICAL fold via list_reduce with a
    prepended init sentinel."""
    merged = " " + a + b

    def step(acc, x):
        out = F.split(acc, _RS).getItem(0)
        carry = F.split(acc, _RS).getItem(1)
        flushed = F.concat(
            out,
            F.when(carry == "", F.lit("")).otherwise(
                F.concat(F.lit(" "), carry)))
        return F.when(
            (carry == a) & (x == b),
            F.concat(out, F.lit(merged + _RS)),
        ).otherwise(F.concat(flushed, F.lit(_RS), x))

    def finish(acc):
        # the final out/carry flush runs INSIDE the aggregate's finish
        # lambda so the (expensive) fold expression is referenced
        # exactly once — referencing the aggregate from three sibling
        # expressions re-substitutes the whole fold per reference and
        # chained merges then blow up 3^k (measured: bpe_token_counts
        # 581 s -> seconds at sf0.01 after this restructuring)
        out = F.split(acc, _RS).getItem(0)
        carry = F.split(acc, _RS).getItem(1)
        return F.trim(F.concat(
            out, F.when(carry == "", F.lit("")).otherwise(
                F.concat(F.lit(" "), carry))))

    return F.aggregate(F.split(seg, " "), F.lit(_RS), step, finish)


def apply_merge(words: DataFrame, a: str, b: str) -> DataFrame:
    """Merge pair (a, b) everywhere: the boundary-aware fold."""
    return words.withColumn("w", merge_pair(F.col("w"), a, b))


def bpe_train(word_counts: DataFrame, n_merges: int,
              word_col: str = "word", cnt_col: str = "cnt"):
    """Learn ``n_merges`` merges from a (word, count) table. Returns
    (merges, final_words): merges as a list of dicts (step, left,
    right, merged, pair_count), final_words the segmented frame after
    all merges (for tokenization downstream). Stops early when no
    adjacent pair remains."""
    words = word_counts.select(
        segment_chars(F.col(word_col)).alias("w"),
        F.col(cnt_col).cast("long").alias("cnt")).persist()
    merges = []
    for step in range(1, n_merges + 1):
        best = (pair_counts(words)
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1).collect())
        if not best:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        merges.append({"step": step, "left": a, "right": b,
                       "merged": a + b, "pair_count": n})
        nxt = apply_merge(words, a, b).persist()
        nxt.count()  # materialize before dropping the parent cache
        words.unpersist()
        words = nxt
    return merges, words


def bpe_segment(col, merges) -> Column:
    """Apply a learned merge list to raw tokens: character
    segmentation followed by the merges in training order — the
    tokenizer that ships with the vocabulary."""
    s = segment_chars(col)
    for m in merges:
        s = merge_pair(s, m["left"], m["right"])
    return s


def with_bpe_segmentation(df: DataFrame, word_col: str, merges,
                          out_col: str = "w") -> DataFrame:
    """bpe_segment staged as one named column per merge (withColumn):
    chaining k folds inside a single expression re-substitutes shared
    subtrees across levels — the engine-wide staged-named-columns rule
    (module docstring of operators/dedup.py)."""
    df = df.withColumn(out_col, segment_chars(F.col(word_col)))
    for m in merges:
        df = df.withColumn(out_col,
                           merge_pair(F.col(out_col), m["left"], m["right"]))
    return df
