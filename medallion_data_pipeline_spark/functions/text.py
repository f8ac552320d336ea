"""Text-analysis column expressions for large-scale training-data pipelines.

Green-field extensions beyond the reference's operator surface
(BASELINE.json north star): language-ID, quality scoring, token
counting, and document fingerprinting over a ``text`` column — all as
native Spark expressions (JVM-side, whole-stage codegen) so they run at
100 TB without Python in the loop.

Determinism contract: everything here is reproducible in ANSI SQL
(DuckDB oracle) — hashing uses md5 (identical hex output in every
engine) rather than Spark's xxhash64 (engine-specific seed/impl).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny embedded English stopword list (public, ubiquitous); enough for a
#: ratio heuristic — NOT a linguistics claim.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this",
]

# small function-word sets for the n-gram/function-word language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "los", "que", "es"],
}


def normalize_text(col: Column) -> Column:
    """lowercase + collapse whitespace + trim — the canonical form used
    by fingerprints and shingles."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def words(col: Column) -> Column:
    """Whitespace tokenization of normalized text -> array<string>."""
    w = F.split(normalize_text(col), " ")
    return F.filter(w, lambda x: x != "")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish token estimate: count of maximal runs of word chars or
    single non-space punctuation — the standard cheap proxy for subword
    tokenizers ('words + punctuation', then ~1.3 tokens/word)."""
    s = normalize_text(col)
    # every match of a word-run or single punct char is one proto-token
    only_tokens = F.regexp_replace(s, r"\w+|[^\w\s]", "#")
    return F.length(F.regexp_replace(only_tokens, r"[^#]", ""))


def punct_ratio(col: Column) -> Column:
    """Fraction of non-space characters that are punctuation."""
    s = normalize_text(col)
    non_space = F.length(F.regexp_replace(s, r"\s", ""))
    punct = F.length(F.regexp_replace(s, r"[\w\s]", ""))
    return F.when(non_space > 0, punct.cast("double") / non_space)


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are common-English stopwords."""
    sw = stopwords or EN_STOPWORDS
    toks = words(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks))


def mean_word_len(col: Column) -> Column:
    toks = words(col)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks))


def quality_score(col: Column) -> Column:
    """Composite document quality heuristic in [0, 1]:

    starts at 1.0 and subtracts penalties for (a) very short docs,
    (b) punctuation-heavy text, (c) unnaturally low stopword ratio,
    (d) degenerate mean word length. Mirrors the shape of public
    web-corpus quality filters (C4/Gopher-style rules) without any
    model dependency.
    """
    n = token_count_ws(col)
    pr = F.coalesce(punct_ratio(col), F.lit(1.0))
    sr = F.coalesce(stopword_ratio(col), F.lit(0.0))
    mwl = F.coalesce(mean_word_len(col), F.lit(0.0))
    score = (
        F.lit(1.0)
        - F.when(n < 20, 0.3).otherwise(0.0)
        - F.when(pr > 0.2, 0.3).otherwise(0.0)
        - F.when(sr < 0.05, 0.2).otherwise(0.0)
        - F.when((mwl < 2.0) | (mwl > 12.0), 0.2).otherwise(0.0)
    )
    return F.round(F.greatest(score, F.lit(0.0)), 2)


def detect_lang(col: Column) -> Column:
    """Function-word language heuristic: the language whose marker set
    has the most token hits wins (ties broken by fixed language order);
    no hits at all -> 'und' (undetermined)."""
    toks = words(col)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    # iterate in reverse so earlier languages win ties via strict '>'
    for lang in reversed(list(LANG_MARKERS)):
        markers = LANG_MARKERS[lang]
        hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
        is_better = hits > best_hits
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(is_better, hits).otherwise(best_hits)
    return best_lang


# ---------------------------------------------------------------------------
# Fingerprints & shingles (dedup building blocks)
# ---------------------------------------------------------------------------

def md5_fingerprint(col: Column) -> Column:
    """Exact-dup fingerprint: md5 of normalized text. md5 is
    engine-portable (same hex in Spark / DuckDB / Postgres), unlike
    xxhash64."""
    return F.md5(normalize_text(col))


def word_shingles(col: Column, k: int = 3) -> Column:
    """k-word shingles of the normalized text -> array<string>.

    Built with sequence+transform over the token array — pure Spark SQL
    expressions, executes in codegen (no UDF), and is expressible
    verbatim in the DuckDB oracle via list comprehensions.
    """
    toks = words(col)
    n = F.size(toks)
    # guard: Spark sequence(1, 0) yields a DESCENDING [1, 0], not empty —
    # docs shorter than k shingles must produce an empty array explicitly
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))


def minhash_signature(col: Column, k: int = 3, num_hashes: int = 16) -> Column:
    """MinHash signature as array<string> of length ``num_hashes``.

    Each hash family h_i(s) = md5(i || ':' || s); the signature element
    is the lexicographic MIN of the hex digests over all shingles.
    Lexicographic min over md5 hex is a valid uniform min-hash (hex
    order == byte order) and is reproducible in any engine with md5.
    Empty docs -> array of NULLs.
    """
    sh = word_shingles(col, k)
    sig = []
    for i in range(num_hashes):
        hashed = F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
        sig.append(F.array_min(hashed))
    return F.array(*sig)


def lsh_bands(col: Column, k: int = 3, num_hashes: int = 16, bands: int = 4) -> Column:
    """LSH band keys: split the minhash signature into ``bands`` rows of
    ``num_hashes/bands`` values; each band key is md5 of the joined
    band. Documents sharing ANY band key are near-dup candidates.
    Returns array<string> of length ``bands``.
    """
    rows = num_hashes // bands
    sig = minhash_signature(col, k, num_hashes)
    keys = []
    for b in range(bands):
        band = F.slice(sig, b * rows + 1, rows)
        keys.append(F.md5(F.concat_ws("|", F.lit(str(b)), F.concat_ws(",", band))))
    return F.array(*keys)


def simhash(col: Column, bits: int = 16) -> Column:
    """SimHash fingerprint over word tokens, ``bits`` wide (<=32; 16 by
    default for oracle-friendliness; widen at scale).

    Portable bit source: bit ``b`` of a token's hash is the parity of
    the ASCII code of hex char ``b+1`` of md5(token) — reproducible in
    any engine with md5+ascii+substr (DuckDB 1.0 lacks hex->int conv).
    For each bit, sum +1/-1 votes over tokens; the fingerprint sets the
    bit iff the sum is positive. Near-duplicate docs land at small
    Hamming distance; equal fingerprints bucket near-dups directly.
    """
    toks = words(col)

    def vote_fn(bit: int):
        # closure factory: a default-arg lambda would change the lambda arity
        return lambda acc, tok: acc + F.when(
            F.ascii(F.substring(F.md5(tok), bit + 1, 1)) % 2 == 1, 1
        ).otherwise(-1)

    fp = F.lit(0).cast("long")
    for b in range(bits):
        votes = F.aggregate(toks, F.lit(0).cast("long"), vote_fn(b))
        fp = fp + F.when(votes > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return fp
