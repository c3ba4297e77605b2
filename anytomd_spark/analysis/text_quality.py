"""Text analysis operators: token counts, quality scores, language ID,
document fingerprints.

Everything except the winnowing fingerprint is pure built-in column
expressions (whole-stage codegen); the fingerprint is an Arrow-batched
pandas UDF because rolling hashes need a per-character loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that with "
    "for on as at by from not"
).split()


def token_count(text_col="text"):
    """Whitespace token count (0 for empty/blank text)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(
        F.length(F.trim(c)) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(c), r"\s+")))


def bpe_ish_token_count(text_col="text"):
    """Sub-word-ish token count: split on word/number/punct boundaries with
    a BPE-style regex (letters runs, digit runs, single punct).

    Always built through the Column API: routing the pattern through an
    F.expr SQL string would eat the ``\\s`` escape in the SQL literal and
    silently count whitespace as punctuation tokens."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    pattern = r"[A-Za-zÀ-ɏ]+|[0-9]+|[^\sA-Za-z0-9À-ɏ]"
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def _ratio(sub_len, total_len):
    return F.when(total_len > 0, sub_len.cast("double") / total_len).otherwise(F.lit(0.0))


def punct_ratio(text_col="text"):
    """ASCII-punctuation character ratio (0.0 for empty text) — the shared
    gate expression used by quality_scores and the composed pipeline."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    punct = F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", ""))
    return _ratio(punct, F.length(c))


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/digit/stopword quality features per document."""
    c = F.col(text_col)
    total = F.length(c)
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    spaces = F.length(F.regexp_replace(c, r"[^ \t\n]", ""))
    tokens = F.split(F.lower(F.trim(c)), r"\s+")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(tokens), stop_arr))
    n_tok = token_count(text_col)
    return docs.withColumns({
        "n_chars_m": total.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "punct_ratio": punct_ratio(text_col),
        "digit_ratio": _ratio(digits, total),
        "space_ratio": _ratio(spaces, total),
        "stopword_hits": n_stop.cast("long"),
        "mean_token_len": F.when(
            n_tok > 0, (total - spaces).cast("double") / n_tok
        ).otherwise(F.lit(0.0)),
    })


def quality_filter(docs: DataFrame, text_col: str = "text",
                   min_tokens: int = 5, max_punct_ratio: float = 0.3) -> DataFrame:
    scored = quality_scores(docs, text_col)
    return scored.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )


# Distinctive function words per latin-script language: each list avoids
# words shared with the others, so hit counts discriminate (the classic
# stopword-profile shortcut for an n-gram language model).
LATIN_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
           "mit", "für", "auf", "sich", "aber", "auch", "wird"),
    "fr": ("le", "les", "des", "est", "une", "dans", "que", "qui",
           "pour", "avec", "sur", "pas", "mais", "vous", "nous"),
    "es": ("el", "los", "las", "es", "una", "que", "para", "con",
           "por", "del", "como", "pero", "más", "este", "muy"),
    "en": ("the", "and", "is", "of", "to", "in", "that", "with",
           "for", "this", "are", "was", "not", "have", "from"),
}


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language heuristic, vectorized and deterministic.

    Two stages: unicode-script ratios decide the non-latin scripts
    (hangul -> ko, kana -> ja, han -> zh, cyrillic -> ru); latin-script
    text is then classified by distinctive-function-word hit counts
    (de/fr/es vs the en default) — the stopword-profile shortcut for an
    n-gram model, expressed entirely in built-in column functions so
    the DuckDB oracle can recompute it verbatim."""
    c = F.col(text_col)
    total = F.greatest(F.length(c), F.lit(1))
    hangul = F.length(F.regexp_replace(c, r"[^가-힯ᄀ-ᇿ]", ""))
    han = F.length(F.regexp_replace(c, r"[^一-鿿]", ""))
    kana = F.length(F.regexp_replace(c, r"[^぀-ヿ]", ""))
    cyr = F.length(F.regexp_replace(c, r"[^Ѐ-ӿ]", ""))

    tokens = F.array_distinct(F.split(F.lower(F.trim(c)), r"\s+"))

    def hits(lang: str):
        prof = F.array(*[F.lit(w) for w in LATIN_PROFILES[lang]])
        return F.size(F.array_intersect(tokens, prof))

    h_de, h_fr, h_es, h_en = hits("de"), hits("fr"), hits("es"), hits("en")
    pred = (
        F.when(hangul / total > 0.05, F.lit("ko"))
        .when(kana / total > 0.05, F.lit("ja"))
        .when(han / total > 0.05, F.lit("zh"))
        .when(cyr / total > 0.05, F.lit("ru"))
        # fixed precedence on ties keeps Spark and the SQL oracle aligned
        .when((h_de > h_en) & (h_de >= h_fr) & (h_de >= h_es), F.lit("de"))
        .when((h_fr > h_en) & (h_fr >= h_es), F.lit("fr"))
        .when(h_es > h_en, F.lit("es"))
        .otherwise(F.lit("en"))
    )
    return docs.withColumn("lang_pred", pred)


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_vocab: int = 50_000,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean unigram log10-probability — the cheap stand-in
    for an LM perplexity filter (CCNet-style): gibberish and boilerplate
    score far below fluent text under the corpus's own unigram model.

    Model: vocabulary = top ``max_vocab`` tokens by corpus frequency
    (ties broken by token for determinism), add-alpha smoothing
    ``p(t) = (c_t + alpha) / (N + alpha * (V + 1))`` with every
    out-of-vocabulary token sharing the c=0 estimate.

    Plan shape for 100 TB: the frequency table aggregates map-side
    partial counts and is capped at ``max_vocab`` rows, so it BROADCASTS
    to the scoring join; the corpus side explodes tokens map-side and
    re-aggregates on the id — one shuffle keyed by document id, none
    keyed by content. Returns (id, n_tokens, avg_logprob).
    """
    from anytomd_spark.analysis.dedup import tokenize

    toks = docs.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("tok")
    )
    freq = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(max_vocab)
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("tok").alias("v"),
    )
    scored = (
        toks.join(F.broadcast(freq), "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.log10(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                / (F.col("n_total") + F.lit(alpha) * (F.least(F.col("v"), F.lit(max_vocab)) + 1))
            ).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("lp").alias("avg_logprob"),
    )


# ---- PII redaction (training-data scrub stage) --------------------------
# Dialect-portable patterns (Java regex + RE2): applied in a FIXED order
# (email, then IPv4, then phone) so Spark and the SQL oracle agree even
# where patterns could overlap.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+\d[\d\- ]{7,}\d"
_PII_RULES = (
    (PII_EMAIL, "<EMAIL>"),
    (PII_IPV4, "<IP>"),
    (PII_PHONE, "<PHONE>"),
)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails / IPv4s / phone-like numbers to typed placeholders —
    the standard pre-training redaction pass. Pure column expressions
    (whole-stage codegen); adds ``redacted`` and a per-document ``n_pii``
    match count (counted BEFORE replacement, so overlapping rules cannot
    double-count a span already rewritten)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_pii = None
    redacted = c
    for pattern, token in _PII_RULES:
        n = F.size(F.regexp_extract_all(redacted, F.lit(pattern), F.lit(0)))
        n_pii = n if n_pii is None else n_pii + n
        redacted = F.regexp_replace(redacted, pattern, token)
    return docs.withColumns({"redacted": redacted, "n_pii": n_pii})


def repetition_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals, per document:

    * ``dup_line_frac``   — 1 − distinct non-empty lines / lines
    * ``dup_2gram_frac``  — 1 − distinct word bigrams / bigrams
    * ``dup_3gram_frac``  — 1 − distinct word trigrams / trigrams

    High values mark boilerplate / degenerate repetition. All built-in
    column expressions; shingle semantics shared with the dedup module.
    """
    from anytomd_spark.analysis.dedup import tokenize

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    lines = F.filter(
        F.transform(F.split(c, "\n"), F.trim),
        lambda x: F.length(x) > 0,
    )

    def dup_frac(arr):
        return F.when(
            F.size(arr) > 0,
            1.0 - F.size(F.array_distinct(arr)) / F.size(arr),
        ).otherwise(F.lit(0.0))

    toks = tokenize(text_col)
    sz = F.size(toks)

    def dup_gram_frac(n: int):
        # grams as zipped-slice STRUCTS, not joined strings: arrays_zip is
        # one builtin (no interpreted per-position lambda like
        # word_shingles' transform+slice+join — measured 8x on this
        # query), and distinct counts are identical because whitespace
        # tokens cannot contain the join separator
        m = sz - (n - 1)
        grams = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(n)])
        return F.when(
            sz >= n, 1.0 - F.size(F.array_distinct(grams)) / m
        ).otherwise(F.lit(0.0))

    return docs.withColumns({
        "dup_line_frac": dup_frac(lines),
        "dup_2gram_frac": dup_gram_frac(2),
        "dup_3gram_frac": dup_gram_frac(3),
    })


_WIN_K, _WIN_W = 8, 4
_WIN_MOD = np.uint64((1 << 61) - 1)
_WIN_LOW53 = np.uint64((1 << 53) - 1)


def _mul257_mod(h: "np.ndarray") -> "np.ndarray":
    """(h * 257) mod (2^61 - 1) without overflow, for h <= MOD.

    257 = 2^8 + 1, and multiplying by 2^8 mod a Mersenne prime is an
    exact 61-bit left-rotation by 8 — all intermediate values stay under
    2^62 in uint64."""
    rot = ((h & _WIN_LOW53) << np.uint64(8)) | (h >> np.uint64(53))
    s = rot + h
    return (s & _WIN_MOD) + (s >> np.uint64(61))


def _poly_hashes(codes: "np.ndarray") -> "np.ndarray":
    """Rolling-equivalent polynomial hashes of all K-grams, vectorized:
    hashes[i] = sum_j codes[i+j] * 257^(K-1-j) mod (2^61 - 1), computed
    Horner-style over the K sliding columns (K vectorized passes instead
    of a per-character Python loop)."""
    n = len(codes)
    if n < _WIN_K:
        h = np.zeros(1, dtype=np.uint64)
        for j in range(n):
            s = _mul257_mod(h) + np.uint64(codes[j])
            h = (s & _WIN_MOD) + (s >> np.uint64(61))
        return np.where(h == _WIN_MOD, np.uint64(0), h)
    m = n - _WIN_K + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(_WIN_K):
        s = _mul257_mod(h) + codes[j: j + m].astype(np.uint64)
        h = (s & _WIN_MOD) + (s >> np.uint64(61))
    return np.where(h == _WIN_MOD, np.uint64(0), h)


@pandas_udf(LongType())
def winnow_fingerprint(texts: pd.Series) -> pd.Series:
    """Winnowing document fingerprint (Arrow-batched pandas UDF).

    Polynomial hash over 8-grams, then XOR of per-window minima
    (window=4, stride 4) — a compact locality-sensitive document
    signature. The hash is vectorized with numpy (8 column passes per
    document instead of a per-character Python loop); values are
    bit-identical to the original rolling-hash formulation."""

    from numpy.lib.stride_tricks import sliding_window_view

    def fp(text) -> int:
        if text is None:
            return 0
        s = text.lower()
        if not s:
            return 0
        codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        hashes = _poly_hashes(codes)
        ln = len(hashes)
        if ln <= _WIN_W:
            out = hashes.min()
        else:
            mins = sliding_window_view(hashes, _WIN_W)[::_WIN_W].min(axis=1)
            out = np.bitwise_xor.reduce(mins)
        return int(out)  # < 2^61, fits signed int64

    return texts.map(fp)


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_md5"),
        winnow_fingerprint(F.col(text_col)).alias("winnow_fp"),
    )
