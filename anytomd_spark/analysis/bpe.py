"""Distributed BPE tokenizer training — the canonical iterative
corpus-level operator a training-data pipeline runs before tokenizing
100 TB of text (Sennrich et al., "Neural Machine Translation of Rare
Words with Subword Units", ACL 2016).

Shape: classic word-frequency BPE. The corpus collapses once into a
(word, count) table (the only full-corpus pass — everything after runs
on the distinct-word table, which is tiny relative to the corpus), each
word becomes a space-delimited symbol string ``" h e l l o </w> "``,
and every merge round is

    pair counts (groupBy over the word table, weighted by word count)
    -> argmax pair (ORDER BY count DESC, pair ASC LIMIT 1 — a bounded
       one-row driver probe, like the repo's other scalar probes)
    -> apply merge via ``replace(sym, " l r ", " lr ")``.

Merge-application semantics are pinned to the engine ``replace()``
scan (left-to-right, non-overlapping, resume after the replacement):
identical in Spark and DuckDB, so the driver oracle can re-derive
EVERY round — pair counting, tie-breaks, merge application — in
unrolled SQL with zero shared code. (For runs of >= 6 identical
symbols inside one word this differs from textbook leftmost-greedy
pairing; real orthography doesn't produce them, and the semantics are
the contract here.)

Pre-tokenization: lowercase ``[a-z]+`` words (split on ``[^a-z]+``),
keeping the symbol alphabet regex-safe and both engines byte-identical.

Scale notes: the per-round groupBy shuffles only the distinct-word
table (bounded by vocabulary, not corpus size); ``localCheckpoint``
every few rounds truncates the iterative lineage, exactly like the
connected-components loop in analysis/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, count): the single full-corpus pass."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _symbolize(words: DataFrame) -> DataFrame:
    return words.select(
        F.concat(
            F.lit(" "),
            F.concat_ws(" ", F.split(F.col("word"), "")),
            F.lit(" " + END + " "),
        ).alias("sym"),
        F.col("count"),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    toks = F.filter(F.split(F.col("sym"), " "), lambda x: x != "")
    a = F.slice(toks, 1, F.size(toks) - 1)
    b = F.slice(toks, 2, F.size(toks) - 1)
    return (
        syms.select(F.explode(F.arrays_zip(a.alias("l"), b.alias("r"))).alias("z"),
                    "count")
        .select(F.col("z.l").alias("left"), F.col("z.r").alias("right"), "count")
        .groupBy("left", "right")
        .agg(F.sum("count").alias("pair_count"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus. Returns a
    DataFrame (rank int, left string, right string, pair_count long)
    in merge order — the merge table a tokenizer ships."""
    spark = docs.sparkSession
    # persist WITHOUT an eager count: the first merge round's job
    # materializes the cache identically, so the separate count() was
    # one whole extra pass at zero benefit (r7 job-count audit)
    syms = _symbolize(word_counts(docs, text_col)).persist()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(syms)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        merges.append((rank, row["left"], row["right"], row["pair_count"]))
        syms = syms.select(
            F.replace(
                F.col("sym"),
                F.lit(f" {row['left']} {row['right']} "),
                F.lit(f" {row['left']}{row['right']} "),
            ).alias("sym"),
            "count",
        )
        if rank % checkpoint_every == 0:
            # lazy: the NEXT round's pair-count job materializes the
            # checkpoint while doing its own work — eager=True paid a
            # dedicated extra pass per checkpoint for the same lineage
            # truncation
            syms = syms.localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize each document with a learned merge list (same delimited
    representation + replace semantics as training): one map-side pass,
    no shuffle."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda x: x != ""
    )
    sym = F.transform(
        words,
        lambda w: F.concat(
            F.lit(" "), F.concat_ws(" ", F.split(w, "")), F.lit(" " + END + " ")
        ),
    )
    for left, right in merges:
        sym = F.transform(
            sym,
            lambda s: F.replace(
                s, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
            ),
        )
    tokens = F.flatten(
        F.transform(sym, lambda s: F.filter(F.split(s, " "), lambda x: x != ""))
    )
    return docs.withColumn(out_col, tokens)
