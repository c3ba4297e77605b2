"""Corpus-assembly operators for training-data pipelines: deterministic
splits, token-budget sharding, benchmark decontamination.

All three are pure built-in-function plans (no Python UDFs) and
engine-portable by construction, so every one has a value-level DuckDB
oracle:

* splits key on an md5 HEX-STRING comparison (hex digits are ordered in
  ASCII, so thresholds are plain string literals — no engine-specific
  hash or hex-to-int parsing);
* sharding uses the same two-level skew-safe cumulative sum as
  ``pipeline.ordered_output`` (a naive global-window cumsum would put
  the whole corpus through one task);
* decontamination broadcasts the (small) benchmark shingle set; its
  optional ``method="bloom"`` variant (the one Arrow-UDF exception in
  this module) trades that broadcast for a constant-size bitmap +
  exact verify — value-identical, so the same oracle covers both.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from anytomd_spark.analysis.dedup import tokenize, word_shingles
from anytomd_spark.analysis.text_quality import token_count


def _word_shingles_udf_input(tokens_col, n: int = 3):
    """Single-scope-lambda twin of :func:`word_shingles`, value-identical.

    Kept ONLY for the one place a shingle expression becomes a Python
    UDF's input (the Bloom decontaminate flag stage): predicate pushdown
    inlines the expression into the UDF call, and Spark 4.1's Python-UDF
    extraction cannot handle an input whose lambda bodies reference an
    ENCLOSING lambda's variable (word_shingles' bound-token form) — the
    UDF is left unextracted in the Filter and evaluation dies with an
    INTERNAL_ERROR. This form re-evaluates ``tokens_col`` once per
    shingle position when inlined (the pre-r7 behavior, quadratic in
    words — acceptable on the non-default bloom path), but every lambda
    only references its own variable, which extraction handles."""
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens_col) - n),
            lambda i: F.array_join(F.slice(tokens_col, i + 1, n), " "),
        ),
    ).otherwise(F.array(F.array_join(tokens_col, " ")))


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """(name, 8-hex-char upper bound) per split, cumulative over the
    weight order. A document lands in the first split whose bound its
    md5-prefix sorts below — identical semantics as comparing the first
    32 bits of the hash against floor(cum_weight * 2^32)."""
    out: list[tuple[str, str]] = []
    cum = 0.0
    for name, w in weights.items():
        cum += w
        out.append((name, format(min(int(cum * (1 << 32)), (1 << 32) - 1), "08x")))
    return out


def deterministic_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document to a train/val/test split, deterministically
    and content-independently: split = f(md5(id || ':' || seed)).

    This is how splits must be done at 10^12 scale — stable under
    re-runs, re-partitioning, and corpus growth (an id keeps its split
    when new data arrives), with no shuffle at all (pure map-side
    expression). ``weights`` must sum to 1 (e.g. {"train": .9,
    "val": .05, "test": .05}).
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    key = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))), 1, 8
    )
    expr = None
    for name, bound in split_thresholds(weights):
        cond = key < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    # floating-point cum may leave the last bound just under ffffffff
    last = next(reversed(weights))
    return docs.withColumn("split", expr.otherwise(F.lit(last)))


def rate_threshold(rate: float) -> str:
    """8-hex-char upper bound for an md5-prefix keep test at ``rate``."""
    return format(min(int(rate * (1 << 32)), (1 << 32) - 1), "08x")


def hash_sample(
    docs: DataFrame,
    rate: float | None = None,
    rates: dict[str, float] | None = None,
    group_col: str = "source",
    seed: int = 13,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic rate sampling — the corpus-curation step that sets
    a target domain/source mix: keep a document iff its md5-prefix key
    sorts below the (per-group) rate threshold.

    Like :func:`deterministic_split`, this is how sampling must work at
    10^12 docs: content-independent, stable under re-runs /
    repartitioning / corpus growth (a kept id stays kept when the rate
    only moves up), and a pure map-side expression — zero shuffle, the
    filter pushes down next to the scan. ``rates`` maps group values
    (e.g. source/domain) to keep-rates; groups absent from the map are
    dropped (explicit mix control). ``rate`` alone applies uniformly.
    """
    if (rate is None) == (rates is None):
        raise ValueError("pass exactly one of rate / rates")
    key = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))), 1, 8
    )
    if rate is not None:
        return docs.filter(key < F.lit(rate_threshold(rate)))
    expr = None
    for group, r in rates.items():
        cond = (F.col(group_col) == group) & (key < F.lit(rate_threshold(r)))
        expr = cond if expr is None else expr | cond
    return docs.filter(expr)


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_bucket: int = 1 << 20,
) -> DataFrame:
    """GPT-style sequence packing: the corpus's whitespace tokens,
    concatenated in ``id_col`` order, are cut into fixed-length
    training sequences of ``seq_len`` tokens; documents SPAN cuts (the
    standard concat-then-chunk packing — no padding, no greedy reflow).
    Output is the doc->sequence overlap map, one row per (document,
    sequence) intersection: (id_col, seq_id, seq_tok_start,
    n_tokens_in_seq) — enough for a writer to materialize any sequence
    by slicing its member documents. Zero-token documents contribute
    nothing and emit no rows.

    Plan shape: global token offsets come from the same two-level
    skew-safe cumulative sum as :func:`token_shards` (no single task
    sees the whole corpus ordering); the per-doc sequence fan-out is a
    JVM ``sequence``/``explode`` bounded by 1 + n_tokens/seq_len rows
    per document; everything downstream is expression arithmetic. Zero
    Python, two small shuffles (bucket offsets + the per-bucket
    window)."""
    base = token_shards(
        docs, max_tokens_per_shard=seq_len, id_col=id_col,
        text_col=text_col, id_bucket=id_bucket,
    )
    first = F.floor(F.col("start_offset") / seq_len).cast("long")
    last = F.floor(
        (F.col("start_offset") + F.col("n_tokens") - 1) / seq_len
    ).cast("long")
    spans = base.filter(F.col("n_tokens") > 0).select(
        id_col, "n_tokens", "start_offset",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * seq_len
    tok_start = F.greatest(F.col("start_offset"), seq_start)
    tok_end = F.least(
        F.col("start_offset") + F.col("n_tokens"), seq_start + seq_len
    )
    return spans.select(
        id_col, "seq_id",
        (tok_start - seq_start).alias("seq_tok_start"),
        (tok_end - tok_start).alias("n_tokens_in_seq"),
    )


def temperature_mix_rates(
    docs: DataFrame,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    group_col: str = "source",
    max_groups: int = 10_000,
) -> dict[str, float]:
    """Per-group keep-rates for temperature-based mixture sampling —
    the multilingual-LM data-mixing standard (exponentiated-count
    smoothing, mBERT / XLM-R, Conneau et al. 2020): sampling
    probability ``p_i ∝ n_i^alpha``, realized on a fixed corpus as
    ``rate_i = min(1, target_fraction * N * p_i / n_i)``. ``alpha < 1``
    flattens the mix (rare groups keep a larger fraction of their
    docs); ``alpha = 1`` reproduces the corpus mix; the min-1 cap is
    the single-epoch materialization bound (a hash FILTER cannot
    upsample).

    The counts aggregate is one map-side-partial groupBy; the collect
    is bounded by the GROUP cardinality — mixture components
    (languages, curated source buckets), never documents — and guarded
    by ``max_groups`` via a limit BEFORE the collect."""
    counts = (
        docs.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .limit(max_groups + 1)
        .collect()
    )
    if len(counts) > max_groups:
        raise ValueError(
            f"temperature_mix_rates: > {max_groups} groups in "
            f"{group_col!r} — mixture components must be curated "
            f"buckets, not raw keys"
        )
    # deterministic arithmetic order (sorted by group) so re-runs — and
    # the SQL oracle, which mirrors this exact expression shape —
    # reproduce the same doubles
    ns = {r[group_col]: float(r["n"]) for r in counts}
    if any(g is None for g in ns):
        # r6 advice: sorted() over str-and-None raised an opaque
        # TypeError; make the contract explicit instead
        raise ValueError(
            f"temperature_mix_rates: null {group_col!r} group in the "
            "corpus — filter or impute null groups before mixing"
        )
    total = sum(ns[g] for g in sorted(ns))
    s = sum(ns[g] ** alpha for g in sorted(ns))
    return {
        g: min(1.0, target_fraction * total * (ns[g] ** alpha / s) / ns[g])
        for g in sorted(ns)
    }


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    group_col: str = "source",
    seed: int = 13,
    id_col: str = "doc_id",
    max_groups: int = 10_000,
) -> DataFrame:
    """Temperature-sampled corpus: derive the per-group rates from the
    corpus counts (:func:`temperature_mix_rates` — one bounded agg) and
    apply them with the zero-shuffle md5-prefix filter
    (:func:`hash_sample`). Same stability contract: membership is a
    pure function of (id, seed, group rate), so retuning the mix
    reuses every prior sample in groups whose rate grew (kept ids stay
    kept when a rate only moves up)."""
    rates = temperature_mix_rates(
        docs, alpha=alpha, target_fraction=target_fraction,
        group_col=group_col, max_groups=max_groups,
    )
    return hash_sample(
        docs, rates=rates, group_col=group_col, seed=seed, id_col=id_col
    )


def token_shards(
    docs: DataFrame,
    max_tokens_per_shard: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_bucket: int = 1 << 20,
) -> DataFrame:
    """Contiguous token-budget sharding: documents in ``id_col`` order
    are packed into shards of ~``max_tokens_per_shard`` whitespace
    tokens; ``shard`` = the shard index of the document's starting
    token offset. The standard way to cut a corpus into equal-work
    training files.

    The cumulative sum is two-level (same pattern as
    ``ordered_output``): per-id-range-bucket token totals aggregate
    first (tiny), a window over BUCKET rows yields each bucket's start
    offset, and the per-document running sum windows only within its
    bucket — no single task ever sees the whole corpus ordering.

    Bucketing is by uniform id RANGES sized from a (count, min, max)
    scalar probe — one cheap eager aggregate over the id column only —
    targeting ~``id_bucket`` rows per bucket. This is order-preserving
    (required for the cumulative sum to be exact) and, unlike the
    naive ``floor(id / id_bucket)``, does not assume dense ids: sparse
    64-bit hash-derived ids (xxhash etc., uniform over the id range)
    still land ~``id_bucket`` rows per bucket, where the dense formula
    made one bucket per document and pushed the whole corpus through
    the single-task offset window. (Adversarially clustered sparse ids
    can still overfill a range bucket; uniform-hash ids — the realistic
    sparse case — cannot.)
    """
    n, mn, mx = docs.agg(
        F.count(F.lit(1)),
        F.min(id_col).cast("double"),
        F.max(id_col).cast("double"),
    ).collect()[0]
    n_buckets = max(1, -(-n // id_bucket))  # ceil
    if mn is None or mx <= mn:
        bkt = F.lit(1).cast("long")
    else:
        # width_bucket is monotone in id (weakly, under the double
        # cast), so bucket boundaries respect id order
        bkt = F.width_bucket(
            F.col(id_col).cast("double"), F.lit(mn), F.lit(mx),
            F.lit(n_buckets),
        ).cast("long")
    base = docs.select(
        F.col(id_col),
        bkt.alias("_bkt"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    counts = base.groupBy("_bkt").agg(F.sum("n_tokens").alias("_n"))
    w_off = Window.orderBy("_bkt")
    offsets = counts.select(
        "_bkt", (F.sum("_n").over(w_off) - F.col("_n")).alias("_off")
    )
    w_run = Window.partitionBy("_bkt").orderBy(id_col)
    return (
        base.join(offsets, "_bkt")
        .withColumn(
            "start_offset",
            F.col("_off") + F.sum("n_tokens").over(w_run) - F.col("n_tokens"),
        )
        .withColumn(
            "shard",
            F.floor(F.col("start_offset") / F.lit(max_tokens_per_shard))
            .cast("long"),
        )
        .select(id_col, "n_tokens", "start_offset", "shard")
    )


def _probe_shingles(probes: DataFrame, text_col: str, shingle_n: int) -> DataFrame:
    """Distinct shingle strings of the probe (benchmark) set."""
    return probes.select(
        F.explode(
            F.array_distinct(word_shingles(tokenize(text_col), shingle_n))
        ).alias("shingle")
    ).distinct()


def bloom_parameters(n_items: int, fpp: float = 0.01, max_bits: int = 1 << 27):
    """Standard Bloom sizing: ``m = -n ln p / (ln 2)^2`` bits,
    ``k = (m/n) ln 2`` probes. ``m`` is clamped to [2^10, max_bits]
    (16 MiB at the default cap — the broadcast stays constant-size no
    matter how large the probe set grows) and ``k`` to [1, 16]."""
    n = max(1, n_items)
    m = int(-n * math.log(max(fpp, 1e-12)) / (math.log(2) ** 2))
    m = max(1 << 10, min(m, max_bits))
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (Steele et al., the java.util.SplittableRandom
    mixer) over a uint64 array — derives the second Bloom hash from the
    first, so the JVM only ever computes ONE xxhash64 per shingle.
    uint64 arithmetic wraps mod 2^64 by construction."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _bloom_positions(h1: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch-Mitzenmacher double hashing:
    ``pos_i = (h1 + i * splitmix64(h1)) mod m``, reduced mod m before
    combining (m <= 2^27, k <= 16 keeps every intermediate < 2^32).
    This ONE function is the position authority for both the bitmap
    builder and the membership probe — there is no second
    implementation to drift from. ``h1`` is int64 (Spark's xxhash64);
    reinterpreted two's-complement to uint64."""
    u = np.ascontiguousarray(h1, dtype=np.int64).view(np.uint64)
    r1 = u % np.uint64(m)
    r2 = _splitmix64(u) % np.uint64(m)
    ks = np.arange(k, dtype=np.uint64)
    return ((r1[:, None] + ks[None, :] * r2[:, None]) % np.uint64(m)).astype(
        np.int64
    )


def build_probe_bloom(probe_sh: DataFrame, m: int, k: int) -> np.ndarray:
    """Aggregate the probe shingles into an m-bit Bloom bitmap: the JVM
    hashes each shingle once (xxhash64), each Arrow batch folds its k
    positions into a local partial bitmap (one numpy ``bitwise_or.at``
    pass — never a per-shingle Python object), and only the NONZERO
    words leave the worker as (word, bits) rows for a ``bit_or``
    reduce. The driver collect is bounded by ``m/64`` longs — the
    CHOSEN filter size — never by the probe count (1<<27 bits ->
    2M longs max)."""
    n_words = (m + 63) // 64

    def partial_bitmaps(batches):
        for pdf in batches:
            h1 = pdf["h1"].to_numpy(np.int64)
            if len(h1) == 0:
                continue
            pos = _bloom_positions(h1, k, m).ravel()
            local = np.zeros(n_words, dtype=np.int64)
            np.bitwise_or.at(local, pos >> 6, np.int64(1) << (pos & 63))
            nz = np.flatnonzero(local)
            yield pd.DataFrame({"word": nz, "bits": local[nz]})

    words = (
        probe_sh.select(F.xxhash64("shingle").alias("h1"))
        .mapInPandas(partial_bitmaps, "word long, bits long")
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
        .collect()
    )
    bitmap = np.zeros(n_words, dtype=np.int64)
    for row in words:
        bitmap[row["word"]] = row["bits"]
    return bitmap


def _bloom_hit_batch(
    hs1: pd.Series, bitmap: np.ndarray, k: int, m: int
) -> pd.Series:
    """Vectorized membership test for a batch of per-doc shingle-hash
    arrays: True iff ANY shingle has all k bits set. Pure numpy — one
    (total_shingles, k) position matrix per batch."""
    lens = np.fromiter(
        (0 if a is None else len(a) for a in hs1), dtype=np.int64, count=len(hs1)
    )
    out = np.zeros(len(hs1), dtype=bool)
    if int(lens.sum()) == 0:
        return pd.Series(out)
    h1 = np.concatenate(
        [np.asarray(a, dtype=np.int64) for a in hs1 if a is not None and len(a)]
    )
    pos = _bloom_positions(h1, k, m)
    member = ((bitmap[pos >> 6] >> (pos & 63)) & 1).all(axis=1)
    nonzero = lens > 0
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1][nonzero]
    out[nonzero] = np.logical_or.reduceat(member, starts)
    return pd.Series(out)


def decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    method: str = "exact",
    fpp: float = 0.01,
    bloom_max_bits: int = 1 << 27,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    ``shingle_n``-gram with a probe (benchmark/eval) document.

    Two physical strategies, identical results:

    * ``method="exact"``: the probe side's distinct shingles BROADCAST;
      the corpus side explodes its shingles map-side and left-semi joins
      against the broadcast, then re-aggregates to distinct contaminated
      ids. The corpus never shuffles on content. Right when the probe
      set is benchmarks — MBs, not TBs.
    * ``method="bloom"``: the probe shingles aggregate into a
      CONSTANT-SIZE Bloom bitmap (per-batch numpy partial bitmaps,
      ``bit_or`` per 64-bit word, driver collect bounded by the chosen
      filter size, broadcast once); the corpus side never explodes
      shingle STRINGS except for hits — per doc, the JVM computes one
      xxhash64 array over its shingles and an Arrow-batched numpy
      kernel probes the bitmap (second hash derived via SplitMix64 in
      the same kernel both sides share). Only Bloom HITS (true
      positives + the fpp false positives) enter the exact string-level
      verify join, so the final answer is bit-identical to ``exact``
      while the broadcast stays ~10 bits/probe-shingle instead of a
      whole string hash-set.

    MEASURED VERDICT (round 6, PLANS.md session-6): at every
    sandbox-measurable shape — bench probes (3.5 vs 6.8 s at sf0.1),
    large in-corpus probes, and a zero-hit 2M-shingle disjoint probe
    set at 10x — ``exact`` wins wall-clock; the codegen'd broadcast
    semi join beats the Arrow hop + extra probe-side jobs whenever the
    probe hash-set actually FITS as a broadcast. ``bloom`` is the
    FEASIBILITY path: its broadcast is ~130x smaller at 2M probe
    shingles (2.5 MB bitmap vs ~340 MB of shingle strings) and
    constant-size under ``bloom_max_bits`` no matter how the benchmark
    suite grows, so it is the shape that still runs when the probe set
    reaches executor-memory scale. Default stays ``exact``.

    ``probes`` needs a ``text`` column; returns (id, contaminated).
    """
    if method not in ("exact", "bloom"):
        raise ValueError(f"unknown decontaminate method: {method!r}")
    probe_sh = _probe_shingles(probes, text_col, shingle_n)
    if method == "exact":
        doc_sh = docs.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_shingles(tokenize(text_col), shingle_n))
            ).alias("shingle"),
        )
        candidates = doc_sh.join(F.broadcast(probe_sh), "shingle", "left_semi")
    else:
        # persisted for its three uses (count, bitmap build, verify
        # broadcast) and deliberately NOT unpersisted here: the verify
        # join materializes only when the RETURNED lazy plan runs, so
        # an eager unpersist would force a full third recomputation of
        # the probe explode+distinct (measured ~10 s at a 2M-shingle
        # probe set). The probe table is small by contract; Spark
        # LRU-evicts it under memory pressure.
        probe_sh = probe_sh.persist()
        m, k = bloom_parameters(probe_sh.count(), fpp, bloom_max_bits)
        bitmap = build_probe_bloom(probe_sh, m, k)
        bc = docs.sparkSession.sparkContext.broadcast(bitmap)

        @pandas_udf("boolean")
        def bloom_any(hs1: pd.Series) -> pd.Series:
            return _bloom_hit_batch(hs1, bc.value, k, m)

        # NB deliberately NOT asNondeterministic: pushdown inlines
        # the shingle expression into the UDF input, but with a
        # SINGLE hash transform that is still exactly one
        # evaluation per doc, and the post-filter _sh recompute
        # runs on bloom HITS only. Measured: the nondeterministic
        # fence costs ~2x on the flag stage (it blocks the
        # efficient eval path), while the inline costs nothing.
        #
        # This branch uses _word_shingles_udf_input (the single-scope
        # lambda form) rather than word_shingles: the r7 bound-token
        # rewrite nests a lambda inside another lambda's scope, and
        # Spark 4.1 fails to extract a Python UDF whose (pushdown-
        # inlined) input contains such a cross-scope lambda — the raw
        # PythonUDF is left in the Filter and the job dies with
        # INTERNAL_ERROR "Cannot evaluate expression" at runtime
        # (reproduced minimally; the nondeterministic fence does not
        # stop the inline either). Values are identical; only this
        # UDF-input site needs the extraction-safe shape.
        shingled = docs.select(
            F.col(id_col),
            F.array_distinct(
                _word_shingles_udf_input(tokenize(text_col), shingle_n)
            ).alias("_sh"),
        )
        # _sh must be a bound column before the hash transform
        # (HOF lambdas re-inline expressions — PLANS.md round-4).
        hashed = shingled.select(
            id_col,
            "_sh",
            F.transform("_sh", lambda s: F.xxhash64(s)).alias("_h1"),
        )
        flagged = hashed.filter(bloom_any("_h1"))
        # exact verify on the (tiny) hit set only — removes Bloom
        # false positives, so bloom == exact by construction.
        # explode_OUTER: a plain explode lets the optimizer infer a
        # size(_sh) > 0 constraint and push it below the UDF, where
        # it recomputes the shingles over every doc; outer generate
        # implies nothing, and the semi join drops its null rows.
        candidates = flagged.select(
            id_col, F.explode_outer("_sh").alias("shingle")
        ).join(F.broadcast(probe_sh), "shingle", "left_semi")
    hits = (
        candidates.select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col, F.coalesce("contaminated", F.lit(False)).alias("contaminated")
    )
