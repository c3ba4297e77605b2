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
* decontamination broadcasts the (small) benchmark shingle set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from anytomd_spark.analysis.dedup import tokenize, word_shingles
from anytomd_spark.analysis.text_quality import token_count


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


def decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    ``shingle_n``-gram with a probe (benchmark/eval) document.

    Plan shape for 100 TB: the probe side is benchmarks — MBs, not TBs —
    so its distinct shingles BROADCAST; the corpus side explodes its
    shingles map-side and left-semi joins against the broadcast, then
    re-aggregates to distinct contaminated ids. The corpus never
    shuffles on content.

    ``probes`` needs a ``text`` column; returns (id, contaminated).
    """
    probe_sh = (
        probes.select(
            F.explode(
                F.array_distinct(word_shingles(tokenize(text_col), shingle_n))
            ).alias("shingle")
        ).distinct()
    )
    doc_sh = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_shingles(tokenize(text_col), shingle_n))
        ).alias("shingle"),
    )
    hits = (
        doc_sh.join(F.broadcast(probe_sh), "shingle", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col, F.coalesce("contaminated", F.lit(False)).alias("contaminated")
    )
