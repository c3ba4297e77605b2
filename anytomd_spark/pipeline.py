"""The Spark extraction pipeline.

Lifecycle (SURVEY.md §3.4):

    read transcripts -> anti-join completed lineage buckets (resume)
      -> salted repartition by hash(conv_id) -> mapInPandas(convert_batch)
      -> window-ordered output -> idempotent per-bucket overwrite
      -> lineage rows (bytes in, chars out, fmt histogram, failures)

Scale notes (designed for 10^12 turns / 1000 executors; validated on
local[32]):
  * The only JVM<->Python crossing is the Arrow-batched ``mapInPandas``;
    everything else is Catalyst-planned (scan pruning, AQE coalescing).
  * Payloads are fat strings, so Arrow batches are kept small
    (``spark.sql.execution.arrow.maxRecordsPerBatch`` = 512).
  * Skewed mega-conversations are split by a turn-derived salt BEFORE the
    shuffle: the kernel is per-row, so rows of one conversation do not need
    to be co-located for conversion — only the final per-conversation
    ordering needs a shuffle, and that one is handled by the window sort.
  * Resume is bucket-granular: output is written partitioned by
    ``bucket = pmod(xxhash64(conv_id), n_buckets)`` with dynamic partition
    overwrite, so a re-run overwrites exactly the buckets it recomputes.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from anytomd_spark.batch import OUTPUT_SPARK_SCHEMA, convert_batch
from anytomd_spark.transcripts import TRANSCRIPTS_SCHEMA

CONVERTED_SCHEMA = f"{TRANSCRIPTS_SCHEMA}, {OUTPUT_SPARK_SCHEMA}"


def build_session(
    master: str | None = None,
    app_name: str = "anytomd-spark",
    shuffle_partitions: int = 32,
    arrow_batch_rows: int = 4096,
    extra_conf: dict | None = None,
) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(arrow_batch_rows),
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        "spark.sql.parquet.compression.codec": "zstd",
        # payloads are fat strings: smaller splits -> >=2 tasks/core so
        # heterogeneous per-row conversion cost doesn't leave stragglers
        "spark.sql.files.maxPartitionBytes": "32m",
        # 16g: the suite runs ~60 queries in one long-lived local JVM —
        # the old 8g heap spent measurable wall time in GC once the
        # session accumulated codegen classes + block-manager state
        # (every query ran ~0.5 s slower late-session than isolated).
        # Driver-side only; executors-on-cluster size independently.
        "spark.driver.memory": "16g",
        # headless batch runs: the UI listener processes every task
        # event on the driver for a UI nobody opens here; opt back in
        # via extra_conf when debugging interactively (guide §7.1)
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    }
    conf.update(extra_conf or {})
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    # pre-build the native HTML walker on the driver: in local mode the
    # workers share /tmp, so this removes the 32-parallel-cc race from
    # the first conversion task of a cold container (workers on a
    # cluster still build once per node, or silently fall back)
    try:
        from anytomd_spark.kernels._html_native import _get_lib

        _get_lib()
    except Exception:
        pass
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship anytomd_spark to the Python workers (the --py-files analogue
    for library/driver-side use; idempotent per session)."""
    sc = spark.sparkContext
    if getattr(sc, "_anytomd_shipped", False):
        return
    import os
    import tempfile
    import zipfile

    import anytomd_spark

    pkg_dir = os.path.dirname(os.path.abspath(anytomd_spark.__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"anytomd_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for name in files:
                    if name.endswith(".py"):
                        full = os.path.join(root, name)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._anytomd_shipped = True


def _salted_repartition(
    df: DataFrame, partitions: int | None, salt_buckets: int
) -> DataFrame:
    """Split mega-conversations across tasks before the kernel: the salted
    key (hash(conv_id), pmod(turn_idx, salt)) — shared by both kernel
    bindings so the salting scheme cannot drift between them."""
    n = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return df.repartition(
        int(n),
        F.xxhash64("conv_id"),
        F.pmod(F.col("turn_idx"), F.lit(salt_buckets)),
    )


def convert_transcripts(
    df: DataFrame,
    partitions: int | None = None,
    salt_buckets: int = 16,
    repartition: bool = False,
    strict: bool = False,
    max_input_bytes: int | None = None,
) -> DataFrame:
    """transcripts -> converted turns (adds markdown/plain/fmt/... columns).

    The conversion kernel is per-row — embarrassingly parallel — so by
    default NO shuffle precedes it: at 100 TB a full payload shuffle in
    front of a map stage is the single biggest avoidable cost, and
    file-split inputs are already balanced by ``maxPartitionBytes``.

    Set ``repartition=True`` when the source layout is conv-clustered
    (e.g. an Iceberg table partitioned by conversation): then the salted
    key ``(hash(conv_id), pmod(turn_idx, salt))`` splits mega-conversations
    so no task inherits a whole one — payload-byte skew that AQE's
    row-count heuristics can miss. The hash(conv_id) partitioning the
    north rule requires for output ordering happens in ``ordered_output``'s
    window shuffle regardless.
    """
    out = _salted_repartition(df, partitions, salt_buckets) if repartition else df
    # passthrough columns survive the kernel: output schema = input + outputs
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    def _convert_iter(iterator):
        for pdf in iterator:
            yield convert_batch(
                pdf, strict=strict, max_input_bytes=max_input_bytes
            )

    return out.mapInPandas(
        _convert_iter, schema=f"{schema}, {OUTPUT_SPARK_SCHEMA}"
    )


def convert_transcripts_distinct(
    df: DataFrame,
    partitions: int | None = None,
    strict: bool = False,
    max_input_bytes: int | None = None,
) -> DataFrame:
    """Convert each DISTINCT (text, tool) payload once and join the
    results back — the cluster-scale form of convert_batch's
    within-batch memoization.

    When to consider it: corpora with a high payload duplication factor
    (boilerplate attachments, templated documents, re-crawled pages —
    the Common-Crawl-style dedup-before-extract pattern). The plan is
    dedup (one payload shuffle on a 256-bit content key) -> map-only
    kernel over the ~distinct set -> hash join back (second shuffle).

    Measured trade (scripts/convert_distinct_bench.py, BENCH/BASELINE.md
    round-6): on local[32] this variant only reaches PARITY with
    :func:`convert_transcripts` even at a 400x duplication factor —
    convert_batch's within-batch memoization already collapses
    duplicates that co-occur inside an Arrow batch at zero shuffle
    cost — and on an all-unique corpus it is ~2x slower (two payload
    shuffles for nothing). Its genuine niche is a multi-executor
    cluster where (a) the duplication factor is high, (b) the distinct
    pool is far larger than an Arrow batch so batch locality cannot
    capture it, and (c) per-payload kernel cost outweighs network
    shuffle cost (real-world OOXML is ~100x heavier than the bench
    fixtures). Default to map-only; measure before switching. Output
    rows and values are identical either way (equivalence-tested).

    Caveat shared with every multi-scan Spark plan: ``df`` is scanned
    TWICE (dedup branch + probe side), so its content must be stable
    across scans — cache/checkpoint a non-deterministic source first,
    or rows whose recomputed key finds no partner silently left-join to
    null outputs.

    The content key is md5(text)||md5(tool) (128+128 bits) rather than
    xxhash64: at 10^12 turns a 64-bit key would see birthday collisions,
    which for THIS operator would silently attach the wrong Markdown to
    a turn.
    """
    # null-safe without sentinel collisions: a null/non-null flag char
    # per column sits alongside the md5 of the coalesced value
    key = F.concat(
        F.md5(F.coalesce(F.col("text"), F.lit(""))),
        F.when(F.col("text").isNull(), F.lit("N")).otherwise(F.lit("T")),
        F.md5(F.coalesce(F.col("tool"), F.lit(""))),
        F.when(F.col("tool").isNull(), F.lit("N")).otherwise(F.lit("T")),
    ).alias("_content_key")

    reps = (
        df.select(key, "text", "tool")
        .dropDuplicates(["_content_key"])
    )
    if partitions:
        reps = reps.repartition(partitions, "_content_key")

    def _convert_iter(iterator):
        for pdf in iterator:
            out = convert_batch(
                pdf, strict=strict, max_input_bytes=max_input_bytes
            )
            yield out.drop(columns=["text", "tool"])

    converted = reps.mapInPandas(
        _convert_iter,
        schema=f"_content_key string, {OUTPUT_SPARK_SCHEMA}",
    )
    return df.withColumn("_content_key", key).join(
        converted, on="_content_key", how="left"
    ).drop("_content_key")


def convert_transcripts_struct(
    df: DataFrame,
    partitions: int | None = None,
    salt_buckets: int = 16,
    repartition: bool = False,
    strict: bool = False,
    max_input_bytes: int | None = None,
) -> DataFrame:
    """Same kernel as :func:`convert_transcripts`, bound as a
    STRUCT-returning scalar pandas UDF over (text, tool) instead of
    mapInPandas over whole rows.

    Why it exists: mapInPandas ships EVERY column across the Arrow
    boundary in both directions — the kernel reads only text+tool, so
    conv_id/role/ts/turn_idx make two pointless Arrow crossings per
    turn. The scalar UDF keeps passthrough columns JVM-side entirely;
    only the payload goes to Python and only the outputs come back.
    Output schema and values are identical (equivalence-tested); see
    PLANS.md round-3 for the measured comparison.
    """
    from pyspark.sql.functions import pandas_udf

    out = _salted_repartition(df, partitions, salt_buckets) if repartition else df

    @pandas_udf(OUTPUT_SPARK_SCHEMA)
    def _conv(text, tool):
        import pandas as pd

        batch = pd.DataFrame({"text": text, "tool": tool})
        res = convert_batch(
            batch, strict=strict, max_input_bytes=max_input_bytes
        )
        return res[[
            "markdown", "plain_text", "title", "fmt", "error",
            "n_warnings", "warning_codes", "bytes_in", "chars_out",
        ]]

    return out.withColumn("_conv", _conv("text", "tool")).select(
        "*", "_conv.*"
    ).drop("_conv")


def ordered_output(
    converted: DataFrame,
    turns: DataFrame | None = None,
    seq_bucket: int = 1 << 20,
    adaptive: bool = True,
) -> DataFrame:
    """Stable (conv_id, turn_idx) ordering (north rule: per-turn equality
    under stable turn ordering): assigns ``turn_seq`` = rank of turn_idx
    within its conversation.

    Skew-safe two-level rank when ``turns`` is supplied: a plain
    ``Window.partitionBy(conv_id)`` puts an ENTIRE conversation on one
    task — a 10^8-turn mega-conversation at 100x scale lands on a single
    executor core with its full payload width. Instead, turn_idx is
    bucketed into ``seq_bucket``-wide ranges; per-(conv, bucket) counts
    aggregate on the SLIM pre-kernel ``turns`` side (conv_id, turn_idx
    only — never re-running the conversion kernel and never shuffling
    payloads twice), cross-bucket offsets come from a per-conv window
    over *bucket rows* (a 10^8-turn conv is ~100 rows there), and the
    payload-side window partitions on (conv_id, bucket) — bounded at
    ``seq_bucket`` rows per task regardless of conversation size.

    ``turns`` must contain exactly the (conv_id, turn_idx) rows of
    ``converted`` (i.e. the kernel's input). Without it the legacy
    single-window path runs — fine when no conversation exceeds
    ~``seq_bucket`` turns.

    ``adaptive`` (default): before committing to the two-level plan,
    one tiny aggregate over the SLIM counts side computes the largest
    per-conversation row count; when every conversation fits in a
    single bucket the legacy single-window path runs instead — the
    common small-conversation case skips the composite-key join + extra
    aggregate entirely (it paid ~+50% on the sf0.1 bench for skew
    safety it didn't need), while any conversation ≥ ``seq_bucket``
    rows keeps the bounded-task guarantee. The check itself is an eager
    driver-side scalar job on (conv_id, turn_idx) only — payloads never
    move. Pass ``adaptive=False`` to pin the two-level plan (tests,
    known-skewed inputs).
    """
    if turns is None:
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        return (
            converted.withColumn("turn_seq", F.row_number().over(w))
            .sortWithinPartitions("conv_id", "turn_idx")
        )
    bkt = F.floor(
        F.coalesce(F.col("turn_idx"), F.lit(0)) / F.lit(seq_bucket)
    ).cast("long")
    counts = (
        turns.select("conv_id", bkt.alias("_seq_bkt"))
        .groupBy("conv_id", "_seq_bkt")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    if adaptive:
        biggest = (
            counts.groupBy("conv_id")
            .agg(F.sum("_n").alias("_t"))
            .agg(F.max("_t"))
            .collect()[0][0]
        )
        if biggest is None or biggest < seq_bucket:
            w = Window.partitionBy("conv_id").orderBy("turn_idx")
            return (
                converted.withColumn("turn_seq", F.row_number().over(w))
                .sortWithinPartitions("conv_id", "turn_idx")
            )
    w_off = Window.partitionBy("conv_id").orderBy("_seq_bkt")
    offsets = counts.select(
        "conv_id", "_seq_bkt",
        (F.sum("_n").over(w_off) - F.col("_n")).cast("long").alias("_off"),
    )
    w_seq = Window.partitionBy("conv_id", "_seq_bkt").orderBy("turn_idx")
    # null-safe on conv_id: a plain inner equi-join would silently DROP
    # rows with a null conv_id (null never equals null) even though the
    # same rows exist on the counts side; the legacy window kept them
    off = offsets.select(
        F.col("conv_id").alias("_oc"), F.col("_seq_bkt").alias("_ob"),
        "_off",
    )
    return (
        converted.withColumn("_seq_bkt", bkt)
        .join(
            off,
            F.col("conv_id").eqNullSafe(F.col("_oc"))
            & (F.col("_seq_bkt") == F.col("_ob")),
        )
        .withColumn(
            "turn_seq",
            (F.col("_off") + F.row_number().over(w_seq)).cast("int"),
        )
        .drop("_seq_bkt", "_off", "_oc", "_ob")
        .sortWithinPartitions("conv_id", "turn_idx")
    )


# --------------------------------------------------------------------------
# lineage sidecar + resumable run
# --------------------------------------------------------------------------

LINEAGE_SCHEMA = (
    "bucket int, n_rows long, bytes_in long, chars_out long, "
    "n_failures long, n_warnings long, fmt_hist map<string,long>, "
    "run_id string, status string, ts double, storage string"
)


def bucketed(df: DataFrame, n_buckets: int = 64) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )


def compute_lineage(converted_with_bucket: DataFrame, run_id: str) -> DataFrame:
    """Per-bucket extraction metrics incl. a format histogram map
    (SURVEY.md §2.5). Two partial-aggregable passes; no collect."""
    base = converted_with_bucket.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("chars_out").alias("chars_out"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_failures"),
        F.sum("n_warnings").cast("long").alias("n_warnings"),
    )
    hist = (
        converted_with_bucket.groupBy("bucket", "fmt")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("bucket")
        .agg(F.map_from_entries(
            F.collect_list(F.struct(F.coalesce("fmt", F.lit("unknown")), "n"))
        ).alias("fmt_hist"))
    )
    return (
        base.join(hist, "bucket", "left")
        .withColumn("run_id", F.lit(run_id))
        .withColumn("status", F.lit("done"))
        .withColumn("ts", F.lit(time.time()))
    )


def verify_against_expected(converted: DataFrame, expected: DataFrame) -> dict:
    """Golden verification (SURVEY §2.5): join produced markdown against an
    expected table on (conv_id, turn_idx); returns mismatch/missing counts.
    ``expected`` schema: conv_id string, turn_idx int, markdown string."""
    joined = converted.select(
        "conv_id", "turn_idx", F.col("markdown").alias("got")
    ).join(
        expected.select(
            "conv_id", "turn_idx", F.col("markdown").alias("want")
        ),
        ["conv_id", "turn_idx"],
        "full_outer",
    )
    row = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("got").isNull(), 1).otherwise(0)).alias("missing"),
        F.sum(F.when(F.col("want").isNull(), 1).otherwise(0)).alias("extra"),
        F.sum(
            F.when(
                F.col("got").isNotNull()
                & F.col("want").isNotNull()
                & (F.col("got") != F.col("want")),
                1,
            ).otherwise(0)
        ).alias("mismatched"),
    ).collect()[0]
    return {
        "rows": row.n,
        "missing": row.missing or 0,
        "extra": row.extra or 0,
        "mismatched": row.mismatched or 0,
        "ok": not (row.missing or row.extra or row.mismatched),
    }


def compute_fmt_histogram(converted: DataFrame) -> DataFrame:
    return converted.groupBy("fmt").agg(F.count(F.lit(1)).alias("n"))


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    output_path: str,
    lineage_path: str,
    run_id: str | None = None,
    n_buckets: int = 64,
    resume: bool = True,
    partitions: int | None = None,
    salted: bool = False,
    strict: bool = False,
    max_input_bytes: int | None = None,
    storage: str | None = None,
) -> dict:
    """Resumable conversion run with a lineage sidecar.

    Completed buckets (recorded in the lineage table for this output) are
    filtered away on resume; each bucket's output partition is
    idempotently overwritten, so a crashed run re-executes only its
    unfinished buckets. ``storage`` picks Iceberg when the runtime jar is
    present (``output_path``/``lineage_path`` are then table
    identifiers), the parquet shim otherwise; the active mode is recorded
    in every lineage row.

    I/O budget (the 100 TB design constraint): ONE read of the input
    (the conversion+write job — run/failure counts ride on it as an
    ``observe`` metric, costing nothing), and one METRIC-COLUMNS-ONLY
    read of the just-written output for the per-bucket lineage — the
    explicit slim projection guarantees the parquet scan materializes
    only the ~6 narrow metric columns, never the markdown/text payloads
    that dominate the bytes (at 100 TB output this is ~1-2% extra read,
    and it buys the durability property: lineage describes the rows
    actually committed, not the rows we believe we wrote).
    """
    from pyspark.sql import Observation

    from anytomd_spark import table_io

    storage = table_io.probe_storage(spark, storage)
    run_id = run_id or uuid.uuid4().hex[:12]
    df = bucketed(transcripts, n_buckets)

    done_buckets: set[int] = set()
    if resume:
        try:
            lineage = table_io.read_lineage(spark, lineage_path, storage)
            done_buckets = {
                r.bucket
                for r in lineage.filter(F.col("status") == "done")
                .select("bucket").distinct().collect()
            }
        except Exception:
            pass  # first run: no lineage yet

    # bucket arithmetic is driver-side (bounded by n_buckets) — no
    # key-scan of the input just to enumerate what remains
    run_buckets = [b for b in range(n_buckets) if b not in done_buckets]
    if not run_buckets:
        return {"run_id": run_id, "rows": 0, "failures": 0, "buckets": 0,
                "storage": storage}
    if done_buckets:
        df = df.filter(~F.col("bucket").isin(sorted(done_buckets)))

    converted = convert_transcripts(
        df.drop("bucket"), partitions=partitions, repartition=salted,
        strict=strict, max_input_bytes=max_input_bytes,
    )
    # bucket is a pure function of conv_id — recompute it post-kernel
    # (mapInPandas declares a fixed output schema without it). The slim
    # pre-kernel projection feeds the skew-safe turn_seq counts.
    ordered = bucketed(
        ordered_output(converted, turns=df.select("conv_id", "turn_idx")),
        n_buckets,
    )

    # run totals + the set of buckets actually written ride on the write
    # job itself (no extra pass); the observed bucket set — not
    # range(n_buckets) — scopes the lineage read, so stale buckets left
    # by earlier runs are never re-attributed to this run_id
    obs = Observation(f"anytomd_run_{run_id}")
    observed = ordered.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.when(F.col("error").isNotNull(), 1).otherwise(0)
        ).alias("failures"),
        F.collect_set("bucket").alias("buckets"),
    )
    table_io.write_output(observed, output_path, storage)
    stats = obs.get
    written_buckets = sorted(stats["buckets"] or [])
    if not written_buckets:
        # empty input: nothing written (and possibly no parquet files to
        # re-read at all) — report zero work, append no lineage
        return {"run_id": run_id, "rows": 0, "failures": 0, "buckets": 0,
                "storage": storage}

    # per-bucket lineage from the committed output, metric columns only
    # (partition-pruned to the written buckets; payloads never read)
    out_slim = (
        table_io.read_output(spark, output_path, storage)
        .filter(F.col("bucket").isin(written_buckets))
        .select("bucket", "fmt", "bytes_in", "chars_out", "error",
                "n_warnings")
    )
    lineage_rows = compute_lineage(out_slim, run_id).withColumn(
        "storage", F.lit(storage)
    )
    table_io.append_lineage(lineage_rows, lineage_path, storage)

    return {
        "run_id": run_id,
        "rows": stats["rows"],
        "failures": stats["failures"] or 0,
        "buckets": len(written_buckets),
        "storage": storage,
    }
