"""Measure convert_transcripts (shuffle-free map) vs
convert_transcripts_distinct (dedup-before-convert) on corpora at two
duplication factors — the trade both docstrings cite.

Duplicate-heavy corpus: N_TURNS turns drawn from a pool of N_POOL
distinct payloads (duplication factor N_TURNS/N_POOL), the shape of a
re-crawled / boilerplate-attachment corpus. Unique corpus: the standard
bench transcripts (per-turn random payloads) — the overhead case where
dedup-before-convert pays two payload shuffles for nothing.

Usage: python scripts/convert_distinct_bench.py
Env: SPARK_GRAFT_CPUS (default 32), N_TURNS (400000), N_POOL (1000).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from anytomd_spark.pipeline import (  # noqa: E402
    build_session,
    convert_transcripts,
    convert_transcripts_distinct,
)
from anytomd_spark.transcripts import turn_payload  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TURNS = int(os.environ.get("N_TURNS", "400000"))
N_POOL = int(os.environ.get("N_POOL", "1000"))
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench")


def ensure_dup_corpus(spark, n_pool: int = N_POOL,
                      heavy: bool = False) -> str:
    """N_TURNS turns whose payload is pool[xxhash(id) % n_pool].

    heavy=True builds an OOXML-only pool (base64 docx/pptx/xlsx): the
    expensive-kernel case where duplicates spread wider than Arrow-batch
    locality, so the within-batch memo can't collapse them."""
    tag = "heavy" if heavy else "mixed"
    path = os.path.join(CACHE, f"dup_corpus_{N_TURNS}_{n_pool}_{tag}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    if heavy:
        import base64
        import random as _random

        from anytomd_spark.transcripts import (
            build_docx,
            build_pptx,
            build_xlsx,
        )
        builders = (build_docx, build_pptx, build_xlsx)
        pool = []
        for i in range(n_pool):
            rng = _random.Random(i)
            blob = builders[i % 3](rng)
            pool.append(("user", base64.b64encode(blob).decode("ascii"), ""))
    else:
        pool = [turn_payload(7, f"pool-{i:06d}", i % 13)
                for i in range(n_pool)]
    pool_df = spark.createDataFrame(
        [(i, t, tool) for i, (_r, t, tool) in enumerate(pool)],
        schema="pool_id long, text string, tool string",
    )
    turns = spark.range(N_TURNS).select(
        F.concat(F.lit("conv-"), (F.col("id") / 8).cast("long").cast("string"))
        .alias("conv_id"),
        F.pmod("id", F.lit(8)).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.pmod(F.xxhash64("id"), F.lit(n_pool)).alias("pool_id"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    (turns.join(F.broadcast(pool_df), "pool_id")
          .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
          .repartition(256)
          .write.mode("overwrite").parquet(path))
    return path


def time_leg(fn, df) -> float:
    t0 = time.time()
    out = fn(df)
    out.agg(
        F.count(F.lit(1)).alias("n"), F.sum("chars_out").alias("c")
    ).collect()
    return time.time() - t0


def main() -> None:
    spark = build_session(
        master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2,
        app_name="convert-distinct-bench",
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, CPUS, 1, CPUS).mapInPandas(lambda it: it, "id long").count()

    dup_path = ensure_dup_corpus(spark)
    heavy_path = ensure_dup_corpus(spark, n_pool=50000, heavy=True)
    from bench import ensure_transcripts  # same cached unique corpus as bench.py
    uniq_path = ensure_transcripts(spark, N_TURNS // 3)

    legs = {
        "map-only": lambda df: convert_transcripts(df, partitions=CPUS * 2),
        "distinct": lambda df: convert_transcripts_distinct(
            df, partitions=CPUS * 2
        ),
    }
    for corpus, path in (("dup-heavy", dup_path),
                         ("dup-spread-heavy", heavy_path),
                         ("unique", uniq_path)):
        df = spark.read.parquet(path)
        n = df.count()
        n_distinct = df.select("text", "tool").distinct().count()
        for name, fn in legs.items():
            times = [time_leg(fn, df) for _ in range(3)]
            med = statistics.median(times)
            print(f"{corpus:16s} n={n} distinct={n_distinct} "
                  f"{name:8s} median={med:7.2f}s "
                  f"({n / med:9.0f} turns/s) samples="
                  f"{[round(t, 2) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
