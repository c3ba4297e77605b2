"""line_dedup skew stress: the design claim is that first-occurrence-
wins via a min-struct AGGREGATE is skew-safe where the textbook
row_number-window formulation funnels each hot line's occurrences
through one task. This script measures both implementations on an
adversarial corpus — every document shares the same block of boilerplate
lines (each hot line occurs once per document, corpus-wide), plus one
unique line per document — and on the natural sf10 documents table.

    python scripts/line_dedup_skew.py [n_docs] [n_hot_lines]

Prints one JSON line with per-variant medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from anytomd_spark.analysis.dedup import line_dedup  # noqa: E402
from anytomd_spark.pipeline import build_session  # noqa: E402


def line_dedup_window(docs: DataFrame, min_chars: int = 10) -> DataFrame:
    """The textbook formulation this repo deliberately avoids: identical
    semantics, but the first-occurrence winner comes from a row_number
    window partitioned BY THE LINE — a hot boilerplate line's entire
    occurrence set sorts inside one task."""
    lines = docs.select(
        F.col("doc_id").alias("id"),
        F.posexplode(F.split(F.col("text"), "\n", -1)).alias(
            "line_idx", "line"
        ),
    )
    eligible = lines.filter(F.length("line") >= min_chars)
    w = Window.partitionBy("line").orderBy("id", "line_idx")
    winners = (
        eligible.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "line_idx", "line")
    )
    kept = lines.filter(F.length("line") < min_chars).unionByName(winners)
    per_doc = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_dedup"),
    )
    return docs.select(F.col("doc_id").alias("id")).join(
        per_doc, "id", "left"
    ).select(
        F.col("id").alias("doc_id"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
    )


def timed(df: DataFrame) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_hot = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(master=f"local[{cpus}]",
                          shuffle_partitions=cpus * 2,
                          app_name="line-dedup-skew")
    spark.sparkContext.setLogLevel("ERROR")

    boiler = "\n".join(
        f"shared boilerplate navigation line number {i} of this site"
        for i in range(n_hot)
    )
    adversarial = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler + "\n"),
            F.lit("document body unique line "), F.col("id").cast("string"),
        ).alias("text"),
    ).repartition(cpus * 2).persist()
    adversarial.count()

    out = {"n_docs": n_docs, "n_hot_lines": n_hot, "cpus": cpus,
           "variants": {}}
    # interleaved: agg, window, agg, window, ... medians
    agg_s, win_s = [], []
    for _ in range(3):
        agg_s.append(timed(line_dedup(adversarial)))
        win_s.append(timed(line_dedup_window(adversarial)))
    out["variants"]["adversarial_agg"] = {
        "samples": agg_s, "median": statistics.median(agg_s)}
    out["variants"]["adversarial_window"] = {
        "samples": win_s, "median": statistics.median(win_s)}

    sf10 = os.path.join(REPO, ".bench", "sf10", "documents.parquet")
    if os.path.exists(sf10):
        nat = spark.read.parquet(sf10)
        nat_s = [timed(line_dedup(nat)) for _ in range(3)]
        out["variants"]["sf10_natural_agg"] = {
            "samples": nat_s, "median": statistics.median(nat_s)}

    # semantics parity on a small slice (window form is the oracle here)
    small = adversarial.filter(F.col("doc_id") < 2000)
    a = sorted(map(tuple, line_dedup(small).collect()))
    b = sorted(map(tuple, line_dedup_window(small).collect()))
    out["parity_2k_docs"] = a == b
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
