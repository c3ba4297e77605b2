"""Interleaved per-query re-measurement (the BENCH anomaly protocol).

The per-round driver bench is a single sample; this repo's own notes
document 20-60% swings from driver-VM contamination. When a query's
bench number moves without a code change, re-measure it here: R rounds,
each running every named query once in order (interleaving absorbs
slow host drift), then per-query median over rounds with ALL samples
disclosed.

    python scripts/query_bench.py text_fingerprints text_repetition
    SPARK_GRAFT_QB_ROUNDS=5 python scripts/query_bench.py ...

Timing matches bench.py exactly: plan build + noop-sink write.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from anytomd_spark.pipeline import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_QB_ROUNDS", "3"))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: query_bench.py <query> [<query> ...]")
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    spark = build_session(
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 2,
        app_name="anytomd-query-bench",
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, CPUS, 1, CPUS).mapInPandas(lambda it: it, "id long").count()

    samples: dict[str, list[float]] = {n: [] for n in names}
    # one untimed warmup pass (JIT, Arrow, Python workers, page cache)
    for n in names:
        qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for _ in range(ROUNDS):
        for n in names:
            t0 = time.time()
            qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples[n].append(round(time.time() - t0, 3))
    spark.stop()
    print(json.dumps({
        "sf_dir": SF_DIR, "cpus": CPUS, "rounds": ROUNDS,
        "note": "1 untimed warmup pass, then interleaved rounds",
        "samples": samples,
        "medians": {n: round(statistics.median(v), 3)
                    for n, v in samples.items()},
    }))


if __name__ == "__main__":
    main()
