"""Extra benchmarks for the optimization round (bench.py is frozen).

Isolates single declared queries under the exact bench.py session
configuration: noop sink (guide §1.4), job descriptions (§1.5), N
timed samples, and optional ``.explain("formatted")`` capture to a
file (the plans/r07 evidence).

Usage:
    python bench_extra.py QUERY [QUERY ...] [--n 3] [--explain-dir plans/r07] [--suffix before]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from anytomd_spark.pipeline import build_session

    spark = build_session(
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 2,
        app_name="anytomd-bench-extra",
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    spark.sparkContext.setLogLevel("WARN")
    # same worker warmup as bench.py
    spark.range(0, CPUS, 1, CPUS).mapInPandas(lambda it: it, "id long").count()

    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    for name in args.queries:
        q = qs[name]
        samples = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = samples
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                q(spark, SF_DIR).explain("formatted")
            path = os.path.join(
                args.explain_dir, f"{name}_{args.suffix}.txt"
            )
            with open(path, "w") as f:
                f.write(buf.getvalue())
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
