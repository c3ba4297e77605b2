"""Two-parallelism scaling evidence (the sandbox substitute for N vs 4N
executors, BASELINE.md protocol): run the identical conversion job on the
identical cached input at local[8] and local[32], report turns/sec at both
and efficiency = (throughput_32 / throughput_8) / 4. Appends the result
table to BENCH/BASELINE.md and prints a JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "400000"))
N_SMALL = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
N_LARGE = int(os.environ.get("SPARK_GRAFT_SCALE_4N", "32"))


def run_leg(cpus: int, transcripts_path: str) -> dict:
    """Run one conversion leg in a fresh JVM/session (subprocess) so the
    two legs share nothing but the input files."""
    code = f"""
import sys, time, json
sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from anytomd_spark.pipeline import build_session, convert_transcripts
spark = build_session(master="local[{cpus}]", shuffle_partitions={cpus * 2},
                      app_name="scaling-{cpus}")
spark.sparkContext.setLogLevel("WARN")
df = spark.read.parquet({transcripts_path!r})
df.limit(2000).count()  # warm Python workers
t0 = time.time()
converted = convert_transcripts(df, partitions={cpus * 2})
stats = converted.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("fails"),
).collect()[0]
dt = time.time() - t0
assert stats.fails == 0
print("LEGRESULT " + json.dumps({{"cpus": {cpus}, "sec": dt, "turns": stats.n}}))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    raise RuntimeError(f"no result line; stderr: {out.stderr[-2000:]}")


def main() -> None:
    from anytomd_spark.pipeline import build_session
    import bench

    spark = build_session(master=f"local[{N_LARGE}]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("WARN")
    transcripts_path = bench.ensure_transcripts(spark, N_CONVS)
    spark.stop()

    small = run_leg(N_SMALL, transcripts_path)
    large = run_leg(N_LARGE, transcripts_path)

    tput_small = small["turns"] / small["sec"]
    tput_large = large["turns"] / large["sec"]
    scale_factor = N_LARGE / N_SMALL
    efficiency = (tput_large / tput_small) / scale_factor

    result = {
        "turns": small["turns"],
        f"sec_local{N_SMALL}": round(small["sec"], 2),
        f"sec_local{N_LARGE}": round(large["sec"], 2),
        f"turns_per_sec_local{N_SMALL}": round(tput_small, 1),
        f"turns_per_sec_local{N_LARGE}": round(tput_large, 1),
        "scaling_efficiency": round(efficiency, 3),
        "criterion": ">= 0.8",
        "pass": efficiency >= 0.8,
    }
    print(json.dumps(result))

    bench_dir = os.path.join(REPO, "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(bench_dir, "BASELINE.md"), "a") as f:
        f.write(
            f"""
## Scaling run {stamp}

Identical job (convert_transcripts over {small['turns']:,} cached
deterministic turns), identical input files, two parallelism levels,
fresh JVM per leg (sandbox substitute for N vs 4N executors):

| master | wall sec | turns/sec |
|---|---|---|
| local[{N_SMALL}] (N) | {small['sec']:.2f} | {tput_small:,.0f} |
| local[{N_LARGE}] (4N) | {large['sec']:.2f} | {tput_large:,.0f} |

efficiency = (throughput_{N_LARGE} / throughput_{N_SMALL}) / {scale_factor:.0f}
           = {efficiency:.3f}  (criterion >= 0.8: {'PASS' if efficiency >= 0.8 else 'FAIL'})
"""
        )


if __name__ == "__main__":
    main()
