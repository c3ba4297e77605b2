"""Archive-shard ingestion throughput: tar_extract / zip_extract over a
few hundred MB of synthesized WebDataset-style shards (mixed txt /
code / CSV / JSON members), measured as members/s and MB/s on
local[$SPARK_GRAFT_CPUS]. The edge is map-only (PLANS.md: zero
Exchange), so this number extrapolates per-core.

    python scripts/ingest_bench.py [n_shards] [members_per]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from anytomd_spark.analysis.ingest import (  # noqa: E402
    build_tar,
    build_zip,
    tar_extract,
    zip_extract,
)
from anytomd_spark.pipeline import build_session  # noqa: E402


def _members(s: int, members_per: int) -> list[tuple[str, bytes]]:
    out = []
    for i in range(members_per):
        kind = i % 4
        if kind == 0:
            body = (f"shard {s} member {i} " * 40).encode()
            out.append((f"doc_{i:04d}.txt", body))
        elif kind == 1:
            body = (f"# shard {s}\n" + f"print({i})\n" * 30).encode()
            out.append((f"doc_{i:04d}.py", body))
        elif kind == 2:
            rows = "\n".join(f"{s},{i},{j}" for j in range(30))
            out.append((f"doc_{i:04d}.csv", f"a,b,c\n{rows}\n".encode()))
        else:
            body = json.dumps({"shard": s, "member": i,
                               "vals": list(range(40))}).encode()
            out.append((f"doc_{i:04d}.json", body))
    return out


def main() -> None:
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    members_per = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(master=f"local[{cpus}]",
                          shuffle_partitions=cpus,
                          app_name="ingest-bench")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, cpus, 1, cpus).mapInPandas(lambda it: it, "id long").count()

    results = {}
    for fmt, build in (("tar", lambda m: build_tar(m, gzipped=False)),
                       ("tar.gz", lambda m: build_tar(m, gzipped=True)),
                       ("zip", lambda m: build_zip(m, compressed=True))):
        payloads = [
            (s, bytearray(build(_members(s, members_per))))
            for s in range(n_shards)
        ]
        total_mb = sum(len(p) for _, p in payloads) / 1e6
        pdf = pd.DataFrame(payloads, columns=["shard_id", "payload"])
        df = spark.createDataFrame(
            pdf, schema="shard_id long, payload binary"
        ).repartition(cpus * 2).persist()
        df.count()  # materialize input before timing

        extract = tar_extract if fmt.startswith("tar") else zip_extract
        t0 = time.time()
        stats = extract(df).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)
                  ).alias("errs"),
            F.sum("n_bytes").alias("bytes"),
        ).collect()[0]
        dt = time.time() - t0
        df.unpersist()
        assert stats.errs == 0, f"{fmt}: {stats.errs} errors"
        results[fmt] = {
            "shards": n_shards, "members": int(stats.n),
            "input_mb": round(total_mb, 1),
            "sec": round(dt, 2),
            "members_per_sec": round(stats.n / dt, 1),
            "mb_per_sec": round(stats.bytes / 1e6 / dt, 1),
        }
    results["cpus"] = cpus
    spark.stop()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
