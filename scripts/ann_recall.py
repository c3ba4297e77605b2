"""ANN quality evidence: recall@k of the approximate similarity
operators vs the exact brute-force baseline (r5 verdict #6 — the
correctness gate pins the ANN operators' determinism; this measures
their QUALITY).

Runs at a given sf dir (default the generated .bench/sf1 — 20,000
64-dim unit vectors; falls back to /root/testdata/sf0.1) with a
deterministic query set, sweeping the operating points the driver
queries use plus higher-recall settings, and prints one JSON line:

    python scripts/gen_scale_data.py 1.0     # once, writes .bench/sf1
    python scripts/ann_recall.py [sf_dir] [n_queries] [k]

Random unit Gaussians are the HARDEST case for ANN (no cluster
structure, nearest-neighbor cosine gaps are tiny), so these numbers
are a lower bound on real-embedding recall.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from anytomd_spark.analysis import similarity as SIM  # noqa: E402
from anytomd_spark.pipeline import build_session  # noqa: E402


def main() -> None:
    default_dir = os.path.join(REPO, ".bench", "sf1")
    if not os.path.exists(os.path.join(default_dir, "embeddings.parquet")):
        default_dir = "/root/testdata/sf0.1"
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else default_dir
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = build_session(master=f"local[{cpus}]",
                          shuffle_partitions=cpus * 2,
                          app_name="ann-recall")
    spark.sparkContext.setLogLevel("WARN")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < n_queries)

    exact = SIM.brute_force_topk(emb, queries, k=k).persist()
    t0 = time.time()
    exact.count()
    exact_sec = time.time() - t0

    variants = {
        # the driver query's operating point (sim_ann_lsh: multiprobe)
        "lsh_p6_t4_mp6": lambda: SIM.lsh_ann_topk(
            emb, queries, k=k, n_planes=6, n_tables=4, n_probes=6),
        # probe-less baselines
        "lsh_p6_t4": lambda: SIM.lsh_ann_topk(
            emb, queries, k=k, n_planes=6, n_tables=4),
        "lsh_p8_t4": lambda: SIM.lsh_ann_topk(
            emb, queries, k=k, n_planes=8, n_tables=4),
        # recall-oriented point: more tables, shorter signatures
        "lsh_p6_t8": lambda: SIM.lsh_ann_topk(
            emb, queries, k=k, n_planes=6, n_tables=8),
        "lsh_p4_t16": lambda: SIM.lsh_ann_topk(
            emb, queries, k=k, n_planes=4, n_tables=16),
        # multiprobe: recall from query-side bit-flip probes, corpus
        # exploded only n_tables times (the 100-TB-friendly lever)
        "lsh_p8_t4_mp8": lambda: SIM.lsh_ann_topk(
            emb, queries, k=k, n_planes=8, n_tables=4, n_probes=8),
        "lsh_p6_t8_mp6": lambda: SIM.lsh_ann_topk(
            emb, queries, k=k, n_planes=6, n_tables=8, n_probes=6),
        # the driver query's IVF point (sim_ann_ivf) + a deeper probe
        "ivf_c16_p4": lambda: SIM.ivf_ann_topk(
            emb, queries, k=k, n_clusters=16, n_probe=4),
        "ivf_c16_p8": lambda: SIM.ivf_ann_topk(
            emb, queries, k=k, n_clusters=16, n_probe=8),
    }
    rows = {}
    for name, build in variants.items():
        t0 = time.time()
        approx = build()
        rec = SIM.recall_at_k(exact, approx, k=k).collect()[0]
        sec = time.time() - t0
        rows[name] = {"recall_at_k": float(rec["recall_at_k"]),
                      "n_queries": int(rec["n_queries"]),
                      "sec": round(sec, 2)}
    result = {
        "metric": f"ann_recall_at_{k}",
        "sf_dir": sf_dir,
        "corpus": n_corpus,
        "n_queries": n_queries,
        "k": k,
        "brute_force_sec": round(exact_sec, 2),
        "variants": rows,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
