"""SemDeDup quality evidence: how much duplicate signal the cluster
scoping gives up, as a function of cluster count (the ann_recall.py
pattern applied to `similarity.semantic_dedup`).

SemDeDup's approximation is structural: only WITHIN-cluster pairs are
ever compared, so a near-duplicate pair split across a k-means boundary
is invisible. This script seeds noisy near-duplicates at a known cosine
band, computes the TRUE pair set by brute force (all pairs >= tau), and
reports for each n_clusters:

  * pair_containment — fraction of true near-dup pairs whose members
    land in the same cluster (the operator's recall CEILING);
  * flagged — documents marked is_dup (vs the global-policy count from
    the n_clusters=1 quadratic reference, which sees every pair);
  * seconds — wall time, showing the cost curve the containment buys.

Usage:
    python scripts/semdedup_quality.py [sf_dir] [tau] [noise]

Defaults: /root/testdata/sf0.1 (2,000 64-dim vectors + 400 seeded noisy
copies), tau=0.9, noise sigma=0.12 (seeded copies land ~cos 0.93-0.99;
random 64-dim pairs sit far below tau, so the seeded pairs ARE the true
pair set, plus any natural collisions brute force finds).

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from anytomd_spark.analysis import similarity as SIM  # noqa: E402
from anytomd_spark.pipeline import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tau = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    sigma = float(sys.argv[3]) if len(sys.argv) > 3 else 0.12

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = build_session(master=f"local[{cpus}]",
                          shuffle_partitions=cpus * 2,
                          app_name="semdedup-quality")
    spark.sparkContext.setLogLevel("WARN")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.toPandas().sort_values("vec_id")
    n = len(base)
    n_seed = n // 5
    rng = np.random.default_rng(123)
    rows = [(int(r.vec_id), [float(x) for x in r.embedding])
            for r in base.itertuples()]
    for r in base.head(n_seed).itertuples():
        v = np.asarray(r.embedding, dtype=np.float64)
        noisy = v + sigma * np.linalg.norm(v) / np.sqrt(len(v)) \
            * rng.standard_normal(len(v))
        rows.append((int(r.vec_id) + 1_000_000,
                     [float(x) for x in noisy]))
    aug = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(cpus).persist()
    n_aug = aug.count()

    # TRUE pair set: brute-force upper-triangle cosine >= tau for small
    # corpora; above ~5k vectors the quadratic reference is the thing
    # this operator exists to avoid, so the truth is the SEEDED pairs
    # (noisy copies at cos ~0.93-0.99; random 64-dim pairs essentially
    # never reach tau=0.9 — the small-corpus brute force confirms the
    # seeded set IS the true set at this tau)
    t0 = time.time()
    if n <= 5000:
        a = aug.select(F.col("vec_id").alias("a"),
                       F.col("embedding").alias("va"))
        b = aug.select(F.col("vec_id").alias("b"),
                       F.col("embedding").alias("vb"))
        true_pairs = {
            (r.a, r.b)
            for r in a.join(b, F.col("a") < F.col("b"))
            .filter(SIM.cosine_np(F.col("va"), F.col("vb")) >= tau)
            .select("a", "b").collect()
        }
        truth = "brute_force"
    else:
        seeded = aug.filter(F.col("vec_id") >= 1_000_000).select(
            (F.col("vec_id") - 1_000_000).alias("a"),
            F.col("vec_id").alias("b"),
            F.col("embedding").alias("vb"),
        )
        orig = aug.select(F.col("vec_id").alias("a"),
                          F.col("embedding").alias("va"))
        true_pairs = {
            (r.a, r.b)
            for r in seeded.join(orig, "a")
            .filter(SIM.cosine_np(F.col("va"), F.col("vb")) >= tau)
            .select("a", "b").collect()
        }
        truth = "seeded_pairs"
    brute_sec = round(time.time() - t0, 2)

    out = {
        "sf_dir": sf_dir, "n_vectors": n_aug, "n_seeded_copies": n_seed,
        "tau": tau, "noise_sigma": sigma, "truth": truth,
        "true_pairs": len(true_pairs), "truth_sec": brute_sec,
        "variants": {},
    }
    # the k=1 quadratic reference only runs where its one-group GEMM
    # fits a task (n^2 doubles); above that the clustered points stand
    # against the seeded truth alone
    ks = (1, 4, 16, 64) if n_aug <= 5000 else (16, 64, 256)
    for n_clusters in ks:
        t0 = time.time()
        res = SIM.semantic_dedup(
            aug, threshold=tau, n_clusters=n_clusters,
            max_cluster=n_aug,
        ).persist()
        flagged = res.filter("is_dup").count()
        sec = round(time.time() - t0, 2)
        clusters = {r.vec_id: r.cluster for r in
                    res.select("vec_id", "cluster").collect()}
        contained = sum(
            1 for (x, y) in true_pairs if clusters[x] == clusters[y]
        )
        res.unpersist()
        out["variants"][f"k{n_clusters}"] = {
            "pair_containment": round(contained / max(1, len(true_pairs)), 4),
            "flagged": flagged,
            "seconds": sec,
        }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
