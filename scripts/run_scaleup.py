"""Scale-up evidence (VERDICT r3 #1): the same jobs at sf0.1 and at a
10x input (sf1.0), same local[32], fresh JVM per leg, reporting per-row
throughput at both scales plus the per-leg JVM peak RSS (VmHWM).

Legs:
  * convert:  the bench conversion pipeline over cached deterministic
    transcripts — 400k convs (~2.66M turns, the sf0.1 bench input) vs
    4M convs (~26.6M turns).
  * analysis: the five heaviest documents/embeddings queries over the
    driver's sf0.1 tables vs the 10x-shaped tables from
    gen_scale_data.py (.bench/sf1).

Pass criterion (VERDICT): per-row throughput at 10x within ~15% of the
1x leg, peak RSS flat-ish (bounded by partition sizing, not input
size). Each leg runs in its own subprocess so VmHWM is per-leg.

    python scripts/run_scaleup.py            # both scales, both legs
    python scripts/run_scaleup.py --leg convert --mult 10
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAVY = [
    "dedup_clusters", "dedup_minhash_pairs", "dedup_ngram_jaccard",
    "sim_ann_lsh", "corpus_decontaminate",
]

# the heaviest-shuffle family gets its own 1x/10x/100x sweep (r5 verdict
# #5): banded LSH + verify, connected components, winnowed shared spans
DEDUP = ["dedup_minhash_pairs", "dedup_clusters", "dedup_shared_spans"]

# round-6 session-6 additions: SemDeDup (embeddings), doc+line exact
# dedup union, fixed+temperature mixture sampling
NEWOPS = ["sim_semantic_dedup", "dedup_exact", "corpus_sample_mix"]


def _sf_dir_for(mult: int) -> str:
    if mult == 1:
        return "/root/testdata/sf0.1"
    return os.path.join(REPO, ".bench", f"sf{mult // 10}")


def _jvm_vmhwm_kb(spark) -> int:
    pid = spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return int(line.split()[1])
    return -1


def run_leg(leg: str, mult: int) -> None:
    """Child process: one leg at one scale; prints a JSON line."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    import bench
    from anytomd_spark.pipeline import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        app_name=f"anytomd-scaleup-{leg}-{mult}x",
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, cpus, 1, cpus).mapInPandas(lambda it: it, "id long").count()

    out: dict = {"leg": leg, "mult": mult, "cpus": cpus}
    if leg == "convert":
        n_convs = 400_000 * mult
        path = bench.ensure_transcripts(spark, n_convs)
        sec, n_turns = bench.bench_convert(spark, path)
        out.update({
            "n_turns": n_turns, "sec": round(sec, 2),
            "turns_per_sec": round(n_turns / sec, 1),
        })
    elif leg == "classifier":
        # the iterative-GD trainer (r6): same cold + interleaved-median
        # protocol; clearCache between rounds so each sample pays the
        # full feature build + 8 epochs + scoring write, not a residue
        # of the previous round's persisted feature table.
        import statistics

        from anytomd_spark.analysis.classifier import (
            EPOCHS, train_quality_classifier,
        )

        sf_dir = _sf_dir_for(mult)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_docs = docs.count()
        rounds = int(os.environ.get("SPARK_GRAFT_SCALEUP_ROUNDS", "3"))
        samples = []
        for i in range(rounds + 1):
            t0 = time.time()
            _, scored = train_quality_classifier(docs)
            scored.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        cold_s, steady = samples[0], samples[1:]
        med = statistics.median(steady)
        out.update({
            "sf_dir": sf_dir, "n_docs": n_docs, "epochs": EPOCHS,
            "cold_first_pass": cold_s, "samples": steady,
            "median_sec": round(med, 3),
            "sec_per_epoch": round(med / EPOCHS, 3),
            "docs_per_sec": round(n_docs / med, 1),
        })
    else:
        import statistics

        names = {"dedup": DEDUP, "newops": NEWOPS}.get(leg, HEAVY)
        sf_dir = _sf_dir_for(mult)
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        qs = entrymod.queries()
        rounds = int(os.environ.get("SPARK_GRAFT_SCALEUP_ROUNDS", "3"))
        # one warmup pass (codegen, Python workers, page cache), timed
        # separately as the COLD number — for the dedup family this pass
        # pays the one-time persisted verified-pairs build, which is the
        # real at-scale cost; the interleaved medians then measure the
        # steady (cached) state. Single cold samples swung 5x between
        # consecutive runs of this leg, hence medians for steady state.
        cold: dict[str, float] = {}
        for name in names:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            cold[name] = round(time.time() - t0, 3)
        samples: dict[str, list[float]] = {n: [] for n in names}
        for _ in range(rounds):
            for name in names:
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                samples[name].append(round(time.time() - t0, 3))
        timings = {n: round(statistics.median(v), 3)
                   for n, v in samples.items()}
        out.update({
            "sf_dir": sf_dir, "n_docs": n_docs, "rounds": rounds,
            "cold_first_pass": cold, "samples": samples, "queries": timings,
            "total_sec": round(sum(timings.values()), 3),
            "docs_per_sec": round(n_docs * len(names)
                                  / sum(timings.values()), 1),
        })
    out["jvm_vmhwm_mb"] = round(_jvm_vmhwm_kb(spark) / 1024)
    spark.stop()
    print("SCALEUP " + json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg",
                    choices=["convert", "analysis", "dedup", "classifier",
                             "newops"])
    ap.add_argument("--mult", type=int)
    ap.add_argument("--dedup-sweep", action="store_true",
                    help="dedup family at 1x/10x/100x (5k/50k/500k docs); "
                         "generate .bench/sf1 + .bench/sf10 first")
    args = ap.parse_args()
    if args.leg:
        run_leg(args.leg, args.mult or 1)
        return
    if args.dedup_sweep:
        results = []
        for mult in (1, 10, 100):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--leg", "dedup", "--mult", str(mult)],
                capture_output=True, text=True, cwd=REPO,
            )
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("SCALEUP ")]
            if not line:
                sys.exit(f"dedup x{mult} failed:\n{p.stdout[-2000:]}"
                         f"\n{p.stderr[-4000:]}")
            results.append(json.loads(line[-1][8:]))
            print(line[-1], flush=True)
        base = results[0]
        print(json.dumps({
            "dedup_docs_per_sec": {f"{r['mult']}x": r["docs_per_sec"]
                                   for r in results},
            "dedup_time_growth_vs_input": {
                f"{r['mult']}x": round(
                    (r["total_sec"] / base["total_sec"]) / r["mult"], 3)
                for r in results},
            "jvm_vmhwm_mb": {f"{r['mult']}x": r["jvm_vmhwm_mb"]
                             for r in results},
        }))
        return
    results = []
    for leg in ("analysis", "convert"):
        for mult in (1, 10):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--leg", leg, "--mult", str(mult)],
                capture_output=True, text=True, cwd=REPO,
            )
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("SCALEUP ")]
            if not line:
                sys.exit(f"{leg} x{mult} failed:\n{p.stdout[-2000:]}"
                         f"\n{p.stderr[-4000:]}")
            results.append(json.loads(line[-1][8:]))
            print(line[-1], flush=True)
    by = {(r["leg"], r["mult"]): r for r in results}
    conv1, conv10 = by[("convert", 1)], by[("convert", 10)]
    ana1, ana10 = by[("analysis", 1)], by[("analysis", 10)]
    print(json.dumps({
        "convert_tps_1x": conv1["turns_per_sec"],
        "convert_tps_10x": conv10["turns_per_sec"],
        "convert_tps_ratio_10x_vs_1x": round(
            conv10["turns_per_sec"] / conv1["turns_per_sec"], 3),
        "analysis_dps_1x": ana1["docs_per_sec"],
        "analysis_dps_10x": ana10["docs_per_sec"],
        "analysis_dps_ratio_10x_vs_1x": round(
            ana10["docs_per_sec"] / ana1["docs_per_sec"], 3),
        "jvm_vmhwm_mb": {f"{r['leg']}_{r['mult']}x": r["jvm_vmhwm_mb"]
                         for r in results},
    }))


if __name__ == "__main__":
    main()
