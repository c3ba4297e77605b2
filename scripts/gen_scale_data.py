"""Deterministic scale-up inputs: documents/embeddings at a multiple of
sf0.1, shaped to match the driver's tables (VERDICT r3 #1 — everything
green so far is sf0.1-only; the 100x-survival claims need at least one
measured 10x point).

Shape matching, measured from /root/testdata/sf0.1 (read-only):
  * documents: 5,000 rows, 31-word vocabulary, ~44-577 chars (~avg
    297), langs {en 41%, de/es/fr/zh ~15%}, 20 sources, 8 exact dups,
    and ~25 seeded near-dup pairs per 500 docs (random id distance,
    3-gram Jaccard ~0.95-0.99 — a copy with a few words resampled).
  * embeddings: 2,000 rows, 64-dim float vectors, int label.

Everything is a function of (seed, row index) — byte-identical across
re-runs and partitioning. Writes parquet under .bench/sf<X>/.

    python scripts/gen_scale_data.py 1.0      # 50,000 docs, 20,000 vecs
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data a join scale plan shuffle skew"
).split()  # 31 words, as in the driver's tables

LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def gen_documents(n_docs: int, seed: int = 20260816) -> pa.Table:
    rng = np.random.default_rng(seed)
    lens = rng.integers(9, 113, size=n_docs)
    texts = [
        " ".join(np.asarray(VOCAB)[rng.integers(0, len(VOCAB), size=ln)])
        for ln in lens
    ]
    # seeded near-dups at the measured rate (25 pairs / 500 docs): doc b
    # becomes doc a with 1-3 words resampled -> 3-gram Jaccard ~0.95+
    n_pairs = n_docs // 20
    pair_ids = rng.choice(n_docs, size=2 * n_pairs, replace=False)
    for k in range(n_pairs):
        a, b = int(pair_ids[2 * k]), int(pair_ids[2 * k + 1])
        words = texts[a].split()
        if len(words) < 40:  # long docs only, like the driver's pairs
            continue
        for _ in range(int(rng.integers(1, 4))):
            words[int(rng.integers(0, len(words)))] = VOCAB[
                int(rng.integers(0, len(VOCAB)))
            ]
        texts[b] = " ".join(words)
    # exact dups at the measured rate (8 / 5000)
    for _ in range(max(1, round(n_docs * 8 / 5000))):
        i, j = rng.integers(0, n_docs, size=2)
        texts[int(j)] = texts[int(i)]
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    sources = [f"src{int(s)}" for s in rng.integers(0, 20, size=n_docs)]
    return pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.tolist(), pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n_vecs: int, dim: int = 64, seed: int = 20260817) -> pa.Table:
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n_vecs, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n_vecs).tolist(),
                          pa.int32()),
    })


def main() -> None:
    mult = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    n_docs = int(50_000 * mult)
    n_vecs = int(20_000 * mult)
    out = os.path.join(REPO, ".bench", f"sf{mult:g}")
    os.makedirs(out, exist_ok=True)
    # small row groups: parquet splits on row-group boundaries, and the
    # shingle-explode stages want fine-grained scan tasks
    pq.write_table(gen_documents(n_docs), f"{out}/documents.parquet",
                   row_group_size=1024)
    pq.write_table(gen_embeddings(n_vecs), f"{out}/embeddings.parquet",
                   row_group_size=4096)
    print(f"wrote {n_docs} documents, {n_vecs} embeddings -> {out}")


if __name__ == "__main__":
    main()
