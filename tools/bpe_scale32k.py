"""Measure BPE train + apply at a REAL 32k-merge vocabulary.

The driver fixtures exhaust long before a production merge count
(sf0.1 at 392 merges, the 100x copy fixture at 3272): the fixture
vocabulary is 31 token-disjoint word families, so there simply are
not 32 768 pairs to learn. This tool synthesizes a WIDE-vocabULARY
corpus — deterministic seeded generation, Zipf-distributed counts
over tens of thousands of distinct letter-words — wide enough that
k = 32 768 merges are all real, and measures:

  1. ``bpe_train(mode="vocab_local")`` at k = 32 768 (the lazy-heap
     greedy kernel after the distributed word count);
  2. the ``vocab_min_count`` frequency-floor prune's effect on the
     kernel input (distinct words in vs out) and wall;
  3. the tokenizer APPLY at k = 32 768 via both modes:
     ``rank_merge`` (one Arrow kernel, k-independent plan) and the
     chained-``replace`` path at chunk 256 (⌈k/256⌉ = 128
     vocabulary-relation rewrites) for the comparison number.

Two corpus scales (s1 / s10 = 10x the documents) give the decade
row. Results go to stdout as a markdown table for SCALE.md.

Usage: python tools/bpe_scale32k.py [--quick]
  --quick: k=2048, s1 only (smoke the harness, not the measurement).
"""

from __future__ import annotations

import os
import random
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".scale", "bpe32k")

VOCAB = 60_000  # distinct words; sum(len-1) >> 32768 merge capacity
DOCS_S1 = 20_000  # documents at scale 1 (100 words each = 2M instances)
WORDS_PER_DOC = 100


def _make_corpus(out_dir: str, n_docs: int, seed: int = 42) -> None:
    """Deterministic wide-vocabulary corpus: VOCAB distinct words of
    length 6-14 over 26 letters, Zipf-weighted sampling (exponent
    1.1), n_docs documents of WORDS_PER_DOC words. Head words repeat
    heavily (real merge mass), the tail is hapax-heavy (what
    vocab_min_count prunes)."""
    if os.path.exists(os.path.join(out_dir, "documents.parquet")):
        return
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    vocab = []
    seen = set()
    while len(vocab) < VOCAB:
        w = "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(6, 14))
        )
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    # Zipf weights over a shuffled rank assignment
    weights = [1.0 / (i + 3) ** 1.1 for i in range(VOCAB)]
    if n_docs > 50 * DOCS_S1:
        # s100: rng.choices at 200M draws is ~10 min of pure-Python
        # bisects — draw the word INDICES with numpy's vectorized
        # categorical sampler instead (identical vocabulary and Zipf
        # distribution; a different but equally deterministic RNG,
        # which is fine because the decade rows compare engine cost
        # on same-distribution corpora, not byte-identical text)
        import numpy as np

        p = np.asarray(weights) / sum(weights)
        g = np.random.default_rng(seed + 1)
        idx = g.choice(VOCAB, size=(n_docs, WORDS_PER_DOC), p=p)
        texts = [" ".join(vocab[i] for i in row) for row in idx]
    else:
        texts = []
        for d in range(n_docs):
            ws = rng.choices(vocab, weights=weights, k=WORDS_PER_DOC)
            texts.append(" ".join(ws))
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(out_dir, "documents.parquet"))


def main() -> None:
    quick = "--quick" in sys.argv
    k = 2_048 if quick else 32_768
    if quick:
        scales = [("s1", DOCS_S1)]
    elif "--s100" in sys.argv:
        # third decade point only: 2M docs / 200M word instances
        # (~1.5 GB text; the 60k vocabulary saturates, so this decade
        # isolates pure corpus-scan + join-back growth)
        scales = [("s100", DOCS_S1 * 100)]
    else:
        scales = [("s1", DOCS_S1), ("s10", DOCS_S1 * 10)]
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.operators.bpe import (
        bpe_token_counts,
        bpe_train,
    )
    from pagerank_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="bpe-scale32k")
    rows = []
    for name, n_docs in scales:
        d = os.path.join(OUT, name)
        _make_corpus(d, n_docs)
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        docs = docs.localCheckpoint()  # isolate op cost from file scan
        n_inst = docs.select(
            F.sum(F.size(F.split("text", r"\s+")))
        ).first()[0]

        t0 = time.monotonic()
        m = bpe_train(docs, n_merges=k, mode="vocab_local")
        n_m = m.count()
        t_train = time.monotonic() - t0

        t0 = time.monotonic()
        m2 = bpe_train(
            docs, n_merges=k, mode="vocab_local", vocab_min_count=2
        )
        n_m2 = m2.count()
        t_train_floor = time.monotonic() - t0

        t0 = time.monotonic()
        a = bpe_token_counts(
            docs,
            n_merges=k,
            train_mode="vocab_local",
            apply_mode="rank_merge",
        )
        n_docs_out = a.count()
        t_apply_rank = time.monotonic() - t0

        if name == "s1":
            t0 = time.monotonic()
            b = bpe_token_counts(
                docs,
                n_merges=k,
                chunk_size=256,
                train_mode="vocab_local",
            )
            assert b.count() == n_docs_out
            t_apply_replace = time.monotonic() - t0
        else:
            t_apply_replace = float("nan")

        vocab_n = (
            docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
            .groupBy("w")
            .count()
        )
        n_vocab = vocab_n.count()
        n_vocab_floor = vocab_n.filter(F.col("count") >= 2).count()
        rows.append(
            (
                name,
                n_inst,
                n_vocab,
                n_vocab_floor,
                n_m,
                t_train,
                n_m2,
                t_train_floor,
                t_apply_rank,
                t_apply_replace,
            )
        )
        print(
            f"[{name}] instances={n_inst} vocab={n_vocab} "
            f"vocab_floor2={n_vocab_floor} merges={n_m} "
            f"train={t_train:.2f}s train_floor2={t_train_floor:.2f}s "
            f"(merges {n_m2}) apply_rank_merge={t_apply_rank:.2f}s "
            f"apply_replace_c256={t_apply_replace:.2f}s",
            flush=True,
        )

    print("\n| scale | word instances | vocab | vocab(floor 2) | "
          "train k=%d | train floor2 | apply rank_merge | "
          "apply replace c256 |" % k)
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r[0]} | {r[1]:,} | {r[2]:,} | {r[3]:,} | {r[5]:.2f} s "
            f"({r[4]} merges) | {r[7]:.2f} s ({r[6]}) | {r[8]:.2f} s | "
            f"{r[9]:.2f} s |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
