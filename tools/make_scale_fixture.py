"""Generate a 10x-scale fixture for the SCALE.md decade measurement.

Derives sf1-scale `documents` / `embeddings` tables from the driver's
sf0.1 fixture by deterministic replication — NO randomness, so two
runs produce byte-identical fixtures and the measured scaling is
reproducible:

- documents: 10 copies; copy k rewrites every token `t -> t + 'x<k>'`
  and offsets doc_id by k * 10_000_000. Token-disjoint copies mean
  the shingle/near-dup structure of sf0.1 repeats 10x SIDE BY SIDE
  (10x buckets, constant per-bucket size, 10x true pairs) instead of
  collapsing into cross-copy near-dup cliques — the honest testbed
  for a LINEAR-scaling claim: a bucketed pair generator should track
  the 10x, an accidental all-pairs would blow up 100x.
- embeddings: 10 copies; copy k offsets vec_id the same way and
  TRANSLATES every vector by k * a fixed unit offset vector (a
  deterministic function of the component index). Translation
  preserves intra-copy distances exactly and displaces copies into
  disjoint regions, so with a codebook scaled 10x (the SemDeDup
  paper's N/k-constant regime) cluster sizes stay constant.

Usage:  python tools/make_scale_fixture.py [out_dir] [copies]
Default out_dir: <repo>/.scale/sf1  (gitignored — ~25 MB); copies=10.
A second decade (copies=100 → ~250 MB) extends the measurement to
two orders of magnitude for the flagship dedup path.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10
ID_STRIDE = 10_000_000


def _doc_copies(src_dir: str, copies: int) -> pa.Table:
    t = pq.read_table(f"{src_dir}/documents.parquet")
    doc_id = t.column("doc_id").to_numpy()
    text = t.column("text").to_pylist()
    lang = t.column("lang")
    source = t.column("source")
    parts = []
    for k in range(copies):
        if k == 0:
            txt = text
        else:
            suf = f"x{k}"
            txt = [" ".join(w + suf for w in s.split()) for s in text]
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(doc_id + k * ID_STRIDE),
                    "text": pa.array(txt, pa.string()),
                    "lang": lang,
                    "source": source,
                    "n_chars": pa.array(
                        np.fromiter((len(s) for s in txt), np.int64)
                    ),
                }
            )
        )
    return pa.concat_tables(parts)


def _emb_copies(src_dir: str, copies: int) -> pa.Table:
    t = pq.read_table(f"{src_dir}/embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    label = t.column("label")
    dim = emb.shape[1]
    # fixed unit offset: a deterministic per-component direction
    idx = np.arange(dim, dtype=np.float64)
    off = (idx * 2654435761 % 97) / 97.0 - 0.5
    off = (off / np.linalg.norm(off) * 4.0).astype(np.float32)
    parts = []
    for k in range(copies):
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_id + k * ID_STRIDE),
                    "embedding": pa.array(
                        list(emb + np.float32(k) * off),
                        pa.list_(pa.float32()),
                    ),
                    "label": label,
                }
            )
        )
    return pa.concat_tables(parts)


def _event_copies(src_dir: str, copies: int) -> pa.Table:
    """events × copies with USER-DISJOINT replication: copy k offsets
    user_id (and event_id) by k·ID_STRIDE and leaves ts/value/type
    untouched — k× more keys at CONSTANT per-key span and density,
    the honest scaling shape for the per-key window family (asof,
    resample/interpolate, sessionize, streaks): per-key work must
    stay flat while total work tracks k. An accidental global sort or
    key-crossing join shows up super-linearly."""
    t = pq.read_table(f"{src_dir}/events.parquet")
    event_id = t.column("event_id").to_numpy()
    user_id = t.column("user_id").to_numpy()
    parts = []
    for k in range(copies):
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(event_id + k * ID_STRIDE),
                    "ts": t.column("ts"),
                    "user_id": pa.array(user_id + k * ID_STRIDE),
                    "event_type": t.column("event_type"),
                    "value": t.column("value"),
                    "props": t.column("props"),
                }
            )
        )
    return pa.concat_tables(parts)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, ".scale", "sf1")
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
    os.makedirs(out, exist_ok=True)
    docs = _doc_copies(SRC, copies)
    pq.write_table(docs, f"{out}/documents.parquet")
    embs = _emb_copies(SRC, copies)
    pq.write_table(embs, f"{out}/embeddings.parquet")
    evs = _event_copies(SRC, copies)
    pq.write_table(evs, f"{out}/events.parquet")
    print(
        f"wrote {docs.num_rows} documents, {embs.num_rows} embeddings, "
        f"{evs.num_rows} events -> {out}"
    )


if __name__ == "__main__":
    main()
