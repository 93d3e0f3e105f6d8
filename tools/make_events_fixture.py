"""10x events fixture for fold-engine decade rows (round 12): the
.scale fixtures covered documents/embeddings only, so the per-key
sequential folds (EWMA / Holt / Holt-Winters / CUSUM) had no decade
measurement. Deterministic replication, the make_scale_fixture
discipline: copy k offsets user_id by k * 10_000_000 and event_id by
k * 100_000_000, keeping ts/value/event_type — KEY COUNT grows 10x
with per-key series identical, which is the honest testbed for a
fold engine (per-batch Arrow kernels over more keys; per-key state
constant; the single shuffle on _k grows with data).

Usage: python tools/make_events_fixture.py [out_dir] [copies]
Default: <repo>/.scale/events10 (gitignored), copies=10.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scale", "events10"
    )
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    eid = t.column("event_id").to_numpy()
    uid = t.column("user_id").to_numpy()
    parts = []
    for k in range(copies):
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(eid + k * 100_000_000),
                    "ts": t.column("ts"),
                    "user_id": pa.array(uid + k * 10_000_000),
                    "event_type": t.column("event_type"),
                    "value": t.column("value"),
                    "props": t.column("props"),
                }
            )
        )
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(out_dir, "events.parquet"))
    print(f"wrote {out.num_rows} rows to {out_dir}/events.parquet")


if __name__ == "__main__":
    main()
