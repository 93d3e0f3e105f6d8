#!/usr/bin/env bash
# Sharded test runner: N concurrent pytest processes, each with its
# own Spark JVM (pytest-xdist is not in the container; session-scoped
# Spark fixtures shard cleanly by FILE). Shards are balanced by
# measured wall time, not test count — test_oracle_parity.py alone
# (203 DuckDB parity checks) is shard A.
#
# Usage: tools/run_tests.sh            # all shards, concurrent
#        tools/run_tests.sh A         # one shard, serial
# Exit code: 0 iff every shard passed.
set -u
cd "$(dirname "$0")/.."

declare -A SHARDS
SHARDS[A]="tests/test_oracle_parity.py"
SHARDS[B]="tests/test_streaming.py tests/test_streaming_joins.py tests/test_dedup_ingest.py tests/test_sketches.py tests/test_skew_rmat_stateful.py tests/test_cdc.py tests/test_incremental.py tests/test_mm_text_pairs.py"
SHARDS[C]="tests/test_properties.py tests/test_zorder.py tests/test_expectations.py tests/test_determinism.py"
SHARDS[E]="tests/test_graph_algorithms.py tests/test_pagerank.py"
SHARDS[D]="tests/test_text_dedup.py tests/test_asof_range.py tests/test_mapreduce_ops.py tests/test_plan_audit.py tests/test_ranking.py tests/test_packing_decontam.py tests/test_jsonl_source.py tests/test_schema_evolution.py tests/test_sinks_bucketed.py tests/test_partitioned.py tests/test_approx_aggregates.py tests/test_fixture_schemas.py tests/test_bucketing.py"

if [ $# -ge 1 ]; then
  # shellcheck disable=SC2086
  exec python -m pytest ${SHARDS[$1]} -q
fi

mkdir -p .testlogs
pids=()
names=()
t0=$(date +%s)
for s in A B C D E; do
  # shellcheck disable=SC2086
  python -m pytest ${SHARDS[$s]} -q >".testlogs/shard_$s.log" 2>&1 &
  pids+=($!)
  names+=("$s")
done
rc=0
for i in "${!pids[@]}"; do
  if ! wait "${pids[$i]}"; then rc=1; fi
  t=$(( $(date +%s) - t0 ))
  echo "shard ${names[$i]} done at ${t}s: $(tail -1 ".testlogs/shard_${names[$i]}.log")"
done
echo "total wall: $(( $(date +%s) - t0 ))s"
exit $rc
