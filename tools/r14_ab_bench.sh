#!/bin/bash
# Alternating same-host A/B: bench subset in HEAD (/root/repo) vs the
# round-start commit 78408f7 (/tmp/repo_pre worktree). Alternation cancels
# slow-drift host contention; each run's JSON line carries per-line spins.
# Usage: tools/r14_ab_bench.sh "<comma-separated lines>" <rounds>
set -u
LINES="$1"
ROUNDS="${2:-3}"
for i in $(seq 1 "$ROUNDS"); do
  for dir in /root/repo /tmp/repo_pre; do
    echo "=== round $i $dir ==="
    (cd "$dir" && SPARK_GRAFT_BENCH_ONLY="$LINES" timeout 1800 python bench.py 2>/dev/null | tail -1)
  done
done
