#!/bin/sh
# Full-suite runner with per-file process isolation.
#
# Why: a single long-lived pytest process accumulates dozens of huge
# interpret-mode XLA CPU compiles; on 2026-08-20 the XLA CPU compiler
# segfaulted ~57 min into a one-process full run
# (test_entropy_enc_parallel.py::test_rechunk_complete_chain_bytes),
# while the same file passes clean in isolation (7/7, 19.5 min).
# Per-file processes localize such crashes to one shard and let the
# rest of the bar finish.  (pytest-xdist/forked are not in this image.)
#
# Usage:  sh scripts/run_suite_sharded.sh [extra pytest args...]
# Exit 0 iff every shard passed.
set -u
cd "$(dirname "$0")/.."
fail=0
t0=$(date +%s)
for f in tests/test_*.py; do
    ts=$(date +%s)
    if python -m pytest "$f" -q "$@" > /tmp/shard.log 2>&1; then
        tail -1 /tmp/shard.log | sed "s#^#[$f $(( $(date +%s) - ts ))s] #"
    else
        rc=$?
        fail=1
        echo "[$f $(( $(date +%s) - ts ))s] FAILED rc=$rc"
        tail -15 /tmp/shard.log | sed 's/^/    /'
    fi
done
echo "total wall: $(( $(date +%s) - t0 )) s; overall: $([ $fail -eq 0 ] && echo PASS || echo FAIL)"
exit $fail
