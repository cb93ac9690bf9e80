#!/bin/sh
# Round-close "freeze, then prove" sequence (CLAUDE.md protocol):
# after the LAST change to bench.py / kernels on the bench path /
# __graft_entry__.py, run this and record the walls in BASELINE.md.
# It re-warms the remote compile service's HLO cache so the driver's
# own bench + dryrun runs hit warm compiles.
#
# Usage:  sh scripts/round_close.sh        (~25 min total, quiet host)
set -e
cd "$(dirname "$0")/.."
echo "== bench.py (budget mode) =="
t0=$(date +%s)
# explicit exit-status check: under plain sh a `python | tail` pipeline's
# status is tail's, so set -e would not stop on a bench failure (r4 ADVICE)
python bench.py >/tmp/bench_close.out 2>bench_close.stderr || {
    echo "bench.py FAILED (see bench_close.stderr)"; exit 1; }
tail -1 /tmp/bench_close.out | tee /tmp/bench_close.json
echo "bench wall: $(( $(date +%s) - t0 )) s"
echo "== dryrun_multichip(8) =="
t1=$(date +%s)
python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun OK')"
echo "dryrun wall: $(( $(date +%s) - t1 )) s"
echo "record both walls + the JSON line's numbers in BASELINE.md"
