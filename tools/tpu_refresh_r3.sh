#!/bin/bash
# One-shot TPU measurement battery for the round-3 headline refresh
# (post shared-edge ndtr rewrite, RESULTS_r3.md "Counts-mode stage split").
# Run when the axon tunnel is alive; each step is individually bounded and
# logs to out/tpu_refresh_r3/.  Safe to re-run; later steps use cached
# compiles.  NEVER run a second jax process while this is live (the
# tunnel relay is single-client).
set -u
cd "$(dirname "$0")/.."
LOG=out/tpu_refresh_r3
mkdir -p "$LOG"

run() { # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  tail -3 "$LOG/$name.log"
  echo "=== $name rc=$rc ==="
}

# 1. headline bench (counts + faithful mc; refreshes bench_last.json)
run bench 2400 python bench.py
# 1b. moment-closure A/B (2-row ndtr chain; see ops/e0grid.expected_moments)
run bench_closure_cell 1800 env BENCH_SAMPLING=counts BENCH_CLOSURE=cell python bench.py
# 1c. deterministic expected-forward refresh (+closure A/B)
run bench_expected 1800 env BENCH_SAMPLING=expected python bench.py
run bench_expected_cell 1800 env BENCH_SAMPLING=expected BENCH_CLOSURE=cell python bench.py
# 1d. DE-mixed move A/B (per-step cost of the 1.6x-ESS proposal)
run bench_move_mixed 1800 env BENCH_MOVE=mixed python bench.py
# 2. counts-mode stage split, simult + oneBD
run stages_simult 1800 python tools/tpu_counts_stages.py
run stages_onebd 1800 python tools/tpu_counts_stages.py --onebd
# 3. oneBD bench: default + hardcore (+closure A/B on the default)
run onebd 1800 python tools/tpu_onebd_bench.py --sampling counts
run onebd_hardcore 1800 python tools/tpu_onebd_bench.py --sampling counts --hardcore
run onebd_closure 1800 python tools/tpu_onebd_bench.py --sampling counts --closure cell
# 4. ensemble-size scaling sweep
for w in 512 1024 2048; do
  run "walkers_$w" 1800 env BENCH_WALKERS=$w python bench.py
done
echo "battery complete; logs in $LOG/"
