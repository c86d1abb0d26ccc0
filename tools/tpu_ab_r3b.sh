#!/bin/bash
# Same-session A/B battery for the round-3 continuation knobs.
# Run AFTER tools/tpu_refresh_r3.sh (shares its compile cache); every row
# is a bench.py invocation so the comparison is end-to-end walker-steps/s
# at the flagship config.  Logs to out/tpu_ab_r3b/.
set -u
cd "$(dirname "$0")/.."
LOG=out/tpu_ab_r3b
mkdir -p "$LOG"

run() { # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  tail -2 "$LOG/$name.log"
  echo "=== $name rc=$rc ==="
}

# base: counts-only headline, same session as the A/B rows below
run base           2400 env BENCH_SAMPLING=counts python bench.py
# radix-factorized TOF one-hot (L=8 and 16; n_pad=70 -> Q=9 / 5)
run tof_radix8     1800 env BENCH_SAMPLING=counts BENCH_TOF_RADIX=8 python bench.py
run tof_radix16    1800 env BENCH_SAMPLING=counts BENCH_TOF_RADIX=16 python bench.py
# run-axis re-measure post-PTRS + halved grids (round-2 verdict: sequential)
run run_batched    1800 env BENCH_SAMPLING=counts BENCH_RUN_AXIS=batched python bench.py
# best-of combinations (cell closure won +19% same-session in the r3
# battery at F=512; combine with the winners above)
run cell_radix8    1800 env BENCH_SAMPLING=counts BENCH_CLOSURE=cell BENCH_TOF_RADIX=8 python bench.py
run cell_batched   1800 env BENCH_SAMPLING=counts BENCH_CLOSURE=cell BENCH_RUN_AXIS=batched python bench.py
# oneBD: radix on the 25-bin windows (Q*L = 32 at L=8)
run onebd_radix8   1800 python tools/tpu_onebd_bench.py --sampling counts --tof-radix 8
run onebd_batched  1800 python tools/tpu_onebd_bench.py --sampling counts --run-axis batched
echo "A/B battery complete; logs in $LOG/"
