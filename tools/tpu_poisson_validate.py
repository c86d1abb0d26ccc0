"""On-chip distribution validation of the fused Pallas Poisson kernel.

The kernel (ops/pallas_poisson.py) claims EXACT Poisson sampling — the
same contract as the XLA PTRS path it replaces on TPU.  This tool pins
that on real hardware across both algorithm branches:

1. moment z-scores: per-lam empirical mean/variance over N draws vs the
   Poisson mean=var=lam (flags bias in either branch);
2. pmf chi-square on the small-lam (CDF-inversion) branch vs scipy's
   exact pmf;
3. tail sanity on the PTRS branch (empirical P(X > lam + 6 sqrt(lam))
   consistent with the normal-tail scale);
4. independence across grid tiles: adjacent tiles at identical lam must
   be uncorrelated (the per-tile seed mixing).

Writes artifacts/pallas_poisson_validation.json.
Usage: python tools/tpu_poisson_validate.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mcmctoffitting_tpu.ops.pallas_poisson import poisson_pallas

assert jax.default_backend() == "tpu", "run on the TPU"

LAMS = [0.0, 0.1, 0.5, 1.0, 3.0, 8.0, 9.9,          # inversion branch
        10.1, 12.0, 30.0, 100.0, 1000.0, 1.0e4, 1.0e5]  # PTRS branch
ROWS, COLS = 512, 512                     # draws per (lam, call)
N_CALLS = 8                               # fresh seeds per lam

report = {"lams": {}, "backend": str(jax.devices()[0])}
fail = False

draw = jax.jit(lambda seed, lam: poisson_pallas(
    seed, jnp.full((ROWS, COLS), lam, jnp.float32)))

t0 = time.time()
for lam in LAMS:
    samples = []
    for c in range(N_CALLS):
        seed = jnp.asarray([c + 1, int(lam * 7 + 13)], jnp.uint32)
        samples.append(np.asarray(draw(seed, lam)))
    x = np.concatenate([s.ravel() for s in samples])   # ~2.1M draws
    n = x.size
    mean, var = x.mean(), x.var()
    # z-scores of the moment estimators under Poisson(lam)
    z_mean = (mean - lam) / np.sqrt(max(lam, 1e-12) / n)
    # Var(sample var) ~ (mu4 - var^2)/n, Poisson mu4 = lam(1+3lam)
    var_var = (lam * (1 + 3 * lam) - lam * lam) / n + 2e-12
    z_var = (var - lam) / np.sqrt(var_var)
    entry = {"n": int(n), "mean": float(mean), "var": float(var),
             "z_mean": float(z_mean), "z_var": float(z_var)}
    if lam == 0.0:
        ok = bool(np.all(x == 0.0))
        entry["all_zero"] = ok
    else:
        ok = abs(z_mean) < 5.0 and abs(z_var) < 5.0
        if lam < 10.0:
            # exact pmf chi-square on the inversion branch
            kmax = int(stats.poisson.ppf(1 - 1e-7, lam)) + 1
            obs = np.bincount(x.astype(np.int64), minlength=kmax + 1)
            pmf = stats.poisson.pmf(np.arange(kmax + 1), lam)
            pmf[-1] += stats.poisson.sf(kmax, lam)
            keep = pmf * n > 5.0
            chi2 = float(np.sum((obs[keep] - n * pmf[keep]) ** 2
                                / (n * pmf[keep])))
            dof = int(keep.sum() - 1)
            pval = float(stats.chi2.sf(chi2, dof))
            entry.update(chi2=chi2, dof=dof, p_value=pval)
            ok = ok and pval > 1e-4
        else:
            tail = float(np.mean(x > lam + 6.0 * np.sqrt(lam)))
            entry["tail_frac_6sigma"] = tail
            ok = ok and tail < 1e-4
    entry["ok"] = bool(ok)
    fail |= not ok
    report["lams"][str(lam)] = entry
    print(f"lam={lam:>9}: mean {mean:.4g} var {var:.4g} "
          f"z=({z_mean:+.2f},{z_var:+.2f}) "
          f"{'OK' if ok else 'FAIL'}", flush=True)

# tile independence: same lam, big array spanning many tiles — adjacent
# tile-row blocks must be uncorrelated
big = np.asarray(draw(jnp.asarray([99, 7], jnp.uint32), 100.0))
a, b = big[:ROWS // 2].ravel(), big[ROWS // 2:].ravel()
r = float(np.corrcoef(a, b)[0, 1])
report["tile_corr"] = r
fail |= abs(r) > 0.01
print(f"adjacent-tile correlation at lam=100: {r:+.4f}", flush=True)
report["elapsed_s"] = round(time.time() - t0, 1)
report["verdict"] = "FAIL" if fail else "PASS"

out = os.path.join("/root/repo", "artifacts",
                   "pallas_poisson_validation.json")
with open(out, "w") as f:
    json.dump(report, f, indent=1)
print(f"{report['verdict']} -> {out}", flush=True)
sys.exit(1 if fail else 0)
