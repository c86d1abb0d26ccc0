"""Probe: jax.random.poisson vs a uniforms-only PTRS sampler on TPU.

Counts mode's per-run cost is dominated by Poisson cell draws
(RESULTS_r3.md stage table).  jax.random.poisson is (a) threefry-only —
it blocks the TPU's hardware `rbg` generator outright — and (b) a generic
rejection implementation.  PTRS (Hormann 1993, transformed rejection with
squeeze) is an EXACT sampler for lam >= 10 built from plain uniforms, so
it runs under any PRNG impl; small lam falls back to exact Knuth
multiplication.  This probe times, on the production shape
(128 walkers x F=1024 cells, rates ~ the flagship's occupancies):

    A. jax.random.poisson (threefry)
    B. poisson_ptrs (threefry uniforms)
    C. poisson_ptrs (rbg uniforms)

and cross-checks B/C's first two moments and a chi-square GOF against A.

Run: python tools/tpu_poisson_probe.py  (TPU; CPU ok for correctness)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mcmctoffitting_tpu.ops.poisson import poisson_ptrs  # noqa: E402


def steady(label, fn, *args, iters=30):
    """Chained compiled scan, host-forced (the axon tunnel does not
    serialize on scalar block_until_ready; RESULTS_r3 methodology)."""
    def chained(a):
        def body(c, _):
            out = fn(jax.random.fold_in(a[0], c), *a[1:])
            return c + 1, jnp.sum(out.astype(jnp.float32))
        _, sums = jax.lax.scan(body, 0, None, length=iters)
        return sums
    run = jax.jit(chained).lower(args).compile()
    np.asarray(run(args))  # warm-up
    t0 = time.perf_counter()
    s = np.asarray(run(args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:40s} {dt * 1e3:8.3f} ms/iter")
    return dt, s


def main():
    shape = (128, 1024)
    rng = np.random.default_rng(0)
    # flagship-like occupancy rates: most cells O(100), tails near zero
    lam = np.abs(rng.normal(180.0, 120.0, size=shape)).astype(np.float32)
    lam[:, :32] = rng.uniform(0.0, 5.0, size=(shape[0], 32))  # small-rate tail
    lam_j = jnp.asarray(lam)

    kt = jax.random.key(0, impl="threefry2x32")
    kr = jax.random.key(0, impl="rbg")

    dt_a, _ = steady("A jax.random.poisson (threefry)",
                     lambda k: jax.random.poisson(k, lam_j), kt)
    dt_b, _ = steady("B poisson_ptrs (threefry)",
                     lambda k: poisson_ptrs(k, lam_j), kt)
    dt_c, _ = steady("C poisson_ptrs (rbg)",
                     lambda k: poisson_ptrs(k, lam_j), kr)
    print(f"PTRS speedup vs jax.random.poisson: threefry {dt_a/dt_b:.2f}x, "
          f"rbg {dt_a/dt_c:.2f}x")

    # correctness: moments + chi-square GOF on a fixed moderate rate
    n = 200_000
    lam0 = 37.5
    draws = np.asarray(jax.jit(
        lambda k: poisson_ptrs(k, jnp.full((n,), lam0, jnp.float32)))(kt))
    mean, var = draws.mean(), draws.var()
    z_mean = (mean - lam0) / np.sqrt(lam0 / n)
    z_var = (var - lam0) / (lam0 * np.sqrt(2.0 / n))
    print(f"moments @ lam={lam0}: mean {mean:.3f} (z={z_mean:+.2f}), "
          f"var {var:.3f} (z={z_var:+.2f})")
    from scipy import stats
    lo, hi = int(lam0 - 5 * np.sqrt(lam0)), int(lam0 + 5 * np.sqrt(lam0))
    edges = np.arange(lo, hi + 1)
    obs = np.bincount(np.clip(draws.astype(int) - lo, 0, hi - lo),
                      minlength=hi - lo + 1)
    probs = stats.poisson.pmf(edges, lam0)
    probs[0] = stats.poisson.cdf(lo, lam0)
    probs[-1] = 1.0 - stats.poisson.cdf(hi - 1, lam0)
    chi2 = np.sum((obs - n * probs) ** 2 / np.maximum(n * probs, 1e-9))
    pval = 1.0 - stats.chi2.cdf(chi2, len(edges) - 1)
    print(f"chi-square GOF @ lam={lam0}: chi2/dof = "
          f"{chi2 / (len(edges) - 1):.2f}, p = {pval:.3f}")

    # small-lambda branch
    draws_s = np.asarray(jax.jit(
        lambda k: poisson_ptrs(k, jnp.full((n,), 1.5, jnp.float32)))(kt))
    print(f"small lam=1.5: mean {draws_s.mean():.4f} var {draws_s.var():.4f}"
          f" p0 {np.mean(draws_s == 0):.4f} (exact {np.exp(-1.5):.4f})")


if __name__ == "__main__":
    main()
