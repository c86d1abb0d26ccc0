"""Poisson-sampler A/B at the counts-mode production shape (r4 ceiling).

The hoist-corrected stage split (tools/tpu_chain_probe3.py) puts
poisson_ptrs at 0.92 of the 1.4 ms per-run eval — the counts path is
POISSON-bound.  This tool times the candidates at the production shape
(W, F+2):

  ptrs/threefry — the production sampler under the default PRNG
  ptrs/rbg      — same sampler, TPU hardware RNG for the uniforms
                  (isolates how much of the cost is threefry bit-gen)
  pallas        — ops/pallas_poisson.poisson_pallas (hardware PRNG +
                  shifted-Stirling gammaln, single fused kernel), when
                  importable

Usage: python tools/tpu_poisson_ab.py [--walkers W] [--chain N]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mcmctoffitting_tpu.ops.poisson import poisson_ptrs


def _arg(name, default, cast=int):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


W = _arg("--walkers", 1024)
C = 514
CHAIN = _arg("--chain", 256)
key = jax.random.PRNGKey(0)
# production-like lam profile: a lognormal bump over ~200 cells + empty
# tails (roughly half the cells are ~0 -> the small-lam path), total 200k
cells = np.arange(C, dtype=np.float32)
lam_np = 6000.0 * np.exp(-0.5 * ((cells - 250.0) / 60.0) ** 2)
lam_np = np.tile(lam_np[None, :], (W, 1))
print(f"W={W} C={C} CHAIN={CHAIN}; lam: {lam_np.sum(1)[0]:.0f} total, "
      f"{(lam_np[0] < 10).mean():.0%} cells on the small-lam path",
      flush=True)


def steady(name, fn, *args, iters=2):
    def run(k, lam):
        def body(carry, i):
            out = fn(jax.random.fold_in(k, i), lam + carry * 1e-20)
            return jnp.sum(out) * 1e-20, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(CHAIN))
        return c
    comp = jax.jit(run).lower(*args).compile()
    float(comp(*args))
    t0 = time.perf_counter()
    for i in range(iters):
        float(comp(*args))
    dt = (time.perf_counter() - t0) / (iters * CHAIN) * 1000
    print(f"{name}: {dt:.3f} ms/iter", flush=True)
    return dt


lam = jnp.asarray(lam_np)
t_tf = steady("ptrs/threefry", poisson_ptrs, key, lam)

key_rbg = jax.random.key(0, impl="rbg")
t_rbg = steady("ptrs/rbg     ", poisson_ptrs, key_rbg, lam)

try:
    from mcmctoffitting_tpu.ops.pallas_poisson import poisson_pallas

    def pk(k, lam):
        seed = jax.random.key_data(k).astype(jnp.uint32).reshape(-1)[:2]
        return poisson_pallas(seed, lam)

    t_pl = steady("pallas       ", pk, key, lam)
    # moment check vs the XLA path (same distribution, different stream)
    a = jnp.stack([poisson_pallas(
        jnp.asarray([i, 17 + i], jnp.uint32), lam) for i in range(8)])
    got_m, got_v = float(a.mean()), float(a.var())
    want_m = float(lam.mean())
    want_v = float(lam.mean())  # Var == mean for Poisson (averaged)
    print(f"pallas moments: mean {got_m:.2f} (want {want_m:.2f}), "
          f"var-of-all {got_v:.2f}", flush=True)
except ImportError as e:
    print(f"pallas kernel not available: {e}", flush=True)
