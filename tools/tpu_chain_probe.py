"""What bounds the counts-mode ndtr moment chain on TPU? (r4 ceiling work)

The r4 stage split at W=1024 puts expected_moments at 2.17 ms/run-eval —
barely above its 128-walker time (1.77 ms), i.e. 8x the walkers for +23%
time.  That rules out compute-throughput as the binding constraint at
saturation and leaves (a) kernel-launch/latency overheads across the many
small elementwise stages, or (b) layout waste on the (W, rows, F+1)
intermediates (rows=2 sublane dim is 4x-padded on f32 tiles).  This probe
pins it:

  ndtr-only     — pure jax.scipy.special.ndtr on the production-shaped
                  tensor (isolates the transcendental cost)
  ndtr-flat     — same element count as one (W, 2F) tile (layout control)
  elementwise   — one multiply on the same tensor (HBM/launch floor)
  chain WxK     — expected_moments at W in {256, 1024, 4096} (scaling:
                  flat = overhead-bound, linear = compute-bound)

Timing per tools/tpu_counts_stages.py rules: CHAIN dependent iterations
inside one lax.scan, fetch a scalar.
Usage: python tools/tpu_chain_probe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtr

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mcmctoffitting_tpu.models import simult
from mcmctoffitting_tpu.ops.e0grid import expected_moments

CHAIN = 16
spec = simult.default_spec(n_samples=200_000, sampling="counts")
tab = spec.e0_grid_table
F = spec.e0_grid_fine
key = jax.random.PRNGKey(0)
theta = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)
print(f"simult counts: F={F}", flush=True)


def chained_tensor(fn, shape):
    """CHAIN dependent iterations of fn over a (shape) tensor."""
    def run(x):
        def body(c, _):
            out = fn(x + c * 1e-20)
            return jnp.sum(out) * 1e-20, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(CHAIN))
        return c
    x0 = jax.random.normal(key, shape, jnp.float32)
    return jax.jit(run).lower(x0).compile(), x0


def chained_theta(fn, w):
    def run(p):
        def body(c, i):
            out = jax.vmap(lambda pp: fn(pp + c * 1e-20))(
                jnp.broadcast_to(p, (w, 4)) + 1e-6 * i)
            return jnp.sum(out) * 1e-20, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(CHAIN))
        return c
    return jax.jit(run).lower(theta).compile()


def steady(name, compiled, x, iters=3):
    float(compiled(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(compiled(x))
    dt = (time.perf_counter() - t0) / (iters * CHAIN) * 1000
    print(f"{name}: {dt:.3f} ms/iter", flush=True)
    return dt


W = 1024
# 1. pure ndtr at the production intermediate shape
c, x = chained_tensor(ndtr, (W, 2, F + 1))
t_ndtr = steady(f"ndtr (W={W}, 2, F+1)     ", c, x)
# 2. layout control: same element count, flat lane-friendly shape
c, x = chained_tensor(ndtr, (W, 2 * (F + 1)))
t_flat = steady(f"ndtr (W={W}, 2(F+1)) flat", c, x)
# 3. HBM/launch floor: one multiply on the same tensor
c, x = chained_tensor(lambda v: v * 1.0001, (W, 2, F + 1))
t_mul = steady(f"mul  (W={W}, 2, F+1)     ", c, x)

# 4. the full chain at three widths
truncated = spec.n_redraw_rounds != 0
for w in (256, 1024, 4096):
    comp = chained_theta(
        lambda p: jnp.sum(expected_moments(
            tab, p[0], p[1], p[2], p[3], float(spec.n_samples),
            truncated)[0]), w)
    steady(f"expected_moments W={w:5d}  ", comp, theta)

print("\ninterpretation: chain time flat in W -> overhead-bound (fusion "
      "wins); ndtr-only ~= chain time -> transcendental-bound (XLA erf is "
      "the floor); mul ~= ndtr -> HBM-bound", flush=True)
