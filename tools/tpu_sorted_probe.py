"""Primitive probe for the sorted-draw (order-statistics) moment design.

The e0grid hot stage costs O(N * F) one-hot compares + an M=4-row MXU dot
per sample chunk (models/forward.py:_e0grid_weight_grid).  Sorted draws via
exponential gaps make binning O(N) prefix sums + O(F) boundary searches:

  gaps ~ Exp(1), S = cumsum(gaps), u_i = S_i / S_{N+1}   (sorted U(0,1))
  z = ndtri(u * cdf_max); e0 = beamE - eLoss - scale * exp(s z)  (sorted)
  cell boundaries = searchsorted(u, u_edges)  (u_edges closed-form via ndtr)
  per-cell moments = diffs of channel prefix sums at the boundaries

Timing rules (learned round 2): chain iterations inside one lax.scan with
a data dependence, nonlinear reduction, traced params, AND force the result
to host with float(...) per call — block_until_ready on a scalar does not
reliably serialize on the axon tunnel backend.

Usage: python tools/tpu_sorted_probe.py [--walkers W] [--fine F] [--n N]
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


def arg(name, default):
    return int(sys.argv[sys.argv.index(name) + 1]) \
        if name in sys.argv else default


W = arg("--walkers", 32)
N = arg("--n", 200_000)
F = arg("--fine", 256)
CHAIN = 16

key = jax.random.PRNGKey(0)
theta = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)

from mcmctoffitting_tpu.models import simult
from mcmctoffitting_tpu.models.forward import (_e0grid_weight_grid,
                                               sample_beam_energies)

spec = simult.default_spec(n_samples=N, xs_mode="e0grid")
tab = spec.e0_grid_table


def chained(make_fn, chain=CHAIN):
    def run(k, p):
        def body(carry, i):
            out = make_fn(jax.random.fold_in(k, i), p + carry * 1e-20)
            return jnp.sum(out * out) ** 0.5 * 1e-20, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(chain))
        return c
    return jax.jit(run).lower(key, theta).compile()


def steady(name, make_fn, iters=3):
    fn = chained(make_fn)
    float(fn(key, theta))          # warm-up, forced to host
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(jax.random.fold_in(key, i), theta))
    dt = (time.perf_counter() - t0) / (iters * CHAIN) * 1000
    print(f"{name} x{W}: {dt:.3f} ms/iter", flush=True)
    return dt


def vb(per_key):
    return lambda k, p: jax.vmap(lambda kk: per_key(kk, p))(
        jax.random.split(k, W))


def sorted_u(k):
    gaps = -jnp.log1p(-jax.random.uniform(k, (N + 1,), dtype=jnp.float32))
    s = jnp.cumsum(gaps)
    return jnp.minimum(s[:-1] / s[-1], 1.0 - 2.0 ** -24)


def sorted_e0(k, p):
    beam_e, e_loss, scale, s = p[0], p[1], p[2], p[3]
    u = sorted_u(k)
    z_max = jnp.log((beam_e - e_loss) / scale) / s
    cdf_max = jax.scipy.special.ndtr(z_max)
    z = jax.scipy.special.ndtri(u * cdf_max)
    return beam_e - (e_loss + scale * jnp.exp(s * z))


def channels(e0):
    t = (e0 - tab.t_ref) / tab.t_scale
    t2 = t * t
    return jnp.stack([jnp.ones_like(t), t, t2, t2 * t])


def sorted_moments(k, p):
    beam_e, e_loss, scale, s = p[0], p[1], p[2], p[3]
    u = sorted_u(k)
    z_max = jnp.log((beam_e - e_loss) / scale) / s
    cdf_max = jax.scipy.special.ndtr(z_max)
    z = jax.scipy.special.ndtri(u * cdf_max)
    e0 = beam_e - (e_loss + scale * jnp.exp(s * z))
    pref = jnp.cumsum(channels(e0), axis=-1)
    pref = jnp.concatenate([jnp.zeros((4, 1), pref.dtype), pref], axis=1)
    edges = jnp.asarray(
        tab.e0_lo + (tab.e0_hi - tab.e0_lo) / F * np.arange(F + 1),
        jnp.float32)
    w = (beam_e - e_loss - edges) / scale
    u_edges = jnp.where(
        w > 0,
        jax.scipy.special.ndtr(jnp.log(jnp.maximum(w, 1e-30)) / s)
        / cdf_max, 0.0)
    u_edges = jnp.minimum(u_edges, 1.0)
    # u ascending = e0 descending; cell f (e0 in [edge_f, edge_f+1)) is
    # u in (u_edges[f+1], u_edges[f]]
    q = jnp.searchsorted(u, u_edges)
    at = pref[:, q]
    return at[:, :-1] - at[:, 1:]


steady("A. iid draw", vb(lambda k, p: sample_beam_energies(k, spec, p)))
steady("B. draw + one-hot moments (current)", vb(
    lambda k, p: _e0grid_weight_grid(spec, sample_beam_energies(k, spec, p))))
steady("C. sorted-u", vb(lambda k, p: sorted_u(k)))
steady("D. sorted e0", vb(sorted_e0))
steady("E. D + channel cumsum", vb(lambda k, p: jnp.cumsum(
    channels(sorted_e0(k, p)), axis=-1)))
steady("H. full sorted moments", vb(sorted_moments))
steady("I. H + A contract", vb(lambda k, p: jnp.dot(
    sorted_moments(k, p).reshape(-1), jnp.asarray(tab.a_matrix),
    preferred_element_type=jnp.float32)))
