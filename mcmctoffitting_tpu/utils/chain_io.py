"""Chain persistence: emcee-text-format compatibility + native checkpoints.

The reference persists chains as append-only text files, one row per walker
per step: ``"{walkerIdx} {np.array-repr of theta} {lnprob}"``
(``tests/simultFit.py:733-740``), re-parsed by a bracket-aware reader
(``readChainFromFile``, ``utilities/utilities.py:432-500``).  We keep that
format for interoperability (existing ppc tooling / chain plotters can read
our chains and vice versa) and add a native ``.npz`` checkpoint holding
(positions, log_probs, PRNG key, step) for exact resume — which the
reference lacks (SURVEY.md §5: "no driver implements resume-from-chain").

A C++ accelerated codec for the text format lives in ``utils/native`` (the
text files reach GBs for long runs; parsing is the post-processing
bottleneck); this module transparently uses it when built.
"""
from __future__ import annotations

import io
import os
from typing import Optional

import numpy as np


def append_chain_text(path: str, positions: np.ndarray,
                      log_probs: np.ndarray, *, mode: str = "a") -> None:
    """Append one or more steps in the reference's text format.

    positions: (W, D) or (S, W, D); log_probs: (W,) or (S, W).
    Row format matches ``fout.write("{0} {1} {2}\\n".format(k, pos[k],
    prob[k]))`` (``tests/simultFit.py:738-739``) — numpy array repr with
    brackets, possibly line-wrapped by numpy for wide theta.
    """
    pos = np.asarray(positions)
    lp = np.asarray(log_probs)
    if pos.ndim == 2:
        pos, lp = pos[None], lp[None]
    text = None
    try:
        from .native import format_chain_text_native
        text = format_chain_text_native(pos, lp)
    except Exception:
        pass
    if text is None:
        buf = io.StringIO()
        for s in range(pos.shape[0]):
            for k in range(pos.shape[1]):
                buf.write("{0} {1} {2}\n".format(k, pos[s, k], lp[s, k]))
        text = buf.getvalue()
    with open(path, mode) as f:
        f.write(text)


def _parse_chain_text_py(text: str):
    """Pure-Python parser for the emcee text chain format.

    Handles numpy's line-wrapping of wide parameter vectors, like the
    bracket-aware reference reader (``utilities/utilities.py:432-500``).
    """
    rows = []
    probs = []
    walker_ids = []
    lines = iter(text.splitlines())
    for line in lines:
        if not line.strip():
            continue
        lb = line.find("[")
        walker_ids.append(int(float(line[:lb])))
        vals = []
        while True:
            rb = line.find("]")
            seg = line[lb + 1: rb if rb != -1 else len(line)]
            vals.extend(float(v) for v in seg.split())
            if rb != -1:
                probs.append(float(line[rb + 1:]))
                break
            line = next(lines)
            lb = -1
        rows.append(vals)
    return np.asarray(rows), np.asarray(probs), np.asarray(walker_ids)


def read_chain_text(path: str):
    """Read a text chain file.

    Returns (chain (S, W, D), probs (S, W), n_params, n_walkers, n_steps) —
    the same 5-tuple as the reference's ``readChainFromFile``.
    Uses the C++ codec when available (utils/native), else pure Python.
    """
    with open(path) as f:
        text = f.read()
    parsed = None
    try:
        from .native import parse_chain_text_native
        parsed = parse_chain_text_native(text)
    except Exception:
        pass
    if parsed is None:
        parsed = _parse_chain_text_py(text)
    rows, probs, walker_ids = parsed
    if walker_ids.size == 0:
        raise ValueError(f"empty or unparseable chain file: {path}")
    n_walkers = int(walker_ids.max()) + 1
    n_steps = len(walker_ids) // n_walkers
    n_params = rows.shape[1]
    chain = rows[: n_steps * n_walkers].reshape(n_steps, n_walkers, n_params)
    prob = probs[: n_steps * n_walkers].reshape(n_steps, n_walkers)
    return chain, prob, n_params, n_walkers, n_steps


def save_checkpoint(path: str, state, *, extra: Optional[dict] = None):
    """Save an EnsembleState (+ optional metadata) for exact resume."""
    import jax
    payload = {
        "positions": np.asarray(state.positions),
        "log_probs": np.asarray(state.log_probs),
        "key": np.asarray(jax.random.key_data(state.key)
                          if jax.dtypes.issubdtype(state.key.dtype,
                                                   jax.dtypes.prng_key)
                          else state.key),
        "step": np.asarray(state.step),
    }
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    np.savez(tmp, **payload)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_checkpoint(path: str):
    """Load an EnsembleState saved by save_checkpoint."""
    import jax
    import jax.numpy as jnp

    from ..sampler.stretch import EnsembleState
    with np.load(path) as z:
        key = jnp.asarray(z["key"], dtype=jnp.uint32)
        if key.shape == (2,):
            key = jax.random.wrap_key_data(key)
        state = EnsembleState(jnp.asarray(z["positions"]),
                              jnp.asarray(z["log_probs"]), key,
                              jnp.asarray(z["step"]))
        extra = {k[6:]: z[k] for k in z.files if k.startswith("extra_")}
    return state, extra
