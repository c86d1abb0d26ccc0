"""Chain IO: emcee-text-format round trip, native codec, checkpoints."""
import numpy as np
import pytest

from mcmctoffitting_tpu.utils import chain_io


def test_text_roundtrip_python_writer(tmp_path):
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(5, 8, 9))
    lp = rng.normal(size=(5, 8))
    path = tmp_path / "chain.dat"
    chain_io.append_chain_text(str(path), pos, lp, mode="w")
    chain, probs, n_params, n_walkers, n_steps = chain_io.read_chain_text(
        str(path))
    assert (n_steps, n_walkers, n_params) == (5, 8, 9)
    np.testing.assert_allclose(chain, pos, rtol=1e-6)
    np.testing.assert_allclose(probs, lp, rtol=1e-6)


def test_text_append_mode(tmp_path):
    path = tmp_path / "chain.dat"
    pos = np.ones((2, 3, 2))
    lp = np.zeros((2, 3))
    chain_io.append_chain_text(str(path), pos, lp, mode="w")
    chain_io.append_chain_text(str(path), pos[0] * 2, lp[0] + 1)
    chain, probs, n_params, n_walkers, n_steps = chain_io.read_chain_text(
        str(path))
    assert (n_steps, n_walkers) == (3, 3)
    np.testing.assert_allclose(chain[2], 2.0)
    np.testing.assert_allclose(probs[2], 1.0)


def test_numpy_repr_wrapped_lines_parse(tmp_path):
    """numpy reprs of wide theta wrap across lines; the reader must stitch
    them (the reference's paramWrap logic, utilities/utilities.py:452-473)."""
    path = tmp_path / "chain.dat"
    theta = np.arange(20, dtype=np.float64) * 1.234567
    with open(path, "w") as f:
        for k in range(2):
            f.write("{0} {1} {2}\n".format(k, theta, -12.5))
    chain, probs, n_params, n_walkers, n_steps = chain_io.read_chain_text(
        str(path))
    assert (n_steps, n_walkers, n_params) == (1, 2, 20)
    np.testing.assert_allclose(chain[0, 0], theta, rtol=1e-6)


def test_native_codec_matches_python():
    pytest.importorskip("ctypes")
    from mcmctoffitting_tpu.utils.native import (format_chain_text_native,
                                                 parse_chain_text_native)
    rng = np.random.default_rng(3)
    pos = rng.normal(size=(4, 6, 5))
    lp = rng.normal(size=(4, 6))
    text = format_chain_text_native(pos, lp)
    rows_n, probs_n, wk_n = parse_chain_text_native(text)
    rows_p, probs_p, wk_p = chain_io._parse_chain_text_py(text)
    np.testing.assert_allclose(rows_n, rows_p)
    np.testing.assert_allclose(probs_n, probs_p)
    np.testing.assert_array_equal(wk_n, wk_p)


def test_empty_chain_file_raises(tmp_path):
    """Empty/truncated chain files must fail with a clear error, not a
    ZeroDivisionError (advisor finding, round 1)."""
    path = tmp_path / "empty.dat"
    path.write_text("")
    with pytest.raises(ValueError, match="empty or unparseable"):
        chain_io.read_chain_text(str(path))
    path.write_text("\n  \n")
    with pytest.raises(ValueError, match="empty or unparseable"):
        chain_io.read_chain_text(str(path))


def test_append_uses_native_formatter(tmp_path):
    """append_chain_text routes through the C++ formatter when available
    and stays parseable either way."""
    from mcmctoffitting_tpu.utils import native
    rng = np.random.default_rng(4)
    pos = rng.normal(size=(3, 4, 7))
    lp = rng.normal(size=(3, 4))
    path = tmp_path / "chain.dat"
    chain_io.append_chain_text(str(path), pos, lp, mode="w")
    text = path.read_text()
    # the native formatter's fixed-precision style, not numpy's repr
    assert text == native.format_chain_text_native(pos, lp)
    chain, probs, *_ = chain_io.read_chain_text(str(path))
    np.testing.assert_allclose(chain, pos, rtol=1e-6)
    np.testing.assert_allclose(probs, lp, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from mcmctoffitting_tpu.sampler import EnsembleState
    state = EnsembleState(jnp.ones((4, 3)), jnp.zeros(4),
                          jax.random.PRNGKey(7), jnp.asarray(42))
    path = str(tmp_path / "ckpt.npz")
    chain_io.save_checkpoint(path, state, extra={"n_runs": 4})
    loaded, extra = chain_io.load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(loaded.positions), 1.0)
    assert int(loaded.step) == 42
    assert extra["n_runs"] == 4
    # resumed key must behave like the original
    a = jax.random.normal(state.key, (3,))
    b = jax.random.normal(loaded.key, (3,))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
