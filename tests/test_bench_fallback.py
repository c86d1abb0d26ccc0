"""bench.py wedged-tunnel fallback: config-gated cache replay.

When the device backend is unreachable, bench.py replays the cached
bench_last.json — but that cache is only ever written for the
default-knob headline configuration, so a sweep invocation (e.g.
BENCH_WALKERS=1024) must NOT replay it as its own result; it emits the
explicit null-error line instead.  Exercised in a subprocess with an
invalid JAX_PLATFORMS so the backend probe genuinely fails.
"""
import json
import os
import pathlib
import subprocess
import sys

REPO = str(pathlib.Path(__file__).resolve().parent.parent)


def _run_bench(extra_env):
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("PALLAS_AXON")}
    env.update({"JAX_PLATFORMS": "no_such_platform",
                "BENCH_PROBE_TIMEOUT": "30"})
    env.update(extra_env)
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, capture_output=True, text=True,
                       timeout=240, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_sweep_invocation_never_replays_default_cache():
    out = _run_bench({"BENCH_WALKERS": "1024"})
    assert out["value"] is None
    assert "unreachable" in out["error"]
    assert "stale" not in out


def test_default_invocation_replays_cache_marked_stale():
    if not os.path.exists(os.path.join(REPO, "bench_last.json")):
        import pytest
        pytest.skip("no cached bench result in this checkout")
    out = _run_bench({})
    assert out.get("stale") is True
    assert out["value"] is not None
