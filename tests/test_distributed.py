"""Multi-host (DCN-shaped) execution path without hardware.

2 processes x 4 virtual CPU devices each, wired by
``jax.distributed.initialize`` into one 8-device global mesh
(parallel/distributed.py), replacing the reference's MPI pool pathway
(``tests/mpiTOFmodel.py:187-201``; local-cluster testing convention
``:15-18`` — ``mpirun -np 2`` on one box).
"""
import sys

sys.path.insert(0, "/root/repo")


def test_dryrun_multihost_2x4():
    from __graft_entry__ import dryrun_multihost
    dryrun_multihost(n_processes=2, devices_per_process=4)


def test_distributed_env_helpers(monkeypatch):
    """Env-var plumbing for bare-metal bring-up (no jax side effects)."""
    from mcmctoffitting_tpu.parallel import distributed

    monkeypatch.setenv("MCMCTOF_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("MCMCTOF_NUM_PROCESSES", "2")
    monkeypatch.setenv("MCMCTOF_PROCESS_ID", "1")
    # initialize() must read these; intercept the jax call itself
    seen = {}

    import jax

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        seen.update(addr=coordinator_address, n=num_processes,
                    pid=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    distributed.initialize()
    assert seen == {"addr": "10.0.0.1:1234", "n": 2, "pid": 1}
