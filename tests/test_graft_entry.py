"""The driver's multi-chip artifact: dryrun_multichip must pass on a box
with fewer real devices than requested (MULTICHIP_r01.json was red because
round 1 assumed >= n devices existed — VERDICT item 1)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_driver_style():
    """Invoke exactly as the driver does: fresh process, default env (may
    see only one real device), `import __graft_entry__; dryrun_multichip(8)`.
    The entry must self-provision a virtual CPU mesh when short on devices.
    """
    env = dict(os.environ)
    # Undo the conftest's in-process test rig so the child looks like the
    # driver's environment (single real device, no forced CPU platform).
    env.pop("RWKV_DRYRUN_FORCE_CPU", None)
    # No backend probe / skip here on purpose: since round 3 the dryrun
    # must NEVER initialize the real backend (MULTICHIP_r02 hung in axon
    # init during a relay outage), so this test must pass with the TPU
    # relay down — that robustness is part of what it validates.
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip(n=8" in proc.stdout
    assert "sp=8 wkv max err" in proc.stdout


def test_dryrun_impl_in_process():
    """Fast path: the impl itself on the conftest's 8-device virtual mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    ge._dryrun_multichip_impl(8)
