"""Driver-contract tests for __graft_entry__.

Round-1 postmortem (VERDICT.md "weak" #2): every in-repo test inherits
conftest's 8 virtual CPU devices, so a hard device-count assertion in
``dryrun_multichip`` could never fire under pytest — and the driver gate
(MULTICHIP_r01.json) shipped red. These tests run the entry points in a
CLEAN subprocess (no conftest, environment scrubbed of jax overrides),
exactly like the driver does on the 1-chip bench box.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env() -> dict:
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    # Speed up reruns without changing semantics (driver won't have these).
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/hocon_jax_cache_entry"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    # XLA AOT artifacts embed host CPU features -> SIGILL after sandbox
    # host migration; cache only the JAX-level artifacts (see conftest).
    env["JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES"] = "none"
    return env


def _run(code: str, timeout: int = 900) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_dryrun_multichip_in_clean_subprocess():
    """The driver gate: dryrun_multichip(8) on a host with NO jax env set
    (1 visible device before self-provisioning) must succeed."""
    proc = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "warp train step OK" in proc.stdout


@pytest.mark.slow
def test_entry_compiles_in_clean_subprocess():
    """The driver compile-checks entry() single-chip."""
    proc = _run(
        "import os; os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "import __graft_entry__\n"
        "fn, args = __graft_entry__.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "jax.block_until_ready(out)\n"
        "print('entry OK', [o.shape for o in out])\n"
    )
    assert proc.returncode == 0, (
        f"entry() compile failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "entry OK" in proc.stdout
