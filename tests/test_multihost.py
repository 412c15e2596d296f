"""Multi-host (jax.distributed) dp over simulated DCN — SURVEY §2h.

Runs scripts/multihost_dryrun.py as a subprocess: 2 coordinator-connected
processes × 4 virtual CPU devices, one global dp4×tp2 mesh with dp
spanning the process boundary. The script itself asserts transcripts are
identical across processes and to a single-process run; this test asserts
the script succeeds.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_multihost_dryrun():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multihost_dryrun.py")],
        cwd=str(REPO), capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "multihost dryrun OK" in proc.stdout
