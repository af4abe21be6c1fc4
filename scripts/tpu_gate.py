"""One-command on-chip verification gate (VERDICT r2 #1).

Runs the ``tpu``-marked pytest lane on the real TPU backend:

    python scripts/tpu_gate.py            # full gate
    python scripts/tpu_gate.py -k sddmm   # subset

Sets ``TGP_TPU_GATE=1`` so tests/conftest.py skips the cpu-platform pin,
then execs pytest ``-m tpu``.  Exit code is pytest's.  Each kernel test is
a fresh Mosaic compile through the tunnel (~20-40 s apiece) — expect the
full gate to take a few minutes.  Record the pass/fail + wall time in
RESULTS.md each round.
"""

import os
import subprocess
import sys
import time


def main() -> int:
    env = dict(os.environ, TGP_TPU_GATE="1")
    cmd = [sys.executable, "-m", "pytest", "tests/tpu", "-m", "tpu", "-v",
           "--no-header", *sys.argv[1:]]
    t0 = time.time()
    rc = subprocess.call(cmd, env=env,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    print(f"[tpu_gate] rc={rc} wall={time.time() - t0:.0f}s")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
