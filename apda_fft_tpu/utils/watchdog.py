"""Device-connect watchdog shared by every hardware entry point.

The remote-tunnel PJRT plugin occasionally deadlocks during its initial
connection (futex wait, no TCP to the relay).  A fresh process almost always
connects, so the watchdog forces the first device op under a SIGALRM and
re-execs the current process if it stalls, bounded by an env counter so a
truly dead device cannot re-exec forever.

Used by ``bench.py``, ``benchmarks/run_all.py`` and ``benchmarks/parity_tpu.py``
(one implementation, all hardware callers - a stalled connect at any of them
self-heals the same way).
"""

from __future__ import annotations

import os
import sys

_RESTART_ENV = "APDA_CONNECT_RESTARTS"


def _default_probe() -> None:
    """One tiny device op: forces backend init + a real round trip."""
    import jax
    import jax.numpy as jnp

    float(jnp.sum(jnp.ones((8, 8))))
    print(f"# device ready: {jax.devices()}", file=sys.stderr)


def connect_with_watchdog(
    stall_seconds: int = 300,
    max_restarts: int = 3,
    probe=_default_probe,
    execv=os.execv,
) -> None:
    """Force device connection up front; re-exec this process on a stall.

    Runs ``probe`` (a first device op by default) under a SIGALRM of
    ``stall_seconds``.  On stall, re-execs preserving ``sys.argv`` and the
    environment plus an incremented restart counter; after ``max_restarts``
    stalls the process exits 2.  ``probe``/``execv`` are injectable so the
    stall path is testable without a wedged device.
    """
    import signal

    restarts = int(os.environ.get(_RESTART_ENV, "0"))

    def on_stall(signum, frame):
        if restarts >= max_restarts:
            print("# device connect stalled; giving up", file=sys.stderr)
            os._exit(2)
        print(
            f"# device connect stalled {stall_seconds}s; re-exec "
            f"({restarts + 1}/{max_restarts})",
            file=sys.stderr,
        )
        os.environ[_RESTART_ENV] = str(restarts + 1)
        execv(sys.executable, [sys.executable] + sys.argv)

    signal.signal(signal.SIGALRM, on_stall)
    signal.alarm(stall_seconds)
    try:
        probe()
    finally:
        signal.alarm(0)
