"""Persistent TPU job runner: amortizes the remote-tunnel reconnect cost.

Through the axon relay a fresh Python process pays a multi-minute device
(re)connection before its first op; this worker connects once and then
executes queued script files sequentially.

Usage:  python benchmarks/tpu_worker.py [spool_dir]
Drop ``<name>.py`` files into the spool dir; each runs with globals
{"jax", "jnp", "np"} preloaded, stdout+stderr captured to ``<name>.out``,
then the script is renamed ``<name>.done``.  Drop a file named ``STOP`` to
exit.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import time
import traceback


def main() -> None:
    spool = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_spool"
    os.makedirs(spool, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    # Pay the device connection cost up front.  If the remote is mid-crash
    # ("UNAVAILABLE: TPU worker process crashed"), this client never
    # recovers - re-exec until a connect succeeds.
    t0 = time.perf_counter()
    try:
        jax.block_until_ready(jnp.zeros(()) + 1)
        float(jnp.sum(jnp.ones((8, 8))))
    except Exception as exc:  # noqa: BLE001
        print(f"[worker] connect failed ({exc}); re-exec in 120s", flush=True)
        time.sleep(120)
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__), spool])
    print(f"[worker] device ready: {jax.devices()} ({time.perf_counter() - t0:.0f}s)",
          flush=True)

    while True:
        jobs = sorted(f for f in os.listdir(spool) if f.endswith(".py"))
        if os.path.exists(os.path.join(spool, "STOP")):
            print("[worker] STOP found, exiting", flush=True)
            return
        # Skip files modified within the last poll interval: a job dropped
        # non-atomically (scp, `cat >`) could otherwise be exec'd while
        # half-written and consumed as a bogus error.
        now = time.time()

        def _settled(f):
            try:
                return now - os.path.getmtime(os.path.join(spool, f)) >= 1.0
            except OSError:
                return False  # deleted/renamed between listdir and stat

        jobs = [f for f in jobs if _settled(f)]
        if not jobs:
            time.sleep(1.0)
            continue
        name = jobs[0]
        path = os.path.join(spool, name)
        out_path = path[:-3] + ".out"
        print(f"[worker] running {name}", flush=True)
        buf = io.StringIO()
        t0 = time.perf_counter()
        try:
            # Jobs see the current on-disk framework, not whatever an earlier
            # job imported (tests/benchmarks modules too - a stale cached
            # tests.test_peaks_match once served an old parity corpus).
            for mod in [
                m for m in sys.modules
                # "bench" covers the top-level bench.py (NOT under
                # benchmarks/) - a stale cached copy once served a
                # pre-edit assert to a later job.
                if m.startswith(("apda_fft_tpu", "tests", "bench",
                                 "__graft_entry__"))
            ]:
                del sys.modules[mod]
            src = open(path).read()
            # __name__/__file__ make main-guarded scripts (bench.py etc.)
            # actually run instead of silently no-opping via the builtins
            # __name__ fallback.
            job_globals = {
                "__name__": "__main__", "__file__": path,
                "jax": jax, "jnp": jnp, "np": np,
            }
            with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                exec(compile(src, path, "exec"), job_globals)
            status = "ok"
        except KeyboardInterrupt:
            raise
        except BaseException:  # noqa: BLE001 - incl. SystemExit from job scripts
            buf.write(traceback.format_exc())
            status = "error"
        buf.write(f"\n[worker] {name}: {status} in {time.perf_counter() - t0:.1f}s\n")
        out = buf.getvalue()
        with open(out_path, "w") as fh:
            fh.write(out)
        try:
            os.rename(path, path[:-3] + ".done")
        except OSError:
            pass  # job file removed under us; output is already written
        print(f"[worker] {name} -> {status}", flush=True)
        if status == "ok":
            # A clean run clears any stale retry credit so a future
            # same-named job keeps its one infra-fault requeue.
            try:
                os.unlink(path[:-3] + ".retried")
            except OSError:
                pass
        # Any runtime fault class that poisons this client: UNAVAILABLE
        # (remote crash) or any "<STATUS>: TPU backend error" (observed:
        # UNIMPLEMENTED, FAILED_PRECONDITION; INTERNAL etc. behave alike).
        fatal = None
        if status == "error":
            m = re.search(
                r"JaxRuntimeError: (UNAVAILABLE|[A-Z_]+: TPU backend error)", out
            )
            fatal = m.group(1) if m else None
        if fatal:
            # The remote TPU crashed/restarted (UNAVAILABLE) or hit a
            # backend fault that poisons the client (e.g. UNIMPLEMENTED
            # complex ops - subsequent device_puts fail too); this
            # process's client never recovers - re-exec for a fresh
            # connection (after a cool-down: the remote takes minutes to
            # come back, and a tight reconnect loop can wedge it further).
            # The job died from the infrastructure, not its own bug:
            # requeue it so it reruns on the fresh client - but
            # only once (a job that itself triggers the crash must not
            # requeue-loop forever).
            marker = path[:-3] + ".retried"
            requeued = False
            if not os.path.exists(marker):
                try:
                    os.rename(path[:-3] + ".done", path)
                    requeued = True
                    open(marker, "w").close()  # only burn the credit on success
                except OSError:
                    pass
            print(f"[worker] client-fatal fault ({fatal}); "
                  f"job {'requeued' if requeued else 'NOT requeued (already retried)'}; "
                  f"re-exec for a fresh client in 120s", flush=True)
            time.sleep(120)
            os.execv(sys.executable, [sys.executable, os.path.abspath(__file__), spool])


if __name__ == "__main__":
    main()
