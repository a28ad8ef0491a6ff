"""Amortized device timing for remote-tunnel TPU attachments.

Per-call timers measure dispatch+fetch latency (a ~25 ms floor through the
axon relay, and ``block_until_ready`` does not truly synchronize there), so
throughput is measured as the slope between two iteration counts of the same
computation repeated inside one jitted ``fori_loop``, with an
iteration-dependent input perturbation preventing XLA from hoisting the body.

:func:`per_iteration_stats` additionally reports the dispatch overhead (the
per-call cost that is NOT device compute) so small-batch latency numbers can
be attributed honestly: ``wall ~= dispatch_s + iters * per_iter_s``.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp


def per_iteration_stats(
    fn,
    *args,
    iters: int | None = None,
    reps: int = 3,
    min_delta: float = 0.05,
    max_iters: int = 50_000,
) -> dict:
    """Timing split for ``fn(*args)`` on device.

    Returns ``{"per_iter_s", "dispatch_s", "iters"}`` where ``per_iter_s`` is
    the latency-amortized device time per evaluation (slope between two
    iteration counts) and ``dispatch_s`` is the residual per-call overhead
    (host->device dispatch + result fetch; through a remote tunnel this is
    the ~25 ms floor).  ``fn`` must accept the first argument as a float32
    array (perturbed per iteration) and return a pytree of arrays.  With
    ``iters=None`` the iteration count grows geometrically until the loop's
    extra wall time clears ``min_delta`` seconds, so tiny workloads don't
    drown in dispatch jitter.
    """

    @functools.partial(jax.jit, static_argnames=("n",))
    def looped(n: int, *a):
        def body(i, acc):
            out = fn(a[0] + i.astype(jnp.float32) * jnp.float32(1e-30), *a[1:])
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in leaves)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n: int) -> float:
        float(looped(n, *args))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(looped(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    def stats(t_small: float, t_large: float, n: int) -> dict:
        per = max((t_large - t_small) / n, 1e-9)
        return {
            "per_iter_s": per,
            "dispatch_s": max(t_small - 2 * per, 0.0),
            "iters": n,
        }

    if iters is not None:
        return stats(timed(2), timed(iters + 2), iters)

    n = 20
    while True:
        # Re-measure the dispatch floor every round: through a remote tunnel
        # it jitters by hundreds of ms, and a stale baseline can exceed the
        # looped time entirely.
        t_small = timed(2)
        t_large = timed(n + 2)
        delta = t_large - t_small
        if delta > min_delta:
            return stats(t_small, t_large, n)
        if n >= max_iters:
            # Loop time never cleared the jitter floor; report the
            # overhead-inclusive upper bound rather than garbage.
            return {
                "per_iter_s": max(t_large / (n + 2), 1e-9),
                "dispatch_s": 0.0,
                "iters": n,
            }
        per = max(delta / n, 1e-7)
        n = min(max(int(2.0 * min_delta / per), n * 4), max_iters)


def per_iteration_seconds(fn, *args, **kwargs) -> float:
    """Seconds per evaluation of ``fn(*args)`` on device, latency-amortized.

    Convenience wrapper over :func:`per_iteration_stats`.
    """
    return per_iteration_stats(fn, *args, **kwargs)["per_iter_s"]


def pipelined_wall_seconds(fn, *args, depth: int = 32, reps: int = 3) -> float:
    """Wall seconds per evaluation with ``depth`` epochs in flight.

    Models the real small-batch mitigation: JAX dispatch is asynchronous, so a
    client that does not synchronize between epochs overlaps the per-call
    dispatch/fetch latency across ``depth`` outstanding programs.  Inputs are
    perturbed per call so XLA cannot serve a cached result; the clock stops
    after every result has been fetched to host (``device_get``), so this is
    an end-to-end number a streaming caller would actually see - including
    whatever part of the tunnel round-trip does NOT pipeline.
    """
    jfn = jax.jit(fn)
    warm = jfn(*args)
    jax.block_until_ready(warm)
    jax.device_get(warm)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [
            jfn(args[0] + jnp.float32(i) * jnp.float32(1e-30), *args[1:])
            for i in range(depth)
        ]
        jax.device_get(outs)
        best = min(best, time.perf_counter() - t0)
    return best / depth
