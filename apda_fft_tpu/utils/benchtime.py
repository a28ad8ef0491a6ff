"""Amortized device timing for remote-tunnel TPU attachments.

Per-call timers measure dispatch+fetch latency (a ~25 ms floor through the
axon relay, and ``block_until_ready`` does not truly synchronize there), so
throughput is measured as the slope between two iteration counts of the same
computation repeated inside one jitted ``fori_loop``, with an
iteration-dependent input perturbation preventing XLA from hoisting the body.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp


def per_iteration_seconds(
    fn,
    *args,
    iters: int | None = None,
    reps: int = 3,
    min_delta: float = 0.05,
    max_iters: int = 50_000,
) -> float:
    """Seconds per evaluation of ``fn(*args)`` on device, latency-amortized.

    ``fn`` must accept the first argument as a float32 array (perturbed per
    iteration) and return a pytree of arrays.  With ``iters=None`` the
    iteration count grows geometrically until the loop's extra wall time
    clears ``min_delta`` seconds, so tiny workloads (single-window epochs)
    don't drown in dispatch jitter.
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

    if iters is not None:
        t_small = timed(2)
        t_large = timed(iters + 2)
        return max((t_large - t_small) / iters, 1e-9)

    n = 20
    while True:
        # Re-measure the dispatch floor every round: through a remote tunnel
        # it jitters by hundreds of ms, and a stale baseline can exceed the
        # looped time entirely.
        t_small = timed(2)
        t_large = timed(n + 2)
        delta = t_large - t_small
        if delta > min_delta:
            return delta / n
        if n >= max_iters:
            # Loop time never cleared the jitter floor; report the
            # overhead-inclusive upper bound rather than garbage.
            return max(t_large / (n + 2), 1e-9)
        per = max(delta / n, 1e-7)
        n = min(max(int(2.0 * min_delta / per), n * 4), max_iters)
