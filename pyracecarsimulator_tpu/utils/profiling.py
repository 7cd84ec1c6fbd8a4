"""Tracing / profiling utilities (SURVEY.md §5 "Tracing / profiling").

``jax.profiler`` wrappers plus a tunnel-aware timing harness: on this
hardware a host<->device round trip costs ~35 ms, so *all* throughput
numbers must amortize repetitions inside one compiled program.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture an XProf/Perfetto trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed_loop(fn: Callable, *args, reps: int = 20,
               overhead_s: float = 0.035) -> float:
    """Seconds per call of ``fn(*args)`` (a jittable scalar-returning fn),
    measured as one compiled lax.scan of ``reps`` iterations + one host
    fetch. Returns per-iteration seconds.

    Every float-array argument is perturbed by ``i * 1e-30`` per iteration:
    without a data dependence on the loop index, XLA CSE-hoists the body
    and the "timing" measures one iteration (the BASELINE.md retraction).
    The perturbation is value-invisible for normal float32 magnitudes.
    """

    @jax.jit
    def loop(*a):
        def rep(acc, i):
            d = i.astype(jnp.float32) * 1e-30
            ai = [x + d if (hasattr(x, "dtype")
                            and jnp.issubdtype(x.dtype, jnp.floating))
                  else x for x in a]
            return acc + fn(*ai), None
        acc, _ = jax.lax.scan(rep, 0.0, jnp.arange(reps))
        return acc

    float(loop(*args))                     # compile + warm
    t0 = time.perf_counter()
    float(loop(*args))
    return max(time.perf_counter() - t0 - overhead_s, 1e-9) / reps


def rays_per_second(scan_fn: Callable, poses, num_beams: int,
                    reps: int = 20) -> float:
    """First-class rays/s counter (SURVEY.md §5 row 1)."""
    n_rays = int(jnp.asarray(poses).shape[0]) * num_beams

    def once(poses):
        return jnp.sum(scan_fn(poses))

    sec = timed_loop(once, poses, reps=reps)
    return n_rays / sec
