"""Latency-hiding / async-collective configuration for the sharded paths.

The north-star configuration ("pose/map gradients all-reduced overlapped
with the backward pass", BASELINE.json; SURVEY.md §7 step 6) relies on
XLA's latency-hiding scheduler to hoist collective *starts* above
independent backward compute and sink the *dones* below it. On TPU those
passes are option-gated; this module owns the option set so every entry
point (make_sharded_step, dryrun_multichip, user scripts) applies the
same configuration.

Two delivery mechanisms, in preference order:

1. Per-executable ``compiler_options`` (jax.jit(..., compiler_options=...))
   — validated by the backend at compile time, no process-wide state, and
   works through remote-compile tunnels. ``overlap_compiler_options()``
   returns the dict for TPU backends and ``{}`` elsewhere (the CPU/GPU
   clients reject TPU option names with INVALID_ARGUMENT).
2. Process-wide ``XLA_FLAGS`` for pod launch scripts
   (``enable_collective_overlap()``) — must run before backend
   initialization, and only on hosts with a LOCAL libtpu (the flags are
   compiled into the TPU build; CPU-only jaxlib aborts on unknown
   ``--xla_tpu_*`` names, measured on this image's jaxlib 0.9.0).
"""

from __future__ import annotations

import os
import warnings

# Option rationale (TPU compiler):
#   latency_hiding_scheduler: enables the overlap scheduler itself —
#     collectives become start/done pairs with compute scheduled between.
#   async_collective_fusion (+ fuse_all_gather): keeps the async pairs
#     fused into surrounding loop bodies so a scan-over-time rollout
#     preserves the overlap across steps.
OVERLAP_COMPILER_OPTIONS = {
    "xla_tpu_enable_latency_hiding_scheduler": "true",
    "xla_tpu_enable_async_collective_fusion": "true",
    "xla_tpu_enable_async_collective_fusion_fuse_all_gather": "true",
}

OVERLAP_XLA_FLAGS = tuple(f"--{k}={v}"
                          for k, v in OVERLAP_COMPILER_OPTIONS.items())


def overlap_compiler_options(backend: str | None = None) -> dict:
    """Options dict for ``jax.jit(..., compiler_options=...)``.

    Empty off-TPU: the option names are TPU-compiler symbols and other
    clients reject them at compile time (INVALID_ARGUMENT, measured on the
    CPU client). Passing ``backend`` skips the jax default-backend probe.
    """
    import jax
    b = backend or jax.default_backend()
    return dict(OVERLAP_COMPILER_OPTIONS) if b == "tpu" else {}


def _backend_initialized() -> bool:
    try:
        from jax._src import xla_bridge
        return xla_bridge.backends_are_initialized()
    except Exception:
        return False


def enable_collective_overlap() -> bool:
    """Append the overlap flags to XLA_FLAGS (idempotent). Pod-host path:
    call from launch scripts BEFORE importing jax, on hosts with a local
    libtpu. Returns True if the flags are (now) staged for the next
    backend initialization.
    """
    cur = os.environ.get("XLA_FLAGS", "")
    missing = [f for f in OVERLAP_XLA_FLAGS if f.split("=")[0] not in cur]
    if not missing:
        return True
    if _backend_initialized():
        warnings.warn(
            "enable_collective_overlap() called after JAX backend "
            "initialization; XLA_FLAGS will not be re-read. Prefer "
            "overlap_compiler_options() per-jit, or set the flags before "
            "importing jax.", RuntimeWarning, stacklevel=2)
        return False
    os.environ["XLA_FLAGS"] = (cur + " " + " ".join(missing)).strip()
    return True
