"""TPU-side acceptance check for the overlap compiler options (VERDICT r2
item 7 / round-1 item 5): compile the PRODUCTION sharded step on the real
TPU chip (1-device mesh) with ``overlap_compiler_options()`` and record

  1. that the TPU client ACCEPTS the option set (a bad name/value raises
     INVALID_ARGUMENT at compile time — this is the validation the CPU-mesh
     run could not provide),
  2. whether the optimized HLO contains async collective start/done pairs
     (on a 1-device mesh XLA usually degenerates the psum to a copy, so 0
     is expected; the acceptance is the evidence that transfers to pods).

Appends a dated section to docs/OVERLAP.md.

    python scripts/overlap_tpu_check.py   # needs the TPU tunnel healthy
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "OVERLAP.md")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pyracecarsimulator_tpu.config import ScanParams
    from pyracecarsimulator_tpu.simulator import build_sim
    from pyracecarsimulator_tpu.state import state_from_pose
    from pyracecarsimulator_tpu.parallel import make_mesh, make_sharded_step
    from pyracecarsimulator_tpu.parallel.flags import (
        OVERLAP_COMPILER_OPTIONS, overlap_compiler_options)

    dev = jax.devices()[0]
    assert jax.default_backend() == "tpu", "run on the TPU"
    mesh = make_mesh([dev], agents_axis=1, beams_axis=1)
    bundle = build_sim("levine", scan=ScanParams(num_beams=1080),
                       backend="sectors")
    # make_sharded_step applies overlap_compiler_options() itself on TPU;
    # compiling it IS the acceptance test.
    step = make_sharded_step(mesh, bundle, with_noise=False)
    a = 8
    s0 = state_from_pose(jnp.zeros(a), jnp.zeros(a), jnp.zeros(a))
    action = (jnp.full((a,), 2.0), jnp.zeros(a))
    out = step(s0, action, None)
    ok = bool(np.isfinite(np.asarray(out.ranges)).all())

    # explicit per-option acceptance probe + HLO inspection on a jitted
    # grad of the sharded SCAN loss (make_sharded_step's own jit already
    # carries the options — compiled above; nesting it would double-apply)
    from pyracecarsimulator_tpu.parallel import make_sharded_scan
    opts = overlap_compiler_options()
    scan = make_sharded_scan(mesh, bundle.segmap, 1080,
                             float(bundle.scan.fov))
    poses = jnp.zeros((a, 3))
    lowered = jax.jit(
        jax.grad(lambda p: jnp.sum(scan(p) ** 2))).lower(poses)
    compiled = lowered.compile(compiler_options=opts or None)
    hlo = compiled.as_text()
    starts = len(re.findall(r"all-reduce-start|collective-permute-start"
                            r"|all-gather-start", hlo))
    dones = len(re.findall(r"all-reduce-done|collective-permute-done"
                           r"|all-gather-done", hlo))
    sync = len(re.findall(r"%all-reduce", hlo))

    section = f"""

## TPU-side acceptance (round 3, {dev})

`scripts/overlap_tpu_check.py`, run on the real chip:

- `make_sharded_step` (1-device mesh, sector backend, 1080 beams)
  compiled and executed with `overlap_compiler_options()` applied —
  finite ranges: {ok}.
- Explicit `compile(compiler_options={dict(OVERLAP_COMPILER_OPTIONS)})`
  of the sharded-scan gradient: **accepted by the TPU compiler** (an
  unknown/invalid option raises INVALID_ARGUMENT at this call; none was
  raised).
- Optimized HLO: {starts} async collective starts / {dones} dones,
  {sync} synchronous all-reduce mentions. On a 1-device mesh XLA
  degenerates the beams-axis psum (expected); the acceptance result is
  the part that transfers to multi-chip slices, where the same options
  split collectives into start/done pairs.
"""
    with open(OUT, "a") as f:
        f.write(section)
    print(section)


if __name__ == "__main__":
    main()
