"""Ring map-pass scan (parallel/ringmap.py): the sector table sharded
across devices, passed around the ring during the scan (SURVEY.md §5
"long-context analogue" extension — the last §2b/§5 design element)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyracecarsimulator_tpu.maps.sectors import build_sector_map
from pyracecarsimulator_tpu.ops.raycast_sectors import scan_poses_sectors
from pyracecarsimulator_tpu.parallel.mesh import make_mesh
from pyracecarsimulator_tpu.parallel.ringmap import (make_ring_scan,
                                                     shard_sector_table)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 fake devices")

FOV = 4.712388980384690
MAXR = 4.0


@pytest.fixture(scope="module")
def world():
    rng = np.random.RandomState(7)
    H = W = 220
    occ = np.zeros((H, W), np.float32)
    occ[:3, :] = 1; occ[-3:, :] = 1; occ[:, :3] = 1; occ[:, -3:] = 1
    for _ in range(40):
        r, c = rng.randint(10, H - 12), rng.randint(10, W - 12)
        h, w = rng.randint(2, 9, 2)
        occ[r:r + h, c:c + w] = 1
    res = 0.05
    org = (-H * res / 2, -W * res / 2)
    smap = build_sector_map(occ, res, org, max_range=MAXR, tile_size=1.0,
                            ns=8, block_half=0.62)
    ys, xs = np.where(occ < 0.5)
    k = rng.randint(len(ys), size=16)
    px = org[0] + (xs[k] + .5) * res
    py = org[1] + (ys[k] + .5) * res
    th = rng.uniform(-np.pi, np.pi, 16)
    poses = jnp.asarray(np.stack([px, py, th], -1), jnp.float32)
    return smap, poses


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
def test_ring_scan_matches_replicated(world, mesh_shape):
    """Bit-parity: the ring-assembled sweep is the SAME arithmetic
    (_sweep_gathered) over the same rows as the replicated path."""
    smap, poses = world
    mesh = make_mesh(agents_axis=mesh_shape[0], beams_axis=mesh_shape[1])
    scan = make_ring_scan(mesh, smap, num_beams=512, fov=FOV,
                          max_range=MAXR)
    r_ring = np.asarray(scan(poses))
    r_rep = np.asarray(scan_poses_sectors(smap, poses, num_beams=512,
                                          fov=FOV, max_range=MAXR,
                                          bb=128))
    np.testing.assert_array_equal(r_ring, r_rep)


def test_ring_table_sharded_memory(world):
    """Each device addresses only L/S table rows (the capacity point of
    the ring: per-device footprint / S)."""
    smap, _ = world
    mesh = make_mesh(agents_axis=1, beams_axis=8)
    sharded, ls = shard_sector_table(mesh, smap)
    l = smap.table.shape[0]
    assert ls == -(-l // 8)
    assert sharded.shape[0] == 8 * ls
    # every device's addressable shard is 1/8 of the padded rows
    for sh in sharded.addressable_shards:
        assert sh.data.shape[0] == ls


def test_ring_scan_gradient(world):
    """Pose gradients through the ring scan equal the replicated
    backend's (the analytic VJP never touches the ring)."""
    smap, poses = world
    mesh = make_mesh(agents_axis=2, beams_axis=4)
    scan = make_ring_scan(mesh, smap, num_beams=512, fov=FOV,
                          max_range=MAXR)

    def loss_ring(p):
        return jnp.sum(scan(p) ** 2)

    def loss_rep(p):
        return jnp.sum(scan_poses_sectors(
            smap, p, num_beams=512, fov=FOV, max_range=MAXR, bb=128) ** 2)

    g_r = np.asarray(jax.grad(loss_ring)(poses))
    g_p = np.asarray(jax.grad(loss_rep)(poses))
    np.testing.assert_allclose(g_r, g_p, rtol=1e-5, atol=1e-5)
