"""TTC tables + check: JAX implementation vs CPU oracle (SURVEY.md §2a
"TTC precompute"/"TTC collision check" parity)."""

import numpy as np
import jax.numpy as jnp

from pyracecarsimulator_tpu.config import CarParams
from pyracecarsimulator_tpu.models.ttc import ttc_tables, check_ttc
from pyracecarsimulator_tpu.oracle import dynamics as odyn

P = CarParams()
FOV = 4.712388980384690


def test_tables_match_oracle():
    cos_j, dist_j = ttc_tables(180, FOV, P)
    cos_o, dist_o = odyn.ttc_tables(180, FOV, P)
    np.testing.assert_allclose(np.asarray(cos_j), cos_o, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dist_j), dist_o, atol=1e-5)


def test_car_distances_geometry():
    """Beam straight ahead exits at the front edge; lateral beams at the
    half-width."""
    cos_j, dist_j = ttc_tables(181, FOV, P)
    d = np.asarray(dist_j)
    mid = 90                         # beam at exactly 0 offset
    rear_overhang = (P.length - P.wheelbase) / 2.0
    x_max = P.wheelbase + rear_overhang - P.scan_distance_to_base_link
    np.testing.assert_allclose(d[mid], x_max, atol=1e-6)
    # beam at +-90 deg: offset = +-pi/2 is at index mid +- 90/135*... find
    offs = np.linspace(-FOV / 2, FOV / 2, 181)
    side = int(np.argmin(np.abs(offs - np.pi / 2)))
    np.testing.assert_allclose(d[side], P.width / 2,
                               atol=P.width * 0.05)


def test_check_matches_oracle(rng):
    for _ in range(50):
        ranges = rng.uniform(0.1, 10.0, 90)
        v = float(rng.uniform(-7, 7))
        thr = float(rng.uniform(0.005, 0.5))
        cos_j, dist_j = ttc_tables(90, FOV, P)
        got = bool(check_ttc(jnp.asarray(ranges, jnp.float32)[None],
                             jnp.asarray([v], jnp.float32),
                             cos_j, dist_j, thr)[0])
        cos_o, dist_o = odyn.ttc_tables(90, FOV, P)
        ref = odyn.check_ttc(ranges, v, cos_o, dist_o, thr)
        assert got == ref, (v, thr)


def test_no_collision_when_parked():
    cos_j, dist_j = ttc_tables(90, FOV, P)
    ranges = jnp.full((1, 90), 0.3)   # walls basically touching
    assert not bool(check_ttc(ranges, jnp.zeros(1), cos_j, dist_j, 10.0)[0])
