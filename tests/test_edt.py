"""EDT parity vs scipy (SURVEY.md §4 item 2)."""

import numpy as np
import pytest

from pyracecarsimulator_tpu.maps.edt import edt, edt_numpy

scipy_ndimage = pytest.importorskip("scipy.ndimage")


@pytest.mark.parametrize("shape,density", [
    ((32, 48), 0.05), ((100, 100), 0.01), ((257, 129), 0.002),
])
def test_edt_matches_scipy(shape, density, rng):
    occ = rng.rand(*shape) < density
    occ[shape[0] // 2, shape[1] // 2] = True
    ref = scipy_ndimage.distance_transform_edt(~occ)
    np.testing.assert_allclose(edt_numpy(occ), ref, atol=1e-4)


def test_edt_resolution_scaling(rng):
    occ = rng.rand(64, 64) < 0.05
    occ[0, 0] = True
    np.testing.assert_allclose(edt(occ, resolution=0.05),
                               edt_numpy(occ) * 0.05, rtol=1e-6)


def test_edt_all_free_is_large():
    occ = np.zeros((16, 16), bool)
    assert edt_numpy(occ).min() > 1e6


def test_edt_all_occupied_is_zero():
    occ = np.ones((16, 16), bool)
    assert edt_numpy(occ).max() == 0.0
