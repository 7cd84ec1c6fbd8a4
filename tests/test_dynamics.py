"""Dynamics parity: JAX models vs CPU oracle + closed-form checks
(SURVEY.md §4 item 2)."""

import numpy as np
import jax.numpy as jnp

from pyracecarsimulator_tpu.config import CarParams
from pyracecarsimulator_tpu.state import CarState, zero_state, set_field
from pyracecarsimulator_tpu.models import dynamics as jdyn
from pyracecarsimulator_tpu.oracle import dynamics as odyn

P = CarParams()
DT = 0.01


def _to_dict(s: CarState, i=()):
    g = lambda a: float(np.asarray(a)[i] if i else a)
    return {"x": g(s.x), "y": g(s.y), "theta": g(s.theta),
            "velocity": g(s.velocity), "steer_angle": g(s.steer_angle),
            "angular_velocity": g(s.angular_velocity),
            "slip_angle": g(s.slip_angle), "st_dyn": bool(np.asarray(s.st_dyn)[i] if i else s.st_dyn)}


def _from_dict(d):
    return CarState(
        x=jnp.float32(d["x"]), y=jnp.float32(d["y"]),
        theta=jnp.float32(d["theta"]), velocity=jnp.float32(d["velocity"]),
        steer_angle=jnp.float32(d["steer_angle"]),
        angular_velocity=jnp.float32(d["angular_velocity"]),
        slip_angle=jnp.float32(d["slip_angle"]),
        st_dyn=jnp.asarray(d["st_dyn"]), collision=jnp.asarray(False))


def _assert_close(jd, od, atol=2e-5):
    for k in ("x", "y", "theta", "velocity", "steer_angle",
              "angular_velocity", "slip_angle"):
        assert abs(jd[k] - od[k]) < atol, (k, jd[k], od[k])


def test_input_processing_matches_oracle(rng):
    for _ in range(50):
        v = float(rng.uniform(-7, 7))
        v_des = float(rng.uniform(-8, 8))
        st = float(rng.uniform(-0.4, 0.4))
        st_des = float(rng.uniform(-0.5, 0.5))
        s = set_field(zero_state(), velocity=jnp.float32(v),
                      steer_angle=jnp.float32(st))
        a, sv = jdyn.process_input(jnp.float32(v_des), jnp.float32(st_des), s, P)
        ao = odyn.compute_accel(float(np.clip(v_des, -P.max_speed, P.max_speed)), v, P)
        svo = odyn.compute_steer_vel(
            float(np.clip(st_des, -P.max_steer_angle, P.max_steer_angle)), st, P)
        assert abs(float(a) - ao) < 1e-5
        assert abs(float(sv) - svo) < 1e-5


def test_ks_matches_oracle(rng):
    for _ in range(30):
        d = {"x": rng.uniform(-5, 5), "y": rng.uniform(-5, 5),
             "theta": rng.uniform(-3, 3), "velocity": rng.uniform(-5, 7),
             "steer_angle": rng.uniform(-0.4, 0.4),
             "angular_velocity": 0.0, "slip_angle": 0.0, "st_dyn": False}
        a, sv = rng.uniform(-5, 5), rng.uniform(-3, 3)
        jd = _to_dict(jdyn.ks_step(_from_dict(d), jnp.float32(a),
                                   jnp.float32(sv), P, DT))
        od = odyn.ks_step(d, a, sv, P, DT)
        _assert_close(jd, od)


def test_st_matches_oracle_both_branches(rng):
    for v0 in [0.1, 0.5, 1.5, 4.0, 6.5, -2.0]:
        d = {"x": 1.0, "y": -2.0, "theta": 0.7, "velocity": v0,
             "steer_angle": 0.2, "angular_velocity": 0.5,
             "slip_angle": 0.05, "st_dyn": False}
        a, sv = 1.5, -0.8
        jd = _to_dict(jdyn.st_step(_from_dict(d), jnp.float32(a),
                                   jnp.float32(sv), P, DT))
        od = odyn.st_step(d, a, sv, P, DT)
        _assert_close(jd, od, atol=5e-5)
        assert jd["st_dyn"] == (abs(v0) >= P.v_switch)


def test_ks_circle_closed_form():
    """Constant steer, constant speed -> circle of radius L/tan(delta)."""
    delta, v = 0.3, 2.0
    R = P.wheelbase / np.tan(delta)
    s = set_field(zero_state(), velocity=jnp.float32(v),
                  steer_angle=jnp.float32(delta))
    n = 400
    for _ in range(n):
        s = jdyn.ks_step(s, 0.0, 0.0, P, DT)
    # after time t, theta = v/R * t
    t = n * DT
    assert abs(float(s.theta) - v / R * t) < 1e-3
    # position on the circle centered at (0, R)
    cx, cy = 0.0, R
    r = np.hypot(float(s.x) - cx, float(s.y) - cy)
    assert abs(r - R) < v * DT  # Euler integration error bound-ish


def test_st_straight_line():
    s = set_field(zero_state(), velocity=jnp.float32(3.0))
    for _ in range(100):
        s = jdyn.st_step(s, 0.0, 0.0, P, DT)
    assert abs(float(s.x) - 3.0 * 1.0) < 1e-4
    assert abs(float(s.y)) < 1e-5
    assert abs(float(s.theta)) < 1e-5


def test_batched_shapes():
    s = zero_state((16,))
    s = set_field(s, velocity=jnp.linspace(0, 7, 16))
    out = jdyn.st_step(s, jnp.zeros(16), jnp.zeros(16), P, DT)
    assert out.x.shape == (16,)
    # low-speed agents took the KS branch, high-speed the ST branch
    st_dyn = np.asarray(out.st_dyn)
    assert not st_dyn[0] and st_dyn[-1]


def test_standstill_latch():
    s = set_field(zero_state(), velocity=jnp.float32(5.0),
                  collision=jnp.asarray(True))
    new = jdyn.st_step(s, jnp.float32(2.0), jnp.float32(0.0), P, DT)
    out = jdyn.apply_standstill(s, new)
    assert float(out.velocity) == 0.0
    assert float(out.x) == 0.0
    assert bool(out.collision)


def test_steer_gradient_modes():
    """The reference bang-bang steering law has zero derivative w.r.t.
    the desired steer (sign(err)*max); steer_mode="smooth" restores
    gradient flow with identical saturated behavior (round 5)."""
    import jax
    import jax.numpy as jnp
    from pyracecarsimulator_tpu.models.dynamics import compute_steer_vel
    p = CarParams()
    g_bang = jax.grad(lambda d: compute_steer_vel(d, 0.0, p))(0.1)
    g_smooth = jax.grad(
        lambda d: compute_steer_vel(d, 0.0, p, "smooth"))(0.01)
    assert float(g_bang) == 0.0
    assert float(g_smooth) > 0.0
    # saturated regions agree with bang-bang
    v_b = compute_steer_vel(0.4, 0.0, p)
    v_s = compute_steer_vel(0.4, 0.0, p, "smooth")
    assert float(jnp.abs(v_b - v_s)) < 1e-6
