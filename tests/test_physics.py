"""Physics engine oracle tests vs real MuJoCo (CPU bindings).

The analog of the reference's alignment suites
(``mujoco/gym/mujoco_gym_align_test.py:37-100``): step our JAX engine and
MuJoCo from identical states and compare.  Contact-free models must match
to float32 precision; contact-rich models (penalty vs LCP solver) get
behavior-level tolerances.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from envpool_tpu.physics import (  # noqa: E402
    bias_forces,
    from_mj_model,
    mass_matrix,
    step,
)


def _load(name):
    import gymnasium

    xml = os.path.join(
        os.path.dirname(gymnasium.__file__), "envs", "mujoco", "assets", name
    )
    m = mujoco.MjModel.from_xml_path(xml)
    return m, from_mj_model(m)


def _rollout_err(name, steps=50, ctrl_scale=0.2, seed=1):
    m, pm = _load(name)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(seed)
    qpos = m.qpos0 + rng.uniform(-0.02, 0.02, m.nq)
    qvel = rng.uniform(-0.05, 0.05, m.nv)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    q, qd = jnp.asarray(qpos, jnp.float32), jnp.asarray(qvel, jnp.float32)
    max_err = 0.0
    for _ in range(steps):
        ctrl = rng.uniform(-ctrl_scale, ctrl_scale, max(m.nu, 1))[: m.nu]
        d.ctrl[:] = ctrl
        mujoco.mj_step(m, d)
        q, qd = step(pm, q, qd, jnp.asarray(ctrl, jnp.float32))
        max_err = max(max_err, float(np.abs(np.asarray(q) - d.qpos).max()))
    return max_err


def test_mass_matrix_and_bias_match_mujoco() -> None:
    m, pm = _load("inverted_pendulum.xml")
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    qpos = rng.uniform(-0.1, 0.1, m.nq)
    qvel = rng.uniform(-0.5, 0.5, m.nv)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(m, d)
    M_ref = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, M_ref)
    M = np.asarray(mass_matrix(pm, jnp.asarray(qpos)))
    np.testing.assert_allclose(M, M_ref, rtol=1e-4, atol=1e-6)
    c = np.asarray(bias_forces(pm, jnp.asarray(qpos), jnp.asarray(qvel)))
    np.testing.assert_allclose(c, d.qfrc_bias, rtol=1e-4, atol=1e-6)


def test_fluid_forces_match_mujoco() -> None:
    """Inertia-box drag (viscous + density terms) vs qfrc_passive."""
    from envpool_tpu.physics.dynamics import _fluid_forces

    m, pm = _load("swimmer.xml")
    d = mujoco.MjData(m)
    d.qpos[:] = m.qpos0
    d.qvel[:] = [0.3, 0.1, 0.2, 0.05, -0.1]
    mujoco.mj_forward(m, d)
    mine = np.asarray(
        _fluid_forces(
            pm, jnp.asarray(d.qpos.copy()), jnp.asarray(d.qvel.copy())
        )
    )
    np.testing.assert_allclose(mine, d.qfrc_passive, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize(
    "name,tol",
    [
        ("inverted_pendulum.xml", 1e-5),
        ("reacher.xml", 1e-4),
        ("inverted_double_pendulum.xml", 1e-5),
        ("swimmer.xml", 5e-3),  # fluid model: f32 drift over 50 steps
    ],
)
def test_contact_free_alignment(name: str, tol: float) -> None:
    assert _rollout_err(name) < tol


@pytest.mark.parametrize(
    "name,tol",
    [
        ("half_cheetah.xml", 0.2),
        ("hopper.xml", 0.2),
    ],
)
def test_contact_behavior_alignment(name: str, tol: float) -> None:
    """Penalty contacts: trajectories stay near MuJoCo for 50 steps."""
    assert _rollout_err(name) < tol


def test_no_spurious_contacts_without_floor() -> None:
    _, pm = _load("inverted_pendulum.xml")
    assert len(pm.con_body) == 0
    _, pm = _load("half_cheetah.xml")
    assert len(pm.con_body) > 0


# ---------------------------------------------------------------------------
# Scalar (lane-parallel) backend equivalence: the TPU-speed path in
# ``physics/scalar.py`` must match the einsum reference implementation
# (itself MuJoCo-aligned above) to float32 precision.
# ---------------------------------------------------------------------------

_FREE_HINGE_XML = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom type="plane" size="5 5 0.1"/>
    <body name="base" pos="0 0 0.5">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="1.0"/>
      <body name="arm" pos="0.2 0 0">
        <joint type="hinge" axis="0 1 0" damping="0.1" range="-1 1" limited="true"/>
        <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" mass="0.3"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def _scalar_vs_einsum(pm, substeps, nsteps, seed=3, n=4):
    from envpool_tpu.physics.dynamics import ContactParams, _step_impl
    from envpool_tpu.physics.scalar import step_batched
    import jax

    rng = np.random.default_rng(seed)
    qpos = jnp.asarray(
        np.tile(pm.qpos0, (n, 1)) + rng.uniform(-0.05, 0.05, (n, pm.nq)),
        jnp.float32,
    )
    qvel = jnp.asarray(rng.normal(0, 0.1, (n, pm.nv)), jnp.float32)
    ctrl = jnp.asarray(rng.uniform(-1, 1, (n, pm.nu)), jnp.float32)
    cp = ContactParams()
    ref = jax.vmap(
        lambda q, v, c: _step_impl(pm, q, v, c, substeps, cp, nsteps)
    )(qpos, qvel, ctrl)
    sc = step_batched(pm, qpos, qvel, ctrl, substeps, cp, nsteps)
    np.testing.assert_allclose(sc[0], ref[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(sc[1], ref[1], rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize(
    "name,substeps",
    [
        ("half_cheetah.xml", 1),  # RK4, contacts
        ("hopper.xml", 2),        # Euler + joint limits, contacts
        ("swimmer.xml", 1),       # RK4, fluid drag
    ],
)
def test_scalar_backend_matches_einsum(name: str, substeps: int) -> None:
    _, pm = _load(name)
    _scalar_vs_einsum(pm, substeps, 3)


def test_scalar_backend_free_joint() -> None:
    """Free-joint path (quaternion FK + expmap integration + contacts)."""
    m = mujoco.MjModel.from_xml_string(_FREE_HINGE_XML)
    pm = from_mj_model(m)
    assert pm.nq == 8 and pm.nv == 7
    _scalar_vs_einsum(pm, 1, 3)


def test_pair_contacts_sphere_sphere() -> None:
    """Two overlapping spheres on slide joints repel symmetrically."""
    xml = """
    <mujoco>
      <option timestep="0.002" gravity="0 0 0"/>
      <worldbody>
        <body name="a" pos="-0.05 0 1">
          <joint type="slide" axis="1 0 0"/>
          <geom type="sphere" size="0.1" mass="1"/>
        </body>
        <body name="b" pos="0.05 0 1">
          <joint type="slide" axis="1 0 0"/>
          <geom type="sphere" size="0.1" mass="1"/>
        </body>
      </worldbody>
    </mujoco>
    """
    from envpool_tpu.physics.dynamics import ContactParams, _step_impl

    m = mujoco.MjModel.from_xml_string(xml)
    pm = from_mj_model(m)
    assert len(pm.pair_body) == 1
    q = jnp.zeros(2)
    qd = jnp.zeros(2)
    cp = ContactParams(pairs=True)
    q2, qd2 = _step_impl(pm, q, qd, jnp.zeros(0), 1, cp, 10)
    # Penetrating spheres push apart with equal momentum.
    assert float(qd2[0]) < -0.01
    np.testing.assert_allclose(float(qd2[0]), -float(qd2[1]), rtol=1e-5)
    # With pairs disabled nothing happens.
    q3, qd3 = _step_impl(pm, q, qd, jnp.zeros(0), 1, ContactParams(), 10)
    np.testing.assert_allclose(np.asarray(qd3), 0.0, atol=1e-7)


def test_pair_contacts_scalar_matches_einsum() -> None:
    """Scalar backend pair-contact path equals the einsum reference."""
    import os
    import gymnasium  # noqa: F401

    import dm_control.suite as suite
    from dm_control.suite import common
    from envpool_tpu.physics.dynamics import ContactParams, _step_impl
    from envpool_tpu.physics.scalar import step_batched
    import jax

    xml = open(
        os.path.join(os.path.dirname(suite.__file__), "finger.xml")
    ).read()
    m = mujoco.MjModel.from_xml_string(xml, common.ASSETS)
    pm = from_mj_model(m)
    rng = np.random.default_rng(0)
    n = 4
    qpos = jnp.asarray(rng.uniform(-0.6, 0.6, (n, 3)), jnp.float32)
    qvel = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    ctrl = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    cp = ContactParams(pairs=True)
    ref = jax.vmap(lambda q, v, c: _step_impl(pm, q, v, c, 2, cp, 2))(
        qpos, qvel, ctrl
    )
    sc = step_batched(pm, qpos, qvel, ctrl, 2, cp, 2)
    np.testing.assert_allclose(sc[0], ref[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(sc[1], ref[1], rtol=2e-3, atol=2e-3)


_BALL_XML = """
<mujoco>
  <option timestep="0.01" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="rod" pos="0 0 1">
      <joint name="swivel" type="ball" pos="0 0 0" damping="0.02"/>
      <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.02"
            density="1000"/>
      <body name="tip" pos="0.05 0 -0.4">
        <joint name="elbow" type="hinge" axis="0 1 0" damping="0.01"/>
        <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.015"
              density="800"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def test_ball_joint_pendulum_matches_mujoco() -> None:
    """Ball-joint spherical pendulum (+ a hinge child): FK, mass
    matrix, bias forces, and a 50-step passive rollout aligned vs
    mj_step (quaternion kinematics q-dot = 0.5 q (x) [0, w], child-frame
    cdof axes, exp-map integration)."""
    m = mujoco.MjModel.from_xml_string(_BALL_XML)
    pm = from_mj_model(m)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    # Random non-identity ball orientation + hinge angle.
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    d.qpos[:4] = quat
    d.qpos[4] = 0.3
    d.qvel[:] = rng.uniform(-0.3, 0.3, m.nv)
    mujoco.mj_forward(m, d)
    q = jnp.asarray(d.qpos, jnp.float32)
    qd = jnp.asarray(d.qvel, jnp.float32)
    # Mass matrix.
    M_ours = np.asarray(mass_matrix(pm, q))
    M_mj = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, M_mj)
    np.testing.assert_allclose(M_ours, M_mj, atol=1e-5)
    # Bias forces.
    b_ours = np.asarray(bias_forces(pm, q, qd))
    np.testing.assert_allclose(b_ours, d.qfrc_bias, atol=1e-4)
    # Passive rollout.
    max_err = 0.0
    for _ in range(50):
        mujoco.mj_step(m, d)
        q, qd = step(pm, q, qd, jnp.zeros((0,), jnp.float32))
        max_err = max(
            max_err, float(np.abs(np.asarray(q) - d.qpos).max())
        )
    assert max_err < 2e-4, max_err
