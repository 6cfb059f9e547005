"""Contact-solver fidelity: N-step trajectory drift vs real MuJoCo.

The ``solver="mujoco"`` path (``physics/solver.py``) replaces penalty
contacts with MuJoCo's soft pyramidal constraint model solved by PGS.
These tests step our engine and ``mj_step`` in lockstep from shared
states over contact-rich trajectories and bound the qpos drift with a
per-task tolerance table — the quantitative analog of the reference's
alignment tests (``mujoco/gym/mujoco_gym_align_test.py:38-82``), which
themselves accept platform drift.

Tolerances are calibrated ~10x above observed drift (float64):
observed @100 steps: hopper 4e-17, ant 2.5e-5, half_cheetah 2.6e-5,
walker2d 2e-4, humanoid 6e-3.
"""

import os

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(autouse=True)
def _x64():
    """Drift bounds are calibrated at float64; restore the global flag so
    the rest of the suite keeps its float32 default."""
    old = bool(jax.config.jax_enable_x64)
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)

from envpool_tpu.physics import dynamics as dyn  # noqa: E402
from envpool_tpu.physics import model as pm  # noqa: E402


def _gym_xml(name):
    import gymnasium

    return os.path.join(
        os.path.dirname(gymnasium.__file__), "envs/mujoco/assets", name
    )


# (xml, steps, tol@half, tol@end)
CASES = [
    ("hopper.xml", 100, 1e-8, 1e-8),
    ("half_cheetah.xml", 100, 5e-4, 5e-4),
    ("walker2d.xml", 100, 5e-4, 5e-3),
    ("ant.xml", 100, 5e-4, 5e-4),
    ("humanoid.xml", 100, 1e-4, 5e-2),
]


@pytest.mark.parametrize("xml,steps,tol_half,tol_end", CASES)
def test_solver_drift_vs_mujoco(xml, steps, tol_half, tol_end):
    m = mujoco.MjModel.from_xml_string(open(_gym_xml(xml)).read())
    model = pm.from_mj_model(m)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    d.qpos[:] = m.qpos0 + rng.uniform(-0.005, 0.005, m.nq)
    d.qvel[:] = rng.uniform(-0.005, 0.005, m.nv)
    ctrls = rng.uniform(-0.4, 0.4, (steps, m.nu))
    cp = dyn.ContactParams(solver="mujoco")
    q = jnp.asarray(d.qpos.copy())
    qd = jnp.asarray(d.qvel.copy())
    errs = []
    for t in range(steps):
        d.ctrl[:] = ctrls[t]
        mujoco.mj_step(m, d)
        q, qd = dyn.step(model, q, qd, jnp.asarray(ctrls[t]), 1, cp, 1)
        errs.append(np.abs(np.asarray(q) - d.qpos).max())
    assert errs[steps // 2 - 1] < tol_half, (
        f"{xml} drift @{steps // 2}: {errs[steps // 2 - 1]:.2e}"
    )
    assert errs[-1] < tol_end, f"{xml} drift @{steps}: {errs[-1]:.2e}"


def test_solver_sphere_bounce_lockstep():
    """Sphere drop/bounce/settle: 400 steps through impact, tight bound."""
    xml = """
    <mujoco>
      <option timestep="0.002"/>
      <worldbody>
        <geom type="plane" size="5 5 0.1"/>
        <body pos="0.1 0.2 0.3">
          <freejoint/>
          <geom type="sphere" size="0.1" mass="1"/>
        </body>
      </worldbody>
    </mujoco>"""
    m = mujoco.MjModel.from_xml_string(xml)
    model = pm.from_mj_model(m)
    d = mujoco.MjData(m)
    d.qvel[:] = [0.5, -0.3, 0.0, 0.2, 0.1, 0.0]
    cp = dyn.ContactParams(solver="mujoco")
    q = jnp.asarray(d.qpos.copy())
    qd = jnp.asarray(d.qvel.copy())
    ctrl = jnp.zeros(0)
    for _ in range(400):
        mujoco.mj_step(m, d)
        q, qd = dyn.step(model, q, qd, ctrl, 1, cp, 1)
    assert np.abs(np.asarray(q) - d.qpos).max() < 1e-3
    # Settled on the plane, rolling/resting: height matches mj closely.
    assert abs(float(q[2]) - d.qpos[2]) < 1e-4


def test_solver_limit_forces_match_mujoco():
    """Joint-limit constraint rows: qfrc_constraint parity at a violated
    configuration (no contacts)."""
    m = mujoco.MjModel.from_xml_string(open(_gym_xml("ant.xml")).read())
    model = pm.from_mj_model(m)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    d.qpos[:] = m.qpos0 + rng.uniform(-0.005, 0.005, m.nq)
    d.qvel[:] = rng.uniform(-0.005, 0.005, m.nv)
    ctrl = rng.uniform(-0.4, 0.4, m.nu)
    d.ctrl[:] = ctrl
    mujoco.mj_forward(m, d)
    assert d.ncon == 0  # initial ant pose: limits only
    from envpool_tpu.physics import solver as sol

    cp = dyn.ContactParams(solver="mujoco")
    M, tau, _, k = dyn._smooth(
        model, jnp.asarray(d.qpos), jnp.asarray(d.qvel), jnp.asarray(ctrl),
        cp,
    )
    qfrc, _ = sol.constraint_force(
        model, k, jnp.asarray(d.qpos), jnp.asarray(d.qvel), M, tau,
        m.opt.timestep, 100,
    )
    np.testing.assert_allclose(
        np.asarray(qfrc), d.qfrc_constraint, rtol=1e-5, atol=1e-6
    )


def test_penalty_path_unchanged():
    """The default penalty path still steps (regression guard for the
    _smooth signature change)."""
    m = mujoco.MjModel.from_xml_string(open(_gym_xml("hopper.xml")).read())
    model = pm.from_mj_model(m)
    q = jnp.asarray(m.qpos0.copy())
    qd = jnp.zeros(m.nv)
    q2, qd2 = dyn.step(model, q, qd, jnp.zeros(m.nu), 1, dyn.ContactParams(), 1)
    assert np.all(np.isfinite(np.asarray(q2)))
    assert q2.shape == q.shape


def test_env_level_solver_drift_float32():
    """End-to-end through make(): Ant-v4 with contact_solver="mujoco" in
    the envs' native float32, stepped against mj_step from the env's own
    reset state.  Bounds the practical (non-x64) drift."""
    import envpool_tpu

    jax.config.update("jax_enable_x64", False)  # the envs' real dtype
    # integrator="model": Ant's env default is the fast-Euler tradeoff;
    # fidelity mode wants the XML's RK4 (docs/contact_solver.md).
    spec = envpool_tpu.make_spec(
        "Ant-v4", num_envs=1, seed=0, contact_solver="mujoco",
        integrator="model",
    )
    env = spec.env

    mj = mujoco.MjModel.from_xml_string(
        open(_gym_xml("ant.xml")).read()
    )
    d = mujoco.MjData(mj)
    st, _ = env.reset_env(jax.random.PRNGKey(0))
    d.qpos[:] = np.asarray(st["qpos"], np.float64)
    d.qvel[:] = np.asarray(st["qvel"], np.float64)
    rng = np.random.default_rng(0)
    frame_skip = env.frame_skip
    state = st
    for t in range(10):  # 10 agent steps x frame_skip mj steps
        ctrl = rng.uniform(-0.4, 0.4, mj.nu).astype(np.float32)
        d.ctrl[:] = ctrl
        for _ in range(frame_skip):
            mujoco.mj_step(mj, d)
        out = env.step_env(state, jnp.asarray(ctrl), jax.random.PRNGKey(t))
        state = out.state
    drift = np.abs(np.asarray(state["qpos"], np.float64) - d.qpos).max()
    # float32 arithmetic over 50 mj-steps of contact-rich dynamics:
    # observed ~4e-5 (impact events amplify f32 noise ~10x per few
    # steps beyond this horizon — 2.5e-2 by step 14).
    assert drift < 2e-3, drift
