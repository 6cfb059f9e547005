"""Wave-3 dmc alignment vs real dm_control: quadruped, manipulator,
stacker, dog.

Strategy (same as the rest of test_dmc.py): inject the *oracle's* qpos/
qvel into our reward/observation functions every step and compare —
this isolates the reward/obs pipeline from solver differences (penalty
vs LCP contacts).  Touch/force-sensor-derived quantities are approximated
from penalty forces and excluded from exact comparison (documented in
envs/mujoco_dmc/tasks3.py).
"""

import numpy as np
import pytest

dm_suite = pytest.importorskip("dm_control.suite")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import envpool_tpu  # noqa: E402


def _env(tid):
    return envpool_tpu.make_spec(tid, num_envs=1).env


@pytest.mark.parametrize(
    "task,tid", [("walk", "QuadrupedWalk-v1"), ("run", "QuadrupedRun-v1")]
)
def test_quadruped_move_reward_alignment(task, tid):
    ref = dm_suite.load("quadruped", task, task_kwargs={"random": 0})
    ref.reset()
    me = _env(tid)
    rng = np.random.default_rng(0)
    max_err = 0.0
    for _ in range(15):
        a = rng.uniform(-1, 1, 12).astype(np.float32)
        ts = ref.step(a)
        qpos = jnp.asarray(ref.physics.data.qpos, jnp.float32)
        qvel = jnp.asarray(ref.physics.data.qvel, jnp.float32)
        extras = {
            "act": jnp.asarray(ref.physics.data.act, jnp.float32),
            "prev_v": jnp.zeros(3, jnp.float32),
        }
        r = float(me.reward_dmc(qpos, qvel, a, extras))
        max_err = max(max_err, abs(r - float(ts.reward)))
    # Velocimeter site vs body-frame velocity: small systematic error.
    assert max_err < 0.05, max_err


def test_quadruped_obs_alignment():
    ref = dm_suite.load("quadruped", "walk", task_kwargs={"random": 1})
    ref.reset()
    me = _env("QuadrupedWalk-v1")
    rng = np.random.default_rng(1)
    for _ in range(3):
        a = rng.uniform(-1, 1, 12).astype(np.float32)
        ts = ref.step(a)
    qpos = jnp.asarray(ref.physics.data.qpos, jnp.float32)
    qvel = jnp.asarray(ref.physics.data.qvel, jnp.float32)
    extras = {
        "act": jnp.asarray(ref.physics.data.act, jnp.float32),
        "prev_v": jnp.zeros(3, jnp.float32),
    }
    mine = me.observe_dmc(qpos, qvel, extras)
    oracle = ts.observation
    # Exact: egocentric_state (qpos/qvel/act), torso_upright.
    np.testing.assert_allclose(
        np.asarray(mine["egocentric_state"]),
        oracle["egocentric_state"],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        float(mine["torso_upright"]), oracle["torso_upright"], atol=1e-4
    )
    # torso_velocity: velocimeter site vs body frame — loose.
    np.testing.assert_allclose(
        np.asarray(mine["torso_velocity"]),
        oracle["torso_velocity"],
        atol=0.2,
    )
    # Shapes for the approximated sensors.
    assert mine["imu"].shape == oracle["imu"].shape
    assert mine["force_torque"].shape == oracle["force_torque"].shape


def test_quadruped_escape_fetch_reward_alignment(monkeypatch):
    # Headless: skip dm_control's hfield re-upload to the GL context.
    from dm_control.mujoco import engine

    monkeypatch.setattr(
        engine.Physics, "contexts", property(lambda self: None)
    )
    for task, tid in (
        ("escape", "QuadrupedEscape-v1"),
        ("fetch", "QuadrupedFetch-v1"),
    ):
        ref = dm_suite.load("quadruped", task, task_kwargs={"random": 2})
        ref.reset()
        me = _env(tid)
        rng = np.random.default_rng(2)
        max_err = 0.0
        for _ in range(10):
            a = rng.uniform(-1, 1, 12).astype(np.float32)
            ts = ref.step(a)
            qpos = jnp.asarray(ref.physics.data.qpos, jnp.float32)
            qvel = jnp.asarray(ref.physics.data.qvel, jnp.float32)
            extras = {
                "act": jnp.asarray(ref.physics.data.act, jnp.float32),
                "prev_v": jnp.zeros(3, jnp.float32),
            }
            r = float(me.reward_dmc(qpos, qvel, a, extras))
            max_err = max(max_err, abs(r - float(ts.reward)))
        assert max_err < 0.05, (task, max_err)


@pytest.mark.parametrize(
    "task,tid",
    [
        ("bring_ball", "ManipulatorBringBall-v1"),
        ("bring_peg", "ManipulatorBringPeg-v1"),
        ("insert_ball", "ManipulatorInsertBall-v1"),
        ("insert_peg", "ManipulatorInsertPeg-v1"),
    ],
)
def test_manipulator_reward_alignment(task, tid):
    ref = dm_suite.load("manipulator", task, task_kwargs={"random": 3})
    ref.reset()
    me = _env(tid)
    named = ref.physics.named
    tname = "target_peg" if "peg" in task else "target_ball"
    tx = float(named.model.body_pos[tname, "x"])
    tz = float(named.model.body_pos[tname, "z"])
    qw = float(named.model.body_quat[tname, "qw"])
    qy = float(named.model.body_quat[tname, "qy"])
    angle = 2 * np.arctan2(qy, qw)
    extras = {"target": jnp.asarray([tx, tz, angle], jnp.float32)}
    rng = np.random.default_rng(3)
    max_err = 0.0
    for _ in range(15):
        a = rng.uniform(-1, 1, 5).astype(np.float32)
        ts = ref.step(a)
        qpos = jnp.asarray(ref.physics.data.qpos, jnp.float32)
        qvel = jnp.asarray(ref.physics.data.qvel, jnp.float32)
        r = float(me.reward_dmc(qpos, qvel, a, extras))
        max_err = max(max_err, abs(r - float(ts.reward)))
    assert max_err < 5e-3, max_err


def test_manipulator_obs_alignment():
    ref = dm_suite.load(
        "manipulator", "bring_ball", task_kwargs={"random": 4}
    )
    ref.reset()
    me = _env("ManipulatorBringBall-v1")
    named = ref.physics.named
    tx = float(named.model.body_pos["target_ball", "x"])
    tz = float(named.model.body_pos["target_ball", "z"])
    qw = float(named.model.body_quat["target_ball", "qw"])
    qy = float(named.model.body_quat["target_ball", "qy"])
    angle = 2 * np.arctan2(qy, qw)
    extras = {"target": jnp.asarray([tx, tz, angle], jnp.float32)}
    rng = np.random.default_rng(4)
    for _ in range(3):
        a = rng.uniform(-1, 1, 5).astype(np.float32)
        ts = ref.step(a)
    qpos = jnp.asarray(ref.physics.data.qpos, jnp.float32)
    qvel = jnp.asarray(ref.physics.data.qvel, jnp.float32)
    mine = me.observe_dmc(qpos, qvel, extras)
    oracle = ts.observation
    np.testing.assert_allclose(
        np.asarray(mine["arm_pos"]), oracle["arm_pos"], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mine["arm_vel"]), oracle["arm_vel"], atol=1e-4
    )
    def _pose_close(a, b, atol):
        # (x, z, qw, qy): the quaternion half is sign-ambiguous (q ~ -q).
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        np.testing.assert_allclose(a[:2], b[:2], atol=atol)
        assert (
            np.allclose(a[2:], b[2:], atol=atol)
            or np.allclose(a[2:], -b[2:], atol=atol)
        ), (a, b)

    _pose_close(mine["hand_pos"], oracle["hand_pos"], 1e-3)
    _pose_close(mine["object_pos"], oracle["object_pos"], 1e-3)
    np.testing.assert_allclose(
        np.asarray(mine["object_vel"]), oracle["object_vel"], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mine["target_pos"]), oracle["target_pos"], atol=1e-4
    )
    assert mine["touch"].shape == oracle["touch"].shape


@pytest.mark.parametrize(
    "task,tid", [("stack_2", "StackerStack2-v1"), ("stack_4", "StackerStack4-v1")]
)
def test_stacker_reward_alignment(task, tid):
    ref = dm_suite.load("stacker", task, task_kwargs={"random": 5})
    ref.reset()
    me = _env(tid)
    named = ref.physics.named
    tx = float(named.model.body_pos["target", "x"])
    tz = float(named.model.body_pos["target", "z"])
    extras = {"target": jnp.asarray([tx, tz], jnp.float32)}
    rng = np.random.default_rng(5)
    max_err = 0.0
    for _ in range(15):
        a = rng.uniform(-1, 1, 5).astype(np.float32)
        ts = ref.step(a)
        qpos = jnp.asarray(ref.physics.data.qpos, jnp.float32)
        qvel = jnp.asarray(ref.physics.data.qvel, jnp.float32)
        r = float(me.reward_dmc(qpos, qvel, a, extras))
        max_err = max(max_err, abs(r - float(ts.reward)))
    assert max_err < 5e-3, max_err


def test_dog_partial_reward_alignment():
    """Dog: torso/pelvis/upright factors exact; touch approximated."""
    ref = dm_suite.load("dog", "stand", task_kwargs={"random": 6})
    ref.reset()
    me = _env("DogStand-v1")
    from dm_control.utils import rewards as dm_rewards

    rng = np.random.default_rng(6)
    for _ in range(5):
        a = rng.uniform(-1, 1, 38).astype(np.float32)
        ref.step(a)
    qpos = jnp.asarray(ref.physics.data.qpos, jnp.float32)
    qvel = jnp.asarray(ref.physics.data.qvel, jnp.float32)
    factors = np.asarray(me._stand_factors(qpos, qvel))
    # Oracle factors recomputed from its own physics.
    phys = ref.physics
    torso_o = dm_rewards.tolerance(
        phys.torso_pelvis_height()[0],
        bounds=(me._stand_height[0], float("inf")),
        margin=me._stand_height[0],
    )
    pelvis_o = dm_rewards.tolerance(
        phys.torso_pelvis_height()[1],
        bounds=(me._stand_height[1], float("inf")),
        margin=me._stand_height[1],
    )
    min_cos = np.cos(np.deg2rad(30))
    upright_o = dm_rewards.tolerance(
        phys.upright(),
        bounds=(min_cos, float("inf")),
        sigmoid="linear",
        margin=min_cos + 1,
        value_at_margin=0,
    )
    np.testing.assert_allclose(factors[0], torso_o, atol=2e-3)
    np.testing.assert_allclose(factors[1], pelvis_o, atol=2e-3)
    np.testing.assert_allclose(factors[2:5], upright_o, atol=2e-3)


def test_dog_obs_shapes_match_oracle():
    ref = dm_suite.load("dog", "fetch", task_kwargs={"random": 7})
    ts = ref.reset()
    me = _env("DogFetch-v1")
    import jax

    st, obs = me.reset_env(jax.random.PRNGKey(0))
    for k, v in ts.observation.items():
        key = f"obs:{k}"
        assert key in obs, f"missing obs key {k}"
        assert np.asarray(obs[key]).shape == np.asarray(v).shape, (
            k, np.asarray(obs[key]).shape, np.asarray(v).shape
        )


def test_dmc_51_ids():
    """Full dm_control suite id parity (make_test.py:367-420)."""
    ref = [
        "AcrobotSwingup-v1", "AcrobotSwingupSparse-v1", "BallInCupCatch-v1",
        "CartpoleBalance-v1", "CartpoleBalanceSparse-v1", "CartpoleSwingup-v1",
        "CartpoleSwingupSparse-v1", "CartpoleThreePoles-v1",
        "CartpoleTwoPoles-v1", "CheetahRun-v1", "DogFetch-v1", "DogRun-v1",
        "DogStand-v1", "DogTrot-v1", "DogWalk-v1", "FingerSpin-v1",
        "FingerTurnEasy-v1", "FingerTurnHard-v1", "FishSwim-v1",
        "FishUpright-v1", "HopperHop-v1", "HopperStand-v1", "HumanoidRun-v1",
        "HumanoidRunPureState-v1", "HumanoidStand-v1", "HumanoidWalk-v1",
        "HumanoidCMURun-v1", "HumanoidCMUStand-v1", "HumanoidCMUWalk-v1",
        "LqrLqr21-v1", "LqrLqr62-v1", "ManipulatorBringBall-v1",
        "ManipulatorBringPeg-v1", "ManipulatorInsertBall-v1",
        "ManipulatorInsertPeg-v1", "PendulumSwingup-v1", "PointMassEasy-v1",
        "PointMassHard-v1", "QuadrupedEscape-v1", "QuadrupedFetch-v1",
        "QuadrupedRun-v1", "QuadrupedWalk-v1", "ReacherEasy-v1",
        "ReacherHard-v1", "StackerStack2-v1", "StackerStack4-v1",
        "SwimmerSwimmer6-v1", "SwimmerSwimmer15-v1", "WalkerRun-v1",
        "WalkerStand-v1", "WalkerWalk-v1",
    ]
    assert len(ref) == 51
    ids = set(envpool_tpu.list_all_envs())
    missing = [t for t in ref if t not in ids]
    assert not missing, missing
