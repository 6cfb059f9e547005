"""MyoSuite family tests (20 core ids, muscle-control structure)."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.core.registry import registry


def test_ids_registered():
    ids = [i for i in envpool_tpu.list_all_envs() if i.startswith("myo")]
    assert len(ids) == 20
    for t in ("myoHandPoseRandom-v0", "myoElbowPose1D6MFixed-v0",
              "myoLegWalk-v0"):
        assert t in ids


def test_muscle_activation_filter():
    env = registry._env("myoFingerPoseFixed-v0", num_envs=1)
    key = jax.random.PRNGKey(0)
    st, _ = env.reset_env(key)
    out = env.step_env(st, jnp.ones(5, jnp.float32), key)
    act1 = np.asarray(out.state["act"])
    # Activations move toward 1.0 but are filtered (not instant).
    assert (act1 > 0.5).all() and (act1 < 1.0 + 1e-6).all()
    out2 = env.step_env(dict(out.state), jnp.ones(5, jnp.float32), key)
    assert (np.asarray(out2.state["act"]) >= act1 - 1e-6).all()


def test_pose_task_solvable_at_target():
    env = registry._env("myoFingerPoseRandom-v0", num_envs=1)
    key = jax.random.PRNGKey(1)
    st, _ = env.reset_env(key)
    st = dict(st)
    st["q"] = st["target"]
    out = env.step_env(st, jnp.zeros(5, jnp.float32), key)
    # Near-zero pose error → solved bonus makes reward positive.
    assert float(out.obs["info:solved"]) in (0.0, 1.0)
    assert float(out.reward) > -0.5


def test_fixed_vs_random_targets():
    import jax

    fixed = registry._env("myoHandPoseFixed-v0", num_envs=1)
    t1 = fixed.reset_env(jax.random.PRNGKey(0))[0]["target"]
    t2 = fixed.reset_env(jax.random.PRNGKey(9))[0]["target"]
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2))
    rand = registry._env("myoHandPoseRandom-v0", num_envs=1)
    r1 = rand.reset_env(jax.random.PRNGKey(0))[0]["target"]
    r2 = rand.reset_env(jax.random.PRNGKey(9))[0]["target"]
    assert np.abs(np.asarray(r1) - np.asarray(r2)).max() > 1e-3


def test_leg_walk_rewards_speed():
    env = registry._env("myoLegWalk-v0", num_envs=1)
    key = jax.random.PRNGKey(2)
    st, _ = env.reset_env(key)
    # Oscillating muscle drive produces speed > still.
    r_still = 0.0
    r_move = 0.0
    st_a = dict(st)
    st_b = dict(st)
    for t in range(20):
        out = env.step_env(st_a, jnp.full(80, -1.0, jnp.float32), key)
        st_a = dict(out.state)
        r_still += float(out.reward)
        drive = jnp.asarray(
            np.sin(t * 0.8 + np.arange(80)) , jnp.float32
        )
        out = env.step_env(st_b, drive, key)
        st_b = dict(out.state)
        r_move += float(out.reward)
    assert r_move > r_still


def test_muscle_activation_dynamics_quantitative():
    """Quantitative fidelity bound: activations follow MuJoCo's muscle
    model — asymmetric time constants (tau_act=10ms scaled by
    0.5+1.5·act, tau_deact=40ms inversely scaled), integrated exactly
    over the 20 ms control step.  Closed-form envelope check."""
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from envpool_tpu.core.registry import registry

    env = registry._env("myoHandPoseFixed-v0", num_envs=1)
    st, _ = env.reset_env(jax.random.PRNGKey(0))
    nm = env.nm

    # Full excitation from rest: act after one step = closed form with
    # tau = 0.01·(0.5 + 1.5·0) = 0.005.
    out = env.step_env(st, jnp.ones(nm, jnp.float32), jax.random.PRNGKey(0))
    want_rise = 1.0 - math.exp(-0.02 / 0.005)
    np.testing.assert_allclose(
        np.asarray(out.state["act"]), want_rise, rtol=1e-5
    )

    # Deactivation from full: tau = 0.04/(0.5+1.5·1) = 0.02 → slower
    # fall than rise (the published asymmetry).
    st_full = dict(out.state)
    st_full["act"] = jnp.ones(nm, jnp.float32)
    out2 = env.step_env(
        st_full, -jnp.ones(nm, jnp.float32), jax.random.PRNGKey(1)
    )
    want_fall = math.exp(-0.02 / 0.02)
    np.testing.assert_allclose(
        np.asarray(out2.state["act"]), want_fall, rtol=1e-5
    )
    assert (1.0 - want_fall) < want_rise  # deactivation is slower
