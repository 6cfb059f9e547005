"""Toy-text oracle alignment vs the original Gymnasium implementations.

The reference validates each family by stepping EnvPool and the original
Python env in lockstep (``envpool/mujoco/gym/mujoco_gym_align_test.py``,
``envpool/toy_text/*_test.py``).  Tabular MDPs allow something stronger
than trajectory goldens: we compare against the oracle's full transition
table ``P[s][a]`` for EVERY state-action pair — deterministic transitions
must match exactly, stochastic ones must match in support and probability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

from envpool_tpu.envs.toy_text import (  # noqa: E402
    BlackjackEnv,
    CliffWalkingEnv,
    FrozenLakeEnv,
    TaxiEnv,
)


def _slip_keys():
    """PRNG keys producing slip = -1, 0, +1 from randint(key, (), -1, 2)."""
    keys = {}
    k = jax.random.PRNGKey(0)
    i = 0
    while len(keys) < 3 and i < 1000:
        k = jax.random.PRNGKey(i)
        s = int(jax.random.randint(k, (), -1, 2, jnp.int32))
        keys.setdefault(s, k)
        i += 1
    assert len(keys) == 3
    return keys


@pytest.mark.parametrize("size,map_name", [(4, "4x4"), (8, "8x8")])
def test_frozen_lake_transition_table(size: int, map_name: str) -> None:
    oracle = gymnasium.make(
        f"FrozenLake{'8x8' if size == 8 else ''}-v1", is_slippery=True
    ).unwrapped
    env = FrozenLakeEnv.from_config(num_envs=1, size=size)
    keys = _slip_keys()
    P = oracle.P
    step = env.step_env
    for s in range(size * size):
        x, y = divmod(s, size)
        # Oracle: terminal states self-loop; ours never steps from them
        # (the pool auto-resets), so only test non-terminal states.
        if P[s][0][0][1] == s and len(P[s][0]) == 1 and P[s][0][0][3]:
            continue
        state = jnp.asarray([x, y], jnp.int32)
        for a in range(4):
            # Our branches: slip -1/0/+1 applied to the action.
            got = set()
            for slip, k in keys.items():
                out = step(state, jnp.int32(a), k)
                got.add(
                    (
                        int(out.obs["obs"]),
                        float(out.reward),
                        bool(out.terminated),
                    )
                )
            want = {
                (int(ns), float(r), bool(term)) for _, ns, r, term in P[s][a]
            }
            assert got == want, (s, a, got, want)
            # All oracle branches are uniform 1/3 (possibly repeated).
            for prob, *_ in P[s][a]:
                assert abs(prob - 1.0 / 3.0) < 1e-9


def test_cliffwalking_transition_table() -> None:
    oracle = gymnasium.make("CliffWalking-v1").unwrapped
    env = CliffWalkingEnv.from_config(num_envs=1)
    step = env.step_env
    key = jax.random.PRNGKey(0)
    P = oracle.P
    for s in range(48):
        x, y = divmod(s, 12)
        if x == 3 and 0 < y < 11:
            continue  # cliff cells are never occupied
        if x == 3 and y == 11:
            continue  # terminal goal
        state = jnp.asarray([x, y], jnp.int32)
        for a in range(4):
            prob, ns, r, term = P[s][a][0]
            assert prob == 1.0
            out = step(state, jnp.int32(a), key)
            assert int(out.obs["obs"]) == ns, (s, a)
            assert float(out.reward) == r, (s, a)
            assert bool(out.terminated) == term, (s, a)


def test_taxi_transition_table() -> None:
    oracle = gymnasium.make("Taxi-v3").unwrapped
    env = TaxiEnv.from_config(num_envs=1)
    step = env.step_env
    key = jax.random.PRNGKey(0)
    P = oracle.P
    for s in range(500):
        x, y, psg, dst = oracle.decode(s)
        if psg == dst and psg < 4:
            # Gymnasium never starts with passenger already delivered;
            # such states are unreachable mid-episode too.
            pass
        state = jnp.asarray([x, y, psg, dst], jnp.int32)
        for a in range(6):
            prob, ns, r, term = P[s][a][0]
            assert prob == 1.0
            out = step(state, jnp.int32(a), key)
            assert int(out.obs["obs"]) == ns, (s, a, oracle.decode(ns))
            assert float(out.reward) == r, (s, a)
            assert bool(out.terminated) == term, (s, a)


def test_blackjack_return_distribution_matches_oracle() -> None:
    """Mean return of 'hit below 17' must match Gymnasium empirically."""
    rng = np.random.default_rng(0)
    oracle = gymnasium.make("Blackjack-v1", natural=False, sab=False)
    n_ep = 4000
    total = 0.0
    for ep in range(n_ep):
        obs, _ = oracle.reset(seed=int(rng.integers(2**31)))
        done = False
        while not done:
            act = 1 if obs[0] < 17 else 0
            obs, r, term, trunc, _ = oracle.step(act)
            done = term or trunc
        total += r
    oracle_mean = total / n_ep

    import envpool_tpu
    from envpool_tpu.core.engine import Engine

    n = 4096
    env = envpool_tpu.make_spec("Blackjack-v1", num_envs=n, seed=7).env
    engine = Engine.shared(env)

    def policy(ts, key):
        return {
            "action": (ts["obs"][:, 0] < 17).astype(jnp.int32)
        }

    run = engine.make_rollout(policy, 24, collect=True)
    ps = engine.init()
    _, traj = run(ps, jax.random.PRNGKey(1))
    rewards = np.asarray(traj["reward"])
    dones = np.asarray(traj["done"])
    ours_mean = rewards[dones].mean()
    n_done = int(dones.sum())
    assert n_done > 5000
    # Two-sample tolerance: returns are in [-1, 1] w/ std ~0.95.
    se = 0.95 * np.sqrt(1 / n_ep + 1 / n_done)
    assert abs(ours_mean - oracle_mean) < 5 * se, (ours_mean, oracle_mean)
