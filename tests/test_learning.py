"""Learning ("pretrain"-analog) test: policies trained THROUGH the pool
reach known reward.

The reference's pretrain tests load frozen weights and assert the policy
still scores through EnvPool (``atari/atari_pretrain_test.py:90-100``,
``vizdoom/vizdoom_pretrain_test.py``) — an end-to-end check that
wrapper/stepping semantics support real learning.  No pretrained
checkpoints ship in-image, so the analog trains from scratch: a
cross-entropy-method linear policy on CartPole, one candidate policy per
env row, everything inside one jitted evaluation program.  CEM solves
CartPole in a few generations iff obs/reward/auto-reset plumbing is
correct end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.core.engine import Engine

POP = 64         # candidate policies == env rows
STEPS = 200
ELITE = 8
GENS = 8


def test_cem_solves_cartpole():
    env = envpool_tpu.make_spec("CartPole-v1", num_envs=POP, seed=0).env
    engine = Engine.shared(env)
    ps0 = engine.init()
    ps0, ts0 = engine.reset(ps0, jnp.ones(POP, jnp.bool_))
    obs0 = ts0["obs"]

    @jax.jit
    def fitness(theta):
        """theta [POP, 2, 4] → summed reward over STEPS per candidate."""

        def body(carry, _):
            ps, obs = carry
            act = jnp.argmax(
                jnp.einsum("eao,eo->ea", theta, obs), -1
            ).astype(jnp.int32)
            ps, ts = engine._step(ps, {"action": act})
            return (ps, ts["obs"]), ts["reward"]

        (_, _), rews = jax.lax.scan(body, (ps0, obs0), length=STEPS)
        return rews.sum(0)  # [POP]

    key = jax.random.PRNGKey(0)
    mu = jnp.zeros((2, 4))
    sigma = jnp.ones((2, 4))
    first_best = None
    best = 0.0
    for g in range(GENS):
        key, k = jax.random.split(key)
        theta = mu + sigma * jax.random.normal(k, (POP, 2, 4))
        fit = fitness(theta)
        elite = theta[jnp.argsort(-fit)[:ELITE]]
        mu = elite.mean(0)
        sigma = elite.std(0) + 0.02
        best = float(fit.max())
        if first_best is None:
            first_best = best
        if best >= STEPS - 1:
            break
    # A correct pool lets CEM reach a full-length episode (auto-reset
    # means a perfect policy scores ~STEPS reward over the window).
    assert best >= 150.0, (first_best, best)
    assert best > first_best * 0.99  # no degradation across generations
