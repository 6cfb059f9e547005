"""PPO on CartPole — fully on-device training demo.

The analog of the reference's ``examples/ppo_atari/ppo.py`` and
``examples/xla_step.py``: the env pool, rollout, GAE, and PPO updates all
compile into one jitted train step; nothing crosses the host boundary
except logging.

Run: ``python examples/ppo_cartpole.py`` (~30 s on one chip; solves
CartPole — mean episode return climbs toward 500).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import envpool_tpu  # noqa: E402
from envpool_tpu.core.engine import Engine  # noqa: E402

NUM_ENVS = 1024
ROLLOUT = 64
EPOCHS = 60
UPDATES_PER_ROLLOUT = 8
LR = 1e-3
GAMMA = 0.99
LAM = 0.95
CLIP = 0.2


def mlp_init(key, sizes):
    params = []
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        k1, key = jax.random.split(key)
        params.append(
            {
                "w": jax.random.normal(k1, (fan_in, fan_out)) * jnp.sqrt(
                    2.0 / fan_in
                ),
                "b": jnp.zeros(fan_out),
            }
        )
    return params


def mlp(params, x):
    for layer in params[:-1]:
        x = jnp.tanh(x @ layer["w"] + layer["b"])
    return x @ params[-1]["w"] + params[-1]["b"]


def main() -> None:
    env = envpool_tpu.make_spec("CartPole-v1", num_envs=NUM_ENVS, seed=0).env
    engine = Engine.shared(env)
    key = jax.random.PRNGKey(0)
    k1, k2, key = jax.random.split(key, 3)
    params = {
        "pi": mlp_init(k1, [4, 64, 64, 2]),
        "v": mlp_init(k2, [4, 64, 64, 1]),
    }

    def rollout(ps, obs0, params, key):
        def body(carry, _):
            ps, obs, k = carry
            k, sub = jax.random.split(k)
            logits = mlp(params["pi"], obs)
            action = jax.random.categorical(sub, logits)
            logp = jax.nn.log_softmax(logits)[
                jnp.arange(NUM_ENVS), action
            ]
            value = mlp(params["v"], obs)[:, 0]
            ps, ts = engine._step(ps, {"action": action.astype(jnp.int32)})
            out = (obs, action, logp, value, ts["reward"], ts["done"])
            return (ps, ts["obs"], k), out

        (ps, last_obs, _), traj = jax.lax.scan(
            body, (ps, obs0, key), length=ROLLOUT
        )
        last_value = mlp(params["v"], last_obs)[:, 0]
        return ps, last_obs, traj, last_value

    def gae(rewards, values, dones, last_value):
        def body(carry, x):
            adv = carry
            r, v, d, v_next = x
            delta = r + GAMMA * v_next * (1 - d) - v
            adv = delta + GAMMA * LAM * (1 - d) * adv
            return adv, adv

        values_next = jnp.concatenate(
            [values[1:], last_value[None]], axis=0
        )
        _, advs = jax.lax.scan(
            body,
            jnp.zeros_like(last_value),
            (rewards, values, dones.astype(jnp.float32), values_next),
            reverse=True,
        )
        return advs

    @jax.jit
    def train_step(ps, obs0, params, key):
        key, k1 = jax.random.split(key)
        ps, last_obs, (obs, action, logp_old, value, reward, done), last_value = (
            rollout(ps, obs0, params, k1)
        )
        advs = gae(reward, value, done, last_value)
        returns = advs + value
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)
        obs_f = obs.reshape(-1, 4)
        act_f = action.reshape(-1)
        logp_f = logp_old.reshape(-1)
        adv_f = advs.reshape(-1)
        ret_f = returns.reshape(-1)

        def loss_fn(params):
            logits = mlp(params["pi"], obs_f)
            logp = jax.nn.log_softmax(logits)[
                jnp.arange(len(act_f)), act_f
            ]
            ratio = jnp.exp(logp - logp_f)
            pg = -jnp.minimum(
                ratio * adv_f,
                jnp.clip(ratio, 1 - CLIP, 1 + CLIP) * adv_f,
            ).mean()
            v = mlp(params["v"], obs_f)[:, 0]
            v_loss = jnp.mean((v - ret_f) ** 2)
            ent = -jnp.mean(
                jnp.sum(
                    jax.nn.softmax(logits) * jax.nn.log_softmax(logits), -1
                )
            )
            return pg + 0.5 * v_loss - 0.01 * ent

        def update(params, _):
            grads = jax.grad(loss_fn)(params)
            params = jax.tree_util.tree_map(
                lambda p, g: p - LR * g, params, grads
            )
            return params, None

        params, _ = jax.lax.scan(
            update, params, None, length=UPDATES_PER_ROLLOUT
        )
        ep_len = jnp.sum(reward) / jnp.maximum(jnp.sum(done), 1)
        return ps, last_obs, params, key, ep_len

    ps = engine.init()
    ps, ts0 = engine.reset(ps, jnp.ones(NUM_ENVS, jnp.bool_))
    obs = ts0["obs"]
    t0 = time.time()
    for epoch in range(EPOCHS):
        ps, obs, params, key, ep_len = train_step(ps, obs, params, key)
        if epoch % 5 == 0 or epoch == EPOCHS - 1:
            print(
                f"epoch {epoch:3d}  mean steps/episode ≈ "
                f"{float(ep_len):7.1f}  ({time.time() - t0:.1f}s)"
            )
    print("done;", NUM_ENVS * ROLLOUT * EPOCHS, "env steps")


if __name__ == "__main__":
    main()
