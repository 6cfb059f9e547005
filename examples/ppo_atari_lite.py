"""PPO on PongLite — pixel-observation training fully on device.

The analog of the reference's ``examples/ppo_atari/ppo.py`` (CleanRL-style
PPO through EnvPool): a small Nature-CNN policy over the stacked 84x84
frames, rollout + GAE + clipped updates compiled into one jitted train
step.  The env pool, the preprocessing pipeline (frame-skip max-pool,
grayscale, resize, stacking) and the learner all run on the TPU; nothing
crosses the host except logging.

Run: ``python examples/ppo_atari_lite.py`` (a few minutes on one chip;
mean episode return trends up from ~-21).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import envpool_tpu  # noqa: E402
from envpool_tpu.core.engine import Engine  # noqa: E402

NUM_ENVS = 256
ROLLOUT = 64
EPOCHS = 30
LR = 2.5e-4
GAMMA = 0.99
LAM = 0.95
CLIP = 0.1
N_ACTIONS = 6


def conv_init(key, c_in, c_out, k):
    w = jax.random.normal(key, (c_out, c_in, k, k)) * jnp.sqrt(
        2.0 / (c_in * k * k)
    )
    return {"w": w, "b": jnp.zeros(c_out)}


def conv(p, x, stride):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["b"][None, :, None, None]


def dense_init(key, n_in, n_out, scale=jnp.sqrt(2.0)):
    w = jax.random.normal(key, (n_in, n_out)) * scale / jnp.sqrt(n_in)
    return {"w": w, "b": jnp.zeros(n_out)}


def net(params, obs_u8):
    x = obs_u8.astype(jnp.float32) / 255.0          # [B, 4, 84, 84]
    x = jax.nn.relu(conv(params["c1"], x, 4))
    x = jax.nn.relu(conv(params["c2"], x, 2))
    x = jax.nn.relu(conv(params["c3"], x, 1))
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(x @ params["fc"]["w"] + params["fc"]["b"])
    logits = x @ params["pi"]["w"] + params["pi"]["b"]
    value = (x @ params["v"]["w"] + params["v"]["b"])[:, 0]
    return logits, value


def main() -> None:
    env = envpool_tpu.make_spec(
        "PongLite-v5", num_envs=NUM_ENVS, seed=0
    ).env
    engine = Engine.shared(env)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    params = {
        "c1": conv_init(ks[0], 4, 32, 8),
        "c2": conv_init(ks[1], 32, 64, 4),
        "c3": conv_init(ks[2], 64, 64, 3),
        # 84 →(8,s4) 20 →(4,s2) 9 →(3,s1) 7 → 64*7*7
        "fc": dense_init(ks[3], 64 * 7 * 7, 512),
        "pi": dense_init(ks[4], 512, N_ACTIONS, scale=0.01),
        "v": dense_init(ks[5], 512, 1, scale=1.0),
    }

    def rollout(ps, obs0, params, key):
        def body(carry, _):
            ps, obs, k = carry
            k, sub = jax.random.split(k)
            logits, value = net(params, obs)
            action = jax.random.categorical(sub, logits)
            logp = jax.nn.log_softmax(logits)[
                jnp.arange(NUM_ENVS), action
            ]
            ps, ts = engine._step(ps, {"action": action.astype(jnp.int32)})
            out = (obs, action, logp, value, ts["reward"], ts["done"])
            return (ps, ts["obs"], k), out

        (ps, last_obs, _), traj = jax.lax.scan(
            body, (ps, obs0, key), length=ROLLOUT
        )
        _, last_value = net(params, last_obs)
        return ps, last_obs, traj, last_value

    def gae(rewards, values, dones, last_value):
        def body(adv, x):
            r, v, d, v_next = x
            delta = r + GAMMA * v_next * (1 - d) - v
            adv = delta + GAMMA * LAM * (1 - d) * adv
            return adv, adv

        values_next = jnp.concatenate([values[1:], last_value[None]], 0)
        _, advs = jax.lax.scan(
            body, jnp.zeros_like(last_value),
            (rewards, values, dones.astype(jnp.float32), values_next),
            reverse=True,
        )
        return advs

    @jax.jit
    def train_step(ps, obs0, params, key):
        key, k1 = jax.random.split(key)
        ps, last_obs, (obs, act, logp_old, val, rew, done), last_v = (
            rollout(ps, obs0, params, k1)
        )
        advs = gae(rew, val, done, last_v)
        rets = advs + val
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)
        obs_f = obs.reshape(-1, *obs.shape[2:])
        act_f = act.reshape(-1)
        logp_f = logp_old.reshape(-1)
        adv_f = advs.reshape(-1)
        ret_f = rets.reshape(-1)

        def loss_fn(params):
            logits, v = net(params, obs_f)
            logp = jax.nn.log_softmax(logits)[
                jnp.arange(len(act_f)), act_f
            ]
            ratio = jnp.exp(logp - logp_f)
            pg = -jnp.minimum(
                ratio * adv_f,
                jnp.clip(ratio, 1 - CLIP, 1 + CLIP) * adv_f,
            ).mean()
            v_loss = jnp.mean((v - ret_f) ** 2)
            ent = -jnp.mean(
                jnp.sum(
                    jax.nn.softmax(logits) * jax.nn.log_softmax(logits),
                    -1,
                )
            )
            return pg + 0.5 * v_loss - 0.01 * ent

        grads = jax.grad(loss_fn)(params)
        params = jax.tree_util.tree_map(
            lambda p, g: p - LR * g, params, grads
        )
        mean_r = rew.sum(0).mean()
        return ps, last_obs, params, key, mean_r

    ps = engine.init()
    ps, ts0 = engine.reset(ps, jnp.ones(NUM_ENVS, jnp.bool_))
    obs0 = ts0["obs"]
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for ep in range(EPOCHS):
        ps, obs0, params, key, mean_r = train_step(ps, obs0, params, key)
        print(
            f"epoch {ep:3d}  mean rollout reward/env {float(mean_r):+.2f}"
            f"  ({time.time() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
