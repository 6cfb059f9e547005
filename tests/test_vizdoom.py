"""Vizdoom family: id parity, action-set builder, reward machinery."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.core.registry import registry
from envpool_tpu.envs.vizdoom import buttons as B
from envpool_tpu.envs.vizdoom.buttons import build_action_set
from envpool_tpu.envs.vizdoom.doom_env import GV_NAMES, shaped_reward

# CamelCased cfg stems of the 20 cfg/wad pairs the reference packages
# (envpool/vizdoom/BUILD:29-78) + the custom slot.
REF_IDS = [
    "Basic-v1", "BasicAudio-v1", "BasicNotifications-v1", "Cig-v1",
    "D1Basic-v1", "D2Navigation-v1", "D3Battle-v1", "D4Battle2-v1",
    "DeadlyCorridor-v1", "Deathmatch-v1", "DefendTheCenter-v1",
    "DefendTheLine-v1", "HealthGathering-v1", "HealthGatheringSupreme-v1",
    "MultiDuel-v1", "MyWayHome-v1", "PredictPosition-v1", "RocketBasic-v1",
    "SimplerBasic-v1", "TakeCover-v1", "VizdoomCustom-v1",
]


def test_id_parity():
    ids = set(envpool_tpu.list_all_envs())
    missing = [t for t in REF_IDS if t not in ids]
    assert not missing, missing


def test_action_set_sizes():
    # D1Basic buttons (pair + attack) → 6 combined actions, the value the
    # reference asserts (vizdoom_test.py:99 `action_space.n == 6`).
    a = build_action_set([B.MOVE_LEFT, B.MOVE_RIGHT, B.ATTACK])
    assert a.shape == (6, 3)
    # all rows distinct, pair never both active
    assert len({tuple(r) for r in a.tolist()}) == 6
    ml, mr = 0, 1
    assert not np.any((a[:, ml] > 0) & (a[:, mr] > 0))
    # force_speed pins SPEED on and halves the product
    bl = [B.MOVE_FORWARD, B.ATTACK, B.SPEED]
    assert len(build_action_set(bl)) == 2 * len(
        build_action_set(bl, force_speed=True)
    )
    # weapon-select block adds (1 + k) choices
    bl = [B.ATTACK, B.SELECT_WEAPON2, B.SELECT_WEAPON3]
    assert len(build_action_set(bl)) == 2 * 3


def test_shaped_reward_weights():
    gvs = jnp.zeros(16)
    # KILLCOUNT +1 → +1
    r = shaped_reward(gvs.at[12].set(1.0), gvs, jnp.int32(0), 5)
    assert np.isclose(float(r), 1.0)
    # HEALTH −10 → −0.03 ; +10 → +0.05
    r = shaped_reward(gvs.at[10].set(-10.0), gvs, jnp.int32(0), 5)
    assert np.isclose(float(r), -0.03, atol=1e-6)
    r = shaped_reward(gvs.at[10].set(10.0), gvs, jnp.int32(0), 5)
    assert np.isclose(float(r), 0.05, atol=1e-6)
    # DEATHCOUNT +1 → −0.75
    r = shaped_reward(gvs.at[8].set(1.0), gvs, jnp.int32(0), 5)
    assert np.isclose(float(r), -0.75)
    # HITCOUNT delta capped at 5
    r = shaped_reward(gvs.at[11].set(50.0), gvs, jnp.int32(0), 5)
    assert np.isclose(float(r), 0.05, atol=1e-6)
    # DAMAGECOUNT delta capped at 200
    r = shaped_reward(gvs.at[7].set(1000.0), gvs, jnp.int32(0), 5)
    assert np.isclose(float(r), 0.6, atol=1e-6)
    # weapon-duration bonus: held ≥5 steps with ammo
    held = gvs.at[13].set(3.0).at[14].set(8.0)
    r = shaped_reward(held, held, jnp.int32(5), 5)
    assert np.isclose(float(r), 0.001, atol=1e-7)


def test_basic_kill_ends_episode():
    env = registry._env("Basic-v1", num_envs=1, use_combined_action=True)
    st, obs = env.reset_env(jax.random.PRNGKey(0))
    assert obs["obs"].shape == (12, 84, 84)
    g = dict(st["g"])
    mx, my = np.asarray(g["mxy"])[0]
    g["ang"] = jnp.float32(
        np.arctan2(my - float(g["py"]), mx - float(g["px"]))
    )
    st = dict(st)
    st["g"] = g
    A = np.asarray(env.action_set)
    atk = int(
        np.argmax((A.sum(1) == 1) & (A[:, env.buttons.index(B.ATTACK)] == 1))
    )
    tot, done = 0.0, False
    for t in range(5):
        out = env.step_env(st, jnp.int32(atk), jax.random.PRNGKey(t))
        st, tot = out.state, tot + float(out.reward)
        if bool(out.terminated):
            done = True
            break
    assert done and tot > 1.0  # KILLCOUNT=1 dominates
    assert float(out.obs["info:KILLCOUNT"]) == 1.0


def test_health_gathering_drain_reward():
    env = registry._env(
        "HealthGathering-v1", num_envs=1, use_combined_action=True
    )
    st, _ = env.reset_env(jax.random.PRNGKey(3))
    out = env.step_env(st, jnp.int32(0), jax.random.PRNGKey(0))
    # idle step: HEALTH −1.75 → reward −1.75 * 0.003 (reference weight)
    assert np.isclose(float(out.reward), -1.75 * 0.003, atol=1e-5)


def test_goal_scenarios_terminate():
    for tid, goal in (("MyWayHome-v1", (4.0, 4.3)),
                      ("DeadlyCorridor-v1", (20.5, 11.5))):
        env = registry._env(tid, num_envs=1, use_combined_action=True)
        st, _ = env.reset_env(jax.random.PRNGKey(1))
        g = dict(st["g"])
        g["px"], g["py"] = jnp.float32(goal[0]), jnp.float32(goal[1])
        st = dict(st)
        st["g"] = g
        out = env.step_env(st, jnp.int32(0), jax.random.PRNGKey(0))
        assert bool(out.terminated) and float(out.obs["info:USER2"]) == 1.0


def test_take_cover_death():
    env = registry._env("TakeCover-v1", num_envs=1, use_combined_action=True)
    st, _ = env.reset_env(jax.random.PRNGKey(4))
    hp = 100.0
    for t in range(150):
        out = env.step_env(st, jnp.int32(0), jax.random.PRNGKey(t))
        st = out.state
        hp = float(out.obs["info:HEALTH"])
        if bool(out.terminated):
            break
    assert hp == 0.0 and bool(out.terminated)


def test_info_surface_and_pool():
    env = envpool_tpu.make(
        "DefendTheCenter-v1", env_type="gymnasium", num_envs=3, seed=0,
        use_combined_action=True, max_episode_steps=40,
    )
    obs, info = env.reset()
    assert obs.shape == (3, 12, 84, 84) and obs.dtype == np.uint8
    for name in GV_NAMES:
        assert name in info, name
    rng = np.random.default_rng(0)
    n = env.action_space.n
    for _ in range(10):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, n, 3).astype(np.int32)
        )
    assert np.isfinite(rew).all()
    assert (info["AMMO2"] <= 26).all()  # limited ammo scenario


def test_custom_img_size():
    # reference test_hg runs 64x48 frames (vizdoom_test.py:77-106)
    env = envpool_tpu.make(
        "D1Basic-v1", env_type="gymnasium", num_envs=2, seed=0,
        use_combined_action=True, img_width=64, img_height=48,
    )
    obs, _ = env.reset()
    assert obs.shape == (2, 4, 48, 64)


def _build_wad(path, verts, lines):
    import struct

    body = b""
    lumps = []
    ofs = 12  # header size

    def add(name, payload):
        nonlocal body, ofs
        lumps.append((ofs, len(payload), name))
        body += payload
        ofs += len(payload)

    add("MAP01", b"")
    add("THINGS", b"")
    add("LINEDEFS", b"".join(struct.pack("<7h", *ln) for ln in lines))
    add("VERTEXES", b"".join(struct.pack("<2h", *v) for v in verts))
    directory = b"".join(
        struct.pack("<ii8s", o, sz, n.encode().ljust(8, b"\x00"))
        for o, sz, n in lumps
    )
    path.write_bytes(
        struct.pack("<4sii", b"PWAD", len(lumps), ofs) + body + directory
    )


def test_wad_geometry_parsing(tmp_path):
    """Parse a synthesized PWAD (square room + inner dividing wall) and
    check the raycaster grid reflects its linedefs."""
    from envpool_tpu.envs.vizdoom.wad import parse_wad_map, wad_to_grid

    # 512x512 room (one-sided borders) + a blocking divider with a gap
    # on the right.
    verts = [(0, 0), (512, 0), (512, 512), (0, 512), (0, 256), (384, 256)]
    lines = [
        (0, 1, 0, 0, 0, 0, -1),
        (1, 2, 0, 0, 0, 0, -1),
        (2, 3, 0, 0, 0, 0, -1),
        (3, 0, 0, 0, 0, 0, -1),
        (4, 5, 1, 0, 0, 0, 1),  # two-sided, ML_BLOCKING
    ]
    path = tmp_path / "scenario.wad"
    _build_wad(path, verts, lines)

    vs, segs = parse_wad_map(str(path))
    assert len(vs) == 6
    assert len(segs) == 5  # 4 borders + 1 blocking divider

    g = 24
    grid = wad_to_grid(str(path), g=g)
    assert (grid[3:10, 3:-3] == 0).any()   # free below the divider
    assert (grid[-8:-3, 3:-3] == 0).any()  # free above it
    mid = int((256 / 512) * (g - 2) + 1 - 1e-6)
    assert (grid[mid, 2:6] > 0).all()      # divider walls on the left
    assert (grid[mid, -5:-2] == 0).any()   # gap on the right


def test_wad_path_replaces_layout(tmp_path):
    """make(..., wad_path=...) drives the env over the parsed geometry."""
    import numpy as np

    import envpool_tpu

    verts = [(0, 0), (512, 0), (512, 512), (0, 512)]
    lines = [(0, 1, 0, 0, 0, 0, -1), (1, 2, 0, 0, 0, 0, -1),
             (2, 3, 0, 0, 0, 0, -1), (3, 0, 0, 0, 0, 0, -1)]
    path = tmp_path / "room.wad"
    _build_wad(path, verts, lines)

    env = envpool_tpu.make(
        "Basic-v1", env_type="gymnasium", num_envs=2, seed=0,
        wad_path=str(path), use_combined_action=True,
    )
    obs, _ = env.reset()
    for t in range(4):
        obs, r, te, tr, info = env.step(
            np.random.default_rng(t).integers(
                0, env.action_space.n, 2
            ).astype(np.int32)
        )
    assert np.isfinite(np.asarray(r)).all()
