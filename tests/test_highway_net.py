"""Highway lane-network scenarios: semantic tests.

Strategy mirrors the reference's per-family behavioral tests
(``envpool/highway/highway_official_coverage_test.py``): obs-spec
shapes, scripted-rollout invariants (route following, IDM braking
behind the merge obstacle, intersection arrival, racetrack lane
centering), and reward-formula checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.envs.highway.net_scenarios import _pack_scenario
from envpool_tpu.envs.highway import net_tasks
from envpool_tpu.envs.highway.network import lane_local

NEW_IDS = {
    "Merge-v0": (5, 5),
    "Exit-v0": (15, 7),
    "TwoWay-v0": (3, 3, 5),
    "UTurn-v0": (3, 3, 16),
    "Roundabout-v0": (5, 5),
    "Intersection-v0": (15, 7),
    "Intersection-v1": (5, 8),
    "Racetrack-v0": (2, 12, 12),
    "RacetrackLarge-v0": (2, 12, 12),
    "RacetrackOval-v0": (2, 12, 12),
}


@pytest.mark.parametrize("tid", sorted(NEW_IDS))
def test_make_reset_step(tid):
    env = envpool_tpu.make_gymnasium(tid, num_envs=2, seed=7)
    obs, info = env.reset()
    assert np.asarray(obs).shape == (2,) + NEW_IDS[tid]
    a = np.stack([env.action_space.sample() for _ in range(2)])
    obs, rew, term, trunc, info = env.step(a)
    assert np.asarray(obs).shape == (2,) + NEW_IDS[tid]
    assert np.all(np.isfinite(np.asarray(rew)))
    assert "speed" in info and "crashed" in info


class _Out:
    def __init__(self, state, obs, reward, terminated):
        self.state, self.obs = state, obs
        self.reward, self.terminated = reward, terminated


def _stepper(env):
    @jax.jit
    def step(st, a, key):
        out = env.step_env(st, a, key)
        return out.state, out.obs, out.reward, out.terminated

    return lambda st, a, key: _Out(*step(st, a, key))


def _rollout(env_cls, actions, seed=0, **cfg):
    env = env_cls.from_config(**cfg)
    key = jax.random.PRNGKey(seed)
    st, obs = jax.jit(env.reset_env)(key)
    step = _stepper(env)
    outs = []
    for a in actions:
        out = step(st, jnp.asarray(a), key)
        st = out.state
        outs.append(out)
    return st, outs


def test_merge_ramp_vehicle_merges():
    """The ramp IDM car follows j->k->b, brakes (speed-limit clip +
    obstacle gap), and MOBIL-merges onto the highway lanes
    (official_task.cc:152-157 + ActIDM/ChangeLanePolicy)."""
    T, veh, extras = _pack_scenario("merge")
    st, outs = _rollout(net_tasks.MergeEnv, [1] * 12)
    # Row 4 = the ramp vehicle: starts at y=14.5 on the ramp, ends on a
    # highway lane (y <= 6), having braked below its 20 m/s ramp speed.
    assert float(veh["pos0"][4, 1]) > 14.0
    assert float(st["pos"][4, 1]) < 6.0
    min_speed = min(float(o.state["speed"][4]) for o in outs)
    assert min_speed < 19.5
    assert not bool(st["crashed"][4])


def test_merge_reward_range():
    _, outs = _rollout(net_tasks.MergeEnv, [1, 3, 0, 2, 4])
    for out in outs:
        assert 0.0 <= float(out.reward) <= 1.0 + 1e-6


def test_two_way_reward_formula():
    st, outs = _rollout(net_tasks.TwoWayEnv, [1, 1])
    T, _, _ = _pack_scenario("two_way")
    lane0 = int(st["lane"][0])
    n = max(int(T["seg_count"][lane0]) - 1, 1)
    hs = int(st["speed_index"]) / 2.0
    ll = (int(T["seg_count"][lane0]) - 1
          - int(T["lane_id"][int(st["target_lane"][0])])) / n
    assert float(outs[-1].reward) == pytest.approx(0.8 * hs + 0.2 * ll,
                                                   abs=1e-5)
    # TTC grid bounded in [0, 1]; oncoming traffic appears somewhere.
    grid = np.asarray(outs[-1].obs["obs"])
    assert grid.shape == (3, 3, 5)
    assert grid.min() >= 0.0 and grid.max() <= 1.0


def test_u_turn_route_following():
    """IDLE ego follows its planned route a->b->c->d around the turn."""
    T, veh, extras = _pack_scenario("u_turn")
    st, outs = _rollout(net_tasks.UTurnEnv, [1] * 10)
    # Traffic rows seeded on c_d keep driving toward x=0 (westbound).
    assert float(st["pos"][5, 0]) < float(veh["pos0"][5, 0])
    # The ego's target lane must have left the initial a_b lane.
    assert int(st["target_lane"][0]) != int(veh["lane"][0])


def test_exit_lane_right_reaches_exit():
    """Scripted LANE_RIGHT spam moves the ego's target lane rightward;
    the success test keys on the exit-adjacent lanes
    (native_task_env.h:1236-1244)."""
    T, veh, extras = _pack_scenario("exit")
    st, outs = _rollout(net_tasks.ExitEnv, [2] * 18,
                        simulation_frequency=5, duration=18)
    assert int(T["lane_id"][int(st["target_lane"][0])]) >= 1
    for out in outs:
        assert 0.0 <= float(out.reward) <= 1.0 + 1e-6


def test_intersection_arrival():
    """IDLE ego (target 9 m/s) crosses and arrives within 13 steps."""
    env = net_tasks.IntersectionEnv.from_config()
    key = jax.random.PRNGKey(3)
    st, _ = jax.jit(env.reset_env)(key)
    step = _stepper(env)
    arrived = False
    for _ in range(13):
        out = step(st, jnp.asarray(1), key)
        st = out.state
        if bool(out.terminated) and not bool(st["crashed"][0]):
            arrived = True
            assert float(out.reward) == pytest.approx(1.0)
            break
    assert arrived


def test_intersection_regulation_yields_traffic():
    """The regulated road sets some lower-priority vehicle's target
    speed to zero at least once (EnforceRoadRules)."""
    env = net_tasks.IntersectionEnv.from_config()
    key = jax.random.PRNGKey(11)
    st, _ = jax.jit(env.reset_env)(key)
    step = _stepper(env)
    saw_yield = False
    for _ in range(6):
        out = step(st, jnp.asarray(1), key)
        st = out.state
        saw_yield = saw_yield or bool(np.asarray(st["yielding"]).any())
    assert saw_yield


def test_racetrack_straight_centering():
    """Zero steering on the opening straight: high centering reward and
    ego cell lit in the occupancy grid."""
    st, outs = _rollout(net_tasks.RacetrackEnv, [[0.0]] * 3,
                        duration=300, policy_frequency=5)
    assert float(outs[0].reward) > 0.8
    grid = np.asarray(outs[0].obs["obs"])
    assert grid[0, 6, 6] == 1.0          # ego occupies the center cell
    assert grid[1].sum() > 10            # lane waypoints present
    assert not bool(outs[-1].terminated)


def test_roundabout_on_road_and_obs_bounds():
    st, outs = _rollout(net_tasks.RoundaboutEnv, [1] * 5)
    obs = np.asarray(outs[-1].obs["obs"])
    assert obs.shape == (5, 5)
    assert np.abs(obs).max() <= 1.0 + 1e-6
    assert not bool(st["crashed"][0])


def test_intersection_multi_agent():
    """Two MDP egos: per-player obs/reward rows (reference
    NativeMultiAgentFns, native_task_env.h:446-466)."""
    env = envpool_tpu.make_gymnasium(
        "IntersectionMultiAgent-v0", num_envs=2, seed=5)
    obs, info = env.reset()
    assert np.asarray(obs["players"]["obs"]).shape == (2, 2, 5, 5)
    for _ in range(3):
        obs, rew, term, trunc, info = env.step(np.ones((2, 2), np.int32))
    assert np.asarray(rew).shape == (2, 2)
    assert np.asarray(info["players"]["speed"]).shape == (2, 2)


def test_task_id_count_full_family():
    """Highway family now registers all 18 reference scenarios
    (envpool/highway/registration.py:29-270)."""
    ids = set(envpool_tpu.list_all_envs())
    expected = {
        "Highway-v0", "HighwayFast-v0", "Merge-v0", "Exit-v0",
        "TwoWay-v0", "UTurn-v0", "Roundabout-v0", "Intersection-v0",
        "Intersection-v1", "IntersectionMultiAgent-v0",
        "IntersectionMultiAgent-v1", "Racetrack-v0", "RacetrackLarge-v0",
        "RacetrackOval-v0", "Parking-v0", "ParkingActionRepeat-v0",
        "ParkingParked-v0", "LaneKeeping-v0",
    }
    missing = expected - ids
    assert not missing, missing
