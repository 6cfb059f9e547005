"""Vectorized 2D football core with SMM observations.

Pitch coordinates follow GRF: x in [-1, 1] (left team attacks +x),
y in [-0.42, 0.42].  Up to 11 players per team with a validity mask
(scenarios place fewer).  The controlled player is the left-team player
nearest to the ball (GRF single-agent convention).

Action set (kDefaultActionSet order, gfootball_common.h:46):
0 idle, 1-8 move (L TL T TR R BR B BL), 9 long pass, 10 high pass,
11 short pass, 12 shot, 13 sprint, 14 release direction, 15 release
sprint, 16 sliding, 17 dribble, 18 release dribble.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

SMM_H, SMM_W, SMM_C = 72, 96, 4
N_ACTIONS = 19
_MAXP = 11
_PITCH_X, _PITCH_Y = 1.0, 0.42
_GOAL_HALF = 0.044 * 2  # goal half-width in y
_SPEED = 0.012
_SPRINT = 1.5
_BALL_DRAG = 0.95
_DIRS = np.asarray(
    [
        (0.0, 0.0),    # idle placeholder (unused index 0)
        (-1, 0), (-1, 1), (0, 1), (1, 1),
        (1, 0), (1, -1), (0, -1), (-1, -1),
    ],
    np.float32,
)
_DIRS[1:] /= np.linalg.norm(_DIRS[1:], axis=1, keepdims=True)

# Scenario definitions: (left xy list, right xy list, difficulty,
# has_keeper_right).  Positions in pitch coords; keeper at x=±0.99.
def _line(n, x, ys=0.35):
    return [(x, y) for y in np.linspace(-ys, ys, n)]


_FULL_LEFT = [(-0.99, 0.0)] + _line(4, -0.6) + _line(4, -0.3) + _line(2, -0.1, 0.15)
_FULL_RIGHT = [(0.99, 0.0)] + _line(4, 0.6) + _line(4, 0.3) + _line(2, 0.1, 0.15)

SCENARIOS = {
    "11_vs_11_competition": (_FULL_LEFT, _FULL_RIGHT, 1.0),
    "11_vs_11_easy_stochastic": (_FULL_LEFT, _FULL_RIGHT, 0.6),
    "11_vs_11_hard_stochastic": (_FULL_LEFT, _FULL_RIGHT, 1.2),
    "11_vs_11_kaggle": (_FULL_LEFT, _FULL_RIGHT, 1.0),
    "11_vs_11_stochastic": (_FULL_LEFT, _FULL_RIGHT, 1.0),
    "1_vs_1_easy": ([(-0.4, 0.0)], [(0.99, 0.0)], 0.5),
    "5_vs_5": (
        [(-0.99, 0.0)] + _line(2, -0.5, 0.2) + _line(2, -0.2, 0.2),
        [(0.99, 0.0)] + _line(2, 0.5, 0.2) + _line(2, 0.2, 0.2),
        1.0,
    ),
    "academy_3_vs_1_with_keeper": (
        [(-0.1, 0.0), (0.6, 0.2), (0.6, -0.2)],
        [(0.99, 0.0), (0.75, 0.0)],
        0.8,
    ),
    "academy_corner": (
        [(0.99, 0.41), (0.8, 0.2), (0.7, 0.0), (0.6, -0.2)],
        [(0.99, 0.0), (0.85, 0.1), (0.85, -0.1), (0.8, 0.0)],
        0.8,
    ),
    "academy_counterattack_easy": (
        [(0.0, 0.0), (0.2, 0.2), (0.2, -0.2), (-0.2, 0.0)],
        [(0.99, 0.0), (0.5, 0.1)],
        0.6,
    ),
    "academy_counterattack_hard": (
        [(0.0, 0.0), (0.2, 0.2), (0.2, -0.2), (-0.2, 0.0)],
        [(0.99, 0.0), (0.5, 0.1), (0.5, -0.1), (0.4, 0.0)],
        1.0,
    ),
    "academy_empty_goal": ([(0.0, 0.0)], [], 0.0),
    "academy_empty_goal_close": ([(0.75, 0.0)], [], 0.0),
    "academy_pass_and_shoot_with_keeper": (
        [(0.7, 0.3), (0.7, -0.3)],
        [(0.99, 0.0), (0.75, 0.3)],
        0.8,
    ),
    "academy_run_pass_and_shoot_with_keeper": (
        [(0.4, 0.3), (0.7, -0.3)],
        [(0.99, 0.0), (0.6, 0.3)],
        0.8,
    ),
    "academy_run_to_score": ([(0.0, 0.0)], [], 0.0),
    "academy_run_to_score_with_keeper": (
        [(0.0, 0.0)], [(0.99, 0.0)], 0.8,
    ),
    "academy_single_goal_versus_lazy": (_FULL_LEFT, _FULL_RIGHT, 0.0),
}


class FootballEnv(TpuEnv):
    DEFAULT_CONFIG = {
        "env_name": "11_vs_11_stochastic",
        "physics_steps_per_frame": 10,
        # Observation representation, mirroring upstream GRF's kwarg:
        # "extracted" = SMM minimap (the reference's only obs,
        # gfootball_env.h:40-49); "simple115v2" = the 115-float vector
        # (positions/directions/ball/ownership/active/game-mode one-hots,
        # absent players padded with -1).
        "representation": "extracted",
    }

    def __init__(self, config):
        super().__init__(config)
        name = str(config["env_name"])
        left, right, diff = SCENARIOS[name]
        self.nl, self.nr = len(left), len(right)
        self.left0 = np.zeros((_MAXP, 2), np.float32)
        if self.nl:
            self.left0[: self.nl] = left
        self.right0 = np.zeros((_MAXP, 2), np.float32)
        if self.nr:
            self.right0[: self.nr] = right
        self.left_mask = np.arange(_MAXP) < self.nl
        self.right_mask = np.arange(_MAXP) < self.nr
        self.difficulty = float(diff)
        # Ball starts with the most advanced left player for academy
        # scenarios, at the centre for matches.
        self.kickoff_ball = (
            np.asarray([0.0, 0.0], np.float32)
            if name.startswith(("11_", "5_", "1_"))
            else np.asarray(left[0], np.float32)
        )

    # -- specs -------------------------------------------------------------

    def state_spec(self):
        if str(self.config["representation"]) == "simple115v2":
            obs_spec = ArraySpec(jnp.float32, (115,), -2.0, 2.0)
        else:
            obs_spec = ArraySpec(jnp.uint8, (SMM_H, SMM_W, SMM_C), 0, 255)
        return {
            "obs": obs_spec,
            "info:score": ArraySpec(jnp.int32, (2,)),
            "info:game_mode": ArraySpec(jnp.int32, ()),
            "info:ball_owned_team": ArraySpec(jnp.int32, (), -1, 1),
            "info:ball_owned_player": ArraySpec(jnp.int32, (), -1, 10),
            "info:steps_left": ArraySpec(jnp.int32, ()),
            "info:engine_seed": ArraySpec(jnp.int32, ()),
            "info:episode_number": ArraySpec(jnp.int32, ()),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(
                jnp.int32, (), 0, N_ACTIONS - 1, is_discrete=True
            )
        }

    # -- helpers -----------------------------------------------------------

    def _smm(self, st):
        """GRF SMM layout: 4 channels of 255-dots."""
        def channel(points, mask):
            xs = jnp.clip(
                ((points[:, 0] + _PITCH_X) / (2 * _PITCH_X) * (SMM_W - 1)),
                0, SMM_W - 1,
            ).astype(jnp.int32)
            ys = jnp.clip(
                ((points[:, 1] + _PITCH_Y) / (2 * _PITCH_Y) * (SMM_H - 1)),
                0, SMM_H - 1,
            ).astype(jnp.int32)
            img = jnp.zeros((SMM_H, SMM_W), jnp.uint8)
            return img.at[ys, xs].max(
                jnp.where(mask, 255, 0).astype(jnp.uint8)
            )

        active = st["left"][st["active"]][None, :]
        return jnp.stack(
            [
                channel(st["left"], jnp.asarray(self.left_mask)),
                channel(st["right"], jnp.asarray(self.right_mask)),
                channel(st["ball"][None, :2], jnp.ones(1, bool)),
                channel(active, jnp.ones(1, bool)),
            ],
            axis=-1,
        )

    def _simple115(self, st):
        """GRF simple115v2: [115] float32."""
        lm = jnp.asarray(self.left_mask)
        rm = jnp.asarray(self.right_mask)

        def team_block(pos, prev, mask):
            xy = jnp.where(mask[:, None], pos, -1.0)[:11]
            dxy = jnp.where(mask[:, None], pos - prev, -1.0)[:11]
            return jnp.concatenate([xy.reshape(-1), dxy.reshape(-1)])

        left = team_block(
            st["left"], st.get("left_prev", st["left"]), lm
        )
        right = team_block(
            st["right"], st.get("right_prev", st["right"]), rm
        )
        ball_prev = st.get("ball_prev", st["ball"])
        ball_pos = jnp.asarray([st["ball"][0], st["ball"][1], 0.0])
        ball_dir = jnp.asarray(
            [st["ball"][0] - ball_prev[0], st["ball"][1] - ball_prev[1], 0.0]
        )
        own = jax.nn.one_hot(st["owned_team"] + 1, 3)  # none/left/right
        active = jax.nn.one_hot(jnp.clip(st["active"], 0, 10), 11)
        game_mode = jax.nn.one_hot(0, 7)  # kGameModeNormal
        return jnp.concatenate(
            [left, right, ball_pos, ball_dir, own, active, game_mode]
        ).astype(jnp.float32)

    def _obs(self, st):
        if str(self.config["representation"]) == "simple115v2":
            main = self._simple115(st)
        else:
            main = self._smm(st)
        return {
            "obs": main,
            "info:score": st["score"],
            "info:game_mode": jnp.int32(0),
            "info:ball_owned_team": st["owned_team"],
            "info:ball_owned_player": st["owned_player"],
            "info:steps_left": jnp.int32(self.max_episode_steps)
            - st["t"],
            "info:engine_seed": jnp.int32(int(self.config["seed"])),
            "info:episode_number": st.get("ep", jnp.int32(0)),
        }

    def _kickoff(self, st):
        st = dict(st)
        st["left"] = jnp.asarray(self.left0)
        st["right"] = jnp.asarray(self.right0)
        st["ball"] = jnp.concatenate(
            [jnp.asarray(self.kickoff_ball), jnp.zeros(2, jnp.float32)]
        )
        owner = int(np.argmin(np.linalg.norm(
            self.left0[: self.nl] - self.kickoff_ball, axis=1
        ))) if self.nl else 0
        st["owned_team"] = jnp.int32(0)
        st["owned_player"] = jnp.int32(owner)
        st["active"] = jnp.int32(owner)
        return st

    def reset_env(self, key):
        st = {
            "left": jnp.asarray(self.left0),
            "right": jnp.asarray(self.right0),
            "left_prev": jnp.asarray(self.left0),
            "right_prev": jnp.asarray(self.right0),
            "ball": jnp.zeros(4, jnp.float32),  # x y vx vy
            "ball_prev": jnp.zeros(4, jnp.float32),
            "owned_team": jnp.int32(0),
            "owned_player": jnp.int32(0),
            "active": jnp.int32(0),
            "score": jnp.zeros(2, jnp.int32),
            "sprint": jnp.bool_(False),
            "t": jnp.int32(0),
            "ep": jnp.int32(0),
        }
        st = self._kickoff(st)
        return st, self._obs(st)

    def reset_env_from(self, state, key, full):
        # Keep the per-env episode counter across auto-resets
        # (info:episode_number, gfootball_env.h:243).
        st, obs = self.reset_env(key)
        ep = state["ep"] + 1
        st["ep"] = ep
        obs = dict(obs)
        obs["info:episode_number"] = ep
        return st, obs

    def step_env(self, state, action, key):
        a = jnp.clip(jnp.reshape(action, ()).astype(jnp.int32), 0, 18)
        st = dict(state)
        left, right = st["left"], st["right"]
        ball = st["ball"]
        active = st["active"]
        lm = jnp.asarray(self.left_mask)
        rm = jnp.asarray(self.right_mask)

        # Sprint toggles.
        sprint = jnp.where(
            a == 13, True, jnp.where(a == 15, False, st["sprint"])
        )
        speed = _SPEED * jnp.where(sprint, _SPRINT, 1.0)

        # Move the active player.
        is_move = (a >= 1) & (a <= 8)
        dvec = jnp.asarray(_DIRS)[jnp.clip(a, 0, 8)]
        new_active_pos = jnp.clip(
            left[active] + jnp.where(is_move, speed, 0.0) * dvec,
            jnp.asarray([-_PITCH_X, -_PITCH_Y]),
            jnp.asarray([_PITCH_X, _PITCH_Y]),
        )
        left = left.at[active].set(new_active_pos)

        we_own = (st["owned_team"] == 0) & (st["owned_player"] == active)
        # Ball carried while owned.
        ball = jnp.where(
            st["owned_team"] == 0,
            ball.at[:2].set(left[st["owned_player"]]),
            jnp.where(
                st["owned_team"] == 1,
                ball.at[:2].set(right[jnp.clip(st["owned_player"], 0, _MAXP - 1)]),
                ball,
            ),
        )

        # Passing: to the nearest teammate in the facing half (long/high
        # pass faster flight); shot: toward the goal centre.
        k1, k2 = jax.random.split(key)
        dists = jnp.linalg.norm(left - left[active][None, :], axis=1)
        dists = jnp.where(
            lm & (jnp.arange(_MAXP) != active), dists, jnp.inf
        )
        mate = jnp.argmin(dists)
        pass_vec = left[mate] - ball[:2]
        pass_dir = pass_vec / (jnp.linalg.norm(pass_vec) + 1e-6)
        goal_vec = jnp.asarray([_PITCH_X, 0.0]) - ball[:2]
        goal_dir = goal_vec / (jnp.linalg.norm(goal_vec) + 1e-6)
        is_pass = ((a == 9) | (a == 10) | (a == 11)) & we_own
        is_shot = (a == 12) & we_own
        pass_speed = jnp.where(a == 11, 0.03, 0.05)
        ball_v = jnp.where(
            is_pass,
            pass_dir * pass_speed,
            jnp.where(is_shot, goal_dir * 0.07, ball[2:]),
        )
        released = is_pass | is_shot
        owned_team = jnp.where(released, -1, st["owned_team"])
        owned_player = jnp.where(released, -1, st["owned_player"])

        # Free ball flight.
        free = owned_team == -1
        ball_xy = jnp.where(free, ball[:2] + ball_v, ball[:2])
        ball_v = jnp.where(free, ball_v * _BALL_DRAG, jnp.zeros(2))
        ball = jnp.concatenate([ball_xy, ball_v])

        # Pickup: nearest player within radius takes the free ball
        # (sliding extends the left player's reach).
        reach_l = jnp.where(a == 16, 0.03, 0.02)
        dl = jnp.where(
            lm, jnp.linalg.norm(left - ball[:2][None, :], axis=1), jnp.inf
        )
        dr = jnp.where(
            rm, jnp.linalg.norm(right - ball[:2][None, :], axis=1), jnp.inf
        )
        l_min, r_min = jnp.min(dl), jnp.min(dr)
        take_l = free & (l_min < reach_l) & (l_min <= r_min)
        take_r = free & (r_min < 0.02) & (r_min < l_min)
        owned_team = jnp.where(take_l, 0, jnp.where(take_r, 1, owned_team))
        owned_player = jnp.where(
            take_l, jnp.argmin(dl), jnp.where(take_r, jnp.argmin(dr),
                                              owned_player)
        )

        # Opponent AI: carrier runs to our goal; nearest defender chases
        # the ball; both scaled by difficulty.
        d = self.difficulty
        if self.nr > 0:
            chaser = jnp.argmin(dr)
            to_ball = ball[:2] - right[chaser]
            to_ball = to_ball / (jnp.linalg.norm(to_ball) + 1e-6)
            right = right.at[chaser].add(_SPEED * d * to_ball)
            their_carrier = jnp.clip(owned_player, 0, _MAXP - 1)
            to_goal = jnp.asarray([-_PITCH_X, 0.0]) - right[their_carrier]
            to_goal = to_goal / (jnp.linalg.norm(to_goal) + 1e-6)
            right = jnp.where(
                owned_team == 1,
                right.at[their_carrier].add(_SPEED * d * to_goal),
                right,
            )
            # Opponent steals when touching our carrier.
            steal = (
                (owned_team == 0)
                & (
                    jnp.min(
                        jnp.where(
                            rm,
                            jnp.linalg.norm(
                                right - ball[:2][None, :], axis=1
                            ),
                            jnp.inf,
                        )
                    )
                    < 0.015 * d
                )
            )
            owned_team = jnp.where(steal, 1, owned_team)
            owned_player = jnp.where(
                steal,
                jnp.argmin(
                    jnp.where(
                        rm,
                        jnp.linalg.norm(right - ball[:2][None, :], axis=1),
                        jnp.inf,
                    )
                ),
                owned_player,
            )

        # Goals.
        in_goal_y = jnp.abs(ball[1]) < _GOAL_HALF
        we_score = (ball[0] >= _PITCH_X - 0.005) & in_goal_y
        they_score = (ball[0] <= -_PITCH_X + 0.005) & in_goal_y
        score = st["score"] + jnp.stack(
            [we_score.astype(jnp.int32), they_score.astype(jnp.int32)]
        )
        reward = we_score.astype(jnp.float32) - they_score.astype(jnp.float32)

        st2 = {
            "left": left,
            "right": right,
            "left_prev": state["left"],
            "right_prev": state["right"],
            "ball": ball,
            "ball_prev": state["ball"],
            "owned_team": owned_team,
            "owned_player": owned_player,
            "active": active,
            "score": score,
            "sprint": sprint,
            "t": st["t"] + 1,
            "ep": st["ep"],
        }
        # Kickoff after a goal.
        scored = we_score | they_score
        fresh = self._kickoff(dict(st2))
        st2 = {
            k: jnp.where(scored, fresh[k], st2[k]) if k in fresh else st2[k]
            for k in st2
        }
        # Active player: nearest left player to the ball.
        dl2 = jnp.where(
            lm,
            jnp.linalg.norm(st2["left"] - st2["ball"][:2][None, :], axis=1),
            jnp.inf,
        )
        st2["active"] = jnp.argmin(dl2).astype(jnp.int32)

        # Academy scenarios end on any goal or possession loss to the
        # right team reaching... keep: end on goal for academy.
        academy = self.nl <= 4 and not self.max_episode_steps > 500
        terminated = scored if academy else jnp.bool_(False)
        return EnvOut(
            state=st2,
            obs=self._obs(st2),
            reward=reward,
            terminated=jnp.asarray(terminated, jnp.bool_),
        )
