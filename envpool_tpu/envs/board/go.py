"""Go — TPU-native functional implementation (pgx-class).

Behavioral reference: the reference's pgx family registers
``Go9x9-v1 / Go13x13-v1 / Go19x19-v1`` and ``ChineseGo*-v1`` variants with
``komi=7.5`` (``envpool/pgx/registration.py:20-74``) over a native C++ Go
core (``envpool/pgx/go.h``, 2-player ``max_num_players=2``).

TPU-native design (no per-stone pointer chasing, everything fixed-shape):

- Chains are found by **iterative min-label propagation**: every stone starts
  labeled with its own flat index; a ``lax.while_loop`` repeatedly takes the
  min over same-colored 4-neighbors until fixpoint.  One pass serves both
  colors.
- Chain liberty **counts** come from a dedup-then-scatter: each empty point
  scatter-adds 1 to each *distinct* neighboring chain label (≤4 compares for
  the dedupe).
- Move legality is closed-form from chain liberties (no per-move
  simulation): an empty non-ko point is playable iff it has an empty
  neighbor, OR an adjacent opponent chain is in atari (its single liberty is
  this point → capture), OR an adjacent own chain has ≥2 liberties.
- Captures remove every opponent chain adjacent to the placed stone whose
  liberty count was 1.  Simple ko: if exactly one stone was captured by a
  lone stone whose only liberty is the captured point, that point is banned
  for one turn.
- Two consecutive passes end the game, scored by **Tromp-Taylor area**
  (stones + empty regions bordering only one color), white + komi.  The
  ``rules`` config ("pgx" | "chinese") is accepted; both use area scoring
  here (they agree except for exotic superko situations, which simple ko
  does not distinguish).

State carries the chain labels/liberties of the current board so each step
runs exactly one labeling pass (legality for the *incoming* move reuses the
previous step's analysis).

Supports pgx-style turns and the EnvPool per-player action-row protocol
(``max_num_players=2``); the reference's player-seat shuffling
(``go.h:100-102``) corresponds to which seat moves first — fixed here to
seat 0 = black for deterministic goldens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from .turn_games import _per_player_reward

_DIRS = ((-1, 0), (1, 0), (0, -1), (0, 1))


def _nbr(x: jax.Array, dr: int, dc: int, fill) -> jax.Array:
    """y[r, c] = x[r+dr, c+dc], with off-board cells = ``fill``."""
    y = jnp.roll(x, (-dr, -dc), (0, 1))
    if dr == 1:
        y = y.at[-1, :].set(fill)
    elif dr == -1:
        y = y.at[0, :].set(fill)
    if dc == 1:
        y = y.at[:, -1].set(fill)
    elif dc == -1:
        y = y.at[:, 0].set(fill)
    return y


def _chain_labels(board: jax.Array) -> jax.Array:
    """Connected-component labels (min flat index) of same-color chains."""
    n = board.shape[0]
    idx = jnp.arange(n * n, dtype=jnp.int32).reshape(n, n)

    def body(carry):
        labels, _ = carry
        new = labels
        for dr, dc in _DIRS:
            nb_lab = _nbr(labels, dr, dc, jnp.int32(n * n))
            nb_col = _nbr(board, dr, dc, jnp.int32(-1))
            same = (nb_col == board) & (board != 0)
            new = jnp.where(same, jnp.minimum(new, nb_lab), new)
        return new, (new != labels).any()

    labels, _ = jax.lax.while_loop(
        lambda c: c[1], body, (idx, jnp.bool_(True))
    )
    return labels


def _chain_liberties(board: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-label liberty counts (distinct empty points adjacent to chain)."""
    n = board.shape[0]
    sent = jnp.int32(n * n)
    empty = board == 0
    labs = []
    for dr, dc in _DIRS:
        lab = _nbr(labels, dr, dc, sent)
        stone = _nbr(board, dr, dc, jnp.int32(0)) != 0
        labs.append(jnp.where(empty & stone, lab, sent))
    libs = jnp.zeros(n * n + 1, jnp.int32)
    for i, lab in enumerate(labs):
        for j in range(i):  # dedupe: same chain via two directions counts once
            lab = jnp.where(lab == labs[j], sent, lab)
        libs = libs.at[lab.reshape(-1)].add(1)
    return libs[:-1]


def _legal_points(board, labels, libs, mark, ko):
    """Closed-form playability of every point for the player with ``mark``."""
    n = board.shape[0]
    empty = board == 0
    ok = jnp.zeros_like(empty)
    for dr, dc in _DIRS:
        nb_col = _nbr(board, dr, dc, jnp.int32(-1))
        nb_lab = _nbr(labels, dr, dc, jnp.int32(0))
        nb_libs = libs[nb_lab]
        ok = ok | (nb_col == 0)
        ok = ok | ((nb_col == 3 - mark) & (nb_libs == 1))
        ok = ok | ((nb_col == mark) & (nb_libs >= 2))
    flat = (empty & ok).reshape(-1)
    return flat & (jnp.arange(n * n) != ko)


def _area_score(board: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Tromp-Taylor area: (black, white) stones + single-color territory."""
    n = board.shape[0]
    sent = jnp.int32(n * n)
    empty = board == 0
    idx = jnp.arange(n * n, dtype=jnp.int32).reshape(n, n)

    def body(carry):
        labels, _ = carry
        new = labels
        for dr, dc in _DIRS:
            nb_lab = _nbr(labels, dr, dc, sent)
            nb_empty = _nbr(empty, dr, dc, False)
            new = jnp.where(
                empty & nb_empty, jnp.minimum(new, nb_lab), new
            )
        return new, (new != labels).any()

    labels, _ = jax.lax.while_loop(
        lambda c: c[1], body, (idx, jnp.bool_(True))
    )
    region = jnp.where(empty, labels, sent).reshape(-1)
    touch = []
    for color in (1, 2):
        near = jnp.zeros_like(empty)
        for dr, dc in _DIRS:
            near = near | _nbr(board == color, dr, dc, False)
        t = jnp.zeros(n * n + 1, jnp.int32)
        t = t.at[region].max(near.reshape(-1).astype(jnp.int32))
        touch.append(t[labels] > 0)
    black_terr = empty & touch[0] & ~touch[1]
    white_terr = empty & touch[1] & ~touch[0]
    black = (board == 1).sum() + black_terr.sum()
    white = (board == 2).sum() + white_terr.sum()
    return black, white


class GoEnv(TpuEnv):
    """N×N Go; action ∈ [0, N²] with N² = pass; board 0/1/2 = ·/B/W."""

    DEFAULT_CONFIG = {
        "board_size": 19,
        "komi": 7.5,
        # Accepted for reference drop-in compat (pgx/registration.py:26-29):
        # history planes are not materialized (obs is the raw board);
        # ``rules`` only affects exotic superko cases simple ko cannot reach.
        "history_length": 8,
        "max_terminal_steps": 0,
        "rules": "pgx",
    }

    @property
    def n(self) -> int:
        return int(self.config["board_size"])

    def state_spec(self):
        n = self.n
        return {
            "obs:board": ArraySpec(jnp.int32, (n, n), 0, 2),
            "obs:current_player": ArraySpec(
                jnp.int32, (), 0, 1, is_discrete=True
            ),
            "info:legal_moves": ArraySpec(jnp.bool_, (n * n + 1,)),
        }

    def action_spec(self):
        n = self.n
        if self.max_num_players > 1:
            return {
                "action": ArraySpec(
                    jnp.int32, (-1,), 0, n * n, is_discrete=True
                )
            }
        return {"action": ArraySpec(jnp.int32, (), 0, n * n, is_discrete=True)}

    def _obs(self, board, player, legal):
        return {
            "obs:board": board,
            "obs:current_player": player,
            "info:legal_moves": jnp.concatenate(
                [legal, jnp.ones(1, jnp.bool_)]  # pass is always legal
            ),
        }

    def reset_env(self, key):
        n = self.n
        board = jnp.zeros((n, n), jnp.int32)
        state = {
            "board": board,
            "player": jnp.int32(0),
            "ko": jnp.int32(-1),
            "passes": jnp.int32(0),
            "moves": jnp.int32(0),
            "labels": jnp.arange(n * n, dtype=jnp.int32).reshape(n, n),
            "libs": jnp.zeros(n * n, jnp.int32),
        }
        legal = jnp.ones(n * n, jnp.bool_)
        return state, self._obs(board, state["player"], legal)

    def step_env(self, state, action, key):
        n = self.n
        board, player = state["board"], state["player"]
        labels, libs = state["labels"], state["libs"]
        if self.max_num_players > 1:
            action = action[player]
        action = jnp.clip(action, 0, n * n)
        is_pass = action == n * n
        mark = player + 1

        p = jnp.minimum(action, n * n - 1)
        r, c = p // n, p % n
        legal_now = _legal_points(board, labels, libs, mark, state["ko"])
        legal = is_pass | legal_now[p]

        # --- play the stone (unconditionally; selected out below) --------
        placed = jnp.zeros((n, n), jnp.bool_).at[r, c].set(True)
        adj_p = jnp.zeros((n, n), jnp.bool_)
        for dr, dc in _DIRS:
            adj_p = adj_p | _nbr(placed, dr, dc, False)
        # Opponent chains adjacent to p whose only liberty was p.
        adj_chain = jnp.zeros(n * n + 1, jnp.int32)
        adj_chain = adj_chain.at[labels.reshape(-1)].max(
            (adj_p & (board != 0)).reshape(-1).astype(jnp.int32)
        )
        captured = (
            (board == 3 - mark)
            & (libs[labels] == 1)
            & (adj_chain[labels] > 0)
        )
        board_played = jnp.where(captured, 0, board)
        board_played = jnp.where(placed, mark, board_played)
        num_captured = captured.sum()
        cap_pos = jnp.argmax(captured.reshape(-1)).astype(jnp.int32)

        own_nbr = jnp.zeros((n, n), jnp.bool_)
        empty_after = jnp.zeros((n, n), jnp.int32)
        for dr, dc in _DIRS:
            own_nbr = own_nbr | _nbr(board == mark, dr, dc, False)
            empty_after = empty_after + _nbr(
                board_played == 0, dr, dc, False
            ).astype(jnp.int32)
        lone = ~(own_nbr & placed).any()
        one_lib = (jnp.where(placed, empty_after, 0).sum()) == 1
        ko_new = jnp.where(
            ~is_pass & (num_captured == 1) & lone & one_lib,
            cap_pos,
            jnp.int32(-1),
        )

        # --- merge pass / play / illegal ----------------------------------
        play = ~is_pass & legal
        new_board = jnp.where(play, board_played, board)
        passes = jnp.where(is_pass, state["passes"] + 1, 0).astype(jnp.int32)
        ko_new = jnp.where(play, ko_new, jnp.int32(-1))
        moves = state["moves"] + 1
        game_over = passes >= 2
        max_steps = int(self.config["max_terminal_steps"])
        if max_steps > 0:
            game_over = game_over | (moves >= max_steps)
        terminated = game_over | ~legal

        black, white = _area_score(new_board)
        komi = float(self.config["komi"])
        margin = black.astype(jnp.float32) - white.astype(jnp.float32) - komi
        mover_is_black = mark == 1
        mover_margin = jnp.where(mover_is_black, margin, -margin)
        outcome = jnp.sign(mover_margin)  # ±1 (0 only for integer komi ties)
        mover_reward = jnp.where(
            ~legal, -1.0, jnp.where(game_over, outcome, 0.0)
        ).astype(jnp.float32)
        reward = _per_player_reward(self, mover_reward, player, terminated)

        next_player = jnp.where(terminated, player, 1 - player).astype(
            jnp.int32
        )
        new_labels = _chain_labels(new_board)
        new_libs = _chain_liberties(new_board, new_labels)
        st = {
            "board": new_board,
            "player": next_player,
            "ko": ko_new,
            "passes": passes,
            "moves": moves.astype(jnp.int32),
            "labels": new_labels,
            "libs": new_libs,
        }
        next_legal = _legal_points(
            new_board, new_labels, new_libs, next_player + 1, ko_new
        )
        return EnvOut(
            state=st,
            obs=self._obs(new_board, next_player, next_legal),
            reward=reward,
            terminated=terminated,
        )
