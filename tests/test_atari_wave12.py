"""Arcade waves 12-18: the non-57 half of the ALE roster + full
Atari id-surface parity with the reference registration scheme."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.core.registry import registry

IDS = [
    "AdventureLite-v5", "SupermanLite-v5", "EarthworldLite-v5",
    "HauntedHouseLite-v5", "SirLancelotLite-v5", "KingKongLite-v5",
    "AirRaidLite-v5", "GalaxianLite-v5", "Atlantis2Lite-v5",
    "SpaceWarLite-v5", "LaserGatesLite-v5", "TrondeadLite-v5",
    "DonkeyKongLite-v5", "MarioBrosLite-v5", "FroggerLite-v5",
    "KeystoneKapersLite-v5", "Pitfall2Lite-v5", "MrDoLite-v5",
    "BackgammonLite-v5", "BlackjackLite-v5", "CasinoLite-v5",
    "OthelloLite-v5", "TicTacToe3dLite-v5", "VideoCheckersLite-v5",
    "VideoChessLite-v5", "TetrisLite-v5", "KlaxLite-v5",
    "VideoCubeLite-v5", "BasicMathLite-v5", "HangmanLite-v5",
    "WordZapperLite-v5", "FlagCaptureLite-v5", "CrossbowLite-v5",
    "DarkchambersLite-v5", "EntombedLite-v5", "EtLite-v5",
    "TurmoilLite-v5", "KoolaidLite-v5", "HumanCannonballLite-v5",
    "MiniatureGolfLite-v5", "JourneyEscapeLite-v5", "LostLuggageLite-v5",
    "PacmanLite-v5", "ElevatorActionLite-v5",
]

# The ALE ROM roster the reference registers (every rom file as
# Name-v5, envpool/atari/registration.py:21-35; filenames per ale-py's
# md5 list).
ALE_GAMES = """adventure air_raid alien amidar assault asterix asteroids
atlantis atlantis2 backgammon bank_heist basic_math battle_zone
beam_rider berzerk blackjack bowling boxing breakout carnival casino
centipede chopper_command crazy_climber crossbow darkchambers defender
demon_attack donkey_kong double_dunk earthworld elevator_action enduro
entombed et fishing_derby flag_capture freeway frogger frostbite
galaxian gopher gravitar hangman haunted_house hero human_cannonball
ice_hockey jamesbond journey_escape kaboom kangaroo keystone_kapers
king_kong klax koolaid krull kung_fu_master laser_gates lost_luggage
mario_bros miniature_golf montezuma_revenge mr_do ms_pacman
name_this_game othello pacman phoenix pitfall pitfall2 pong pooyan
private_eye qbert riverraid road_runner robotank seaquest sir_lancelot
skiing solaris space_invaders space_war star_gunner superman surround
tennis tetris tic_tac_toe_3d time_pilot trondead turmoil tutankham
up_n_down venture video_checkers video_chess video_cube video_pinball
wizard_of_wor word_zapper yars_revenge zaxxon""".split()


def _camel(game: str) -> str:
    return "".join(p.capitalize() for p in game.split("_"))


def test_full_ale_id_surface():
    """Every name derived from the reference's registration scheme has
    a Lite core (or a Machine2600 preset id) registered."""
    ids = set(envpool_tpu.list_all_envs())
    missing = []
    for game in ALE_GAMES:
        name = _camel(game)
        if (
            f"{name}Lite-v5" not in ids
            and f"{name}-v5" not in ids
            and f"Machine2600/{name}-v5" not in ids
        ):
            missing.append(name)
    assert missing == [], missing
    assert len(ALE_GAMES) >= 100  # the full roster, not just Atari-57


@pytest.mark.parametrize("tid", IDS)
def test_cores_run_and_render(tid):
    env = registry._env(tid, num_envs=1)
    game = env.game
    g = game.init(jax.random.PRNGKey(0))
    tick = jax.jit(game.tick)
    rng = np.random.default_rng(0)
    for t in range(80):
        g, r, over = tick(
            g, jnp.int32(rng.integers(0, game.action_set_size)),
            jax.random.PRNGKey(t),
        )
        assert np.isfinite(float(r)), tid
    fr = np.asarray(game.render_gray(g))
    assert fr.shape == (210, 160) and len(np.unique(fr)) >= 3, tid


def test_othello_opening_move_flips():
    """Playing the standard opening d3 flips exactly one stone and the
    drone answers with a legal reply."""
    from envpool_tpu.envs.atari.wave15_games import (
        OthelloGame, _apply_move,
    )

    game = OthelloGame()
    g = game.init(jax.random.PRNGKey(0))
    board = g["board"]
    # (2, 4) is legal for +1 here: (3,4) is the drone's, (4,4) ours.
    new, legal = _apply_move(board, jnp.int32(2), jnp.int32(4), 1)
    assert bool(legal)
    assert int(new[2, 4]) == 1 and int(new[3, 4]) == 1  # flipped
    # Illegal: occupied center square.
    _, legal2 = _apply_move(board, jnp.int32(3), jnp.int32(3), 1)
    assert not bool(legal2)
    # Illegal: empty square with no flips.
    _, legal3 = _apply_move(board, jnp.int32(0), jnp.int32(0), 1)
    assert not bool(legal3)


def test_tetris_line_clear_scores():
    """Force a nearly-full bottom row; dropping an I-piece flat into
    the gap clears the line and pays."""
    from envpool_tpu.envs.atari.wave16_games import TetrisGame

    game = TetrisGame()
    g = game.init(jax.random.PRNGKey(3))
    grid = jnp.zeros((16, 8), jnp.int32).at[15, :4].set(1)
    # I-piece lying on tile row 1, rot 0 occupies columns pc..pc+3.
    g = {
        **g, "grid": grid, "piece": jnp.int32(0), "rot": jnp.int32(0),
        "pr": jnp.int32(13), "pc": jnp.int32(4), "fall": jnp.int32(2),
    }
    total = 0.0
    tick = jax.jit(game.tick)
    for t in range(8):
        g, r, over = tick(g, jnp.int32(4), jax.random.PRNGKey(t))  # soft drop
        total += float(r)
        if total > 0:
            break
    assert total >= 1.0, total
    assert int(np.asarray(g["grid"])[15].sum()) == 0  # row cleared


def test_ttt3d_win_detection():
    from envpool_tpu.envs.atari.wave16_games import _WORDS  # noqa: F401
    from envpool_tpu.envs.atari.wave15_games import TicTacToe3dGame

    cells = jnp.zeros((64,), jnp.int32)
    # Space diagonal (0,0,0),(1,1,1),(2,2,2),(3,3,3).
    for i in range(4):
        cells = cells.at[i * 16 + i * 4 + i].set(1)
    assert bool(TicTacToe3dGame._won(cells, 1))
    assert not bool(TicTacToe3dGame._won(cells, -1))
    # A broken line must not count.
    cells = cells.at[2 * 16 + 2 * 4 + 2].set(0)
    assert not bool(TicTacToe3dGame._won(cells, 1))


def test_blackjack_dealer_hits_to_17():
    from envpool_tpu.envs.atari.wave15_games import _bj_value

    assert int(_bj_value(jnp.int32(6), jnp.int32(1))) == 16  # A+5 soft
    assert int(_bj_value(jnp.int32(12), jnp.int32(1))) == 12  # hard (22 bust)
    assert int(_bj_value(jnp.int32(10), jnp.int32(0))) == 10
