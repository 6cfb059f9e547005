"""Board-game env family (pgx-class)."""

from .animal_shogi import AnimalShogiEnv
from .backgammon import BackgammonEnv
from .chess import ChessEnv
from .game_2048 import Game2048Env
from .gardner_chess import GardnerChessEnv
from .go import GoEnv
from .hex import HexEnv
from .leduc import LeducHoldemEnv
from .othello import OthelloEnv
from .poker import KuhnPokerEnv
from .shogi import ShogiEnv
from .sparrow_mahjong import SparrowMahjongEnv
from .turn_games import Connect4Env, TicTacToeEnv

__all__ = [
    "AnimalShogiEnv",
    "BackgammonEnv",
    "ChessEnv",
    "Connect4Env",
    "GoEnv",
    "HexEnv",
    "Game2048Env",
    "GardnerChessEnv",
    "KuhnPokerEnv",
    "LeducHoldemEnv",
    "OthelloEnv",
    "ShogiEnv",
    "SparrowMahjongEnv",
    "TicTacToeEnv",
]
