"""Board-game env family (pgx-class)."""

from .._lazy import lazy_exports

_EXPORTS = {
    "AnimalShogiEnv": "animal_shogi",
    "BackgammonEnv": "backgammon",
    "ChessEnv": "chess",
    "Connect4Env": "turn_games",
    "Game2048Env": "game_2048",
    "GardnerChessEnv": "gardner_chess",
    "GoEnv": "go",
    "HexEnv": "hex",
    "KuhnPokerEnv": "poker",
    "LeducHoldemEnv": "leduc",
    "OthelloEnv": "othello",
    "ShogiEnv": "shogi",
    "SparrowMahjongEnv": "sparrow_mahjong",
    "TicTacToeEnv": "turn_games",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
