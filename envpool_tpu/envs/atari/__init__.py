"""Atari-class pixel env family (on-device arcade emulation).

Reference behavior: ``envpool/atari/atari_env.h`` (ALE on CPU threads).
Here the games and the full pixel pipeline run on TPU.
"""

from .arcade_env import ArcadeEnv, ArcadeGame
from .more_games import (
    AsterixEnv,
    BowlingEnv,
    BoxingEnv,
    EnduroEnv,
    SeaquestEnv,
    SkiingEnv,
)
from .breakout import BreakoutEnv
from .freeway import FreewayEnv
from .pong import PongEnv
from .space_invaders import SpaceInvadersEnv
from .wave3_games import (
    BeamRiderEnv,
    CrazyClimberEnv,
    FrostbiteEnv,
    MsPacmanEnv,
    QbertEnv,
    RiverraidEnv,
)
from .wave4_games import (
    AssaultEnv,
    AtlantisEnv,
    KangarooEnv,
    RoadRunnerEnv,
    TennisEnv,
    UpNDownEnv,
)
from .wave5_games import (
    BattleZoneEnv,
    DoubleDunkEnv,
    NameThisGameEnv,
    PhoenixEnv,
)
from .wave6_games import (
    AmidarEnv,
    ChopperCommandEnv,
    DemonAttackEnv,
    FishingDerbyEnv,
    GopherEnv,
    IceHockeyEnv,
)
from .wave7_games import (
    BankHeistEnv,
    JamesbondEnv,
    StarGunnerEnv,
    TimePilotEnv,
    WizardOfWorEnv,
    ZaxxonEnv,
)
from .wave8_games import (
    AlienEnv,
    BerzerkEnv,
    KaboomEnv,
    KrullEnv,
    PitfallEnv,
    VentureEnv,
)
from .wave9_games import (
    CarnivalEnv,
    CentipedeEnv,
    GravitarEnv,
    HeroEnv,
    MontezumaRevengeEnv,
    PooyanEnv,
)
from .wave10_games import (
    AsteroidsEnv,
    DefenderEnv,
    KungFuMasterEnv,
    PrivateEyeEnv,
    RobotankEnv,
)
from .machine_env import Machine2600Env, Machine2600Game
from .wave11_games import (
    SolarisEnv,
    SurroundEnv,
    TutankhamEnv,
    VideoPinballEnv,
    YarsRevengeEnv,
)

__all__ = [
    "AlienEnv",
    "AmidarEnv",
    "ArcadeEnv",
    "ArcadeGame",
    "AssaultEnv",
    "AsterixEnv",
    "AtlantisEnv",
    "BankHeistEnv",
    "BattleZoneEnv",
    "BeamRiderEnv",
    "BerzerkEnv",
    "BowlingEnv",
    "BoxingEnv",
    "BreakoutEnv",
    "CarnivalEnv",
    "CentipedeEnv",
    "ChopperCommandEnv",
    "DemonAttackEnv",
    "CrazyClimberEnv",
    "DoubleDunkEnv",
    "EnduroEnv",
    "FishingDerbyEnv",
    "FreewayEnv",
    "FrostbiteEnv",
    "GopherEnv",
    "GravitarEnv",
    "HeroEnv",
    "IceHockeyEnv",
    "JamesbondEnv",
    "KaboomEnv",
    "KangarooEnv",
    "KrullEnv",
    "MontezumaRevengeEnv",
    "MsPacmanEnv",
    "NameThisGameEnv",
    "PhoenixEnv",
    "PitfallEnv",
    "PooyanEnv",
    "PongEnv",
    "QbertEnv",
    "RiverraidEnv",
    "RoadRunnerEnv",
    "TennisEnv",
    "UpNDownEnv",
    "VentureEnv",
    "WizardOfWorEnv",
    "ZaxxonEnv",
    "SeaquestEnv",
    "SkiingEnv",
    "SpaceInvadersEnv",
    "StarGunnerEnv",
    "TimePilotEnv",
    "AsteroidsEnv",
    "DefenderEnv",
    "KungFuMasterEnv",
    "PrivateEyeEnv",
    "RobotankEnv",
    "SolarisEnv",
    "SurroundEnv",
    "TutankhamEnv",
    "VideoPinballEnv",
    "YarsRevengeEnv",
    "Machine2600Env",
    "Machine2600Game",
]
