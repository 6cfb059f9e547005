"""Atari-class pixel-env registration.

These are faithful-behavior arcade cores, NOT the ALE: score digits are
not rasterized and RAM maps differ, so they are registered under honest
``XxxLite-v5`` ids rather than squatting the reference's ALE ids
(``envpool/atari/registration.py:21-35`` registers real ALE ROMs as
``Xxx-v5``).  The wrapper pipeline (grayscale, resize, frame-stack,
max-pool, reward clip, episodic life, noop/fire reset) matches the
reference config surface exactly.

The reference registers ~104 ALE ROMs as ``Xxx-v5``
(``envpool/atari/registration.py:21-35``) with ``max_episode_steps=108000``
raw frames / frame_skip = 27000 agent steps.  We register the games with
on-device cores; the same pipeline config surface applies.
"""

from ...core.registry import register

_PATH = "envpool_tpu.envs.atari"

register(
    task_id="PongLite-v5",
    import_path=_PATH,
    env_cls="PongEnv",
    max_episode_steps=27000,
    task="pong",
)

register(
    task_id="BreakoutLite-v5",
    import_path=_PATH,
    env_cls="BreakoutEnv",
    max_episode_steps=27000,
    task="breakout",
)

register(
    task_id="FreewayLite-v5",
    import_path=_PATH,
    env_cls="FreewayEnv",
    max_episode_steps=27000,
    task="freeway",
)

register(
    task_id="SpaceInvadersLite-v5",
    import_path=_PATH,
    env_cls="SpaceInvadersEnv",
    max_episode_steps=27000,
    task="space_invaders",
)

# Arcade wave 2 (more_games.py).
for _task_id, _cls, _task in (
    ("AsterixLite-v5", "AsterixEnv", "asterix"),
    ("SkiingLite-v5", "SkiingEnv", "skiing"),
    ("BoxingLite-v5", "BoxingEnv", "boxing"),
    ("SeaquestLite-v5", "SeaquestEnv", "seaquest"),
    ("EnduroLite-v5", "EnduroEnv", "enduro"),
    ("BowlingLite-v5", "BowlingEnv", "bowling"),
):
    register(
        task_id=_task_id,
        import_path=_PATH,
        env_cls=_cls,
        max_episode_steps=27000,
        task=_task,
    )

# Arcade wave 3 (wave3_games.py).
for _task_id, _cls, _task in (
    ("QbertLite-v5", "QbertEnv", "qbert"),
    ("MsPacmanLite-v5", "MsPacmanEnv", "ms_pacman"),
    ("BeamRiderLite-v5", "BeamRiderEnv", "beam_rider"),
    ("FrostbiteLite-v5", "FrostbiteEnv", "frostbite"),
    ("RiverraidLite-v5", "RiverraidEnv", "riverraid"),
    ("CrazyClimberLite-v5", "CrazyClimberEnv", "crazy_climber"),
    ("TennisLite-v5", "TennisEnv", "tennis"),
    ("AssaultLite-v5", "AssaultEnv", "assault"),
    ("AtlantisLite-v5", "AtlantisEnv", "atlantis"),
    ("KangarooLite-v5", "KangarooEnv", "kangaroo"),
    ("UpNDownLite-v5", "UpNDownEnv", "up_n_down"),
    ("RoadRunnerLite-v5", "RoadRunnerEnv", "road_runner"),
    ("BattleZoneLite-v5", "BattleZoneEnv", "battle_zone"),
    ("DoubleDunkLite-v5", "DoubleDunkEnv", "double_dunk"),
    ("NameThisGameLite-v5", "NameThisGameEnv", "name_this_game"),
    ("PhoenixLite-v5", "PhoenixEnv", "phoenix"),
    ("DemonAttackLite-v5", "DemonAttackEnv", "demon_attack"),
    ("GopherLite-v5", "GopherEnv", "gopher"),
    ("ChopperCommandLite-v5", "ChopperCommandEnv", "chopper_command"),
    ("IceHockeyLite-v5", "IceHockeyEnv", "ice_hockey"),
    ("FishingDerbyLite-v5", "FishingDerbyEnv", "fishing_derby"),
    ("AmidarLite-v5", "AmidarEnv", "amidar"),
    ("StarGunnerLite-v5", "StarGunnerEnv", "star_gunner"),
    ("TimePilotLite-v5", "TimePilotEnv", "time_pilot"),
    ("JamesbondLite-v5", "JamesbondEnv", "jamesbond"),
    ("WizardOfWorLite-v5", "WizardOfWorEnv", "wizard_of_wor"),
    ("ZaxxonLite-v5", "ZaxxonEnv", "zaxxon"),
    ("BankHeistLite-v5", "BankHeistEnv", "bank_heist"),
    ("AlienLite-v5", "AlienEnv", "alien"),
    ("BerzerkLite-v5", "BerzerkEnv", "berzerk"),
    ("VentureLite-v5", "VentureEnv", "venture"),
    ("KaboomLite-v5", "KaboomEnv", "kaboom"),
    ("KrullLite-v5", "KrullEnv", "krull"),
    ("PitfallLite-v5", "PitfallEnv", "pitfall"),
    ("CentipedeLite-v5", "CentipedeEnv", "centipede"),
    ("MontezumaRevengeLite-v5", "MontezumaRevengeEnv", "montezuma_revenge"),
    ("HeroLite-v5", "HeroEnv", "hero"),
    ("GravitarLite-v5", "GravitarEnv", "gravitar"),
    ("PooyanLite-v5", "PooyanEnv", "pooyan"),
    ("CarnivalLite-v5", "CarnivalEnv", "carnival"),
    ("AsteroidsLite-v5", "AsteroidsEnv", "asteroids"),
    ("DefenderLite-v5", "DefenderEnv", "defender"),
    ("KungFuMasterLite-v5", "KungFuMasterEnv", "kung_fu_master"),
    ("PrivateEyeLite-v5", "PrivateEyeEnv", "private_eye"),
    ("RobotankLite-v5", "RobotankEnv", "robotank"),
    ("SolarisLite-v5", "SolarisEnv", "solaris"),
    ("SurroundLite-v5", "SurroundEnv", "surround"),
    ("TutankhamLite-v5", "TutankhamEnv", "tutankham"),
    ("VideoPinballLite-v5", "VideoPinballEnv", "video_pinball"),
    ("YarsRevengeLite-v5", "YarsRevengeEnv", "yars_revenge"),
):
    register(
        task_id=_task_id,
        import_path=_PATH,
        env_cls=_cls,
        max_episode_steps=27000,
        task=_task,
    )


# Arcade waves 12-18: the non-57 half of the ALE roster
# (envpool/atari/registration.py registers every ROM as Name-v5).
for _task_id, _cls, _task in (
    ("AdventureLite-v5", "AdventureEnv", "adventure"),
    ("SupermanLite-v5", "SupermanEnv", "superman"),
    ("EarthworldLite-v5", "EarthworldEnv", "earthworld"),
    ("HauntedHouseLite-v5", "HauntedHouseEnv", "haunted_house"),
    ("SirLancelotLite-v5", "SirLancelotEnv", "sir_lancelot"),
    ("KingKongLite-v5", "KingKongEnv", "king_kong"),
    ("AirRaidLite-v5", "AirRaidEnv", "air_raid"),
    ("GalaxianLite-v5", "GalaxianEnv", "galaxian"),
    ("Atlantis2Lite-v5", "Atlantis2Env", "atlantis2"),
    ("SpaceWarLite-v5", "SpaceWarEnv", "space_war"),
    ("LaserGatesLite-v5", "LaserGatesEnv", "laser_gates"),
    ("TrondeadLite-v5", "TrondeadEnv", "trondead"),
    ("DonkeyKongLite-v5", "DonkeyKongEnv", "donkey_kong"),
    ("MarioBrosLite-v5", "MarioBrosEnv", "mario_bros"),
    ("FroggerLite-v5", "FroggerEnv", "frogger"),
    ("KeystoneKapersLite-v5", "KeystoneKapersEnv", "keystone_kapers"),
    ("Pitfall2Lite-v5", "Pitfall2Env", "pitfall2"),
    ("MrDoLite-v5", "MrDoEnv", "mr_do"),
    ("BackgammonLite-v5", "BackgammonEnv", "backgammon"),
    ("BlackjackLite-v5", "BlackjackEnv", "blackjack"),
    ("CasinoLite-v5", "CasinoEnv", "casino"),
    ("OthelloLite-v5", "OthelloEnv", "othello"),
    ("TicTacToe3dLite-v5", "TicTacToe3dEnv", "tic_tac_toe_3d"),
    ("VideoCheckersLite-v5", "VideoCheckersEnv", "video_checkers"),
    ("VideoChessLite-v5", "VideoChessEnv", "video_chess"),
    ("TetrisLite-v5", "TetrisEnv", "tetris"),
    ("KlaxLite-v5", "KlaxEnv", "klax"),
    ("VideoCubeLite-v5", "VideoCubeEnv", "video_cube"),
    ("BasicMathLite-v5", "BasicMathEnv", "basic_math"),
    ("HangmanLite-v5", "HangmanEnv", "hangman"),
    ("WordZapperLite-v5", "WordZapperEnv", "word_zapper"),
    ("FlagCaptureLite-v5", "FlagCaptureEnv", "flag_capture"),
    ("CrossbowLite-v5", "CrossbowEnv", "crossbow"),
    ("DarkchambersLite-v5", "DarkchambersEnv", "darkchambers"),
    ("EntombedLite-v5", "EntombedEnv", "entombed"),
    ("EtLite-v5", "EtEnv", "et"),
    ("TurmoilLite-v5", "TurmoilEnv", "turmoil"),
    ("KoolaidLite-v5", "KoolaidEnv", "koolaid"),
    ("HumanCannonballLite-v5", "HumanCannonballEnv", "human_cannonball"),
    ("MiniatureGolfLite-v5", "MiniatureGolfEnv", "miniature_golf"),
    ("JourneyEscapeLite-v5", "JourneyEscapeEnv", "journey_escape"),
    ("LostLuggageLite-v5", "LostLuggageEnv", "lost_luggage"),
    ("PacmanLite-v5", "PacmanEnv", "pacman"),
    ("ElevatorActionLite-v5", "ElevatorActionEnv", "elevator_action"),
):
    register(
        task_id=_task_id,
        import_path=_PATH,
        env_cls=_cls,
        max_episode_steps=27000,
        task=_task,
    )

# The 2600 machine env: runs user-supplied 4K cartridge ROMs on the
# vectorized 6502+TIA emulator behind the standard pipeline (no ROM
# assets ship in-image; rom_path is required at make()).
register(
    task_id="Machine2600-v0",
    import_path=_PATH,
    env_cls="Machine2600Env",
    max_episode_steps=27000,
    task="machine2600",
)

# Per-ROM preset ids (ALE-settings analog, rom_presets.py): real-ALE
# reward/lives/terminal semantics + minimal action sets for users who
# supply the matching cartridge dump via rom_path=.
for _preset, _name in (
    ("breakout", "Breakout"),
    ("pong", "Pong"),
    ("freeway", "Freeway"),
    ("space_invaders", "SpaceInvaders"),
    ("seaquest", "Seaquest"),
    ("boxing", "Boxing"),
    ("asteroids", "Asteroids"),
    ("ms_pacman", "MsPacman"),
    ("qbert", "Qbert"),
    ("bowling", "Bowling"),
    ("frostbite", "Frostbite"),
    ("battle_zone", "BattleZone"),
):
    register(
        task_id=f"Machine2600/{_name}-v5",
        import_path=_PATH,
        env_cls="Machine2600Env",
        max_episode_steps=27000,
        task="machine2600",
        game=_preset,
    )
