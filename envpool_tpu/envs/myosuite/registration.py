"""MyoSuite registration — the public core id set.

Mirrors the upstream MyoSuite registry names (myosuite/envs/myo/
myobase registration); see the package docstring for the offline
surface caveat.
"""

from ...core.registry import register

_PATH = "envpool_tpu.envs.myosuite"

_TASKS = [
    # (id, body, task, variant, steps)
    ("myoFingerPoseFixed-v0", "finger", "pose", "fixed", 100),
    ("myoFingerPoseRandom-v0", "finger", "pose", "random", 100),
    ("myoFingerReachFixed-v0", "finger", "reach", "fixed", 100),
    ("myoFingerReachRandom-v0", "finger", "reach", "random", 100),
    ("myoElbowPose1D6MFixed-v0", "elbow", "pose", "fixed", 100),
    ("myoElbowPose1D6MRandom-v0", "elbow", "pose", "random", 100),
    ("myoHandPoseFixed-v0", "hand", "pose", "fixed", 100),
    ("myoHandPoseRandom-v0", "hand", "pose", "random", 100),
    ("myoHandReachFixed-v0", "hand", "reach", "fixed", 100),
    ("myoHandReachRandom-v0", "hand", "reach", "random", 100),
    ("myoHandKeyTurnFixed-v0", "hand", "key", "fixed", 100),
    ("myoHandKeyTurnRandom-v0", "hand", "key", "random", 100),
    ("myoHandObjHoldFixed-v0", "hand", "hold", "fixed", 100),
    ("myoHandObjHoldRandom-v0", "hand", "hold", "random", 100),
    ("myoHandPenTwirlFixed-v0", "hand", "twirl", "fixed", 100),
    ("myoHandPenTwirlRandom-v0", "hand", "twirl", "random", 100),
    ("myoLegWalk-v0", "leg", "walk", "fixed", 1000),
    ("myoLegRoughTerrainWalk-v0", "leg", "walk", "random", 1000),
    ("myoLegHillyTerrainWalk-v0", "leg", "walk", "random", 1000),
    ("myoLegStairTerrainWalk-v0", "leg", "walk", "random", 1000),
]

for _tid, _body, _task, _variant, _steps in _TASKS:
    register(
        task_id=_tid,
        import_path=_PATH,
        env_cls="MyoEnv",
        body=_body,
        task=_task,
        variant=_variant,
        max_episode_steps=_steps,
    )
