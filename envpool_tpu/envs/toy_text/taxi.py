"""Taxi — TPU-native functional implementation.

Behavioral reference: ``envpool/toy_text/taxi.h:34-133``.  5x5 grid with
wall map {"|:|::|","|:|::|","|::::|","||:|:|","||:|:|"}; pickup locations
R/G/Y/B at (0,0),(0,4),(4,0),(4,3).  Reset: taxi at random cell, passenger
location s ∈ {0..3}, destination t ∈ {0..3}.  Actions: 0 south (x+1),
1 north (x-1), 2 east, 3 west (wall-gated), 4 pickup, 5 dropoff.
Observation encodes ``((x*5+y)*5+s)*4+t``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_MAP = ["|:|::|", "|:|::|", "|::::|", "||:|:|", "||:|:|"]
_LOC = np.array([[0, 0], [0, 4], [4, 0], [4, 3]], np.int32)
# loc_map: which pickup location (0-3) each cell is, -1 otherwise.
_LOC_MAP = -np.ones((5, 5), np.int32)
for _i, (_x, _y) in enumerate(_LOC):
    _LOC_MAP[_x, _y] = _i
# can_east[x, y]: separator right of cell y is ':'.
_CAN_EAST = np.array(
    [[_MAP[x][y + 1] == ":" for y in range(5)] for x in range(5)]
)
# can_west[x, y]: separator left of cell y is ':'.
_CAN_WEST = np.array(
    [[_MAP[x][y] == ":" for y in range(5)] for x in range(5)]
)


class TaxiEnv(TpuEnv):
    DEFAULT_CONFIG = {"reward_threshold": 8.0}

    @property
    def reward_threshold(self) -> float:
        return float(self.config["reward_threshold"])

    def state_spec(self):
        return {"obs": ArraySpec(jnp.int32, (), 0, 499, is_discrete=True)}

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 5, is_discrete=True)}

    @staticmethod
    def _encode(x, y, s, t):
        return (((x * 5 + y) * 5 + s) * 4 + t).astype(jnp.int32)

    def reset_env(self, key):
        kx, ky, ks, kt = jax.random.split(key, 4)
        x = jax.random.randint(kx, (), 0, 5, jnp.int32)
        y = jax.random.randint(ky, (), 0, 5, jnp.int32)
        s = jax.random.randint(ks, (), 0, 4, jnp.int32)
        t = jax.random.randint(kt, (), 0, 4, jnp.int32)
        state = jnp.stack([x, y, s, t])
        return state, {"obs": self._encode(x, y, s, t)}

    def step_env(self, state, action, key):
        x, y, s, t = state
        can_east = jnp.asarray(_CAN_EAST)[x, y]
        can_west = jnp.asarray(_CAN_WEST)[x, y]
        loc_map = jnp.asarray(_LOC_MAP)[x, y]
        loc = jnp.asarray(_LOC)

        nx = jnp.where(
            action == 0,
            jnp.minimum(x + 1, 4),
            jnp.where(action == 1, jnp.maximum(x - 1, 0), x),
        )
        ny = jnp.where(
            (action == 2) & can_east,
            y + 1,
            jnp.where((action == 3) & can_west, y - 1, y),
        )

        at_src = (s < 4) & (x == loc[jnp.clip(s, 0, 3), 0]) & (
            y == loc[jnp.clip(s, 0, 3), 1]
        )
        pickup_ok = (action == 4) & at_src
        at_dst = (s == 4) & (x == loc[t, 0]) & (y == loc[t, 1])
        dropoff_ok = (action == 5) & at_dst
        # Dropoff at a wrong pickup location: passenger exits there.
        dropoff_side = (
            (action == 5) & ~at_dst & (s == 4) & (loc_map >= 0)
        )
        bad_pickup = (action == 4) & ~at_src
        bad_dropoff = (action == 5) & ~at_dst & ~dropoff_side

        ns = jnp.where(
            pickup_ok,
            4,
            jnp.where(
                dropoff_ok, t, jnp.where(dropoff_side, loc_map, s)
            ),
        )
        reward = jnp.where(
            dropoff_ok, 20.0, jnp.where(bad_pickup | bad_dropoff, -10.0, -1.0)
        ).astype(jnp.float32)
        terminated = dropoff_ok
        new_state = jnp.stack([nx, ny, ns, t]).astype(jnp.int32)
        return EnvOut(
            state=new_state,
            obs={"obs": self._encode(nx, ny, ns, t)},
            reward=reward,
            terminated=terminated,
        )
