"""Jumanji-class scheduling/packing envs: JobShop, MultiCVRP, BinPack.

Behavioral reference (jumanji v1.1.1 semantics):

* JobShop — ``envpool/jumanji/job_shop_env.h``: 10 machines, 20 job slots
  of which 2 are active by default (job 0: one op on machine 0, duration
  2; job 1: one op on machine 1, duration 3).  Each step every machine
  picks a job id or 20 (no-op); scheduling an unstartable job invalidates
  the whole step (-10 and terminal), otherwise reward is -1 per step
  until all active jobs complete.  Machines assign in index order, so two
  machines claiming the same op conflict deterministically.
* MultiCVRP — ``envpool/jumanji/multi_cvrp_env.h``: 2 vehicles serve 20
  customers (nodes at (node/2, 0), demand 10, capacity 60).  Vehicles
  move in index order; visiting the depot refills capacity; reward =
  -total distance travelled, -100 for an invalid joint action (also
  terminal).  Time-window fields exist in the observation but default to
  [0, 30] with zero penalty coefficients.
* BinPack — ``envpool/jumanji/bin_pack_env.h``: place items into empty
  maximal spaces (EMS) of a unit bin; the chosen EMS splits into up to 3
  children anchored at its min corner (above / beside / in front of the
  placed item); reward = placed item volume, -1 and terminal for an
  invalid (ems, item) pair.

TPU-native: the per-machine/vehicle sequential sweeps are
``lax.fori_loop``s with static trip counts; the BinPack EMS compaction is
a stable argsort on the validity mask (no dynamic list sizes).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

# ---------------------------------------------------------------------------
# JobShop
# ---------------------------------------------------------------------------

_J_JOBS = 20
_J_OPS = 8
_J_MACHINES = 10
_J_NOJOB = 20
_J_ACTIVE = 2
_J_LIMIT = 1000


def _j_can_start(st, machine, job):
    return (
        (st["machine_job"][machine] == _J_NOJOB)
        & (job < _J_ACTIVE)
        & ~st["completed"][job]
        & st["op_mask"][job, 0]
        & (st["op_machine"][job, 0] == machine)
    )


class JobShopEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs:ops_machine_ids": ArraySpec(
                jnp.int32, (_J_JOBS, _J_OPS), -1, 9
            ),
            "obs:ops_durations": ArraySpec(
                jnp.int32, (_J_JOBS, _J_OPS), -1, 6
            ),
            "obs:ops_mask": ArraySpec(jnp.bool_, (_J_JOBS, _J_OPS)),
            "obs:machines_job_ids": ArraySpec(
                jnp.int32, (_J_MACHINES,), 0, _J_NOJOB
            ),
            "obs:machines_remaining_times": ArraySpec(
                jnp.int32, (_J_MACHINES,), 0, 6
            ),
            "obs:action_mask": ArraySpec(
                jnp.bool_, (_J_MACHINES, _J_NOJOB + 1)
            ),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(
                jnp.int32, (_J_MACHINES,), 0, _J_NOJOB, is_discrete=True
            )
        }

    def _obs(self, st):
        machines = jnp.arange(_J_MACHINES)[:, None]
        jobs = jnp.arange(_J_NOJOB + 1)[None, :]
        can = (
            (st["machine_job"][:, None] == _J_NOJOB)
            & (jobs < _J_ACTIVE)
            & ~jnp.pad(st["completed"], (0, 1))[jobs[0]][None, :]
            & jnp.pad(st["op_mask"][:, 0], (0, 1))[jobs[0]][None, :]
            & (jnp.pad(st["op_machine"][:, 0], (0, 1), constant_values=-1)[
                jobs[0]
            ][None, :] == machines)
        )
        mask = can | (jobs == _J_NOJOB)
        return {
            "obs:ops_machine_ids": st["op_machine"],
            "obs:ops_durations": st["op_duration"],
            "obs:ops_mask": st["op_mask"],
            "obs:machines_job_ids": st["machine_job"],
            "obs:machines_remaining_times": st["machine_time"],
            "obs:action_mask": mask,
        }

    def reset_env(self, key):
        op_machine = jnp.full((_J_JOBS, _J_OPS), -1, jnp.int32)
        op_duration = jnp.full((_J_JOBS, _J_OPS), -1, jnp.int32)
        op_mask = jnp.zeros((_J_JOBS, _J_OPS), jnp.bool_)
        op_machine = op_machine.at[0, 0].set(0).at[1, 0].set(1)
        op_duration = op_duration.at[0, 0].set(2).at[1, 0].set(3)
        op_mask = op_mask.at[0, 0].set(True).at[1, 0].set(True)
        st = {
            "op_machine": op_machine,
            "op_duration": op_duration,
            "op_mask": op_mask,
            "machine_job": jnp.full((_J_MACHINES,), _J_NOJOB, jnp.int32),
            "machine_time": jnp.zeros((_J_MACHINES,), jnp.int32),
            "completed": jnp.zeros((_J_JOBS,), jnp.bool_),
            "step": jnp.int32(0),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        action = jnp.clip(action, 0, _J_NOJOB)

        def body(machine, carry):
            st, valid = carry
            sel = action[machine]
            noop = sel == _J_NOJOB
            job = jnp.clip(sel, 0, _J_JOBS - 1)
            can = _j_can_start(st, machine, job)
            do = ~noop & can
            st = dict(
                st,
                machine_job=st["machine_job"].at[machine].set(
                    jnp.where(do, sel, st["machine_job"][machine])
                ),
                machine_time=st["machine_time"].at[machine].set(
                    jnp.where(
                        do,
                        st["op_duration"][job, 0],
                        st["machine_time"][machine],
                    )
                ),
                op_mask=st["op_mask"].at[job, 0].set(
                    jnp.where(do, False, st["op_mask"][job, 0])
                ),
            )
            return st, valid & (noop | can)

        st, valid = lax.fori_loop(
            0, _J_MACHINES, body, (dict(state), jnp.bool_(True))
        )

        busy = st["machine_job"] != _J_NOJOB
        new_time = jnp.where(busy, st["machine_time"] - 1, st["machine_time"])
        finished = busy & (new_time == 0)
        fin_jobs = jnp.clip(st["machine_job"], 0, _J_JOBS - 1)
        completed = st["completed"].at[fin_jobs].max(finished)
        machine_job = jnp.where(finished, _J_NOJOB, st["machine_job"])

        step = state["step"] + 1
        all_done = jnp.all(completed[:_J_ACTIVE])
        terminated = ~valid | all_done | (step >= _J_LIMIT)
        reward = jnp.where(valid, -1.0, -10.0).astype(jnp.float32)
        st = dict(
            st,
            machine_job=machine_job,
            machine_time=new_time,
            completed=completed,
            step=step,
        )
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=terminated,
        )


# ---------------------------------------------------------------------------
# MultiCVRP
# ---------------------------------------------------------------------------

_M_NODES = 21
_M_VEHICLES = 2
_M_CAP = 60
_M_LIMIT = 40


class MultiCVRPEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        n, v = _M_NODES, _M_VEHICLES
        return {
            "obs:nodes.coordinates": ArraySpec(
                jnp.float32, (n, 2), 0.0, 10.0
            ),
            "obs:nodes.demands": ArraySpec(jnp.int32, (n,), 0, _M_CAP),
            "obs:windows.start": ArraySpec(jnp.float32, (n,), 0.0, 30.0),
            "obs:windows.end": ArraySpec(jnp.float32, (n,), 0.0, 30.0),
            "obs:coeffs.early": ArraySpec(jnp.float32, (n,), 0.0, 1.0),
            "obs:coeffs.late": ArraySpec(jnp.float32, (n,), 0.0, 1.0),
            "obs:vehicles.coordinates": ArraySpec(
                jnp.float32, (v, 2), 0.0, 10.0
            ),
            "obs:vehicles.local_times": ArraySpec(
                jnp.float32, (v,), 0.0, 565.6854
            ),
            "obs:vehicles.capacities": ArraySpec(jnp.int32, (v,), 0, _M_CAP),
            "obs:action_mask": ArraySpec(jnp.bool_, (v, n)),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(
                jnp.int32, (_M_VEHICLES,), 0, _M_NODES - 1, is_discrete=True
            )
        }

    def _coords(self):
        nodes = jnp.arange(_M_NODES, dtype=jnp.float32)
        return jnp.stack([nodes / 2.0, jnp.zeros_like(nodes)], axis=1)

    def _obs(self, st):
        n = _M_NODES
        depot = jnp.arange(n) == 0
        mask = depot[None, :] | (
            (st["demands"][None, :] > 0)
            & (st["demands"][None, :] <= st["cap"][:, None])
        )
        zeros = jnp.zeros((n,), jnp.float32)
        return {
            "obs:nodes.coordinates": self._coords(),
            "obs:nodes.demands": st["demands"],
            "obs:windows.start": zeros,
            "obs:windows.end": jnp.full((n,), 30.0, jnp.float32),
            "obs:coeffs.early": zeros,
            "obs:coeffs.late": zeros,
            "obs:vehicles.coordinates": st["veh"],
            "obs:vehicles.local_times": st["times"],
            "obs:vehicles.capacities": st["cap"],
            "obs:action_mask": mask,
        }

    def reset_env(self, key):
        demands = jnp.full((_M_NODES,), 10, jnp.int32).at[0].set(0)
        st = {
            "demands": demands,
            "veh": jnp.zeros((_M_VEHICLES, 2), jnp.float32),
            "times": jnp.zeros((_M_VEHICLES,), jnp.float32),
            "cap": jnp.full((_M_VEHICLES,), _M_CAP, jnp.int32),
            "step": jnp.int32(0),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        action = jnp.clip(action, 0, _M_NODES - 1)
        coords = self._coords()

        def body(v, carry):
            st, valid, reward = carry
            node = action[v]
            ok = (node == 0) | (
                (st["demands"][node] > 0)
                & (st["demands"][node] <= st["cap"][v])
            )
            nxt = coords[node]
            dist = jnp.sqrt(jnp.sum((st["veh"][v] - nxt) ** 2))
            reward = reward - jnp.where(ok, dist, 0.0)
            veh = st["veh"].at[v].set(jnp.where(ok, nxt, st["veh"][v]))
            times = st["times"].at[v].add(jnp.where(ok, dist, 0.0))
            refill = ok & (node == 0)
            serve = ok & (node != 0)
            cap = st["cap"].at[v].set(
                jnp.where(
                    refill,
                    _M_CAP,
                    st["cap"][v]
                    - jnp.where(serve, st["demands"][node], 0),
                )
            )
            demands = st["demands"].at[node].set(
                jnp.where(serve, 0, st["demands"][node])
            )
            st = dict(st, veh=veh, times=times, cap=cap, demands=demands)
            return st, valid & ok, reward

        st, valid, reward = lax.fori_loop(
            0,
            _M_VEHICLES,
            body,
            (dict(state), jnp.bool_(True), jnp.float32(0.0)),
        )
        step = state["step"] + 1
        served = jnp.all(st["demands"][1:] == 0)
        terminated = ~valid | served | (step >= _M_LIMIT)
        st = dict(st, step=step)
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=jnp.where(valid, reward, -100.0).astype(jnp.float32),
            terminated=terminated,
        )


# ---------------------------------------------------------------------------
# BinPack
# ---------------------------------------------------------------------------

_B_EMS = 40
_B_ITEMS = 20
_B_ACTIVE = 2
_B_LIMIT = 20
_B_EPS = 1e-6


def _b_valid(st):
    """(EMS, ITEMS) validity matrix."""
    ext = st["ems"][:, 1::2] - st["ems"][:, ::2]  # (E, 3) extents
    fits = jnp.all(
        st["items"][None, :, :] <= ext[:, None, :] + _B_EPS, axis=-1
    )
    return (
        st["ems_mask"][:, None]
        & st["items_mask"][None, :]
        & ~st["placed"][None, :]
        & fits
    )


class BinPackEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        e, i = _B_EMS, _B_ITEMS
        spec = {
            "obs:ems_mask": ArraySpec(jnp.bool_, (e,)),
            "obs:items_mask": ArraySpec(jnp.bool_, (i,)),
            "obs:items_placed": ArraySpec(jnp.bool_, (i,)),
            "obs:action_mask": ArraySpec(jnp.bool_, (e, i)),
        }
        for axis in ("x", "y", "z"):
            spec[f"obs:ems.{axis}1"] = ArraySpec(jnp.float32, (e,), 0.0, 1.0)
            spec[f"obs:ems.{axis}2"] = ArraySpec(jnp.float32, (e,), 0.0, 1.0)
            spec[f"obs:items.{axis}_len"] = ArraySpec(
                jnp.float32, (i,), 0.0, 1.0
            )
        return spec

    def action_spec(self):
        # [ems 0..39, item 0..19]
        return {"action": ArraySpec(jnp.int32, (2,), 0, 39, is_discrete=True)}

    def _obs(self, st):
        out = {
            "obs:ems_mask": st["ems_mask"],
            "obs:items_mask": st["items_mask"],
            "obs:items_placed": st["placed"],
            "obs:action_mask": _b_valid(st),
        }
        for k, axis in enumerate("xyz"):
            out[f"obs:ems.{axis}1"] = st["ems"][:, 2 * k]
            out[f"obs:ems.{axis}2"] = st["ems"][:, 2 * k + 1]
            out[f"obs:items.{axis}_len"] = st["items"][:, k]
        return out

    def reset_env(self, key):
        ems = jnp.zeros((_B_EMS, 6), jnp.float32)
        ems = ems.at[0, 1::2].set(1.0)  # full unit bin
        ems_mask = jnp.zeros((_B_EMS,), jnp.bool_).at[0].set(True)
        items = jnp.zeros((_B_ITEMS, 3), jnp.float32)
        items = items.at[:_B_ACTIVE].set(0.5)
        items_mask = (
            jnp.arange(_B_ITEMS) < _B_ACTIVE
        )
        st = {
            "ems": ems,
            "ems_mask": ems_mask,
            "items": items,
            "items_mask": items_mask,
            "placed": jnp.zeros((_B_ITEMS,), jnp.bool_),
            "step": jnp.int32(0),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        ems_i = jnp.clip(action[0], 0, _B_EMS - 1)
        item_i = jnp.clip(action[1], 0, _B_ITEMS - 1)
        valid = _b_valid(state)[ems_i, item_i]

        old = state["ems"][ems_i]  # (6,) x1 x2 y1 y2 z1 z2
        it = state["items"][item_i]  # (3,)
        # Children anchored at the EMS min corner, per SplitEms
        # (bin_pack_env.h:346-375): above, beside (y), beside (x).
        c_top = old.at[4].set(old[4] + it[2])
        c_y = old.at[2].set(old[2] + it[1])
        c_x = old.at[0].set(old[0] + it[0])
        cands = jnp.stack([c_top, c_y, c_x])  # (3, 6)
        cand_ok = jnp.all(cands[:, ::2] < cands[:, 1::2], axis=1)

        keep = state["ems_mask"] & (jnp.arange(_B_EMS) != ems_i)
        all_ems = jnp.concatenate([cands, state["ems"]], axis=0)
        all_ok = jnp.concatenate([cand_ok, keep])
        # Stable compaction: valid rows first, original order preserved.
        order = jnp.argsort(~all_ok, stable=True)
        new_ems = all_ems[order][:_B_EMS]
        new_mask = all_ok[order][:_B_EMS]
        new_ems = jnp.where(new_mask[:, None], new_ems, 0.0)

        ems = jnp.where(valid, new_ems, state["ems"])
        ems_mask = jnp.where(valid, new_mask, state["ems_mask"])
        placed = state["placed"].at[item_i].set(
            state["placed"][item_i] | valid
        )
        items_mask = state["items_mask"].at[item_i].set(
            state["items_mask"][item_i] & ~valid
        )
        reward = jnp.where(valid, jnp.prod(it), -1.0).astype(jnp.float32)

        step = state["step"] + 1
        st = {
            "ems": ems,
            "ems_mask": ems_mask,
            "items": state["items"],
            "items_mask": items_mask,
            "placed": placed,
            "step": step,
        }
        terminated = ~valid | ~jnp.any(_b_valid(st)) | (step >= _B_LIMIT)
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=terminated,
        )
