"""Per-task MetaWorld compute_reward laws, reference-exact.

Behavioral spec: the per-task ``ComputeReward`` cases in
``envpool/mujoco/metaworld/metaworld_env.h:1635-2688`` (which mirror the
published metaworld v2/v3 ``compute_reward`` implementations).  Each law
here reproduces that task's formula — tolerance bounds/margins, hamacher
blends, caging parameterization, touch bonuses, snap-to-10 radii —
evaluated on the Sawyer surrogate's state (sawyer.py):

* ``tcp`` / ``grip`` (open fraction == the reference's ``tcp_open`` obs
  component) / finger-pad model (pads at tcp.y ± half-separation);
* ``obj`` — the task's tracked object/handle point; ``obj0`` its reset
  position; ``goal`` the target;
* ``disp_frac`` — articulation fraction for 1-dof tasks (drives the
  angle-based terms of door-open / lever-pull, a documented surrogate
  for the MuJoCo joint readout the reference uses).

Together with the category laws in sawyer.py (reach/push/pick-place and
the ten earlier articulated tasks) this gives 49 of the 50 tasks their
published reward law — hammer and the stick tasks run their laws over
the two-body surrogate (nail / container as ``obj2``).  Only
peg-insert-side keeps the generic law: its RectPrismTolerance needs
collision-box corner sites from an XML the reference does not ship.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_PI = float(np.pi)
_HAND_INIT = np.asarray([0.0, 0.6, 0.2], np.float32)
_PAD_HALF_CLOSED = 0.01
_PAD_HALF_OPEN = 0.05


def _hamacher(a, b):
    denom = a + b - a * b
    return jnp.where(denom > 0, a * b / denom, 0.0)


def _longtail(x, lower, upper, margin):
    """metaworld_env.h:254-268 LongTailTolerance (value_at_margin=0.1)."""
    margin = jnp.asarray(margin, jnp.float32)
    d = jnp.where(x < lower, lower - x, x - upper)
    scaled = 3.0 * d / jnp.where(margin > 0, margin, 1.0)
    out = 1.0 / (scaled * scaled + 1.0)
    out = jnp.where(margin > 0, out, 0.0)
    return jnp.where((x >= lower) & (x <= upper), 1.0, out)


def _gaussian(x, lower, upper, margin):
    """metaworld_env.h:278-289 GaussianTolerance."""
    margin = jnp.asarray(margin, jnp.float32)
    d = jnp.where(x < lower, lower - x, x - upper)
    d = d / jnp.where(margin > 0, margin, 1.0)
    scale = np.sqrt(-2.0 * np.log(0.1))
    out = jnp.exp(-0.5 * (d * scale) ** 2)
    out = jnp.where(margin > 0, out, 0.0)
    return jnp.where((x >= lower) & (x <= upper), 1.0, out)


def _norm(v):
    return jnp.linalg.norm(v)


def _dist2(a, b):
    """xy-plane distance (reference ``Distance2``)."""
    return jnp.linalg.norm(a[:2] - b[:2])


def _dscaled(a, b, s):
    return jnp.linalg.norm((a - b) * jnp.asarray(s, jnp.float32))


def _pads(tcp, grip):
    """Finger-pad positions from the surrogate pad model (sawyer.py)."""
    half = _PAD_HALF_CLOSED + (_PAD_HALF_OPEN - _PAD_HALF_CLOSED) * grip
    left = tcp.at[1].set(tcp[1] + half)
    right = tcp.at[1].set(tcp[1] - half)
    return left, right


# Pads at reset: hand at _HAND_INIT, gripper fully open (half = 0.05).
_INIT_LEFT_PAD = np.asarray([0.0, 0.65, 0.2], np.float32)
_INIT_RIGHT_PAD = np.asarray([0.0, 0.55, 0.2], np.float32)


def _caging(c, obj_pos, obj_radius, pad_success_thresh,
            object_reach_radius, xz_thresh, desired_effort=1.0,
            high_density=False, medium_density=False, init_obj=None,
            signed_y=False, grip_success_extra=-1.0,
            caging_threshold=0.97):
    """metaworld_env.h:1478-1547 GripperCagingReward, all options."""
    initial_obj = c["obj0"] if init_obj is None else init_obj
    left_pad, right_pad = _pads(c["tcp"], c["grip"])
    if signed_y:
        left_delta = left_pad[1] - obj_pos[1]
        right_delta = obj_pos[1] - right_pad[1]
    else:
        left_delta = jnp.abs(left_pad[1] - obj_pos[1])
        right_delta = jnp.abs(right_pad[1] - obj_pos[1])
    left_margin = jnp.abs(
        jnp.abs(left_pad[1] - initial_obj[1]) - pad_success_thresh
    )
    right_margin = jnp.abs(
        jnp.abs(right_pad[1] - initial_obj[1]) - pad_success_thresh
    )
    left_caging = _longtail(
        left_delta, obj_radius, pad_success_thresh, left_margin
    )
    right_caging = _longtail(
        right_delta, obj_radius, pad_success_thresh, right_margin
    )
    y_caging = _hamacher(left_caging, right_caging)

    init_tcp = jnp.asarray(_HAND_INIT)
    xz = jnp.asarray([0, 2])
    xz_margin = _norm(initial_obj[xz] - init_tcp[xz]) - xz_thresh
    xz_caging = _longtail(
        _norm(c["tcp"][xz] - obj_pos[xz]), 0.0, xz_thresh, xz_margin
    )
    caging = _hamacher(y_caging, xz_caging)
    gripper_closed = (
        jnp.clip(c["a"][3], 0.0, desired_effort) / desired_effort
    )
    if grip_success_extra >= 0.0:
        grip_margin = obj_radius + grip_success_extra
        lg = _longtail(left_delta, obj_radius, grip_margin, left_margin)
        rg = _longtail(right_delta, obj_radius, grip_margin, right_margin)
        y_gripping = _hamacher(lg, rg)
        gripping = jnp.where(caging > caging_threshold, y_gripping, 0.0)
        out = (caging + gripping) / 2.0
    else:
        gripping = jnp.where(caging > caging_threshold, gripper_closed, 0.0)
        out = _hamacher(caging, gripping)
    if high_density:
        out = (out + caging) / 2.0
    if medium_density:
        tcp_to_obj = _norm(obj_pos - c["tcp"])
        tcp_to_obj_init = _norm(initial_obj - init_tcp)
        reach_margin = jnp.abs(tcp_to_obj_init - object_reach_radius)
        reach = _longtail(
            tcp_to_obj, 0.0, object_reach_radius, reach_margin
        )
        out = (out + reach) / 2.0
    return out


def _sweep_caging(c, obj_pos, obj_radius, grip_success_extra, xz_thresh):
    """metaworld_env.h:1583-1619 SweepStyleCagingReward (margins from the
    CURRENT object y vs the INITIAL pad y, signed deltas)."""
    pad_success_margin = 0.05
    grip_success_margin = obj_radius + grip_success_extra
    left_pad, right_pad = _pads(c["tcp"], c["grip"])
    left_delta = left_pad[1] - obj_pos[1]
    right_delta = obj_pos[1] - right_pad[1]
    right_margin = jnp.abs(
        jnp.abs(obj_pos[1] - _INIT_RIGHT_PAD[1]) - pad_success_margin
    )
    left_margin = jnp.abs(
        jnp.abs(obj_pos[1] - _INIT_LEFT_PAD[1]) - pad_success_margin
    )
    rc = _longtail(right_delta, obj_radius, pad_success_margin, right_margin)
    lc = _longtail(left_delta, obj_radius, pad_success_margin, left_margin)
    rg = _longtail(right_delta, obj_radius, grip_success_margin, right_margin)
    lg = _longtail(left_delta, obj_radius, grip_success_margin, left_margin)
    y_caging = _hamacher(rc, lc)
    y_gripping = _hamacher(rg, lg)
    init_tcp = jnp.asarray(_HAND_INIT)
    xz = jnp.asarray([0, 2])
    xz_margin = _norm(c["obj0"][xz] - init_tcp[xz]) - xz_thresh
    xz_caging = _longtail(
        _norm(c["tcp"][xz] - obj_pos[xz]), 0.0, xz_thresh, xz_margin
    )
    caging = _hamacher(y_caging, xz_caging)
    gripping = jnp.where(caging > 0.95, y_gripping, 0.0)
    return (caging + gripping) / 2.0


def _log_floor(radius, thresh, k, b):
    """The log-barrier "floor" height used by bin-picking / box-close /
    door-open / pick-out-of-hole (metaworld_env.h:1742-1748 etc.)."""
    return jnp.where(
        radius <= thresh, 0.0,
        k * jnp.log(jnp.maximum(radius - thresh, 1e-9)) + b,
    )


# ---------------------------------------------------------------------------
# Per-task laws.  Each returns (reward_0_10, grasp_like, in_place, target_d).
# Case numbers cite metaworld_env.h's ComputeReward switch.
# ---------------------------------------------------------------------------


def _law_basketball(c):  # case 1
    target = c["goal"].at[2].set(0.3)
    target_to_obj = _dscaled(c["obj"], target, (1.0, 1.0, 2.0))
    target_to_obj_init = _dscaled(c["obj0"], target, (1.0, 1.0, 2.0))
    in_place = _longtail(target_to_obj, 0.0, 0.08, target_to_obj_init)
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    grasped = _caging(c, c["obj"], 0.025, 0.06, 0.01, 0.005, 1.0, True)
    lifted = (
        (tcp_to_obj < 0.035) & (c["grip"] > 0.0)
        & (c["obj"][2] - 0.01 > c["obj0"][2])
    )
    grasped = jnp.where(lifted, 1.0, grasped)
    reward = _hamacher(grasped, in_place)
    reward = jnp.where(lifted, reward + 1.0 + 5.0 * in_place, reward)
    reward = jnp.where(target_to_obj < 0.08, 10.0, reward)
    return reward, grasped, in_place, target_to_obj


def _law_bin_picking(c):  # case 2
    obj_to_target = _norm(c["obj"] - c["goal"])
    init = _norm(c["obj0"] - c["goal"])
    in_place = _longtail(obj_to_target, 0.0, 0.05, init)
    hand = c["tcp"]
    r0 = _dist2(hand, c["obj0"])
    r1 = _dist2(hand, c["goal"])
    floor = jnp.minimum(
        _log_floor(r0, 0.03, 0.02, 0.2), _log_floor(r1, 0.03, 0.02, 0.2)
    )
    above_floor = jnp.where(
        hand[2] >= floor, 1.0,
        _longtail(jnp.maximum(floor - hand[2], 0.0), 0.0, 0.01, 0.05),
    )
    grasped = _caging(c, c["obj"], 0.015, 0.05, 0.01, 0.01, 0.7, True)
    reward = _hamacher(grasped, in_place)
    near = _norm(c["obj"] - hand) < 0.04
    pinched = c["grip"] < 0.43
    lifted = c["obj"][2] - 0.02 > c["obj0"][2]
    grasp_success = near & lifted & ~pinched
    reward = jnp.where(
        grasp_success,
        reward + 1.0 + 5.0 * _hamacher(above_floor, in_place), reward,
    )
    reward = jnp.where(obj_to_target < 0.05, 10.0, reward)
    return reward, grasped, in_place, obj_to_target


def _law_box_close(c):  # case 3
    obs_quat = c["quat"]
    reward_grab = jnp.clip(
        (jnp.clip(c["a"][3], -1.0, 1.0) + 1.0) / 2.0, 0.0, 1.0
    )
    quat_err = _norm(
        jnp.asarray([
            obs_quat[0] - 0.707, obs_quat[1], obs_quat[2],
            obs_quat[3] - 0.707,
        ])
    )
    reward_quat = jnp.maximum(1.0 - quat_err / 0.2, 0.0)
    lid = c["obj"] + jnp.asarray([0.0, 0.0, 0.02])
    hand = c["tcp"]
    radius = _dist2(hand, lid)
    floor = _log_floor(radius, 0.02, 0.04, 0.4)
    above_floor = jnp.where(
        hand[2] >= floor, 1.0,
        _longtail(floor - hand[2], 0.0, 0.01, floor / 2.0),
    )
    in_place = _longtail(_norm(hand - lid), 0.0, 0.02, 0.5)
    ready = _hamacher(above_floor, in_place)
    pos_error = _dscaled(c["goal"], lid, (1.0, 1.0, 3.0))
    lifted = (
        0.2 * (lid[2] > 0.04).astype(jnp.float32)
        + 0.8 * _longtail(pos_error, 0.0, 0.05, 0.25)
    )
    reward = 2.0 * _hamacher(reward_grab, ready) + 8.0 * lifted
    success = _norm(c["obj"] - c["goal"]) < 0.08
    reward = jnp.where(success, 10.0, reward)
    reward = reward * reward_quat
    return reward, reward_grab, lifted, _norm(c["obj"] - c["goal"])


def _law_button_topdown_wall(c):  # case 4/5 (same law as topdown)
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    tcp_to_obj_init = _norm(c["obj"] - jnp.asarray(_HAND_INIT))
    obj_to_target = jnp.abs(c["goal"][2] - c["obj"][2])
    obj_to_target_init = jnp.abs(c["goal"][2] - c["obj0"][2])
    tcp_closed = 1.0 - c["grip"]
    near = _longtail(tcp_to_obj, 0.0, 0.01, tcp_to_obj_init)
    pressed = _longtail(obj_to_target, 0.0, 0.005, obj_to_target_init)
    reward = 5.0 * _hamacher(tcp_closed, near)
    reward = jnp.where(tcp_to_obj <= 0.03, reward + 5.0 * pressed, reward)
    return reward, near, pressed, obj_to_target


def _law_button_wall(c):  # case 7
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    near = _longtail(
        tcp_to_obj, 0.0, 0.01, _norm(c["obj"] - jnp.asarray(_HAND_INIT))
    )
    obj_to_target = jnp.abs(c["goal"][1] - c["obj"][1])
    obj_to_target_init = jnp.abs(c["goal"][1] - c["obj0"][1])
    pressed = _longtail(obj_to_target, 0.0, 0.005, obj_to_target_init)
    far = 2.0 * _hamacher((1.0 - c["grip"]) / 2.0, near)
    close = 2.0 + 2.0 * (1.0 + c["grip"]) + 4.0 * pressed * pressed
    reward = jnp.where(tcp_to_obj > 0.07, far, close)
    return reward, near, pressed, obj_to_target


def _law_coffee_push_pull(c):  # cases 9/10 (identical law)
    scaled_to_target = _dscaled(c["obj"], c["goal"], (2.0, 2.0, 1.0))
    scaled_init = _dscaled(c["obj0"], c["goal"], (2.0, 2.0, 1.0))
    in_place = _longtail(scaled_to_target, 0.0, 0.05, scaled_init)
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    grasped = _caging(
        c, c["obj"], 0.02, 0.05, 0.04, 0.05, 0.7, False, True
    )
    reward = _hamacher(grasped, in_place)
    touch = (tcp_to_obj < 0.04) & (c["grip"] > 0.0)
    reward = jnp.where(touch, reward + 1.0 + 5.0 * in_place, reward)
    reward = jnp.where(scaled_to_target < 0.05, 10.0, reward)
    return reward, grasped, in_place, _norm(c["obj"] - c["goal"])


def _law_dial_turn(c):  # case 11
    # Surrogate: ``obj`` is the dial-rim point the reference composes
    # from the dial body and knob angle; handle_init == obj0.
    obj_to_target = _norm(c["obj"] - c["goal"])
    init_margin = jnp.abs(_norm(c["obj0"] - c["goal"]) - 0.07)
    in_place = _longtail(obj_to_target, 0.0, 0.07, init_margin)
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    reach = _gaussian(
        tcp_to_obj, 0.0, 0.005,
        jnp.abs(_norm(c["obj0"] - jnp.asarray(_HAND_INIT)) - 0.005),
    )
    reach = _hamacher(reach, jnp.clip(c["a"][3], 0.0, 1.0))
    reward = 10.0 * _hamacher(reach, in_place)
    return reward, reach, in_place, obj_to_target


def _law_assembly(c, disassemble=False):  # cases 0 / 12
    hand = c["tcp"]
    wrench = c["obj"]
    wrench = wrench.at[0].set(
        jnp.where(jnp.abs(wrench[0] - hand[0]) < 0.01, hand[0], wrench[0])
    )
    wrench_center = c["obj"]  # surrogate: nut center == tracked point
    q = c["quat"]
    quat_err = _norm(
        jnp.asarray([q[0] - 0.707, q[1], q[2], q[3] - 0.707])
    )
    reward_quat = jnp.maximum(1.0 - quat_err / 0.4, 0.0)
    # assembly: medium density; disassemble: high density (cases 0/12).
    reward_grab = _caging(
        c, wrench, 0.015, 0.02, 0.01, 0.01, 1.0,
        high_density=disassemble, medium_density=not disassemble,
    )
    if disassemble:
        pos_error = (
            c["goal"] + jnp.asarray([0.0, 0.0, 0.1])
        ) - wrench_center
        in_place = (
            0.1 * (wrench_center[2] > 0.02).astype(jnp.float32)
            + 0.9 * _longtail(_norm(pos_error), 0.0, 0.02, 0.2)
        )
        success = c["obj"][2] > c["goal"][2]
        reward = (2.0 * reward_grab + 6.0 * in_place) * reward_quat
        reward = jnp.where(success, 10.0, reward)
        return reward, reward_grab, in_place, jnp.float32(0.0)
    pos_error = c["goal"] - wrench_center
    radius = _norm(pos_error[:2])
    aligned = radius < 0.02
    hooked = pos_error[2] > 0.0
    success = aligned & hooked
    threshold = jnp.where(success, 0.02, 0.01)
    target_height = jnp.where(
        radius > threshold,
        0.02 * jnp.log(jnp.maximum(radius - threshold, 1e-9)) + 0.2, 0.0,
    )
    pe = pos_error.at[2].set(target_height - wrench_center[2])
    lifted = (wrench_center[2] > 0.02) | (radius < threshold)
    in_place = (
        0.1 * lifted.astype(jnp.float32)
        + 0.9 * _longtail(_dscaled(pe, jnp.zeros(3), (1.0, 1.0, 3.0)),
                          0.0, 0.02, 0.4)
    )
    reward = (2.0 * reward_grab + 6.0 * in_place) * reward_quat
    reward = jnp.where(success, 10.0, reward)
    return reward, reward_grab, in_place, jnp.float32(0.0)


def _law_door_close(c):  # case 13
    obj_to_target = _norm(c["obj"] - c["goal"])
    in_place = _gaussian(
        obj_to_target, 0.0, 0.05, _norm(c["obj0"] - c["goal"])
    )
    tcp_to_target = _norm(c["tcp"] - c["goal"])
    hand_margin = _norm(jnp.asarray(_HAND_INIT) - c["obj"]) + 0.1
    hand_in_place = _gaussian(
        tcp_to_target, 0.0, 0.25 * 0.05, hand_margin
    )
    reward = 3.0 * hand_in_place + 6.0 * in_place
    reward = jnp.where(obj_to_target < 0.05, 10.0, reward)
    return reward, hand_in_place, in_place, obj_to_target


def _law_door_lock(c):  # case 14
    left_pad, _ = _pads(c["tcp"], c["grip"])
    tcp_to_obj = _dscaled(c["obj"], left_pad, (0.25, 1.0, 0.5))
    tcp_to_obj_init = _dscaled(
        c["obj"], jnp.asarray(_INIT_LEFT_PAD), (0.25, 1.0, 0.5)
    )
    obj_to_target = jnp.abs(c["goal"][2] - c["obj"][2])
    near = _longtail(tcp_to_obj, 0.0, 0.01, tcp_to_obj_init)
    pressed = _longtail(obj_to_target, 0.0, 0.005, 0.1)
    reward = (
        2.0 * _hamacher(jnp.maximum(c["grip"], 0.0), near) + 8.0 * pressed
    )
    return reward, near, pressed, obj_to_target


def _law_door_open(c):  # case 15
    hand = c["tcp"]
    reward_grab = (jnp.clip(c["a"][3], -1.0, 1.0) + 1.0) / 2.0
    door = c["obj"] + jnp.asarray([-0.05, 0.0, 0.0])
    radius = _dist2(hand, door)
    floor = _log_floor(radius, 0.12, 0.04, 0.4)
    above_floor = jnp.where(
        hand[2] >= floor, 1.0,
        _longtail(floor - hand[2], 0.0, 0.01, floor / 2.0),
    )
    in_place = _longtail(
        _norm(hand - door - jnp.asarray([0.05, 0.03, -0.01])),
        0.0, 0.06, 0.5,
    )
    ready = _hamacher(above_floor, in_place)
    # Surrogate: door hinge angle from the articulation fraction
    # (full travel == the reference's fully-open pi/2 + pi/6 swing).
    theta = -c["disp_frac"] * (_PI / 2.0 + _PI / 6.0)
    door_angle = -theta
    opened = (
        0.2 * (theta < -_PI / 90.0).astype(jnp.float32)
        + 0.8 * _longtail(
            _PI / 2.0 + _PI / 6.0 - door_angle, 0.0, 0.5, _PI / 3.0
        )
    )
    reward = 2.0 * _hamacher(ready, reward_grab) + 8.0 * opened
    success = jnp.abs(c["obj"][0] - c["goal"][0]) <= 0.08
    reward = jnp.where(success, 10.0, reward)
    return reward, reward_grab, opened, jnp.float32(0.0)


def _law_door_unlock(c):  # case 16
    shoulder = c["tcp"] + jnp.asarray([0.0, 0.055, 0.07])
    init_shoulder = jnp.asarray(_HAND_INIT) + jnp.asarray(
        [0.0, 0.055, 0.07]
    )
    shoulder_to_lock = _dscaled(shoulder, c["obj"], (0.25, 1.0, 0.5))
    shoulder_init = _dscaled(
        init_shoulder, c["obj0"], (0.25, 1.0, 0.5)
    )
    ready = _longtail(shoulder_to_lock, 0.0, 0.02, shoulder_init)
    obj_to_target = jnp.abs(c["goal"][0] - c["obj"][0])
    pushed = _longtail(obj_to_target, 0.0, 0.005, 0.1)
    reward = 2.0 * ready + 8.0 * pushed
    return reward, ready, pushed, obj_to_target


def _law_hand_insert(c):  # case 17
    obj_to_target = _norm(c["obj"] - c["goal"])
    in_place = _longtail(
        obj_to_target, 0.0, 0.05, _norm(c["obj0"] - c["goal"])
    )
    grasped = _caging(c, c["obj"], 0.015, 0.05, 0.01, 0.005, 1.0, True)
    reward = _hamacher(grasped, in_place)
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    touch = (tcp_to_obj < 0.02) & (c["grip"] > 0.0)
    reward = jnp.where(touch, reward + 1.0 + 7.0 * in_place, reward)
    reward = jnp.where(obj_to_target < 0.05, 10.0, reward)
    return reward, grasped, in_place, obj_to_target


def _law_handle_pull(c, side=False):  # cases 25/26
    if side:
        obj_to_target = _norm(c["obj"] - c["goal"])
        init_d = _norm(c["obj0"] - c["goal"])
    else:
        obj_to_target = jnp.abs(c["goal"][2] - c["obj"][2])
        init_d = jnp.abs(c["goal"][2] - c["obj0"][2])
    in_place = _longtail(obj_to_target, 0.0, 0.05, init_d)
    grasped = _caging(
        c, c["obj"], 0.032 if side else 0.022, 0.06 if side else 0.05,
        0.01, 0.01, 1.0, True,
    )
    reward = _hamacher(grasped, in_place)
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    lifted = (
        (tcp_to_obj < 0.035) & (c["grip"] > 0.0)
        & (c["obj"][2] - 0.01 > c["obj0"][2])
    )
    reward = jnp.where(lifted, reward + 1.0 + 5.0 * in_place, reward)
    reward = jnp.where(obj_to_target < 0.05, 10.0, reward)
    return reward, grasped, in_place, obj_to_target


def _law_lever_pull(c):  # case 27
    shoulder = c["tcp"] + jnp.asarray([0.0, 0.055, 0.07])
    init_shoulder = jnp.asarray(_HAND_INIT) + jnp.asarray(
        [0.0, 0.055, 0.07]
    )
    shoulder_to_lever = _dscaled(shoulder, c["obj"], (4.0, 1.0, 4.0))
    shoulder_init = _dscaled(init_shoulder, c["obj0"], (4.0, 1.0, 4.0))
    ready = _longtail(shoulder_to_lever, 0.0, 0.02, shoulder_init)
    # Surrogate: lever angle from articulation fraction (0 -> pi/2).
    lever_angle = c["disp_frac"] * (_PI / 2.0)
    lever_error = jnp.abs(lever_angle - _PI / 2.0)
    engagement = _longtail(
        lever_error, 0.0, _PI / 48.0, _PI / 2.0 - _PI / 12.0
    )
    in_place = _longtail(
        _norm(c["obj"] - c["goal"]), 0.0, 0.04,
        _norm(c["obj0"] - c["goal"]),
    )
    reward = 10.0 * _hamacher(ready, in_place)
    return reward, ready, engagement, shoulder_to_lever


def _law_pick_place_wall(c):  # case 28
    midpoint = jnp.asarray([c["goal"][0], 0.77, 0.25])
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    obj_to_mid = _dscaled(c["obj"], midpoint, (1.0, 1.0, 3.0))
    mid_init = _dscaled(c["obj0"], midpoint, (1.0, 1.0, 3.0))
    part1 = _longtail(obj_to_mid, 0.0, 0.05, mid_init)
    obj_to_target = _norm(c["obj"] - c["goal"])
    part2 = _longtail(
        obj_to_target, 0.0, 0.05, _norm(c["obj0"] - c["goal"])
    )
    grasped = _caging(c, c["obj"], 0.015, 0.05, 0.01, 0.005, 1.0)
    grasped_place = _hamacher(grasped, part1)
    lifted = (
        (tcp_to_obj < 0.02) & (c["grip"] > 0.0)
        & (c["obj"][2] - 0.015 > c["obj0"][2])
    )
    over_wall = c["obj"][1] > 0.75
    reward = jnp.where(
        lifted,
        jnp.where(
            over_wall,
            grasped_place + 1.0 + 4.0 + 3.0 * part2,
            grasped_place + 1.0 + 4.0 * part1,
        ),
        grasped_place,
    )
    reward = jnp.where(obj_to_target < 0.05, 10.0, reward)
    return reward, grasped, part2, obj_to_target


def _law_pick_out_of_hole(c):  # case 29
    obj_to_target = _norm(c["obj"] - c["goal"])
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    radius = _dist2(c["tcp"], c["obj0"])
    floor = _log_floor(radius, 0.03, 0.015, 0.15)
    above_floor = jnp.where(
        c["tcp"][2] >= floor, 1.0,
        _longtail(jnp.maximum(floor - c["tcp"][2], 0.0), 0.0, 0.01, 0.02),
    )
    grasped = _caging(c, c["obj"], 0.015, 0.02, 0.01, 0.03, 0.1, True)
    in_place = _longtail(
        obj_to_target, 0.0, 0.02, _norm(c["obj0"] - c["goal"])
    )
    reward = _hamacher(grasped, in_place)
    grasp_success = (
        (tcp_to_obj < 0.04) & (c["obj"][2] - 0.02 > c["obj0"][2])
        & ~(c["grip"] < 0.33)
    )
    reward = jnp.where(
        grasp_success,
        reward + 1.0 + 5.0 * _hamacher(in_place, above_floor), reward,
    )
    reward = jnp.where(obj_to_target < 0.05, 10.0, reward)
    return reward, grasped, in_place, obj_to_target


def _law_plate_slide(c, variant):  # cases 31-34
    obj_to_target = _norm(c["obj"] - c["goal"])
    in_margin = _norm(c["obj0"] - c["goal"])
    grasp_margin = _norm(jnp.asarray(_HAND_INIT) - c["obj0"])
    if variant != "forward":
        in_margin = in_margin - 0.05
        grasp_margin = grasp_margin - 0.05
    in_place = _longtail(obj_to_target, 0.0, 0.05, in_margin)
    tcp_to_obj = _norm(c["tcp"] - c["obj"])
    grasped = _longtail(tcp_to_obj, 0.0, 0.05, grasp_margin)
    if variant == "forward":
        reward = 8.0 * _hamacher(grasped, in_place)
    else:
        reward = jnp.where(
            (c["tcp"][2] <= 0.03) & (tcp_to_obj < 0.07),
            2.0 + 7.0 * in_place, 1.5 * grasped,
        )
    reward = jnp.where(obj_to_target < 0.05, 10.0, reward)
    return reward, grasped, in_place, obj_to_target


def _law_peg_unplug_side(c):  # case 36
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    obj_to_target = _norm(c["obj"] - c["goal"])
    grasped = _caging(c, c["obj"], 0.025, 0.05, 0.01, 0.005, 0.8, True)
    in_place = _longtail(
        obj_to_target, 0.0, 0.05, _norm(c["obj0"] - c["goal"])
    )
    grasp_success = (
        (c["grip"] > 0.5) & (c["obj"][0] - c["obj0"][0] > 0.015)
    )
    reward = jnp.where(
        grasp_success & (tcp_to_obj < 0.035),
        1.0 + 2.0 * grasped + 5.0 * in_place, 2.0 * grasped,
    )
    reward = jnp.where(obj_to_target <= 0.05, 10.0, reward)
    return reward, grasped, in_place, obj_to_target


def _law_soccer(c):  # case 37
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    scaled_to_target = _dscaled(c["obj"], c["goal"], (3.0, 1.0, 1.0))
    scaled_init = _dscaled(c["obj"], c["obj0"], (3.0, 1.0, 1.0))
    in_place = _longtail(scaled_to_target, 0.0, 0.07, scaled_init)
    goal_line = c["goal"][1] - 0.1
    past_line = (
        (c["obj"][1] > goal_line)
        & (jnp.abs(c["obj"][0] - c["goal"][0]) > 0.10)
    )
    in_place = jnp.where(
        past_line,
        jnp.clip(
            in_place
            - 2.0 * ((c["obj"][1] - goal_line) / (1.0 - goal_line)),
            0.0, 1.0,
        ),
        in_place,
    )
    grasped = _sweep_caging(c, c["obj"], 0.013, 0.01, 0.005)
    reward = 3.0 * grasped + 6.5 * in_place
    reward = jnp.where(scaled_to_target < 0.07, 10.0, reward)
    return reward, grasped, in_place, _norm(c["obj"] - c["goal"])


def _law_push_wall(c):  # case 41
    midpoint = jnp.asarray([-0.05, 0.77, c["obj"][2]])
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    mid = _dscaled(c["obj"], midpoint, (3.0, 1.0, 1.0))
    mid_init = _dscaled(c["obj0"], midpoint, (3.0, 1.0, 1.0))
    part1 = _longtail(mid, 0.0, 0.05, mid_init)
    target_to_obj = _norm(c["obj"] - c["goal"])
    part2 = _longtail(
        target_to_obj, 0.0, 0.05, _norm(c["obj0"] - c["goal"])
    )
    grasped = _caging(c, c["obj"], 0.015, 0.05, 0.01, 0.005, 1.0, True)
    touch = (tcp_to_obj < 0.02) & (c["grip"] > 0.0)
    over_wall = c["obj"][1] > 0.75
    reward = jnp.where(
        touch,
        jnp.where(
            over_wall,
            2.0 * grasped + 1.0 + 4.0 + 3.0 * part2,
            2.0 * grasped + 1.0 + 4.0 * part1,
        ),
        2.0 * grasped,
    )
    reward = jnp.where(target_to_obj < 0.05, 10.0, reward)
    return reward, grasped, part2, target_to_obj


def _law_push_back(c):  # case 42
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    target_to_obj = _norm(c["obj"] - c["goal"])
    init = _norm(c["obj0"] - c["goal"])
    in_place = _longtail(target_to_obj, 0.0, 0.05, init)
    grasped = _sweep_caging(c, c["obj"], 0.007, 0.003, 0.01)
    reward = _hamacher(grasped, in_place)
    moving = (
        (tcp_to_obj < 0.01) & (c["grip"] > 0.0) & (c["grip"] < 0.55)
        & (init - target_to_obj > 0.01)
    )
    reward = jnp.where(moving, reward + 1.0 + 5.0 * in_place, reward)
    reward = jnp.where(target_to_obj < 0.05, 10.0, reward)
    return reward, grasped, in_place, target_to_obj


def _law_shelf_place(c):  # case 45
    obj_to_target = _norm(c["obj"] - c["goal"])
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    in_place = _longtail(
        obj_to_target, 0.0, 0.05, _norm(c["obj0"] - c["goal"])
    )
    grasped = _caging(c, c["obj"], 0.02, 0.05, 0.01, 0.01, 1.0)
    reward = _hamacher(grasped, in_place)
    in_band = (
        (c["obj"][2] > 0.0) & (c["obj"][2] < 0.24)
        & (c["obj"][0] > c["goal"][0] - 0.15)
        & (c["obj"][0] < c["goal"][0] + 0.15)
    )
    under_shelf = in_band & (c["obj"][1] > c["goal"][1] - 0.15) & (
        c["obj"][1] < c["goal"][1]
    )
    z_scaling = (0.24 - c["obj"][2]) / 0.24
    y_scaling = (c["obj"][1] - (c["goal"][1] - 0.15)) / 0.15
    bound_loss = _hamacher(y_scaling, z_scaling)
    in_place = jnp.where(
        under_shelf, jnp.clip(in_place - bound_loss, 0.0, 1.0), in_place
    )
    in_place = jnp.where(
        in_band & (c["obj"][1] > c["goal"][1]), 0.0, in_place
    )
    lifted = (
        (tcp_to_obj < 0.025) & (c["grip"] > 0.0)
        & (c["obj"][2] - 0.01 > c["obj0"][2])
    )
    reward = jnp.where(lifted, reward + 1.0 + 5.0 * in_place, reward)
    reward = jnp.where(obj_to_target < 0.05, 10.0, reward)
    return reward, grasped, in_place, obj_to_target


def _law_sweep(c, into=False):  # cases 46/47
    target = c["goal"]
    if into:
        target = target.at[2].set(c["obj"][2])
    obj_to_target = _norm(c["obj"] - target)
    tcp_to_obj = _norm(c["obj"] - c["tcp"])
    in_place = _longtail(
        obj_to_target, 0.0, 0.05, _norm(c["obj0"] - target)
    )
    grasped = _sweep_caging(
        c, c["obj"], 0.02, 0.005 if into else 0.01,
        0.01 if into else 0.005,
    )
    reward = 2.0 * grasped + 6.0 * _hamacher(grasped, in_place)
    reward = jnp.where(obj_to_target < 0.05, 10.0, reward)
    return reward, grasped, in_place, obj_to_target


def _law_hammer(c):  # case 22
    hand = c["tcp"]
    hammer = c["obj"]
    hammer_head = hammer + jnp.asarray([0.16, 0.06, 0.0])
    threshed = hammer.at[0].set(
        jnp.where(jnp.abs(hammer[0] - hand[0]) < 0.07, hand[0], hammer[0])
    )
    q = c["quat"]
    quat_err = _norm(jnp.asarray([q[0] - 1.0, q[1], q[2], q[3]]))
    reward_quat = jnp.maximum(1.0 - quat_err / 0.4, 0.0)
    reward_grab = _caging(
        c, threshed, 0.015, 0.02, 0.01, 0.01, 1.0, True, False
    )
    in_place = (
        0.1 * (hammer_head[2] > 0.02).astype(jnp.float32)
        + 0.9 * _longtail(_norm(hammer_head - c["goal"]), 0.0, 0.02, 0.2)
    )
    reward = (2.0 * reward_grab + 6.0 * in_place) * reward_quat
    # Surrogate nail joint: displacement of the second body from spawn.
    success = _norm(c["obj2"] - c["obj2_0"]) > 0.09
    reward = jnp.where(success & (reward > 5.0), 10.0, reward)
    return reward, reward_grab, in_place, jnp.float32(0.0)


def _law_stick_push(c):  # case 38
    stick = c["obj"] + jnp.asarray([0.015, 0.0, 0.0])
    container = c["obj2"]
    tcp_to_stick = _norm(stick - c["tcp"])
    stick_to_target = _norm(stick - c["goal"])
    stick_in_place = _longtail(
        stick_to_target, 0.0, 0.12,
        _norm(c["obj0"] - c["goal"]) - 0.12,
    )
    container_to_target = _norm(container - c["goal"])
    container_in_place = _longtail(
        container_to_target, 0.0, 0.12,
        _norm(c["obj2_0"] - c["goal"]) - 0.12,
    )
    # StickCagingReward(.., 0.04, 0.05, 0.01, 0.01, high, use_stick_init)
    grasped = _caging(
        c, stick, 0.04, 0.05, 0.01, 0.01, 1.0, True, False,
        init_obj=c["obj0"],
    )
    grasp_success = (
        (tcp_to_stick < 0.02) & (c["grip"] > 0.0)
        & (stick[2] - 0.01 > c["obj0"][2])
    )
    grasped = jnp.where(grasp_success, 1.0, grasped)
    reward = jnp.where(
        grasp_success,
        jnp.where(
            container_to_target <= 0.12, 10.0,
            2.0 + 5.0 * stick_in_place + 3.0 * container_in_place,
        ),
        grasped,
    )
    return reward, grasped, stick_in_place, container_to_target


def _law_stick_pull(c):  # case 39
    stick = c["obj"]
    handle = c["obj2"]
    end_of_stick = stick + jnp.asarray([0.12, 0.0, 0.0])
    container = handle + jnp.asarray([0.05, 0.0, 0.0])
    container_init = c["obj2_0"] + jnp.asarray([0.05, 0.0, 0.0])
    tcp_to_stick = _norm(stick - c["tcp"])
    handle_to_target = _norm(handle - c["goal"])
    stick_to_container = _dscaled(stick, container, (1.0, 1.0, 2.0))
    stick_in_place = _longtail(
        stick_to_container, 0.0, 0.05,
        _dscaled(c["obj0"], container_init, (1.0, 1.0, 2.0)),
    )
    stick_to_target = _norm(stick - c["goal"])
    stick_in_place2 = _longtail(
        stick_to_target, 0.0, 0.05, _norm(c["obj0"] - c["goal"])
    )
    container_to_target = _norm(container - c["goal"])
    container_in_place = _longtail(
        container_to_target, 0.0, 0.05, _norm(c["obj2_0"] - c["goal"])
    )
    grasped = _caging(
        c, stick, 0.014, 0.05, 0.01, 0.01, 1.0, True, False,
        init_obj=c["obj2_0"],
    )
    grasp_success = (
        (tcp_to_stick < 0.02) & (c["grip"] > 0.0)
        & (stick[2] - 0.01 > c["obj0"][2])
    )
    grasped = jnp.where(grasp_success, 1.0, grasped)
    grasped_place = _hamacher(grasped, stick_in_place)
    inserted = (
        (end_of_stick[0] >= handle[0])
        & (jnp.abs(end_of_stick[1] - handle[1]) <= 0.040)
        & (jnp.abs(end_of_stick[2] - handle[2]) <= 0.060)
    )
    reward = jnp.where(
        grasp_success,
        jnp.where(
            inserted,
            jnp.where(
                handle_to_target <= 0.12, 10.0,
                1.0 + grasped_place + 5.0 + 2.0 * stick_in_place2
                + container_in_place,
            ),
            1.0 + grasped_place + 5.0 * stick_in_place,
        ),
        grasped_place,
    )
    return reward, grasped, stick_in_place, handle_to_target


# name -> law(ctx).  Covers every task whose published law is computable
# from the surrogate's single-object state (see module docstring).
LAWS = {
    "assembly-v3": lambda c: _law_assembly(c, False),
    "basketball-v3": _law_basketball,
    "bin-picking-v3": _law_bin_picking,
    "box-close-v3": _law_box_close,
    "button-press-topdown-wall-v3": _law_button_topdown_wall,
    "button-press-wall-v3": _law_button_wall,
    "coffee-pull-v3": _law_coffee_push_pull,
    "coffee-push-v3": _law_coffee_push_pull,
    "dial-turn-v3": _law_dial_turn,
    "disassemble-v3": lambda c: _law_assembly(c, True),
    "door-close-v3": _law_door_close,
    "door-lock-v3": _law_door_lock,
    "door-open-v3": _law_door_open,
    "door-unlock-v3": _law_door_unlock,
    "hand-insert-v3": _law_hand_insert,
    "handle-pull-side-v3": lambda c: _law_handle_pull(c, True),
    "handle-pull-v3": lambda c: _law_handle_pull(c, False),
    "lever-pull-v3": _law_lever_pull,
    "pick-place-wall-v3": _law_pick_place_wall,
    "pick-out-of-hole-v3": _law_pick_out_of_hole,
    "plate-slide-v3": lambda c: _law_plate_slide(c, "forward"),
    "plate-slide-side-v3": lambda c: _law_plate_slide(c, "side"),
    "plate-slide-back-v3": lambda c: _law_plate_slide(c, "back"),
    "plate-slide-back-side-v3": lambda c: _law_plate_slide(c, "backside"),
    "peg-unplug-side-v3": _law_peg_unplug_side,
    "soccer-v3": _law_soccer,
    "push-wall-v3": _law_push_wall,
    "push-back-v3": _law_push_back,
    "shelf-place-v3": _law_shelf_place,
    "sweep-into-v3": lambda c: _law_sweep(c, True),
    "sweep-v3": lambda c: _law_sweep(c, False),
    "hammer-v3": _law_hammer,
    "stick-push-v3": _law_stick_push,
    "stick-pull-v3": _law_stick_pull,
}

# Tasks whose obs second slot carries a second body (nail / container),
# with its surrogate spawn point (metaworld_env.h cases 22/38/39 reset;
# the container spawn is a documented surrogate constant — the XML body
# defaults are not shipped in the reference tree).
TWO_BODY = {
    "hammer-v3": None,  # nail spawns at the sampled goal
    "stick-push-v3": (0.2, 0.6, 0.02),
    "stick-pull-v3": (0.2, 0.6, 0.02),
}

# Rest quaternion per task for the obs/quat-error terms: assembly /
# disassemble / box-close expect the nut/lid at a 90-degree z rotation
# (quat (.707, 0, 0, .707), metaworld_env.h:1689,1777 quat-error form).
REST_QUAT = {
    "assembly-v3": (0.7071068, 0.0, 0.0, 0.7071068),
    "disassemble-v3": (0.7071068, 0.0, 0.0, 0.7071068),
    "box-close-v3": (0.7071068, 0.0, 0.0, 0.7071068),
    # Stick obs quats are XYZW (BodyQuatXYZW, metaworld_env.h:639-646);
    # identity in that order is (0, 0, 0, 1).
    "stick-push-v3": (0.0, 0.0, 0.0, 1.0),
    "stick-pull-v3": (0.0, 0.0, 0.0, 1.0),
}
