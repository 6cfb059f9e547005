"""MyoSuite env family (musculoskeletal control tasks).

Reference surface: ``envpool/mujoco/myosuite/`` — the reference's task
metadata (exact obs dims, pinned model list) ships as a bazel-downloaded
JSON that is absent from the source tree, so exact surface parity is not
reconstructible offline.  This family implements the well-known public
MyoSuite core ids (finger/elbow/hand pose+reach, key turn, object hold,
pen twirl, leg walking) with MyoSuite's env structure: muscle-activation
actions in [0, 1] passed through first-order activation filters, dense
pose/reach rewards with the standard solved bonus, Fixed/Random target
variants.  Dynamics run on surrogate joint models (documented)."""

from .._lazy import lazy_exports

_EXPORTS = {
    "MyoEnv": "tasks",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
