"""Release smoke: build the wheel, install it offline, drive a pool.

The analog of the reference's release checks
(``scripts/release_installed_wheel_smoke.py``, ``Makefile:259-272``):
install the built wheel into an isolated prefix with ``--no-index``,
import envpool_tpu FROM THE WHEEL (not the repo), and run
make/reset/step end-to-end.  Run via ``make wheel-smoke``.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", ".", "--no-deps", "-w",
         "dist", "--no-build-isolation"],
        cwd=REPO, check=True, capture_output=True,
    )
    wheel = sorted(glob.glob(os.path.join(REPO, "dist", "envpool_tpu-*.whl")))[-1]
    tmp = tempfile.mkdtemp(prefix="wheel_smoke_")
    subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-index", "--no-deps",
         "--target", tmp, wheel],
        check=True, capture_output=True,
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = tmp
    # Force CPU: the install prefix replaces PYTHONPATH, so any site
    # customization that registered an out-of-tree backend is gone, and
    # an inherited JAX_PLATFORMS naming it would fail to initialize.
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    code = f"""
import envpool_tpu, numpy as np
assert envpool_tpu.__file__.startswith({tmp!r}), envpool_tpu.__file__
n_ids = len(envpool_tpu.list_all_envs())
assert n_ids >= 790, n_ids
env = envpool_tpu.make('CartPole-v1', env_type='gymnasium', num_envs=8,
                       seed=0)
obs, info = env.reset()
obs, rew, term, trunc, info = env.step(np.ones(8, np.int32))
assert obs.shape == (8, 4)
denv = envpool_tpu.make_dm('Catch-v0', num_envs=4)
ts = denv.reset()
print('WHEEL_SMOKE_OK', n_ids)
"""
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd="/tmp",
        capture_output=True, text=True,
    )
    out = (r.stdout + r.stderr).strip()
    print(out)
    return 0 if "WHEEL_SMOKE_OK" in out else 1


if __name__ == "__main__":
    raise SystemExit(main())
