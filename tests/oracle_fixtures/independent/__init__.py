"""Independent scalar oracle models for golden-fixture generation.

The upstream packages (minigrid, highway-env, jumanji, pgx) are not
installable in this image (no network egress), so lockstep fixtures are
generated instead from *independent scalar reimplementations* written
directly from the published semantics: plain-Python, loop-based,
deliberately sharing no code or structure with envpool_tpu's vectorized
JAX implementations.  Two independently-written implementations agreeing
on full trajectories is the same evidence class as the chess-perft and
shogi brute-force crosschecks the suite already uses.

Generation protocol (mirrors the reference's inject-initial-state
alignment tests, e.g. mujoco_gym_align_test.py:38-82): the envpool_tpu
env is used ONLY to produce the episode's initial layout (reset state);
the scalar oracle then steps the whole episode by itself and its outputs
are committed as the golden.  tests/test_golden_lockstep.py replays the
envpool_tpu env over the same actions and asserts equality.
"""
