"""API adapters: Gymnasium, dm_env, and the functional/XLA interface."""
