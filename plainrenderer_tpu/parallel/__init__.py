"""Multi-chip SPMD scaling (jax.sharding over ICI)."""
