"""JAX/Pallas compute kernels: k-mer seeding, banded DP waves, trace
alignment.  All functions are jit-compatible with static shapes; ragged
results use capacity + overflow-count reporting (two-phase batching,
SURVEY.md §7 'Hard parts' #4)."""
