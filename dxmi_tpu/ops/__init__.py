"""Low-level TPU ops: numerics helpers and (incrementally) Pallas kernels
for the hot paths."""
