"""Pure-NumPy geometry kernels (no Spark imports here)."""
