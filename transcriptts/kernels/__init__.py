"""Pure-numpy kernels (no Spark imports) — the per-group sequential algorithms
that Arrow UDF wrappers call. Kept Spark-free so golden-parity tests run fast
and the same code executes identically on driver and executors."""
