"""TPU device engines (JAX/XLA/Pallas): batched FM-index ranks, lockstep
exact/inexact backward search, suffix-array resolution."""
