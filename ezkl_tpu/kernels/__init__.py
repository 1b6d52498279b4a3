"""TPU compute kernels: NTT, MSM, Poseidon — the prover's hot path.

These replace the out-of-tree halo2 fork + ICICLE CUDA kernels the
reference dispatches to (SURVEY.md §2.1, `/root/reference/src/execute.rs:84-97`).
"""
