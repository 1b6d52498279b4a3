"""ezkl_tpu — a TPU-native zero-knowledge proving framework for neural nets.

Capabilities mirror zkonduit/ezkl (ONNX graph -> PLONKish circuit over BN254
-> KZG SNARK), re-designed for TPU: the prover math (field arithmetic, NTT,
MSM, Poseidon, quotient evaluation) runs as vectorized JAX/XLA programs with
shard_map multi-chip scaling, while circuit synthesis and orchestration are
host-side Python.
"""

__version__ = "0.1.0"
