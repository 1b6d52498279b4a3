"""TPU-native PLONKish proof system (the engine the reference outsources).

The reference delegates its entire prover core to the out-of-tree
`zkonduit/halo2` fork + ICICLE CUDA (SURVEY.md §2.1, L0). This package IS
that engine, built TPU-first:

- `pairing`   host BN254 Fq2/Fq6/Fq12 tower + optimal ate pairing (verifier)
- `domain`    evaluation domains over Fr; NTT/coset dispatch to kernels
- `srs`       KZG structured reference strings (local insecure gen + IO)
- `kzg`       commitments (device MSM) and opening proofs
- `transcript` Fiat-Shamir (blake2b; EVM/keccak variant)
- `cs`        constraint system: columns, gates, permutation, lookups
- `prover`    proof creation (device NTT/MSM hot path)
- `verifier`  host verification incl. MockProver-style row checker
"""
