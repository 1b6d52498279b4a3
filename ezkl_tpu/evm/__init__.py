"""EVM interop: Solidity verifier generation + calldata encoding
(reference L6, `/root/reference/src/eth.rs` + halo2_solidity_verifier)."""

from .solidity import generate_verifier  # noqa: F401
