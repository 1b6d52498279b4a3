"""Fiat-Shamir transcripts.

The reference proves with Blake2b or EVM (Keccak) transcripts from the
halo2 fork / snark-verifier (SURVEY.md §3.4 step 6, `src/pfsys/mod.rs`).
We define our own byte-level protocol (this engine has its own verifier):

* absorb a G1 point: 32-byte LE x || 32-byte LE y (affine, identity = 0||0)
* absorb an Fr scalar: 32-byte LE
* challenge: hash(state || b"\\x00") -> 64 bytes -> int LE mod r; the state
  then absorbs the challenge bytes (domain-separated chaining).

Host-side (a few KB per proof). `KeccakTranscript` swaps blake2b for
keccak256 for future EVM verifier compatibility.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..fieldmath import limbs, curve
from ..fieldmath.spec import bn254_fr, bn254_fq, FR_MODULUS
from ..utils.keccak import keccak256

FR = bn254_fr()
FQ = bn254_fq()


class Transcript:
    def __init__(self, label: bytes = b"ezkl-tpu-proof"):
        self._state = bytes(hashlib.blake2b(label, digest_size=64).digest())

    def _hash(self, data: bytes) -> bytes:
        return hashlib.blake2b(data, digest_size=64).digest()

    # -- absorbing ----------------------------------------------------------

    def common_bytes(self, data: bytes):
        self._state = self._hash(self._state + b"\x01" + data)

    def common_scalar(self, x: int):
        self.common_bytes(int(x % FR_MODULUS).to_bytes(32, "little"))

    def common_point(self, pt):
        """pt: host (x, y) ints or None (identity)."""
        if pt is None:
            self.common_bytes(b"\x00" * 64)
        else:
            self.common_bytes(
                int(pt[0]).to_bytes(32, "little") + int(pt[1]).to_bytes(32, "little")
            )

    # -- challenges ---------------------------------------------------------

    def challenge(self) -> int:
        out = self._hash(self._state + b"\x00")
        self._state = self._hash(self._state + b"\x02" + out)
        return int.from_bytes(out, "little") % FR_MODULUS


class KeccakTranscript(Transcript):
    def __init__(self, label: bytes = b"ezkl-tpu-proof"):
        self._state = keccak256(label)

    def _hash(self, data: bytes) -> bytes:
        # two squeezes for 64 bytes of output material
        h1 = keccak256(data)
        return h1 + keccak256(h1 + data)


class EvmTranscript:
    """EVM-native transcript: keccak256 state chaining, 32-byte BIG-endian
    encodings, single-squeeze challenges — what the generated Solidity
    verifier replays (reference EvmTranscript from snark-verifier,
    `src/pfsys/mod.rs:32-37`; ours matches our own protocol).

    absorb:    state = keccak256(state || 0x01 || data)
    challenge: out = keccak256(state || 0x00); state = keccak256(state ||
               0x02 || out); value = int_be(out) mod r
    """

    def __init__(self, label: bytes = b"ezkl-tpu-evm"):
        self._state = keccak256(label)

    def common_bytes(self, data: bytes):
        self._state = keccak256(self._state + b"\x01" + data)

    def common_scalar(self, x: int):
        self.common_bytes(int(x % FR_MODULUS).to_bytes(32, "big"))

    def common_point(self, pt):
        if pt is None:
            self.common_bytes(b"\x00" * 64)
        else:
            self.common_bytes(int(pt[0]).to_bytes(32, "big")
                              + int(pt[1]).to_bytes(32, "big"))

    def challenge(self) -> int:
        out = keccak256(self._state + b"\x00")
        self._state = keccak256(self._state + b"\x02" + out)
        return int.from_bytes(out, "big") % FR_MODULUS


def decode_point_host(pt: curve.PointP):
    """Device PointP (batch ()) -> host affine tuple or None."""
    batched = curve.PointP(pt.x[:, None], pt.y[:, None], pt.z[:, None])
    return curve.decode_points(batched)[0]


def decode_scalar_host(v) -> int:
    """Device (16,) Montgomery limb scalar -> host int."""
    return int(limbs.decode(FR, np.asarray(v)[:, None])[0])
