"""KZG structured reference strings.

Mirrors the reference's SRS management (SURVEY.md §2.2 execute.rs:439-569):
`gen_srs` creates an INSECURE locally-generated SRS (reference analog
`src/pfsys/srs.rs:13-16`), artifacts live under `~/.ezkl-tpu/srs/kzg{k}.srs`
by default, and files round-trip through a simple versioned binary format.

The G1 powers are generated ON DEVICE: tau^i scalars via `limbs.powers`,
then one batched scalar-mul scan — O(256) point ops instead of n host
multiplications.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import pathlib
import struct

import numpy as np
import jax
import jax.numpy as jnp

from ..fieldmath import limbs, curve, hostcurve
from ..fieldmath.spec import bn254_fr, bn254_fq, FR_MODULUS, NLIMBS
from . import pairing

MAGIC = b"EZTPUSRS"
VERSION = 1


@dataclasses.dataclass
class SRS:
    """g1[i] = tau^i * G1 (i < 2^k) as a batched device PointP; g2 powers
    [G2, tau*G2] as host affine Fq2 pairs."""

    k: int
    g1: curve.PointP          # batch (n,)
    g2: tuple                 # G2 generator (host)
    s_g2: tuple               # tau * G2 (host)

    @property
    def n(self) -> int:
        return 1 << self.k


def repo_dir() -> pathlib.Path:
    base = os.environ.get("EZKL_TPU_SRS_REPO", str(pathlib.Path.home() / ".ezkl-tpu" / "srs"))
    p = pathlib.Path(base)
    p.mkdir(parents=True, exist_ok=True)
    return p


def srs_path(k: int) -> pathlib.Path:
    return repo_dir() / f"kzg{k}.srs"


def gen_srs(k: int, seed: bytes = b"ezkl-tpu insecure srs") -> SRS:
    """INSECURE deterministic SRS (tau derived from seed). Test/dev only —
    same caveat as the reference's gen-srs command."""
    tau = int.from_bytes(hashlib.blake2b(seed, digest_size=32).digest(), "little") % FR_MODULUS
    n = 1 << k
    fr = bn254_fr()

    # scalars tau^0..tau^{n-1}, raw form, then one batched fixed-base scalarmul
    with jax.ensure_compile_time_eval():
        powers_mont = limbs.jitted(fr).powers(tau, n)
        powers_raw = limbs.jitted(fr).from_mont(powers_mont)
    bits = curve.scalars_to_bits(powers_raw)          # (256, n)
    g = curve.generator((n,))
    g1 = jax.jit(curve.scalar_mul)(g, bits)
    # normalize to affine (z == 1): the MSM's fast path gathers only (x, y)
    # and uses mixed adds, which needs z == 1 on every lane
    ax, ay = curve._to_affine_jit(g1)
    g1 = curve.from_affine(ax, ay)

    g2 = pairing.G2_GEN
    s_g2 = pairing.g2_mul(g2, tau)
    return SRS(k=k, g1=g1, g2=g2, s_g2=s_g2)


def truncate(srs: SRS, k: int) -> SRS:
    """Restrict to the first 2^k powers (for smaller circuits)."""
    assert k <= srs.k
    n = 1 << k
    g1 = jax.tree.map(lambda a: a[..., :n], srs.g1)
    return SRS(k=k, g1=g1, g2=srs.g2, s_g2=srs.s_g2)


# ---------------------------------------------------------------------------
# serialization
# ---------------------------------------------------------------------------

def save(srs: SRS, path: str | os.PathLike | None = None) -> pathlib.Path:
    path = pathlib.Path(path) if path else srs_path(srs.k)
    ax, ay = curve._to_affine_jit(srs.g1)
    inf = np.asarray(curve.is_identity(srs.g1))
    ax = np.asarray(ax, dtype=np.uint32)
    ay = np.asarray(ay, dtype=np.uint32)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<II", VERSION, srs.k))
        for coord in (srs.g2, srs.s_g2):
            for fq2 in coord:
                for c in fq2:
                    f.write(int(c).to_bytes(32, "little"))
        f.write(inf.astype(np.uint8).tobytes())
        f.write(ax.tobytes())
        f.write(ay.tobytes())
    return path


def load(path: str | os.PathLike) -> SRS:
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == MAGIC, "not an ezkl-tpu srs file"
    version, k = struct.unpack("<II", data[8:16])
    assert version == VERSION
    off = 16
    g2_vals = []
    for _ in range(8):
        g2_vals.append(int.from_bytes(data[off:off + 32], "little"))
        off += 32
    g2 = ((g2_vals[0], g2_vals[1]), (g2_vals[2], g2_vals[3]))
    s_g2 = ((g2_vals[4], g2_vals[5]), (g2_vals[6], g2_vals[7]))
    n = 1 << k
    inf = np.frombuffer(data[off:off + n], dtype=np.uint8).astype(bool)
    off += n
    ax = np.frombuffer(data[off:off + 4 * NLIMBS * n], dtype=np.uint32).reshape(NLIMBS, n)
    off += 4 * NLIMBS * n
    ay = np.frombuffer(data[off:off + 4 * NLIMBS * n], dtype=np.uint32).reshape(NLIMBS, n)
    g1 = curve.from_affine(jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(inf))
    return SRS(k=k, g1=g1, g2=g2, s_g2=s_g2)


def get_or_create(k: int) -> SRS:
    """Load ~/.ezkl-tpu/srs/kzg{k}.srs, or any larger cached one truncated;
    else generate-and-cache (insecure local gen — no network in this image)."""
    p = srs_path(k)
    if p.exists():
        return load(p)
    for bigger in sorted(repo_dir().glob("kzg*.srs")):
        try:
            kk = int(bigger.stem[3:])
        except ValueError:
            continue
        if kk > k:
            return truncate(load(bigger), k)
    srs = gen_srs(k)
    save(srs)
    return srs
