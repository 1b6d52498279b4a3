"""Evaluation domains over BN254 Fr.

The TPU-native analog of the halo2 fork's `EvaluationDomain` (consumed by
the reference at `/root/reference/src/circuit/modules/polycommit.rs:52` and
throughout its prover). Polynomials live on device as (16, n) Montgomery
limb arrays; transforms dispatch to `ezkl_tpu.kernels.ntt`.

Three representations (mirroring halo2's naming):
- coeff:           coefficients  a_0..a_{n-1}
- lagrange:        evaluations over H = <omega>, |H| = n = 2^k
- extended coset:  evaluations over g*H' with |H'| = n_ext = 2^(k+extended_k_gap)

The extended domain hosts quotient computation: gate polynomials have degree
<= deg * (n-1), so n_ext >= deg*(n-1)+1.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..fieldmath import limbs
from ..fieldmath.spec import FieldSpec, bn254_fr, NLIMBS
from ..kernels import ntt as nttmod


@dataclasses.dataclass(frozen=True, eq=False)
class Domain:
    spec: FieldSpec
    k: int                  # log2 domain size
    extended_k: int         # log2 extended domain size

    @property
    def n(self) -> int:
        return 1 << self.k

    @property
    def n_ext(self) -> int:
        return 1 << self.extended_k

    @property
    def omega(self) -> int:
        return nttmod.root_of_unity(self.spec, self.k)

    @property
    def omega_ext(self) -> int:
        return nttmod.root_of_unity(self.spec, self.extended_k)

    # -- transforms (device) ------------------------------------------------

    def lagrange_to_coeff(self, v):
        return nttmod.intt(self.spec, v)

    def coeff_to_lagrange(self, v):
        return nttmod.ntt(self.spec, v)

    def coeff_to_extended(self, v):
        """coeffs (16, n) -> evals over the extended coset (16, n_ext)."""
        pad = jnp.zeros((NLIMBS,) + v.shape[1:-1] + (self.n_ext - v.shape[-1],),
                        dtype=v.dtype)
        return nttmod.coset_ntt(self.spec, jnp.concatenate([v, pad], axis=-1))

    def extended_to_coeff(self, v):
        return nttmod.coset_intt(self.spec, v)

    # -- host-side scalars --------------------------------------------------

    def rotate_omega(self, x: int, rotation: int) -> int:
        """x * omega^rotation (host int)."""
        p = self.spec.modulus
        w = self.omega if rotation >= 0 else pow(self.omega, -1, p)
        return (x * pow(w, abs(rotation), p)) % p

    def vanishing_on_extended(self) -> jnp.ndarray:
        """Z_H(x) = x^n - 1 evaluated over the extended coset (16, n_ext),
        Montgomery. Z_H(g*w'^i) = g^n * w'^(n*i) - 1 (periodic, cheap).

        Host-computed numpy + tracer-proof device memo (`ntt._dev_cached`):
        an lru-cached device array here would retain a tracer when first
        touched inside a jit (the r4 NTT-twiddle failure class — this one
        is reached from inside the jitted quotient-combine stage)."""
        import numpy as np
        p = self.spec.modulus
        gn = pow(self.spec.generator, self.n, p)
        period = self.n_ext // self.n
        vals = [(gn * pow(self.omega_ext, self.n * i, p) - 1) % p
                for i in range(period)]
        key = ("vanish", self.spec, self.k, self.extended_k)
        hit = nttmod._DEV_MEMO.get(key)
        if hit is not None:
            return hit
        base = np.tile(limbs.encode(self.spec, vals), (1, self.n))
        return nttmod._dev_cached(key, base)

    def vanishing_inv_on_extended(self) -> jnp.ndarray:
        """1 / Z_H over the extended coset (never zero there)."""
        import numpy as np
        p = self.spec.modulus
        gn = pow(self.spec.generator, self.n, p)
        period = self.n_ext // self.n
        vals = [pow((gn * pow(self.omega_ext, self.n * i, p) - 1) % p, -1, p)
                for i in range(period)]
        key = ("vanish_inv", self.spec, self.k, self.extended_k)
        hit = nttmod._DEV_MEMO.get(key)
        if hit is not None:
            return hit
        base = np.tile(limbs.encode(self.spec, vals), (1, self.n))
        return nttmod._dev_cached(key, base)

    # -- polynomial evaluation at a host point ------------------------------

    def eval_coeff_at(self, coeffs, x: int) -> int:
        """Horner evaluation of a (16, n) coeff poly at host scalar x.
        Decodes to host ints; use for openings (cheap: one poly per call is
        avoided in the prover by the batched device path in kzg.py)."""
        p = self.spec.modulus
        cs = limbs.decode(self.spec, coeffs)
        acc = 0
        for c in reversed(list(cs)):
            acc = (acc * x + int(c)) % p
        return acc


@functools.lru_cache(maxsize=None)
def domain(k: int, extended_k: int | None = None, gate_degree: int = 8) -> Domain:
    """Domain for 2^k rows; extended size covers gate_degree * (n-1) + 1."""
    spec = bn254_fr()
    if extended_k is None:
        need = gate_degree * ((1 << k) - 1) + 1
        extended_k = max(k, (need - 1).bit_length())
    assert extended_k <= spec.two_adicity
    return Domain(spec, k, extended_k)
