"""KZG polynomial commitments and openings, device-accelerated.

Replaces the halo2 fork's `commit_lagrange` / multiopen machinery
(SURVEY.md §2.1; consumed at `/root/reference/src/circuit/modules/
polycommit.rs:45-81`). TPU-first choices:

* commit(evals over H) = iNTT (device) then Pippenger MSM (device) over the
  monomial SRS — no group-element Lagrange SRS needed.
* opening witnesses are computed in EVALUATION form: W = (p - p(z))/(X - z)
  evaluated on H via one `batch_inv` — no sequential synthetic division.
* p(z) via the barycentric formula, batched on device.
* multiopen: GWC-style — group queries by point, RLC with challenge v
  within a group, one witness commitment per point; verifier folds groups
  with challenge u into a 2-pairing check (verifier.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fieldmath import limbs, curve
from ..fieldmath.curve import PointP
from ..fieldmath.spec import bn254_fr, NLIMBS
from ..kernels import msm as msmmod
from ..kernels import ntt as nttmod
from .srs import SRS

FR = bn254_fr()


@functools.lru_cache(maxsize=32)
def _jitted_commit(m: int, lagrange: bool):
    c = msmmod.default_window_bits(m)

    @jax.jit
    def run(pts, vals):
        if lagrange:
            vals = nttmod.intt(FR, vals)
        raw = limbs.from_mont(FR, vals)
        return msmmod.msm(pts, raw, c=c, affine=True)

    return run


@functools.lru_cache(maxsize=32)
def _jitted_to_raw(lagrange: bool):
    @jax.jit
    def run(vals):
        if lagrange:
            vals = nttmod.intt(FR, vals)
        return limbs.from_mont(FR, vals)

    return run


def _commit(srs: SRS, vals: jnp.ndarray, lagrange: bool) -> PointP:
    """Commit dispatch: multi-chip via `parallel.sharded.msm_sharded` when a
    mesh is active (set_mesh / EZKL_TPU_MESH) and the size shards evenly;
    single-device otherwise."""
    m = vals.shape[-1]
    assert m <= srs.n, "poly too long for SRS"
    pts = jax.tree.map(lambda a: a[..., :m], srs.g1)
    from ..parallel import sharded
    mesh = sharded.active_mesh()
    if mesh is not None:
        d = mesh.devices.size
        local = m // d if m % d == 0 else 0
        if local >= 1 and (local & (local - 1)) == 0:
            raw = _jitted_to_raw(lagrange)(vals)
            return sharded.msm_sharded(mesh, pts, raw)
    return _jitted_commit(m, lagrange)(pts, vals)


def commit_coeff(srs: SRS, coeffs: jnp.ndarray) -> PointP:
    """Commitment to a coefficient-form poly (16, m), m <= srs.n, m a power
    of two."""
    return _commit(srs, coeffs, lagrange=False)


def commit_lagrange(srs: SRS, evals: jnp.ndarray) -> PointP:
    """Commitment to a poly given by evals over H (|H| = len)."""
    return _commit(srs, evals, lagrange=True)


def _multi_group(m: int) -> int | None:
    """Window-group width for batched commits: at small n the per-window
    scan steps are only n/32 lanes wide (latency-bound), so batching G
    windows per step pays; at large n the kernel is VPU-bound and G=1
    wins (measured, docs/PERF.md)."""
    return min(8, max(1, (1 << 17) // m)) if m < (1 << 17) else None


@functools.lru_cache(maxsize=32)
def _jitted_commit_multi(m: int, lagrange: bool, cols: int):
    c = msmmod.default_window_bits(m)
    group = _multi_group(m)

    @jax.jit
    def run(pts, vals):                       # vals: (C, 16, m) Montgomery
        v = jnp.moveaxis(vals, 0, 1)          # (16, C, m) ntt batch layout
        if lagrange:
            v = nttmod.intt(FR, v)
        raw = limbs.from_mont(FR, v)
        return msmmod.msm_multi(pts, jnp.moveaxis(raw, 1, 0), c=c,
                                group=group, affine=True)

    return run


def commit_many(srs: SRS, stacks, lagrange: bool = True) -> list:
    """Commit C same-length polys in ONE batched MSM pass.

    stacks: (C, 16, m) device array (or a list of (16, m) arrays).
    Returns a list of C host affine points (transcript-ready), in order.
    Falls back to per-poly commits under an active mesh (the sharded MSM
    path is single-poly for now).

    The column count is padded to the next power of two with zero polys
    (committing to the identity, sliced off before decode) so ONE compiled
    executable serves every batch size in a bucket — a prove issues ~5
    different C values and each distinct C was a fresh multi-minute MSM
    compile on a cold TPU cache (the r4 k=14 cold-compile wall)."""
    from ..fieldmath import curve as curvemod
    if isinstance(stacks, (list, tuple)):
        if not stacks:
            return []
        stacks = jnp.stack(list(stacks), axis=0)
    C, _, m = stacks.shape
    if C == 0:
        return []
    from ..parallel import sharded
    if sharded.active_mesh() is not None:
        return [
            _decode_one(_commit(srs, stacks[i], lagrange)) for i in range(C)]
    assert m <= srs.n, "poly too long for SRS"
    pts = jax.tree.map(lambda a: a[..., :m], srs.g1)
    Cp = 1 << (C - 1).bit_length()
    if Cp != C:
        stacks = jnp.concatenate(
            [stacks, jnp.zeros((Cp - C,) + stacks.shape[1:], stacks.dtype)])
    out = _jitted_commit_multi(m, lagrange, Cp)(pts, stacks)
    out = PointP(out.x[..., :C], out.y[..., :C], out.z[..., :C])
    return curvemod.decode_points(out)


def _decode_one(p: PointP):
    from ..fieldmath import curve as curvemod
    batched = PointP(p.x[:, None], p.y[:, None], p.z[:, None])
    return curvemod.decode_points(batched)[0]


@functools.lru_cache(maxsize=32)
def _jitted_for_k(k: int):
    """Per-domain jitted kernels taking the point as a DEVICE scalar, so a
    new Fiat-Shamir point never recompiles."""
    n = 1 << k
    w = nttmod.root_of_unity(FR, k)
    with jax.ensure_compile_time_eval():
        wi = limbs.jitted(FR).powers(w, n)                      # (16, n)

    @jax.jit
    def eval_at(evals, z_mont, scale_mont):
        zb = jnp.broadcast_to(z_mont[:, None], (NLIMBS, n))
        inv = limbs.batch_inv(FR, limbs.sub(FR, zb, wi))
        terms = limbs.mont_mul(FR, limbs.mont_mul(FR, evals, wi), inv)
        return limbs.mont_mul(FR, _sum_last(terms), scale_mont)

    @jax.jit
    def open_witness(evals, value, z_mont):
        zb = jnp.broadcast_to(z_mont[:, None], (NLIMBS, n))
        inv = limbs.batch_inv(FR, limbs.sub(FR, wi, zb))
        num = limbs.sub(FR, evals, jnp.broadcast_to(value[:, None], evals.shape))
        return limbs.mont_mul(FR, num, inv)

    @jax.jit
    def eval_coeff_at(coeffs, z_mont):
        pw = limbs.powers_dynamic(FR, z_mont, coeffs.shape[-1])
        return _sum_last(limbs.mont_mul(FR, coeffs, pw))

    return eval_at, open_witness, eval_coeff_at


def eval_at(evals: jnp.ndarray, z: int, k: int) -> jnp.ndarray:
    """Barycentric evaluation p(z) from evals over H (z not in H).

    p(z) = (z^n - 1)/n * sum_i evals_i * w^i / (z - w^i).
    Returns a (16,) Montgomery limb scalar (device).
    """
    p = FR.modulus
    n = 1 << k
    zn = (pow(z, n, p) - 1) * pow(n, -1, p) % p
    fn, _, _ = _jitted_for_k(k)
    return fn(evals, limbs.const(FR, z), limbs.const(FR, zn))


def eval_coeff_at(coeffs: jnp.ndarray, z: int, k: int) -> jnp.ndarray:
    """p(z) from coefficient form (16, n) at host point z -> (16,) mont."""
    _, _, fn = _jitted_for_k(k)
    return fn(coeffs, limbs.const(FR, z))


def _sum_last(v: jnp.ndarray) -> jnp.ndarray:
    """Field sum along last axis (log-depth halving)."""
    n = v.shape[-1]
    while n > 1:
        if n % 2:
            v = jnp.concatenate(
                [v, jnp.zeros(v.shape[:-1] + (1,), v.dtype)], axis=-1)
            n += 1
        v = limbs.add(FR, v[..., : n // 2], v[..., n // 2:])
        n //= 2
    return v[..., 0]


def open_witness_evals(evals: jnp.ndarray, value, z: int, k: int) -> jnp.ndarray:
    """(p - v)/(X - z) as evals over H. `value` is (16,) Montgomery p(z)."""
    _, fn, _ = _jitted_for_k(k)
    return fn(evals, value, limbs.const(FR, z))
