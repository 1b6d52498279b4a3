"""Vectorized 256-bit Montgomery arithmetic on TPU.

Representation: a field element array has shape ``(16, *batch)`` uint32 —
16 little-endian limbs of 16 bits each, limb axis first so that the batch
axis lands on TPU vector lanes. All values are kept canonical (< modulus)
in Montgomery form unless stated otherwise.

Design notes (TPU-first):

* 16-bit limbs in uint32: the TPU VPU has exact 32-bit integer multiply
  (low half) but no widening 64-bit product. With 16-bit limbs every
  partial product a_i*b_j < 2^32 is exact in uint32.
* Multiplication is a single broadcast outer product (16,16,batch) followed
  by anti-diagonal column sums computed with a pad/reshape "shear" (no
  gathers, 5 XLA ops) — column accumulators stay < 2^21 so they are exact.
* Montgomery reduction is done in "separated" form: M = T_lo * N' mod R,
  result = (T + M*N) / R — three outer products total instead of a 256-step
  CIOS loop.
* All carry/borrow propagation uses Kogge-Stone carry-lookahead (log-depth,
  vectorized along the limb axis) instead of sequential ripple chains. This
  keeps each field op to a few hundred XLA ops, which matters both for
  VPU utilization and XLA compile time.

This module replaces the reference's dependency on halo2curves/ICICLE field
kernels (SURVEY.md §2.1: `halo2_proofs` fork prover core; `/root/reference/
Cargo.toml:23-27`) with a TPU-native design; algorithms are textbook
Comba/Montgomery, laid out for SIMD.
"""

from __future__ import annotations

import functools as _functools
import os as _os

import numpy as np
import jax
import jax.numpy as jnp

from .spec import FieldSpec, LIMB_BITS, LIMB_MASK, NLIMBS, int_to_limbs, limbs_to_int

_U32 = jnp.uint32


def _u(x: int):
    return _U32(x)


# ---------------------------------------------------------------------------
# host <-> device conversion helpers (slow; for tests / one-off setup)
# ---------------------------------------------------------------------------

def encode(spec: FieldSpec, xs, mont: bool = True) -> np.ndarray:
    """Python ints (any nested shape) -> (16, *shape) uint32 limb array."""
    arr = np.asarray(xs, dtype=object)
    flat = arr.reshape(-1)
    out = np.zeros((NLIMBS, flat.size), np.uint32)
    for idx in range(flat.size):
        v = int(flat[idx]) % spec.modulus
        if mont:
            v = (v * spec.r) % spec.modulus
        out[:, idx] = int_to_limbs(v)
    return out.reshape((NLIMBS,) + arr.shape)


def decode(spec: FieldSpec, limbs, mont: bool = True) -> np.ndarray:
    """(16, *shape) limb array -> object ndarray of Python ints."""
    a = np.asarray(limbs)
    batch = a.shape[1:]
    flat = a.reshape(NLIMBS, -1)
    rinv = pow(spec.r, -1, spec.modulus) if mont else 1
    out = np.empty(flat.shape[1], dtype=object)
    for idx in range(flat.shape[1]):
        v = limbs_to_int(flat[:, idx])
        out[idx] = (v * rinv) % spec.modulus
    return out.reshape(batch)


def encode_i64(spec: FieldSpec, xs: np.ndarray) -> np.ndarray:
    """Vectorized int64 ndarray -> (16, *shape) RAW (non-Montgomery) limbs.

    Negative values map to p - |x|. This is the witness-generation fast path
    (quantized model values are i64); full-width ints use `encode`.
    """
    xs = np.asarray(xs, dtype=np.int64)
    mag = np.abs(xs).astype(np.uint64)
    out = np.zeros((NLIMBS,) + xs.shape, np.uint32)
    for i in range(4):
        out[i] = ((mag >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(np.uint32)
    neg = xs < 0
    if np.any(neg):
        # p - mag, little-endian borrow subtract (vectorized)
        p_limbs = spec.mod_limbs.astype(np.int64)
        borrow = np.zeros(xs.shape, np.int64)
        for i in range(NLIMBS):
            d = p_limbs[i] - out[i].astype(np.int64) - borrow
            borrow = (d < 0).astype(np.int64)
            d = np.where(d < 0, d + (1 << LIMB_BITS), d)
            out[i] = np.where(neg, d.astype(np.uint32), out[i])
    return out


def pack_rows(a: np.ndarray) -> np.ndarray:
    """(16, n) RAW (non-Montgomery) u32 limbs -> (n,) structured 4×u64 array.

    Vectorized host-side packing for set operations (np.sort/searchsorted/
    unique); the structured dtype's lexicographic order is a consistent total
    order (not numeric order), which is all matching needs.
    """
    a = np.asarray(a, np.uint64)
    n = a.shape[-1]
    out = np.zeros((n, 4), np.uint64)
    for i in range(NLIMBS):
        out[:, i // 4] |= a[i] << np.uint64(16 * (i % 4))
    return np.ascontiguousarray(out).view([("", np.uint64)] * 4).reshape(-1)


def pack_rows_multi(blocks) -> np.ndarray:
    """List of (16, n) RAW limb arrays (a tuple of values per row) -> (n,)
    structured array over 4*len(blocks) u64 fields (row-wise tuples)."""
    cols = []
    for a in blocks:
        a = np.asarray(a, np.uint64)
        w = np.zeros((a.shape[-1], 4), np.uint64)
        for i in range(NLIMBS):
            w[:, i // 4] |= a[i] << np.uint64(16 * (i % 4))
        cols.append(w)
    packed = np.concatenate(cols, axis=1)
    return np.ascontiguousarray(packed).view(
        [("", np.uint64)] * (4 * len(blocks))).reshape(-1)


def const(spec: FieldSpec, value: int, mont: bool = True) -> jnp.ndarray:
    """A single field constant as a (16,) limb vector (broadcastable)."""
    v = value % spec.modulus
    if mont:
        v = (v * spec.r) % spec.modulus
    return jnp.asarray(int_to_limbs(v), dtype=_U32)


def bcast_const(spec: FieldSpec, value: int, batch_ndim: int, mont: bool = True):
    """Constant reshaped (16, 1, 1, ...) for broadcasting against batch dims."""
    c = const(spec, value, mont=mont)
    return c.reshape((NLIMBS,) + (1,) * batch_ndim)


def zeros(batch_shape) -> jnp.ndarray:
    return jnp.zeros((NLIMBS,) + tuple(batch_shape), dtype=_U32)


def ones_mont(spec: FieldSpec, batch_shape) -> jnp.ndarray:
    one = const(spec, 1, mont=True).reshape((NLIMBS,) + (1,) * len(tuple(batch_shape)))
    return jnp.broadcast_to(one, (NLIMBS,) + tuple(batch_shape))


# ---------------------------------------------------------------------------
# unstacked ("limb list") compute core
#
# All device math below operates on PYTHON LISTS of 16 per-limb arrays
# instead of a stacked (16, *B) array. Every limb-index manipulation (shift,
# anti-diagonal sum, carry lookahead) then happens at TRACE time as list
# reindexing, and the emitted XLA graph is pure elementwise arithmetic on
# identically-shaped arrays — which XLA fuses into one kernel. The previous
# stacked implementation used pad/reshape "shear" tricks that defeated
# fusion and materialized the (16,16,*B) outer products in HBM: measured
# 6.1 Melem/s mont_mul at 2^20 on v5e vs 74 Melem/s for this form (12x).
# Public API stays stacked; `_unstack`/`_stack` sit at the boundaries and
# fuse away.
# ---------------------------------------------------------------------------

def _unstack(a):
    return [a[i] for i in range(a.shape[0])]


def _stack(xs):
    return jnp.stack([jnp.asarray(x, _U32) for x in xs], axis=0)


def _ks_carry_l(g, p):
    """Kogge-Stone carry lookahead on lists: c[k] = g[k] | (p[k] & c[k-1]).

    g, p: lists of K {0,1} u32 arrays; returns carry OUT of each position.
    """
    K = len(g)
    c = list(g)
    pp = list(p)
    d = 1
    while d < K:
        c = [c[k] | (pp[k] & c[k - d]) if k >= d else c[k] for k in range(K)]
        pp = [pp[k] & pp[k - d] if k >= d else jnp.zeros_like(pp[k])
              for k in range(K)]
        d *= 2
    return c


def _normalize_l(cols, bound_bits: int):
    """Exactly normalize base-2^16 columns (list of K, values < 2^bound_bits).

    Returns (list of 16-bit limbs, carry_out_of_top in {0,1}). The caller
    must size K so the true value fits (carry_out then provably 0) or
    consume it; split-round top spill is dropped (mod 2^(16K) semantics)."""
    v = list(cols)
    K = len(v)
    bound = (1 << bound_bits) - 1
    while bound > (1 << LIMB_BITS):
        lo = [x & _u(LIMB_MASK) for x in v]
        hi = [x >> LIMB_BITS for x in v]
        v = [lo[k] + hi[k - 1] if k >= 1 else lo[k] for k in range(K)]
        bound = LIMB_MASK + (bound >> LIMB_BITS)
    g = [(x >> LIMB_BITS).astype(_U32) for x in v]        # x == 2^16
    p = [(x == _u(LIMB_MASK)).astype(_U32) for x in v]    # x == 2^16 - 1
    c = _ks_carry_l(g, p)
    out = [(v[k] + c[k - 1] if k >= 1 else v[k]) & _u(LIMB_MASK)
           for k in range(K)]
    return out, c[-1]


def _raw_add_l(a, b):
    s = [x + y for x, y in zip(a, b)]  # <= 2^17 - 2
    return _normalize_l(s, 17)


def _raw_sub_l(a, b):
    """a - b limbwise with borrow lookahead; returns (limbs, borrow_out)."""
    K = len(a)
    g = [(a[k] < b[k]).astype(_U32) for k in range(K)]
    p = [(a[k] == b[k]).astype(_U32) for k in range(K)]
    bor = _ks_carry_l(g, p)
    out = [(a[k] + _u(1 << LIMB_BITS) - b[k] - (bor[k - 1] if k >= 1 else 0))
           & _u(LIMB_MASK) for k in range(K)]
    return out, bor[-1]


def _mod_limbs_l(spec: FieldSpec):
    return [int(x) for x in spec.mod_limbs]


def _cond_sub_mod_l(spec: FieldSpec, a):
    """Subtract modulus once if a >= modulus (assumes a < 2*modulus)."""
    pl = _mod_limbs_l(spec)
    plb = [jnp.broadcast_to(_u(x), a[0].shape) for x in pl]
    d, borrow = _raw_sub_l(a, plb)
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, a[k], d[k]) for k in range(len(a))]


def _mul_columns_l(a, b):
    """Product columns of two limb lists -> list of 32 u32 columns < 2^21.

    Each 32x32->32 multiply of 16-bit values is exact; lo/hi 16-bit halves
    accumulate into columns bounded by 16*2^16 + 16*2^16 < 2^21."""
    K = NLIMBS
    lo_cols = [None] * (2 * K)
    hi_cols = [None] * (2 * K)
    for i in range(K):
        for j in range(K):
            pr = a[i] * b[j]
            plo = pr & _u(LIMB_MASK)
            phi = pr >> LIMB_BITS
            k = i + j
            lo_cols[k] = plo if lo_cols[k] is None else lo_cols[k] + plo
            hi_cols[k + 1] = phi if hi_cols[k + 1] is None else hi_cols[k + 1] + phi
    z = jnp.zeros_like(a[0])
    return [
        (lo_cols[k] if lo_cols[k] is not None else z)
        + (hi_cols[k] if hi_cols[k] is not None else z)
        for k in range(2 * K)
    ]


def _mul_columns_const_l(a, bconst):
    """Same as `_mul_columns_l` with a STATIC integer-limb operand: zero
    limbs are skipped at trace time (Montgomery N and N' both have several)."""
    K = NLIMBS
    lo_cols = [None] * (2 * K)
    hi_cols = [None] * (2 * K)
    for i in range(K):
        for j in range(K):
            bj = int(bconst[j])
            if bj == 0:
                continue
            pr = a[i] * _u(bj)
            plo = pr & _u(LIMB_MASK)
            phi = pr >> LIMB_BITS
            k = i + j
            lo_cols[k] = plo if lo_cols[k] is None else lo_cols[k] + plo
            hi_cols[k + 1] = phi if hi_cols[k + 1] is None else hi_cols[k + 1] + phi
    z = jnp.zeros_like(a[0])
    return [
        (lo_cols[k] if lo_cols[k] is not None else z)
        + (hi_cols[k] if hi_cols[k] is not None else z)
        for k in range(2 * K)
    ]


@_functools.lru_cache(maxsize=8)
def _nprime_limbs(spec: FieldSpec):
    return tuple(int(x) for x in int_to_limbs(
        pow(-spec.modulus, -1, 1 << (LIMB_BITS * NLIMBS))
        % (1 << (LIMB_BITS * NLIMBS))))


# ---------------------------------------------------------------------------
# MXU constant-multiply: the two Montgomery-reduction products (x N' mod R,
# x N) have a STATIC operand, so each is a linear map over the limbs —
# a (64, 32) banded constant matrix times the 8-bit limb split of the
# variable operand. On TPU that rides the MXU (bf16 x bf16 -> f32, exact:
# 8-bit values, products < 2^16, <= 32-term sums < 2^21 << 2^24), replacing
# ~450 VPU u32 multiplies per element with one tiny matmul. Used inside
# pallas kernels and the TPU XLA core; CPU keeps the u32 convolution.
# ---------------------------------------------------------------------------

def _use_mxu_reduce() -> bool:
    """Default OFF: measured on v5e the MXU path is bit-exact but ~35%
    SLOWER than the u32 convolution (104 vs 162 Mmul/s standalone) — the
    u32<->bf16 cast chain and (32, blk) relayouts cost more than the saved
    VPU multiplies at K=32 MXU utilization. Kept behind EZKL_TPU_MXU_REDUCE
    for future tuning (int8 MXU path / wider fused batches)."""
    env = _os.environ.get("EZKL_TPU_MXU_REDUCE")
    if env is not None:
        return env not in ("0", "false")
    return False


def _const_mat8(c_bytes: tuple):
    """(64, 32) bf16 band matrix M[i+j, i] = c8[j] for the convolution
    cols8[k] = sum_{i+j=k} a8[i] * c8[j].

    Built from iotas + scalar selects instead of a literal array: pallas
    kernels reject captured array constants, and XLA/Mosaic constant-folds
    or CSEs this tiny (64, 32) computation."""
    k = jax.lax.broadcasted_iota(jnp.int32, (64, 32), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (64, 32), 1)
    d = k - i
    M = jnp.zeros((64, 32), jnp.float32)
    for j, cj in enumerate(c_bytes):
        if cj:
            M = jnp.where(d == j, jnp.float32(cj), M)
    return M.astype(jnp.bfloat16)


@_functools.lru_cache(maxsize=8)
def _nprime_bytes(spec: FieldSpec):
    v = pow(-spec.modulus, -1, 1 << (LIMB_BITS * NLIMBS)) \
        % (1 << (LIMB_BITS * NLIMBS))
    return tuple((v >> (8 * i)) & 0xFF for i in range(32))


@_functools.lru_cache(maxsize=8)
def _mod_bytes(spec: FieldSpec):
    return tuple((spec.modulus >> (8 * i)) & 0xFF for i in range(32))


def _mul_columns_const_mxu(a, c_bytes):
    """a: list of 16 u32 limb arrays (16-bit values) -> 32 base-2^16
    product columns (< 2^30) via one MXU matmul against the static
    operand's byte matrix."""
    a8 = []
    for x in a:
        a8.append(x & _u(0xFF))
        a8.append(x >> 8)
    # u32 -> bf16 via i32/f32 (Mosaic has no direct u32<->bf16 casts)
    A = (jnp.stack(a8).astype(jnp.int32).astype(jnp.float32)
         .astype(jnp.bfloat16))                            # (32, *B)
    flat = A.reshape(32, -1)
    M = _const_mat8(tuple(c_bytes))
    cols8 = jax.lax.dot_general(
        M, flat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (64, n)
    cols8 = cols8.astype(jnp.int32).astype(_U32).reshape((64,) + a[0].shape)
    return [cols8[2 * k] + (cols8[2 * k + 1] << 8) for k in range(32)]


def _mont_mul_l(spec: FieldSpec, a, b, reduce: bool = True):
    """List-form Montgomery product (separated reduction).

    reduce=False returns the pre-canonical value in [0, 2p) — the lazy
    domain used inside the pallas point kernels (see `_add_2p_l`)."""
    t_cols = _mul_columns_l(a, b)
    t_lo, _ = _normalize_l(t_cols[:NLIMBS], 21)
    if _use_mxu_reduce():
        m_cols = _mul_columns_const_mxu(t_lo, _nprime_bytes(spec))
        m, _ = _normalize_l(m_cols[:NLIMBS], 30)
        mn_cols = _mul_columns_const_mxu(m, _mod_bytes(spec))
        s_cols = [t_cols[k] + mn_cols[k] for k in range(2 * NLIMBS)]
        s, _ = _normalize_l(s_cols, 31)      # low 16 limbs == 0 after this
    else:
        m_cols = _mul_columns_const_l(t_lo, _nprime_limbs(spec))
        m, _ = _normalize_l(m_cols[:NLIMBS], 21)
        mn_cols = _mul_columns_const_l(m, _mod_limbs_l(spec))
        s_cols = [t_cols[k] + mn_cols[k] for k in range(2 * NLIMBS)]
        s, _ = _normalize_l(s_cols, 22)      # low 16 limbs == 0 after this
    hi = s[NLIMBS:]
    return _cond_sub_mod_l(spec, hi) if reduce else hi


def _add_l(spec: FieldSpec, a, b):
    s, _ = _raw_add_l(a, b)  # no carry-out: a, b < p < 2^254
    return _cond_sub_mod_l(spec, s)


def _sub_l(spec: FieldSpec, a, b):
    d, borrow = _raw_sub_l(a, b)
    pl = [jnp.broadcast_to(_u(x), d[0].shape) for x in _mod_limbs_l(spec)]
    fixed, _ = _raw_add_l(d, pl)
    bb = borrow.astype(jnp.bool_)
    return [jnp.where(bb, fixed[k], d[k]) for k in range(len(d))]


# ---------------------------------------------------------------------------
# lazy (<2p) domain — used inside the pallas point kernels (pcurve)
#
# Residues are kept in [0, 2p) between operations and only canonicalized at
# kernel exits, dropping the per-multiply `_cond_sub_mod_l` (~6-8% of the
# point-add op count). Closure proofs (BN254 Fq, p ~ 0.756*2^254, R = 2^256):
#   mul: a, b < 2p  =>  (a*b + m*N)/R < 4p^2/R + p = p*(4p/R + 1) < 1.76p
#   add: a + b < 4p < 2^256, one conditional -2p  => < 2p
#   sub: a - b + {0, 2p}  => < 2p
# ---------------------------------------------------------------------------

@_functools.lru_cache(maxsize=8)
def _mod2_limbs_l(spec: FieldSpec):
    from .spec import int_to_limbs
    return [int(x) for x in int_to_limbs(2 * spec.modulus)]


def _cond_sub_2p_l(spec: FieldSpec, a):
    """Subtract 2p once if a >= 2p (assumes a < 4p < 2^256)."""
    pl2 = _mod2_limbs_l(spec)
    plb = [jnp.broadcast_to(_u(x), a[0].shape) for x in pl2]
    d, borrow = _raw_sub_l(a, plb)
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, a[k], d[k]) for k in range(len(a))]


def _add_2p_l(spec: FieldSpec, a, b):
    s, _ = _raw_add_l(a, b)  # a, b < 2p  =>  s < 4p < 2^256, no carry out
    return _cond_sub_2p_l(spec, s)


def _sub_2p_l(spec: FieldSpec, a, b):
    d, borrow = _raw_sub_l(a, b)
    pl2 = [jnp.broadcast_to(_u(x), d[0].shape)
           for x in _mod2_limbs_l(spec)]
    fixed, _ = _raw_add_l(d, pl2)
    bb = borrow.astype(jnp.bool_)
    return [jnp.where(bb, fixed[k], d[k]) for k in range(len(d))]



# ---------------------------------------------------------------------------
# stacked ("shear") compute core — the COMPILE-CHEAP path
#
# The limb-list core above emits ~3.5k HLO ops per mont_mul, which executes
# 12-25x faster on TPU but takes XLA minutes per instantiation on the CPU
# backend (tests, the driver's virtual-device dryrun). This stacked
# implementation is the round-1 design (~50 ops/mul via pad/reshape shear
# sums): slower at scale but nearly free to compile. `add`/`sub`/`mont_mul`
# pick a core per backend (fused on TPU, stacked on CPU); both are bit-exact
# and cross-checked in tests/test_field.py.
# ---------------------------------------------------------------------------

def _shift_up_st(x, d: int):
    """shift limbs toward higher indices: out[k] = x[k-d], zeros below."""
    pad = jnp.zeros((d,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0) if d < x.shape[0] else jnp.zeros_like(x)


def _ks_carry_st(g, p):
    """Kogge-Stone prefix: c[k] = g[k] | (p[k] & c[k-1]) ... resolved in log depth.

    g, p: (K, *B) uint32 in {0,1}. Returns carry OUT of each position.
    """
    K = g.shape[0]
    c, pp = g, p
    d = 1
    while d < K:
        c = c | (pp & _shift_up_st(c, d))
        pp = pp & _shift_up_st(pp, d)
        d *= 2
    return c


def _normalize_st(cols, bound_bits: int):
    """Exactly normalize base-2^16 columns (K,*B) with values < 2^bound_bits.

    Returns (limbs < 2^16, carry_out_of_top in {0,1,...}). The caller must
    size K so the true value fits (carry_out then provably 0) or consume it.
    """
    v = cols
    bound = (1 << bound_bits) - 1
    # pre-split rounds until limbs <= 2^16
    while bound > (1 << LIMB_BITS):
        lo = v & _u(LIMB_MASK)
        hi = v >> LIMB_BITS
        v = lo + _shift_up_st(hi, 1)
        bound = LIMB_MASK + (bound >> LIMB_BITS)
        # hi[-1] escapes the top limb: provably 0 when the true value fits in
        # K limbs, and intentionally dropped for the mod-2^256 callers.
    # now v[k] <= 2^16: exact carry-lookahead
    g = (v >> LIMB_BITS).astype(_U32)          # v == 2^16
    p = (v == _u(LIMB_MASK)).astype(_U32)      # v == 2^16 - 1
    c = _ks_carry_st(g, p)
    carry_in = _shift_up_st(c, 1)
    out = (v + carry_in) & _u(LIMB_MASK)
    return out, c[-1]


def _raw_sub_st(a, b):
    """a - b limbwise with borrow lookahead; returns (limbs, borrow_out {0,1})."""
    g = (a < b).astype(_U32)
    p = (a == b).astype(_U32)
    bor = _ks_carry_st(g, p)
    bin_ = _shift_up_st(bor, 1)
    out = (a + _u(1 << LIMB_BITS) - b - bin_) & _u(LIMB_MASK)
    return out, bor[-1]


def _raw_add_st(a, b):
    s = a + b  # <= 2^17 - 2
    return _normalize_st(s, 17)


def _mod_limbs_st(spec: FieldSpec, ndim: int):
    return jnp.asarray(spec.mod_limbs, dtype=_U32).reshape((NLIMBS,) + (1,) * (ndim - 1))


def _cond_sub_mod_st(spec: FieldSpec, a):
    """Subtract modulus once if a >= modulus (assumes a < 2*modulus)."""
    p_l = _mod_limbs_st(spec, a.ndim)
    d, borrow = _raw_sub_st(a, jnp.broadcast_to(p_l, a.shape))
    keep = borrow.astype(jnp.bool_)  # borrow -> a < p -> keep a
    return jnp.where(keep[None], a, d)


# ---------------------------------------------------------------------------
# products: outer product + anti-diagonal shear sums
# ---------------------------------------------------------------------------

def _shear_sum_st(x):
    """Anti-diagonal sums of (n, m, *B): out[k] = sum_i x[i, k-i], (n+m-1, *B).

    Implemented with the pad/flatten/reshape shear trick — no gathers.
    """
    n, m = x.shape[0], x.shape[1]
    batch = x.shape[2:]
    xp = jnp.pad(x, [(0, 0), (0, n)] + [(0, 0)] * len(batch))  # (n, m+n, *B)
    flat = xp.reshape((n * (m + n),) + batch)
    flat = flat[: n * (m + n - 1)]
    sheared = flat.reshape((n, m + n - 1) + batch)
    return jnp.sum(sheared, axis=0, dtype=_U32)


def _mul_columns_st(a, b):
    """Product columns of two limb vectors: (32, *B) u32 columns < 2^21.

    a: (16, *B), b: (16, *B) or (16,) broadcastable.
    """
    prod = a[:, None] * b[None, :]          # (16, 16, *B) exact u32
    plo = prod & _u(LIMB_MASK)
    phi = prod >> LIMB_BITS
    slo = _shear_sum_st(plo)                   # (31, *B) each < 16*2^16 = 2^20
    shi = _shear_sum_st(phi)
    z1 = jnp.zeros((1,) + slo.shape[1:], dtype=_U32)
    cols = jnp.concatenate([slo, z1], axis=0) + jnp.concatenate([z1, shi], axis=0)
    return cols                              # (32, *B) < 2^21


# ---------------------------------------------------------------------------
# public modular ops
# ---------------------------------------------------------------------------

def _add_stacked(spec: FieldSpec, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    s, _ = _raw_add_st(a, b)  # no carry-out: a, b < p < 2^254
    return _cond_sub_mod_st(spec, s)


def _sub_stacked(spec: FieldSpec, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    d, borrow = _raw_sub_st(a, b)
    p_l = jnp.broadcast_to(_mod_limbs_st(spec, a.ndim), a.shape)
    fixed, _ = _raw_add_st(d, p_l)
    return jnp.where(borrow.astype(jnp.bool_)[None], fixed, d)






def _mont_mul_stacked(spec: FieldSpec, a, b):
    """Montgomery product a*b*R^{-1} mod p; canonical in/out.

    Separated reduction: T = a*b; M = (T mod R) * N' mod R;
    result = (T + M*N) / R, then one conditional subtract.
    """
    a, b = jnp.broadcast_arrays(a, b)
    batch_ndim = a.ndim - 1
    t_cols = _mul_columns_st(a, b)                          # (32,*B) < 2^21
    # T_lo = T mod R, exactly (carries above limb 15 drop with the mod)
    t_lo, _ = _normalize_st(t_cols[:NLIMBS], 21)
    nprime = jnp.asarray(
        int_to_limbs(pow(-spec.modulus, -1, 1 << (LIMB_BITS * NLIMBS))
                     % (1 << (LIMB_BITS * NLIMBS))),
        dtype=_U32,
    ).reshape((NLIMBS,) + (1,) * batch_ndim)
    m_cols = _mul_columns_st(t_lo, jnp.broadcast_to(nprime, a.shape))
    m, _ = _normalize_st(m_cols[:NLIMBS], 21)               # M = T_lo*N' mod R
    p_l = jnp.broadcast_to(_mod_limbs_st(spec, a.ndim), a.shape)
    mn_cols = _mul_columns_st(m, p_l)                       # (32,*B) < 2^21
    s_cols = t_cols + mn_cols                            # < 2^22
    s, top = _normalize_st(s_cols, 22)                      # 32 limbs; low 16 == 0
    # result = s[16:] plus carry `top` into a 17th limb — provably 0
    res = s[NLIMBS:]
    return _cond_sub_mod_st(spec, res)



# ---------------------------------------------------------------------------
# public modular ops (stacked (16, *B) API over the list core)
# ---------------------------------------------------------------------------


def _use_fused() -> bool:
    """Fused limb-list core on accelerators; stacked shear core on CPU
    (compile time). Override with EZKL_TPU_FUSED_LIMBS=0/1."""
    env = _os.environ.get("EZKL_TPU_FUSED_LIMBS")
    if env is not None:
        return env not in ("0", "false")
    return jax.default_backend() != "cpu"


# ---------------------------------------------------------------------------
# pallas dispatch for WIDE mont_mul on TPU
#
# One inlined XLA copy of the fused mont_mul costs the TPU compiler ~13 s;
# prover stage graphs and the NTT contain dozens-to-hundreds of call sites,
# which made cold compiles take minutes-to-hours (the round-2 bench timeout).
# As a pallas_call each site is one opaque custom call; jax caches the
# kernel lowering per (spec, block shape), so the ~5k-op body is traced a
# bounded number of times per process. add/sub stay XLA elementwise (their
# graphs are small and fuse into neighbors).
# ---------------------------------------------------------------------------

_PL_BLK = 1024       # wide block: 8 sublane-tiles of 128 lanes
_PL_BLK_NARROW = 128  # narrow block (padded up)
_PL_MIN = 128        # below this flattened width, stay on the fused XLA core


def pl_interpret() -> bool:
    """EZKL_TPU_PALLAS_INTERPRET=1 runs every pallas kernel in interpret
    mode — the only way to exercise the TPU kernel code paths (packed
    gathers, in-kernel negation, fused scans) on a CPU-only test box."""
    return _os.environ.get("EZKL_TPU_PALLAS_INTERPRET", "") \
        not in ("", "0", "false")


def pallas_call(*args, **kw):
    """`pl.pallas_call` wrapper honoring EZKL_TPU_PALLAS_INTERPRET."""
    from jax.experimental import pallas as _pl
    if pl_interpret():
        kw.setdefault("interpret", True)
    return _pl.pallas_call(*args, **kw)


def _use_pallas_field() -> bool:
    # pallas kernel tracing breaks under ensure_compile_time_eval (internal
    # jnp constants concretize into "captured constants"); precomputes that
    # run under it keep the fused XLA core.
    try:
        from jax._src import config as _jcfg
        if _jcfg.eager_constant_folding.value:
            return False
    except Exception:
        pass
    env = _os.environ.get("EZKL_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false")
    return jax.default_backend() == "tpu"


@_functools.lru_cache(maxsize=None)
def _pl_mul_call(spec: FieldSpec, n: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    blk = _PL_BLK if n >= _PL_BLK else _PL_BLK_NARROW
    assert n % blk == 0

    def kern(a_ref, b_ref, o_ref):
        al = [a_ref[i] for i in range(NLIMBS)]
        bl = [b_ref[i] for i in range(NLIMBS)]
        ol = _mont_mul_l(spec, al, bl)
        for i in range(NLIMBS):
            o_ref[i] = ol[i]

    spec_b = pl.BlockSpec((NLIMBS, blk), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    return pallas_call(
        kern, grid=(n // blk,), in_specs=[spec_b] * 2, out_specs=spec_b,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n), _U32))


def _mont_mul_pallas(spec: FieldSpec, a, b):
    shape = a.shape
    n = 1
    for d in shape[1:]:
        n *= d
    blk = _PL_BLK if n >= _PL_BLK else _PL_BLK_NARROW
    target = max(blk, -(-n // blk) * blk)
    a2 = a.reshape(NLIMBS, n)
    b2 = b.reshape(NLIMBS, n)
    if target != n:
        z = jnp.zeros((NLIMBS, target - n), _U32)
        a2 = jnp.concatenate([a2, z], axis=-1)
        b2 = jnp.concatenate([b2, z], axis=-1)
    out = _pl_mul_call(spec, target)(a2, b2)
    return out[:, :n].reshape(shape)


def add(spec: FieldSpec, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    if not _use_fused():
        return _add_stacked(spec, a, b)
    return _stack(_add_l(spec, _unstack(a), _unstack(b)))


def sub(spec: FieldSpec, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    if not _use_fused():
        return _sub_stacked(spec, a, b)
    return _stack(_sub_l(spec, _unstack(a), _unstack(b)))


def neg(spec: FieldSpec, a):
    return sub(spec, jnp.zeros_like(a), a)


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)


def select(mask, a, b):
    """mask: batch-shaped bool. Returns a where mask else b."""
    return jnp.where(mask[None], a, b)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product a*b*R^{-1} mod p; canonical in/out.

    Separated reduction: T = a*b; M = (T mod R) * N' mod R;
    result = (T + M*N) / R, then one conditional subtract.
    """
    a, b = jnp.broadcast_arrays(a, b)
    if not _use_fused():
        return _mont_mul_stacked(spec, a, b)
    n = 1
    for d in a.shape[1:]:
        n *= d
    if n >= _PL_MIN and _use_pallas_field():
        return _mont_mul_pallas(spec, a, b)
    return _stack(_mont_mul_l(spec, _unstack(a), _unstack(b)))


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a):
    r2 = bcast_const(spec, spec.r2, a.ndim - 1, mont=False)
    return mont_mul(spec, a, jnp.broadcast_to(r2, a.shape))


def from_mont(spec: FieldSpec, a):
    one = bcast_const(spec, 1, a.ndim - 1, mont=False)
    return mont_mul(spec, a, jnp.broadcast_to(one, a.shape))


def double(spec: FieldSpec, a):
    return add(spec, a, a)


def small_mul(spec: FieldSpec, a, k: int):
    """Multiply by a small static integer k via double-and-add (no mont_mul)."""
    assert k >= 0
    if k == 0:
        return jnp.zeros_like(a)
    acc = None
    for bit in bin(k)[2:]:
        if acc is not None:
            acc = double(spec, acc)
        if bit == "1":
            acc = a if acc is None else add(spec, acc, a)
    return acc


def pow_static(spec: FieldSpec, a, e: int):
    """a^e for a STATIC exponent (Montgomery form).

    MSB-first square-and-multiply with the bit sequence as scan input — the
    compiled body is just 2 mont_muls (small graph; the old 4-bit-window
    table form took minutes of XLA compile)."""
    if e == 0:
        return ones_mont(spec, a.shape[1:])
    nbits = e.bit_length()
    bits = jnp.asarray([bool((e >> i) & 1) for i in range(nbits - 2, -1, -1)])

    def body(acc, bit):
        acc = mont_sqr(spec, acc)
        withmul = mont_mul(spec, acc, a)
        acc = jnp.where(bit, withmul, acc)
        return acc, None

    out, _ = jax.lax.scan(body, a, bits)  # start at a: leading bit is 1
    return out


def inv(spec: FieldSpec, a):
    """Batched inverse via Fermat: a^(p-2). inv(0) == 0."""
    return pow_static(spec, a, spec.modulus - 2)


_SCAN_BLOCK = 32


def prefix_scan_mul(spec: FieldSpec, v, reverse: bool = False):
    """Inclusive prefix (or suffix) product along the LAST axis.

    Blocked: reshape to (m, BLOCK), one lax.scan of BLOCK full-width steps
    (body = 1 mont_mul, compiled once), recurse on the m block totals.
    Compile size O(log_BLOCK n) mont_muls vs associative_scan's unrolled
    2*log2(n) (which took minutes of XLA compile time)."""
    if reverse:
        return prefix_scan_mul(spec, v[..., ::-1])[..., ::-1]
    n = v.shape[-1]
    if n <= _SCAN_BLOCK:
        def body(acc, x):
            acc = mont_mul(spec, acc, x)
            return acc, acc
        xs = jnp.moveaxis(v, -1, 0)
        _, pref = jax.lax.scan(body, ones_mont(spec, v.shape[1:-1]), xs)
        return jnp.moveaxis(pref, 0, -1)
    m = -(-n // _SCAN_BLOCK)
    if m * _SCAN_BLOCK != n:
        padn = m * _SCAN_BLOCK - n
        v = jnp.concatenate([v, ones_mont(spec, v.shape[1:-1] + (padn,))], axis=-1)
    vr = v.reshape(v.shape[:-1] + (m, _SCAN_BLOCK))
    local = prefix_scan_mul(spec, vr)                       # (.., m, B)
    totals = local[..., -1]
    tot_pref = prefix_scan_mul(spec, totals)                # (.., m)
    offs = jnp.concatenate(
        [ones_mont(spec, totals.shape[1:-1] + (1,)), tot_pref[..., :-1]], axis=-1)
    combined = mont_mul(spec, local, offs[..., None])
    return combined.reshape(v.shape[:-1] + (-1,))[..., :n]


def prefix_scan_add(spec: FieldSpec, v):
    """Inclusive prefix SUM along the last axis (blocked, like
    `prefix_scan_mul`)."""
    n = v.shape[-1]
    if n <= _SCAN_BLOCK:
        def body(acc, x):
            acc = add(spec, acc, x)
            return acc, acc
        xs = jnp.moveaxis(v, -1, 0)
        _, pref = jax.lax.scan(body, zeros(v.shape[1:-1]), xs)
        return jnp.moveaxis(pref, 0, -1)
    m = -(-n // _SCAN_BLOCK)
    if m * _SCAN_BLOCK != n:
        padn = m * _SCAN_BLOCK - n
        v = jnp.concatenate([v, zeros(v.shape[1:-1] + (padn,))], axis=-1)
    vr = v.reshape(v.shape[:-1] + (m, _SCAN_BLOCK))
    local = prefix_scan_add(spec, vr)
    totals = local[..., -1]
    tot_pref = prefix_scan_add(spec, totals)
    offs = jnp.concatenate(
        [zeros(totals.shape[1:-1] + (1,)), tot_pref[..., :-1]], axis=-1)
    combined = add(spec, local, offs[..., None])
    return combined.reshape(v.shape[:-1] + (-1,))[..., :n]


def batch_inv(spec: FieldSpec, a):
    """Montgomery-trick batch inversion along the LAST axis.

    Blocked prefix/suffix product scans plus a single Fermat inversion.
    Zeros invert to zero.
    """
    zero_mask = is_zero(a)
    one = ones_mont(spec, a.shape[1:])
    a_safe = select(zero_mask, one, a)
    prefix = prefix_scan_mul(spec, a_safe)
    suffix = prefix_scan_mul(spec, a_safe, reverse=True)
    total_inv = inv(spec, prefix[..., -1])
    pad = ones_mont(spec, a.shape[1:-1] + (1,))
    left = jnp.concatenate([pad, prefix[..., :-1]], axis=-1)
    right = jnp.concatenate([suffix[..., 1:], pad], axis=-1)
    out = mont_mul(spec, mont_mul(spec, left, right), total_inv[..., None])
    return select(zero_mask, jnp.zeros_like(out), out)


def powers_dynamic(spec: FieldSpec, base: jnp.ndarray, n: int) -> jnp.ndarray:
    """[1, b, .., b^(n-1)] as (16, n) from a TRACED (16,) Montgomery base.

    Prefix-product of [1, b, b, ...] via the blocked scan — safe to jit with
    static n; use for per-proof challenge points where `powers`' static base
    would recompile."""
    v = jnp.concatenate(
        [ones_mont(spec, (1,)),
         jnp.broadcast_to(base[:, None], (NLIMBS, n - 1))], axis=-1)
    return prefix_scan_mul(spec, v)


def powers(spec: FieldSpec, base_int: int, n: int) -> jnp.ndarray:
    """[base^0, .., base^(n-1)] as (16, n) Montgomery limbs."""
    return powers_dynamic(spec, const(spec, base_int % spec.modulus), n)


class JittedField:
    """Per-spec jitted wrappers for standalone (eager) use.

    Inside larger jitted kernels, call the module-level traceable functions
    directly; these wrappers avoid eager per-op dispatch overhead from host
    code and cache compilations per input shape.
    """

    def __init__(self, spec: FieldSpec):
        import functools as _ft

        self.spec = spec
        self.add = jax.jit(_ft.partial(add, spec))
        self.sub = jax.jit(_ft.partial(sub, spec))
        self.neg = jax.jit(_ft.partial(neg, spec))
        self.mont_mul = jax.jit(_ft.partial(mont_mul, spec))
        self.mont_sqr = jax.jit(_ft.partial(mont_sqr, spec))
        self.to_mont = jax.jit(_ft.partial(to_mont, spec))
        self.from_mont = jax.jit(_ft.partial(from_mont, spec))
        self.inv = jax.jit(_ft.partial(inv, spec))
        self.batch_inv = jax.jit(_ft.partial(batch_inv, spec))
        self.pow_static = jax.jit(_ft.partial(pow_static, spec), static_argnums=1)
        self.small_mul = jax.jit(_ft.partial(small_mul, spec), static_argnums=1)
        self.powers = jax.jit(_ft.partial(powers, spec), static_argnums=(0, 1))


@_functools.lru_cache(maxsize=None)
def jitted(spec: FieldSpec) -> JittedField:
    return JittedField(spec)
