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
# carry machinery (Kogge-Stone lookahead along limb axis 0)
# ---------------------------------------------------------------------------

def _shift_up(x, d: int):
    """shift limbs toward higher indices: out[k] = x[k-d], zeros below."""
    pad = jnp.zeros((d,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0) if d < x.shape[0] else jnp.zeros_like(x)


def _ks_carry(g, p):
    """Kogge-Stone prefix: c[k] = g[k] | (p[k] & c[k-1]) ... resolved in log depth.

    g, p: (K, *B) uint32 in {0,1}. Returns carry OUT of each position.
    """
    K = g.shape[0]
    c, pp = g, p
    d = 1
    while d < K:
        c = c | (pp & _shift_up(c, d))
        pp = pp & _shift_up(pp, d)
        d *= 2
    return c


def _normalize(cols, bound_bits: int):
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
        v = lo + _shift_up(hi, 1)
        bound = LIMB_MASK + (bound >> LIMB_BITS)
        # hi[-1] escapes the top limb: provably 0 when the true value fits in
        # K limbs, and intentionally dropped for the mod-2^256 callers.
    # now v[k] <= 2^16: exact carry-lookahead
    g = (v >> LIMB_BITS).astype(_U32)          # v == 2^16
    p = (v == _u(LIMB_MASK)).astype(_U32)      # v == 2^16 - 1
    c = _ks_carry(g, p)
    carry_in = _shift_up(c, 1)
    out = (v + carry_in) & _u(LIMB_MASK)
    return out, c[-1]


def _raw_sub(a, b):
    """a - b limbwise with borrow lookahead; returns (limbs, borrow_out {0,1})."""
    g = (a < b).astype(_U32)
    p = (a == b).astype(_U32)
    bor = _ks_carry(g, p)
    bin_ = _shift_up(bor, 1)
    out = (a + _u(1 << LIMB_BITS) - b - bin_) & _u(LIMB_MASK)
    return out, bor[-1]


def _raw_add(a, b):
    s = a + b  # <= 2^17 - 2
    return _normalize(s, 17)


def _mod_limbs(spec: FieldSpec, ndim: int):
    return jnp.asarray(spec.mod_limbs, dtype=_U32).reshape((NLIMBS,) + (1,) * (ndim - 1))


def _cond_sub_mod(spec: FieldSpec, a):
    """Subtract modulus once if a >= modulus (assumes a < 2*modulus)."""
    p_l = _mod_limbs(spec, a.ndim)
    d, borrow = _raw_sub(a, jnp.broadcast_to(p_l, a.shape))
    keep = borrow.astype(jnp.bool_)  # borrow -> a < p -> keep a
    return jnp.where(keep[None], a, d)


# ---------------------------------------------------------------------------
# products: outer product + anti-diagonal shear sums
# ---------------------------------------------------------------------------

def _shear_sum(x):
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


def _mul_columns(a, b):
    """Product columns of two limb vectors: (32, *B) u32 columns < 2^21.

    a: (16, *B), b: (16, *B) or (16,) broadcastable.
    """
    prod = a[:, None] * b[None, :]          # (16, 16, *B) exact u32
    plo = prod & _u(LIMB_MASK)
    phi = prod >> LIMB_BITS
    slo = _shear_sum(plo)                   # (31, *B) each < 16*2^16 = 2^20
    shi = _shear_sum(phi)
    z1 = jnp.zeros((1,) + slo.shape[1:], dtype=_U32)
    cols = jnp.concatenate([slo, z1], axis=0) + jnp.concatenate([z1, shi], axis=0)
    return cols                              # (32, *B) < 2^21


# ---------------------------------------------------------------------------
# public modular ops
# ---------------------------------------------------------------------------

def add(spec: FieldSpec, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    s, _ = _raw_add(a, b)  # no carry-out: a, b < p < 2^254
    return _cond_sub_mod(spec, s)


def sub(spec: FieldSpec, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    d, borrow = _raw_sub(a, b)
    p_l = jnp.broadcast_to(_mod_limbs(spec, a.ndim), a.shape)
    fixed, _ = _raw_add(d, p_l)
    return jnp.where(borrow.astype(jnp.bool_)[None], fixed, d)


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
    batch_ndim = a.ndim - 1
    t_cols = _mul_columns(a, b)                          # (32,*B) < 2^21
    # T_lo = T mod R, exactly (carries above limb 15 drop with the mod)
    t_lo, _ = _normalize(t_cols[:NLIMBS], 21)
    nprime = jnp.asarray(
        int_to_limbs(pow(-spec.modulus, -1, 1 << (LIMB_BITS * NLIMBS))
                     % (1 << (LIMB_BITS * NLIMBS))),
        dtype=_U32,
    ).reshape((NLIMBS,) + (1,) * batch_ndim)
    m_cols = _mul_columns(t_lo, jnp.broadcast_to(nprime, a.shape))
    m, _ = _normalize(m_cols[:NLIMBS], 21)               # M = T_lo*N' mod R
    p_l = jnp.broadcast_to(_mod_limbs(spec, a.ndim), a.shape)
    mn_cols = _mul_columns(m, p_l)                       # (32,*B) < 2^21
    s_cols = t_cols + mn_cols                            # < 2^22
    s, top = _normalize(s_cols, 22)                      # 32 limbs; low 16 == 0
    # result = s[16:] plus carry `top` into a 17th limb — provably 0
    res = s[NLIMBS:]
    return _cond_sub_mod(spec, res)


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
    """a^e for a STATIC exponent (Montgomery form), 4-bit windows via scan."""
    if e == 0:
        return ones_mont(spec, a.shape[1:])
    table = [ones_mont(spec, a.shape[1:]), a]
    for _ in range(14):
        table.append(mont_mul(spec, table[-1], a))
    table = jnp.stack(table, axis=0)  # (16, NLIMBS, *batch)
    digits = []
    x = e
    while x:
        digits.append(x & 0xF)
        x >>= 4
    digits.reverse()
    dig = jnp.asarray(digits, dtype=jnp.int32)

    def body(acc, d):
        for _ in range(4):
            acc = mont_sqr(spec, acc)
        acc = mont_mul(spec, acc, table[d])
        return acc, None

    out, _ = jax.lax.scan(body, ones_mont(spec, a.shape[1:]), dig)
    return out


def inv(spec: FieldSpec, a):
    """Batched inverse via Fermat: a^(p-2). inv(0) == 0."""
    return pow_static(spec, a, spec.modulus - 2)


def batch_inv(spec: FieldSpec, a):
    """Montgomery-trick batch inversion along the LAST axis.

    Prefix/suffix products via associative_scan (parallel, log-depth) plus a
    single Fermat inversion. Zeros invert to zero.
    """
    zero_mask = is_zero(a)
    one = ones_mont(spec, a.shape[1:])
    a_safe = select(zero_mask, one, a)

    def mulfn(x, y):
        return mont_mul(spec, x, y)

    ax = a.ndim - 1
    prefix = jax.lax.associative_scan(mulfn, a_safe, axis=ax)
    suffix = jax.lax.associative_scan(mulfn, a_safe, axis=ax, reverse=True)
    total_inv = inv(spec, prefix[..., -1])
    pad = ones_mont(spec, a.shape[1:-1] + (1,))
    left = jnp.concatenate([pad, prefix[..., :-1]], axis=-1)
    right = jnp.concatenate([suffix[..., 1:], pad], axis=-1)
    out = mont_mul(spec, mont_mul(spec, left, right), total_inv[..., None])
    return select(zero_mask, jnp.zeros_like(out), out)


def powers_dynamic(spec: FieldSpec, base: jnp.ndarray, n: int) -> jnp.ndarray:
    """[1, b, .., b^(n-1)] as (16, n) from a TRACED (16,) Montgomery base.

    Doubling construction (log n mont_muls), safe to jit with static n —
    use for per-proof challenge points where `powers`' static base would
    recompile."""
    arr = ones_mont(spec, (1,))
    pw = base[:, None]
    m = 1
    while m < n:
        arr = jnp.concatenate(
            [arr, mont_mul(spec, arr, jnp.broadcast_to(pw, arr.shape))], axis=-1)
        pw = mont_sqr(spec, pw)
        m *= 2
    return arr[:, :n]


def powers(spec: FieldSpec, base_int: int, n: int) -> jnp.ndarray:
    """[base^0, .., base^(n-1)] as (16, n) Montgomery limbs, built by doubling."""
    m = 1
    arr = const(spec, 1, mont=True).reshape(NLIMBS, 1)
    while m < n:
        step = bcast_const(spec, pow(base_int, m, spec.modulus), 1)
        arr = jnp.concatenate([arr, mont_mul(spec, arr, jnp.broadcast_to(step, arr.shape))], axis=-1)
        m *= 2
    return arr[:, :n]


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
