"""Pippenger multi-scalar multiplication over BN254 G1, TPU-vectorized.

Replaces the MSM inside the reference's halo2 fork / ICICLE CUDA backend
(SURVEY.md §2.1; dispatch seam `/root/reference/src/execute.rs:84-97`;
consumer example `/root/reference/src/circuit/modules/polycommit.rs:45-81`).

TPU-first design — no scatters, no data-dependent control flow, and small
compiled graphs (every point-add chain is a `lax.scan`, never an unrolled
tree, so the RCB15 complete-add subgraph appears only a handful of times):

* Window digits for all windows are extracted up-front with static shifts
  over the 16-bit limb representation: (W, N) uint32.
* Per window (a `lax.scan` over the window axis):
    1. `argsort` digits (XLA sort), gather points into digit order,
    2. blocked inclusive prefix scan of point adds: reshape (M, S) and scan
       S sequential steps of M-wide vectorized adds, recurse on the M block
       totals — ~sqrt(N) sequential steps, O(N) adds, O(1) add subgraphs,
    3. the bucket phase collapses via telescoping: with exclusive prefix E
       and bucket start offsets s_b (b = 1..B-1),
           sum_b b*S_b = (B-1)*Total - sum_{b>=1} E[s_b]
       so one gather + one fold replaces all bucket diffs/suffix sums.
* Windows combine by Horner (scan: c doublings + 1 add per step), and the
  shared (B-1)*Total term folds across windows into ONE fixed-scalar
  multiplication: result = ((2^(cW) - 1) mod r) * Total - Horner(F_w).

Multi-chip: shard the point axis; each chip runs this kernel on its shard
and partial results are tree-added after an all_gather
(`ezkl_tpu.parallel.msm_sharded`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fieldmath import limbs, curve
from ..fieldmath.curve import PointP
from ..fieldmath.spec import bn254_fq, bn254_fr, NLIMBS, LIMB_BITS

_U32 = jnp.uint32


def default_window_bits(n: int) -> int:
    """Window size heuristic: balance per-window O(N) scan vs 2^c fold."""
    return max(2, min(16, int(n).bit_length() - 1))


def extract_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """(16, N) raw (non-Montgomery) scalar limbs -> (W, N) window digits.

    Window w holds bits [w*c, (w+1)*c) of the scalar, little-endian.
    """
    nbits = NLIMBS * LIMB_BITS
    W = -(-nbits // c)
    mask = _U32((1 << c) - 1)
    padded = jnp.concatenate(
        [scalars, jnp.zeros((2,) + scalars.shape[1:], dtype=_U32)], axis=0
    )
    outs = []
    for w in range(W):
        lo = w * c
        i, r = divmod(lo, LIMB_BITS)
        d = padded[i] >> _U32(r)
        got = LIMB_BITS - r
        while got < c:
            i += 1
            d = d | (padded[i] << _U32(got))
            got += LIMB_BITS
        outs.append(d & mask)
    return jnp.stack(outs, axis=0)


# ---------------------------------------------------------------------------
# blocked prefix scan of point additions
# ---------------------------------------------------------------------------

_SEQ_BASE = 16  # below this, scan sequentially


def _seq_inclusive(p: PointP) -> PointP:
    """Sequential inclusive prefix along last axis via lax.scan."""
    xs = jax.tree.map(lambda a: jnp.moveaxis(a, -1, 0), p)

    def body(acc, x):
        acc = curve.add(acc, x)
        return acc, acc

    init = curve.identity(p.batch_shape[:-1])
    _, pref = jax.lax.scan(body, init, xs)
    return jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), pref)


def prefix_scan_points(p: PointP) -> PointP:
    """Inclusive prefix sum of points along the last batch axis (power of 2).

    Work O(N); sequential depth ~2*sqrt(N); O(1) distinct add subgraphs.
    """
    n = p.x.shape[-1]
    assert (n & (n - 1)) == 0, "prefix_scan_points: need power-of-two length"
    if n <= _SEQ_BASE:
        return _seq_inclusive(p)
    k = n.bit_length() - 1
    s = 1 << ((k + 1) // 2)  # sequential steps this level
    m = n // s
    pr = jax.tree.map(lambda a: a.reshape(a.shape[:-1] + (m, s)), p)
    local = _seq_inclusive(pr)                                 # (.., m, s)
    totals = jax.tree.map(lambda a: a[..., -1], local)          # (.., m)
    tot_pref = prefix_scan_points(totals)
    # exclusive block offsets: identity for block 0
    def shift(a):
        z = jnp.zeros_like(a[..., :1])
        return jnp.concatenate([z, a[..., :-1]], axis=-1)

    offs = PointP(shift(tot_pref.x), shift(tot_pref.y), shift(tot_pref.z))
    offs = curve.select_point(
        jnp.arange(m) == 0,
        curve.identity(offs.batch_shape),
        offs,
    )
    combined = curve.add(local, jax.tree.map(lambda a: a[..., None], offs))
    return jax.tree.map(lambda a: a.reshape(a.shape[:-2] + (n,)), combined)


def fold_points(p: PointP) -> PointP:
    """Sum of points along the last axis (power of 2), scan-based."""
    return jax.tree.map(lambda a: a[..., -1], prefix_scan_points(p))


def _scalar_mul_static(p: PointP, k: int) -> PointP:
    """k*p for a static integer k via a bit-scan (2 add subgraphs)."""
    fr = bn254_fr()
    k %= fr.modulus
    if k == 0:
        return curve.identity(p.batch_shape)
    nbits = k.bit_length()
    bits = jnp.asarray(
        [(k >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.bool_
    )

    def body(acc, b):
        acc = curve.dbl(acc)
        acc = curve.select_point(b, curve.add(acc, p), acc)
        return acc, None

    out, _ = jax.lax.scan(body, curve.identity(p.batch_shape), bits)
    return out


# ---------------------------------------------------------------------------
# the MSM
# ---------------------------------------------------------------------------

def msm(points: PointP, scalars: jnp.ndarray, c: int | None = None) -> PointP:
    """sum_i scalars[i] * points[i].

    points: projective PointP with batch shape (N,), N a power of two
    (identity lanes OK — pad with identity/0 to a power of two).
    scalars: (16, N) RAW (non-Montgomery) Fr limbs.
    Returns a single projective PointP (batch shape ()).
    """
    n = scalars.shape[-1]
    assert (n & (n - 1)) == 0, "msm: pad N to a power of two"
    if c is None:
        c = default_window_bits(n)
    nbuckets = 1 << c
    digits = extract_digits(scalars, c)  # (W, N)
    W = digits.shape[0]

    total = fold_points(points)

    def window_body(_, d):
        order = jnp.argsort(d)
        sorted_d = d[order]
        sorted_pts = jax.tree.map(lambda a: a[:, order], points)
        incl = prefix_scan_points(sorted_pts)
        # starts[b] = #digits < b, for b = 1..B-1
        starts = jnp.searchsorted(sorted_d, jnp.arange(1, nbuckets, dtype=_U32))
        safe = jnp.maximum(starts, 1) - 1
        e_pts = jax.tree.map(lambda a: a[:, safe], incl)  # E[starts_b]
        e_pts = curve.select_point(starts == 0, curve.identity(starts.shape), e_pts)
        # pad bucket axis to power of two with identities for the fold
        pad = max(nbuckets, 2) - (nbuckets - 1)
        idp = curve.identity((pad,))
        e_pad = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=-1), e_pts, idp
        )
        return None, fold_points(e_pad)  # F_w = sum_b E[starts_b]

    _, f_w = jax.lax.scan(window_body, None, digits)  # leaves (W, 16)

    # Horner MSB-first: G = sum_w 2^(c*w) * F_w
    def horner_body(acc, f):
        for _ in range(c):
            acc = curve.dbl(acc)
        return curve.add(acc, f), None

    rev = jax.tree.map(lambda a: a[::-1], f_w)
    g_sum, _ = jax.lax.scan(horner_body, curve.identity(()), rev)

    # result = ((2^(cW) - 1) mod r) * Total - G
    fr = bn254_fr()
    mult = ((1 << (c * W)) - 1) % fr.modulus
    lead = _scalar_mul_static(total, mult)
    return curve.add(lead, _neg_point(g_sum))


def _neg_point(p: PointP) -> PointP:
    fq = bn254_fq()
    return PointP(p.x, limbs.neg(fq, p.y), p.z)


@functools.lru_cache(maxsize=8)
def _jitted_msm(c: int):
    return jax.jit(functools.partial(msm, c=c))


def msm_jit(points: PointP, scalars: jnp.ndarray, c: int | None = None) -> PointP:
    n = scalars.shape[-1]
    if c is None:
        c = default_window_bits(n)
    return _jitted_msm(c)(points, scalars)


def pad_msm_inputs(points: PointP, scalars: jnp.ndarray):
    """Pad N to the next power of two with identity points / zero scalars."""
    n = scalars.shape[-1]
    target = 1 if n == 0 else 1 << (n - 1).bit_length()
    if target == n:
        return points, scalars
    extra = target - n
    idp = curve.identity((extra,))
    points = jax.tree.map(lambda a, b: jnp.concatenate([a, b], -1), points, idp)
    scalars = jnp.concatenate(
        [scalars, jnp.zeros((NLIMBS, extra), dtype=_U32)], axis=-1
    )
    return points, scalars
