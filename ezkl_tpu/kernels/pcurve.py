"""Pallas TPU kernels for batched BN254 G1 point addition/doubling.

Why a kernel: the XLA-graph form of one complete point add is ~40k HLO ops
(12 fused limb multiplies); every `lax.scan` body that instantiates it costs
minutes of XLA compile time, and the MSM uses several such bodies. As a
`pallas_call` the add becomes ONE custom call in the enclosing graph —
Mosaic compiles the kernel body once per block shape in seconds — and all
limb intermediates provably live in VMEM/registers.

The kernel body reuses the limb-list math from `fieldmath.limbs` (pure
elementwise jnp on per-limb arrays, which is exactly what Mosaic wants) and
the RCB15 complete-addition schedule from `fieldmath.curve`.

Layout: coordinates are (16, B) u32 Montgomery limb arrays (same as
`curve.PointP`); the kernel grids over B in blocks of `_BLK` lanes shaped
(16, _BLK) in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fieldmath import limbs
from ..fieldmath.curve import PointP, B3
from ..fieldmath.spec import bn254_fq, NLIMBS

FQ = bn254_fq()
_BLK = 1024       # lanes per block for wide batches (8 sublane-tiles of 128)
_BLK_NARROW = 128  # block for narrow batches (padded up); keeps pad waste low


def _unstack_ref(ref):
    return [ref[i] for i in range(NLIMBS)]


# Formulas run in the LAZY (<2p) residue domain (limbs._add_2p_l): the
# per-multiply canonical subtraction is dropped (~6-8% of the add op
# count) and kernels canonicalize with `_canon` only at the stores that
# escape to HBM, so every kernel OUTPUT stays bit-identical to the strict
# pipeline (same residue, canonicalized < p).

def _mul(a, b):
    return limbs._mont_mul_l(FQ, a, b, reduce=False)


def _add(a, b):
    return limbs._add_2p_l(FQ, a, b)


def _sub(a, b):
    return limbs._sub_2p_l(FQ, a, b)


def _canon(v):
    """Lazy (<2p) -> canonical (<p) limbs at a kernel's output store."""
    return limbs._cond_sub_mod_l(FQ, v)


def _xb3(a):
    """Multiply by 3*b = 9 via doubling chain (9 = 8 + 1)."""
    t2 = _add(a, a)
    t4 = _add(t2, t2)
    t8 = _add(t4, t4)
    return _add(t8, a)


def _complete_add_l(X1, Y1, Z1, X2, Y2, Z2):
    """RCB15 algorithm 7 (a=0, b3=9) on limb lists."""
    t0 = _mul(X1, X2)
    t1 = _mul(Y1, Y2)
    t2 = _mul(Z1, Z2)
    t3 = _add(X1, Y1)
    t4 = _add(X2, Y2)
    t3 = _mul(t3, t4)
    t4 = _add(t0, t1)
    t3 = _sub(t3, t4)
    t4 = _add(Y1, Z1)
    X3 = _add(Y2, Z2)
    t4 = _mul(t4, X3)
    X3 = _add(t1, t2)
    t4 = _sub(t4, X3)
    X3 = _add(X1, Z1)
    Y3 = _add(X2, Z2)
    X3 = _mul(X3, Y3)
    Y3 = _add(t0, t2)
    Y3 = _sub(X3, Y3)
    X3 = _add(t0, t0)
    t0 = _add(X3, t0)
    t2 = _xb3(t2)
    Z3 = _add(t1, t2)
    t1 = _sub(t1, t2)
    Y3 = _xb3(Y3)
    X3 = _mul(t4, Y3)
    t2 = _mul(t3, t1)
    X3 = _sub(t2, X3)
    Y3 = _mul(Y3, t0)
    t1 = _mul(t1, Z3)
    Y3 = _add(t1, Y3)
    t0 = _mul(t0, t3)
    Z3 = _mul(Z3, t4)
    Z3 = _add(Z3, t0)
    return X3, Y3, Z3


def _mixed_add_l(X1, Y1, Z1, X2, Y2):
    """RCB15 algorithm 8 (a=0, b3=9): P1 projective (identity OK) + P2
    AFFINE (must not be identity). 11 muls vs algorithm 7's 12."""
    t0 = _mul(X1, X2)
    t1 = _mul(Y1, Y2)
    t3 = _add(X2, Y2)
    t4 = _add(X1, Y1)
    t3 = _mul(t3, t4)
    t4 = _add(t0, t1)
    t3 = _sub(t3, t4)
    t4 = _mul(Y2, Z1)
    t4 = _add(t4, Y1)
    Y3 = _mul(X2, Z1)
    Y3 = _add(Y3, X1)
    X3 = _add(t0, t0)
    t0 = _add(X3, t0)
    t2 = _xb3(Z1)
    Z3 = _add(t1, t2)
    t1 = _sub(t1, t2)
    Y3 = _xb3(Y3)
    X3 = _mul(t4, Y3)
    t2 = _mul(t3, t1)
    X3 = _sub(t2, X3)
    Y3 = _mul(Y3, t0)
    t1 = _mul(t1, Z3)
    Y3 = _add(t1, Y3)
    t0 = _mul(t0, t3)
    Z3 = _mul(Z3, t4)
    Z3 = _add(Z3, t0)
    return X3, Y3, Z3


def _dbl_l(X, Y, Z):
    """RCB15 algorithm 9 (a=0, b3=9) on limb lists."""
    t0 = _mul(Y, Y)
    Z3 = _add(t0, t0)
    Z3 = _add(Z3, Z3)
    Z3 = _add(Z3, Z3)
    t1 = _mul(Y, Z)
    t2 = _mul(Z, Z)
    t2 = _xb3(t2)
    X3 = _mul(t2, Z3)
    Y3 = _add(t0, t2)
    Z3 = _mul(t1, Z3)
    t1 = _add(t2, t2)
    t2 = _add(t1, t2)
    t0 = _sub(t0, t2)
    Y3 = _mul(t0, Y3)
    Y3 = _add(X3, Y3)
    t1 = _mul(X, Y)
    X3 = _mul(t0, t1)
    X3 = _add(X3, X3)
    return X3, Y3, Z3


def _add_kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
    X3, Y3, Z3 = _complete_add_l(
        _unstack_ref(x1), _unstack_ref(y1), _unstack_ref(z1),
        _unstack_ref(x2), _unstack_ref(y2), _unstack_ref(z2))
    X3, Y3, Z3 = _canon(X3), _canon(Y3), _canon(Z3)
    for i in range(NLIMBS):
        ox[i] = X3[i]
        oy[i] = Y3[i]
        oz[i] = Z3[i]


def _dbl_kernel(x, y, z, ox, oy, oz):
    X3, Y3, Z3 = _dbl_l(_unstack_ref(x), _unstack_ref(y), _unstack_ref(z))
    X3, Y3, Z3 = _canon(X3), _canon(Y3), _canon(Z3)
    for i in range(NLIMBS):
        ox[i] = X3[i]
        oy[i] = Y3[i]
        oz[i] = Z3[i]


# EXACTLY TWO block shapes — (16, 128) for narrow batches, (16, 1024) for
# wide — whatever the batch width: jax caches pallas kernel lowering per
# (kernel, block shapes), and tracing the ~15k-op limb kernel body costs
# ~30 s, so it must be paid a bounded number of times per process instead
# of once per distinct width (the round-2 bench timed out on exactly that).
# Narrow batches keep a small block so scalar-ish ops (Horner combine,
# fold tails) don't burn 1024 lanes of VPU per step.


def _blk_for(n: int) -> int:
    return _BLK if n >= _BLK else _BLK_NARROW


@functools.lru_cache(maxsize=64)
def _add_call(n: int):
    blk = _blk_for(n)
    assert n % blk == 0
    spec = pl.BlockSpec((NLIMBS, blk), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return limbs.pallas_call(
        _add_kernel,
        grid=(n // blk,),
        in_specs=[spec] * 6,
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32)
                        for _ in range(3)),
    )


@functools.lru_cache(maxsize=64)
def _dbl_call(n: int):
    blk = _blk_for(n)
    assert n % blk == 0
    spec = pl.BlockSpec((NLIMBS, blk), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return limbs.pallas_call(
        _dbl_kernel,
        grid=(n // blk,),
        in_specs=[spec] * 3,
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32)
                        for _ in range(3)),
    )


# ---------------------------------------------------------------------------
# fused sequential kernels: prefix scan / fold / Horner
#
# Measured on v5e (docs/PERF.md): ONE pallas_call has ~1 ms of dispatch +
# loop-carry overhead when issued per step of a lax.scan, so a 32-step
# point-add scan ran at 2.6x worse throughput than the standalone add
# kernel. These kernels move the whole sequential loop INSIDE one
# pallas_call: the TPU grid's last dimension iterates sequentially on-core,
# the accumulator lives in VMEM scratch across steps, and the loop carry
# never touches HBM.
# ---------------------------------------------------------------------------

# scan-lane block: 1024 measured optimal on v5e (512 -> 21.9 Madd/s,
# 1024 -> 35.7, 2048 -> 35.5 at 2^20; docs/PERF.md)
_SCAN_BLK = 1024


def _one_limbs_b(blk: int):
    """Montgomery 1 (R mod p) as limb-list of (blk,) broadcasts."""
    from ..fieldmath.spec import int_to_limbs
    one = (FQ.r) % FQ.modulus
    return [jnp.full((blk,), int(v), jnp.uint32) for v in int_to_limbs(one)]


def _zero_limbs_b(blk: int):
    return [jnp.zeros((blk,), jnp.uint32) for _ in range(NLIMBS)]


@functools.lru_cache(maxsize=None)
def _scan_call(m_blocks: int, steps: int, blk: int, mixed: bool):
    """Inclusive prefix scan of point adds along a step axis.

    Inputs are (steps, NLIMBS, m) coordinate planes (x, y[, z]); output is
    the projective prefix in the same layout. mixed=True treats inputs as
    AFFINE (z==1; identity not allowed) and uses the 11-mul mixed add.
    """
    spec_b = pl.BlockSpec((1, NLIMBS, blk), lambda i, j: (j, 0, i),
                          memory_space=pltpu.VMEM)
    n_in = 2 if mixed else 3

    def kern(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:n_in + 3]
        ax, ay, az = refs[n_in + 3:]
        j = pl.program_id(1)
        X2 = [ins[0][0, i] for i in range(NLIMBS)]
        Y2 = [ins[1][0, i] for i in range(NLIMBS)]
        Z2 = None if mixed else [ins[2][0, i] for i in range(NLIMBS)]

        @pl.when(j == 0)
        def _():
            one = _one_limbs_b(blk)
            for i in range(NLIMBS):
                ax[i] = X2[i]
                ay[i] = Y2[i]
                az[i] = one[i] if mixed else Z2[i]

        @pl.when(j > 0)
        def _():
            X1 = [ax[i] for i in range(NLIMBS)]
            Y1 = [ay[i] for i in range(NLIMBS)]
            Z1 = [az[i] for i in range(NLIMBS)]
            if mixed:
                X3, Y3, Z3 = _mixed_add_l(X1, Y1, Z1, X2, Y2)
            else:
                X3, Y3, Z3 = _complete_add_l(X1, Y1, Z1, X2, Y2, Z2)
            for i in range(NLIMBS):
                ax[i] = X3[i]
                ay[i] = Y3[i]
                az[i] = Z3[i]

        # acc stays lazy in scratch; each step's escaping prefix value is
        # canonicalized at the store (3 cond-subs vs the 11-12 saved)
        cx = _canon([ax[i] for i in range(NLIMBS)])
        cy = _canon([ay[i] for i in range(NLIMBS)])
        cz = _canon([az[i] for i in range(NLIMBS)])
        for i in range(NLIMBS):
            outs[0][0, i] = cx[i]
            outs[1][0, i] = cy[i]
            outs[2][0, i] = cz[i]

    m = m_blocks * blk
    shape = jax.ShapeDtypeStruct((steps, NLIMBS, m), jnp.uint32)
    return limbs.pallas_call(
        kern, grid=(m_blocks, steps),
        in_specs=[spec_b] * n_in, out_specs=(spec_b,) * 3,
        out_shape=(shape,) * 3,
        scratch_shapes=[pltpu.VMEM((NLIMBS, blk), jnp.uint32)] * 3,
    )


@functools.lru_cache(maxsize=None)
def _scan_call_packed(m_blocks: int, steps: int, blk: int):
    """Prefix scan over PACKED affine inputs with in-kernel sign handling.

    Inputs: x, y as (steps, 8, m) planes of 2x16-bit-packed u32 limbs plus
    a (steps, 1, m) u32 sign plane (1 = negate y). Unpack + conditional
    negation happen in VMEM (~400 ops vs the ~40k-op add), replacing the
    XLA-side unpack/neg/select passes that materialized full-width (16, m)
    intermediates between the gather and the kernel."""
    spec_p = pl.BlockSpec((1, NLIMBS // 2, blk), lambda i, j: (j, 0, i),
                          memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((1, 1, blk), lambda i, j: (j, 0, i),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, NLIMBS, blk), lambda i, j: (j, 0, i),
                          memory_space=pltpu.VMEM)

    def kern(pxr, pyr, snr, o0, o1, o2, ax, ay, az):
        j = pl.program_id(1)
        mask16 = jnp.uint32(0xFFFF)
        X2, Y2 = [], []
        for i in range(NLIMBS):
            w = pxr[0, i // 2]
            X2.append((w >> 16) if i % 2 else (w & mask16))
            w = pyr[0, i // 2]
            Y2.append((w >> 16) if i % 2 else (w & mask16))
        neg = snr[0, 0] != 0
        pl_limbs = [jnp.broadcast_to(jnp.uint32(v), Y2[0].shape)
                    for v in limbs._mod_limbs_l(FQ)]
        ny, _ = limbs._raw_sub_l(pl_limbs, Y2)   # p - y in (0, p]: lazy-ok
        Y2 = [jnp.where(neg, ny[i], Y2[i]) for i in range(NLIMBS)]

        @pl.when(j == 0)
        def _():
            one = _one_limbs_b(blk)
            for i in range(NLIMBS):
                ax[i] = X2[i]
                ay[i] = Y2[i]
                az[i] = one[i]

        @pl.when(j > 0)
        def _():
            X3, Y3, Z3 = _mixed_add_l(
                [ax[i] for i in range(NLIMBS)],
                [ay[i] for i in range(NLIMBS)],
                [az[i] for i in range(NLIMBS)], X2, Y2)
            for i in range(NLIMBS):
                ax[i] = X3[i]
                ay[i] = Y3[i]
                az[i] = Z3[i]

        cx = _canon([ax[i] for i in range(NLIMBS)])
        cy = _canon([ay[i] for i in range(NLIMBS)])
        cz = _canon([az[i] for i in range(NLIMBS)])
        for i in range(NLIMBS):
            o0[0, i] = cx[i]
            o1[0, i] = cy[i]
            o2[0, i] = cz[i]

    m = m_blocks * blk
    shape = jax.ShapeDtypeStruct((steps, NLIMBS, m), jnp.uint32)
    return limbs.pallas_call(
        kern, grid=(m_blocks, steps),
        in_specs=[spec_p, spec_p, spec_s], out_specs=(spec_o,) * 3,
        out_shape=(shape,) * 3,
        scratch_shapes=[pltpu.VMEM((NLIMBS, blk), jnp.uint32)] * 3,
    )


def prefix_scan_packed(px, py, sn) -> PointP:
    """Inclusive point prefix over packed affine inputs along the last axis.

    px, py: (8, m, S) packed coordinate planes (2x16-bit per u32, z == 1,
    identity-free); sn: (m, S) u32 with 1 = negate y. Returns projective
    PointP (16, m, S), canonical limbs."""
    _, m, S = px.shape
    blk = _scan_blk_for(m)
    mp = -(-m // blk) * blk
    ins = []
    for a, rows in ((px, NLIMBS // 2), (py, NLIMBS // 2),
                    (sn[None], 1)):
        a = jnp.moveaxis(a, -1, 0)                    # (S, rows, m)
        if mp != m:
            pad = jnp.zeros((S, rows, mp - m), jnp.uint32)
            a = jnp.concatenate([a, pad], axis=-1)
        ins.append(a)
    ox, oy, oz = _scan_call_packed(mp // blk, S, blk)(*ins)
    return PointP(*(jnp.moveaxis(a, 0, -1)[:, :m] for a in (ox, oy, oz)))


def _scan_blk_for(m: int) -> int:
    return _SCAN_BLK if m % _SCAN_BLK == 0 and m >= _SCAN_BLK else _BLK_NARROW


def prefix_scan_steps(p) -> PointP:
    """Inclusive point prefix along the LAST axis of a (16, m, S) batch.

    p: PointP (projective; (0:1:0) identities OK) or (x, y) tuple (affine,
    z==1, identity-free). m is padded to a block multiple with zero lanes
    — garbage-safe: the formulas have no divisions and the pad lanes are
    sliced away. Returns projective PointP (16, m, S)."""
    mixed = not isinstance(p, PointP)
    coords = (p.x, p.y, p.z) if not mixed else (p[0], p[1])
    _, m, S = coords[0].shape
    blk = _scan_blk_for(m)
    mp = -(-m // blk) * blk
    ins = []
    for a in coords:
        a = jnp.moveaxis(a, -1, 0)                    # (S, 16, m)
        if mp != m:
            pad = jnp.zeros((S, NLIMBS, mp - m), jnp.uint32)
            a = jnp.concatenate([a, pad], axis=-1)
        ins.append(a)
    ox, oy, oz = _scan_call(mp // blk, S, blk, mixed)(*ins)
    return PointP(*(jnp.moveaxis(a, 0, -1)[:, :m] for a in (ox, oy, oz)))


@functools.lru_cache(maxsize=None)
def _fold_call(n_groups: int, n_chunks: int, blk: int, mixed: bool):
    """Lane-wise accumulation over chunks, independently per group:
    (groups, chunks, 16, blk) -> (groups, 16, blk) partial sums."""
    in_spec = pl.BlockSpec((1, 1, NLIMBS, blk), lambda g, j: (g, j, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, NLIMBS, blk), lambda g, j: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    n_in = 2 if mixed else 3

    def kern(*refs):
        ins = [r.at[0] for r in refs[:n_in]]
        outs = [r.at[0] for r in refs[n_in:n_in + 3]]
        ax, ay, az = refs[n_in + 3:]
        j = pl.program_id(1)
        X2 = [ins[0][0, i] for i in range(NLIMBS)]
        Y2 = [ins[1][0, i] for i in range(NLIMBS)]
        Z2 = None if mixed else [ins[2][0, i] for i in range(NLIMBS)]

        @pl.when(j == 0)
        def _():
            one = _one_limbs_b(blk)
            for i in range(NLIMBS):
                ax[i] = X2[i]
                ay[i] = Y2[i]
                az[i] = one[i] if mixed else Z2[i]

        @pl.when(j > 0)
        def _():
            X1 = [ax[i] for i in range(NLIMBS)]
            Y1 = [ay[i] for i in range(NLIMBS)]
            Z1 = [az[i] for i in range(NLIMBS)]
            if mixed:
                X3, Y3, Z3 = _mixed_add_l(X1, Y1, Z1, X2, Y2)
            else:
                X3, Y3, Z3 = _complete_add_l(X1, Y1, Z1, X2, Y2, Z2)
            for i in range(NLIMBS):
                ax[i] = X3[i]
                ay[i] = Y3[i]
                az[i] = Z3[i]

        # only the final chunk's store survives (constant out index map):
        # skip the per-step copies and canonicalize once at the end
        @pl.when(j == n_chunks - 1)
        def _():
            cx = _canon([ax[i] for i in range(NLIMBS)])
            cy = _canon([ay[i] for i in range(NLIMBS)])
            cz = _canon([az[i] for i in range(NLIMBS)])
            for i in range(NLIMBS):
                outs[0][i] = cx[i]
                outs[1][i] = cy[i]
                outs[2][i] = cz[i]

    shape = jax.ShapeDtypeStruct((n_groups, NLIMBS, blk), jnp.uint32)
    return limbs.pallas_call(
        kern, grid=(n_groups, n_chunks),
        in_specs=[in_spec] * n_in, out_specs=(out_spec,) * 3,
        out_shape=(shape,) * 3,
        scratch_shapes=[pltpu.VMEM((NLIMBS, blk), jnp.uint32)] * 3,
    )


def fold_lanes(p, blk: int = 1024) -> PointP:
    """Sum points along the last axis DOWN TO blk lane partials in one
    pallas call (n must be a multiple of blk; blk drops to 128 for narrow
    inputs). p: projective PointP ((0:1:0) identities OK) or affine (x, y)
    tuple (identity-free), shaped (16, n) or (16, G, n) — the G axis folds
    independently per group. Lane l of group g holds sum_j p[g, j*blk+l];
    finish with `reduce_pairwise`. Returns (16, blk) or (16, G, blk)."""
    mixed = not isinstance(p, PointP)
    coords = (p.x, p.y, p.z) if not mixed else (p[0], p[1])
    n = coords[0].shape[-1]
    grouped = coords[0].ndim == 3
    G = coords[0].shape[1] if grouped else 1
    if n < blk:
        blk = _BLK_NARROW
    assert n % blk == 0, f"fold_lanes: n={n} not a multiple of blk={blk}"
    ins = [a.reshape(NLIMBS, G, n // blk, blk).transpose(1, 2, 0, 3)
           for a in coords]
    ox, oy, oz = _fold_call(G, n // blk, blk, mixed)(*ins)
    out = PointP(*(jnp.moveaxis(a, 0, 1) for a in (ox, oy, oz)))
    if not grouped:
        out = jax.tree.map(lambda a: a[:, 0], out)
    return out


def reduce_pairwise(p: PointP) -> PointP:
    """(16, ..., w) partials -> (16, ...) total by log2(w) halving adds
    (complete adds; identity lanes OK)."""
    w = p.x.shape[-1]
    while w > 1:
        half = w // 2
        a = jax.tree.map(lambda t: t[..., :half], p)
        b = jax.tree.map(lambda t: t[..., half:w], p)
        p = add(a, b)
        w = half
    return jax.tree.map(lambda t: t[..., 0], p)


def fold_all(p, blk: int = 1024) -> PointP:
    """Full sum along the last axis: fold_lanes + halving tree -> (16,).

    p: projective PointP (identity lanes OK) or affine (x, y) tuple
    (identity-free; n already a blk multiple)."""
    mixed = not isinstance(p, PointP)
    n = (p[0] if mixed else p.x).shape[-1]
    use_blk = blk if n >= blk else _BLK_NARROW
    if n % use_blk:
        if mixed:
            # promote to projective so identity padding is available
            p = PointP(p[0], p[1], limbs.ones_mont(FQ, (n,)))
            mixed = False
        np_ = -(-n // use_blk) * use_blk
        from ..fieldmath import curve as _curve
        idp = _curve.identity((np_ - n,))
        p = jax.tree.map(lambda a, b: jnp.concatenate([a, b], -1), p, idp)
    return reduce_pairwise(fold_lanes(p, blk=blk))


@functools.lru_cache(maxsize=None)
def _horner_call(W: int, c: int, width: int):
    """Windowed Horner combine: acc = 2^c * acc + V_w, MSB window first.

    Inputs: V as (W, NLIMBS, width) projective planes. Output (16, width).
    Grid (W, c+1): steps j<c double, step j==c adds V_w; the very first
    grid step instead loads identity-free... the first window's doubles
    act on the identity accumulator (dbl(identity)=identity under RCB15
    alg 9: (0:1:0) -> (0:1:0) — verified by tests), so no special case.
    """
    in_spec = pl.BlockSpec((1, NLIMBS, width), lambda w, j: (w, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((NLIMBS, width), lambda w, j: (0, 0),
                            memory_space=pltpu.VMEM)

    def kern(vx, vy, vz, ox, oy, oz, ax, ay, az):
        w = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((w == 0) & (j == 0))
        def _():
            one = _one_limbs_b(width)
            zero = _zero_limbs_b(width)
            for i in range(NLIMBS):
                ax[i] = zero[i]
                ay[i] = one[i]
                az[i] = zero[i]

        @pl.when(j < c)
        def _():
            X3, Y3, Z3 = _dbl_l([ax[i] for i in range(NLIMBS)],
                                [ay[i] for i in range(NLIMBS)],
                                [az[i] for i in range(NLIMBS)])
            for i in range(NLIMBS):
                ax[i] = X3[i]
                ay[i] = Y3[i]
                az[i] = Z3[i]

        @pl.when(j == c)
        def _():
            X3, Y3, Z3 = _complete_add_l(
                [ax[i] for i in range(NLIMBS)],
                [ay[i] for i in range(NLIMBS)],
                [az[i] for i in range(NLIMBS)],
                [vx[0, i] for i in range(NLIMBS)],
                [vy[0, i] for i in range(NLIMBS)],
                [vz[0, i] for i in range(NLIMBS)])
            for i in range(NLIMBS):
                ax[i] = X3[i]
                ay[i] = Y3[i]
                az[i] = Z3[i]

        # only the very last grid step's store survives: canonicalize once
        @pl.when((w == W - 1) & (j == c))
        def _():
            cx = _canon([ax[i] for i in range(NLIMBS)])
            cy = _canon([ay[i] for i in range(NLIMBS)])
            cz = _canon([az[i] for i in range(NLIMBS)])
            for i in range(NLIMBS):
                ox[i] = cx[i]
                oy[i] = cy[i]
                oz[i] = cz[i]

    shape = jax.ShapeDtypeStruct((NLIMBS, width), jnp.uint32)
    return limbs.pallas_call(
        kern, grid=(W, c + 1),
        in_specs=[in_spec] * 3, out_specs=(out_spec,) * 3,
        out_shape=(shape,) * 3,
        scratch_shapes=[pltpu.VMEM((NLIMBS, width), jnp.uint32)] * 3,
    )


def horner_combine(v: PointP, c: int) -> PointP:
    """MSB-first Horner over windows: sum_w 2^(c*w) * V_w.

    v: PointP (16, W, width) with window axis second, MSB window FIRST
    along it. Returns (16, width)."""
    W, width = v.x.shape[1], v.x.shape[2]
    wp = max(_BLK_NARROW, width)
    ins = []
    for a in (v.x, v.y, v.z):
        a = jnp.moveaxis(a, 1, 0)                     # (W, 16, width)
        if wp != width:
            a = jnp.concatenate(
                [a, jnp.zeros((W, NLIMBS, wp - width), jnp.uint32)], -1)
        ins.append(a)
    ox, oy, oz = _horner_call(W, c, wp)(*ins)
    return PointP(ox[:, :width], oy[:, :width], oz[:, :width])


@functools.lru_cache(maxsize=None)
def _dbln_call(c: int, width: int):
    """2^c * P for (16, width) points: grid (c,) of doubles in scratch."""
    io_spec = pl.BlockSpec((NLIMBS, width), lambda j: (0, 0),
                           memory_space=pltpu.VMEM)

    def kern(x, y, z, ox, oy, oz, ax, ay, az):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            X3, Y3, Z3 = _dbl_l([x[i] for i in range(NLIMBS)],
                                [y[i] for i in range(NLIMBS)],
                                [z[i] for i in range(NLIMBS)])
            for i in range(NLIMBS):
                ax[i] = X3[i]
                ay[i] = Y3[i]
                az[i] = Z3[i]

        @pl.when(j > 0)
        def _():
            X3, Y3, Z3 = _dbl_l([ax[i] for i in range(NLIMBS)],
                                [ay[i] for i in range(NLIMBS)],
                                [az[i] for i in range(NLIMBS)])
            for i in range(NLIMBS):
                ax[i] = X3[i]
                ay[i] = Y3[i]
                az[i] = Z3[i]

        @pl.when(j == c - 1)
        def _():
            cx = _canon([ax[i] for i in range(NLIMBS)])
            cy = _canon([ay[i] for i in range(NLIMBS)])
            cz = _canon([az[i] for i in range(NLIMBS)])
            for i in range(NLIMBS):
                ox[i] = cx[i]
                oy[i] = cy[i]
                oz[i] = cz[i]

    shape = jax.ShapeDtypeStruct((NLIMBS, width), jnp.uint32)
    return limbs.pallas_call(
        kern, grid=(c,),
        in_specs=[io_spec] * 3, out_specs=(io_spec,) * 3,
        out_shape=(shape,) * 3,
        scratch_shapes=[pltpu.VMEM((NLIMBS, width), jnp.uint32)] * 3,
    )


def dbl_pow2(p: PointP, c: int) -> PointP:
    """2^c * P, one pallas call. p: (16, *batch) with flat width padded."""
    bs = p.x.shape[1:]
    n = 1
    for d in bs:
        n *= d
    ins, t = _flatten_pad([p.x, p.y, p.z], n)
    ox, oy, oz = _dbln_call(c, t)(*ins)
    shape = (NLIMBS,) + bs
    return PointP(ox[:, :n].reshape(shape), oy[:, :n].reshape(shape),
                  oz[:, :n].reshape(shape))


def _flatten_pad(arrs, n):
    """Flatten trailing batch dims to one axis; zero-pad to a block multiple
    (128-lane blocks below 1024 lanes, 1024-lane blocks above)."""
    blk = _blk_for(n)
    target = max(blk, -(-n // blk) * blk)
    out = []
    for a in arrs:
        a = a.reshape(NLIMBS, n)
        if target != n:
            z16 = jnp.zeros((NLIMBS, target - n), jnp.uint32)
            a = jnp.concatenate([a, z16], axis=-1)
        out.append(a)
    return out, target


def add(p: PointP, q: PointP) -> PointP:
    """Complete projective add via the pallas kernel (TPU path).

    Batch shapes must match (broadcast on the caller side); any batch rank,
    any width — inputs are padded to a multiple of the block (garbage lanes
    are computed and sliced away; compile-time beats the nil runtime waste).
    """
    bs = p.x.shape[1:]
    assert bs == q.x.shape[1:], f"batch mismatch {bs} vs {q.x.shape[1:]}"
    n = 1
    for d in bs:
        n *= d
    ins, t = _flatten_pad([p.x, p.y, p.z, q.x, q.y, q.z], n)
    ox, oy, oz = _add_call(t)(*ins)
    shape = (NLIMBS,) + bs
    return PointP(ox[:, :n].reshape(shape), oy[:, :n].reshape(shape),
                  oz[:, :n].reshape(shape))


def dbl(p: PointP) -> PointP:
    bs = p.x.shape[1:]
    n = 1
    for d in bs:
        n *= d
    ins, t = _flatten_pad([p.x, p.y, p.z], n)
    ox, oy, oz = _dbl_call(t)(*ins)
    shape = (NLIMBS,) + bs
    return PointP(ox[:, :n].reshape(shape), oy[:, :n].reshape(shape),
                  oz[:, :n].reshape(shape))
