"""Proof creation — the TPU-native replacement for halo2's `create_proof`
(SURVEY.md §3.4: commit advice -> challenges -> lookup/permutation polys ->
quotient on the extended coset -> openings; every hot kernel is device NTT /
MSM / batched limb math).

Protocol (own verifier; see `verifier.py`):
 1. absorb vk repr + instance values
 2. per advice phase: commit advice columns, absorb, squeeze phase challenges
 3. theta; lookup multiplicities m committed
 4. beta, gamma; permutation Z chunks + lookup grand-sum phi committed
 5. random poly committed; y; quotient h over the extended coset, split,
    committed
 6. x; all query evaluations absorbed
 7. GWC multiopen: v (intra-point RLC), one witness commitment per point, u

Zero-knowledge: with a = n - BLINDING_FACTORS - 1 (`cs.last_active_row`),
rows (a, n) of every advice / permutation-Z / lookup-phi / lookup-m column
hold fresh randomness; running constraints are masked to rows [0, a);
boundary constraints bind at row a; a committed random polynomial joins the
x-point opening batch (halo2's vanishing-argument random_poly,
`/root/reference/src/graph/mod.rs:100` ASSUMED_BLINDING_FACTORS analog).
Deterministic proofs for testing: pass `seed=` or set EZKL_TPU_DET_SEED
(reference det-prove feature, `src/pfsys/mod.rs:436-439`).

Compilation model: all device work is grouped into FIVE jitted stage
functions built once per ProvingKey (cached on the pk object). Fiat-Shamir
challenges enter as (16,) Montgomery device scalars, so a new proof never
retraces or recompiles.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os as _os
import pathlib
import time as _time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from ..fieldmath import limbs
from ..fieldmath.spec import bn254_fr, NLIMBS
from ..kernels import ntt as nttmod
from . import kzg
from .assign import Assignment
from .cs import (ConstraintSystem, FIXED, ADVICE, INSTANCE, Query,
                 BLINDING_FACTORS, last_active_row)
from .domain import Domain
from .evaluator import EvalCtx, evaluate
from .keygen import ProvingKey, DELTA
from .srs import SRS
from .transcript import Transcript, decode_point_host, decode_scalar_host

FR = bn254_fr()

_TRACE = _os.environ.get("EZKL_TPU_TRACE", "")
_t0 = _time.time()
_PROG = None  # live Progress for the current create_proof call


def _span(msg: str):
    global _PROG
    if _TRACE:
        print(f"[prover +{_time.time() - _t0:7.1f}s] {msg}", flush=True)
    else:
        from ..utils import log as _log
        _log.debug("prover: %s", msg)
    if _PROG is not None:
        if msg == "done":
            _PROG.done()
            _PROG = None
        else:
            _PROG.step(msg)


@dataclasses.dataclass
class Proof:
    """Transcript-ordered proof contents (host-side ints/points)."""

    advice_commitments: list
    lookup_m_commitments: list
    perm_z_commitments: list
    lookup_phi_commitments: list
    shuffle_z_commitments: list
    random_commitment: object   # blinding poly commitment (host affine)
    h_commitments: list
    evals: dict                 # label -> int
    opening_commitments: list   # one per distinct point
    instances: list[list[int]]

    def to_json(self):
        import json

        def pt(p):
            return None if p is None else [hex(p[0]), hex(p[1])]

        return json.dumps({
            "advice": [pt(p) for p in self.advice_commitments],
            "lookup_m": [pt(p) for p in self.lookup_m_commitments],
            "perm_z": [pt(p) for p in self.perm_z_commitments],
            "lookup_phi": [pt(p) for p in self.lookup_phi_commitments],
            "shuffle_z": [pt(p) for p in self.shuffle_z_commitments],
            "random": pt(self.random_commitment),
            "h": [pt(p) for p in self.h_commitments],
            "evals": {k: hex(v) for k, v in self.evals.items()},
            "openings": [pt(p) for p in self.opening_commitments],
            "instances": [[hex(v) for v in col] for col in self.instances],
        }, indent=1)

    @classmethod
    def from_json(cls, s: str):
        import json

        d = json.loads(s)

        def pt(p):
            return None if p is None else (int(p[0], 16), int(p[1], 16))

        return cls(
            advice_commitments=[pt(p) for p in d["advice"]],
            lookup_m_commitments=[pt(p) for p in d["lookup_m"]],
            perm_z_commitments=[pt(p) for p in d["perm_z"]],
            lookup_phi_commitments=[pt(p) for p in d["lookup_phi"]],
            shuffle_z_commitments=[pt(p) for p in d.get("shuffle_z", [])],
            random_commitment=pt(d["random"]),
            h_commitments=[pt(p) for p in d["h"]],
            evals={k: int(v, 16) for k, v in d["evals"].items()},
            opening_commitments=[pt(p) for p in d["openings"]],
            instances=[[int(v, 16) for v in col] for col in d["instances"]],
        )


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _running_sum(v):
    """Exclusive prefix sum along last axis (field add)."""
    incl = limbs.prefix_scan_add(FR, v)
    z = jnp.zeros(v.shape[:-1] + (1,), v.dtype)
    return jnp.concatenate([z, incl[..., :-1]], axis=-1)


def _running_product(v):
    """Exclusive prefix product along last axis (starts at 1)."""
    incl = limbs.prefix_scan_mul(FR, v)
    one = limbs.ones_mont(FR, v.shape[1:-1] + (1,))
    return jnp.concatenate([one, incl[..., :-1]], axis=-1)


_LAG_MEMO: dict = {}


def _lagrange_bases_ext(dom: Domain, indices: tuple) -> jnp.ndarray:
    """[l_i over the extended coset for i in indices] as (16, B, n_ext).

    ONE jitted batched transform instead of per-index eager chains: the
    prover needs BLINDING_FACTORS+2 basis vectors per pk and each eager
    intt+coset_ntt chain is hundreds of per-op dispatches on the TPU
    tunnel (~10-15 ms each — a visible chunk of the r4 821 s setup).
    Explicit memo with a tracer guard (never cache under a trace)."""
    key = (dom.k, dom.extended_k, indices)
    hit = _LAG_MEMO.get(key)
    if hit is not None:
        return hit
    one = np.asarray(limbs.encode(FR, [1]))[:, 0]
    e = np.zeros((NLIMBS, len(indices), dom.n), np.uint32)
    for b, idx in enumerate(indices):
        e[:, b, idx] = one
    fn = jax.jit(lambda v: dom.coeff_to_extended(nttmod.intt(FR, v)))
    out = fn(jnp.asarray(e))
    if not isinstance(out, jax.core.Tracer):
        _LAG_MEMO[key] = out
    return out


def _lagrange_basis_ext(dom: Domain, index: int) -> jnp.ndarray:
    """l_index evaluated over the extended coset (16, n_ext)."""
    return _lagrange_bases_ext(dom, (index,))[:, 0]


def _eval_label(kind: str, index: int, rotation: int) -> str:
    return f"{kind}{index}@{rotation}"


def _maybe_release_executables(n: int):
    """Circuits accumulate enough LLVM JIT code sections on the CPU
    backend to exhaust section memory ("Unable to allocate section
    memory" / segfaults — seen at k=10 already). Dropping the in-process
    executable cache between heavy phases frees them; recompiles hit the
    persistent disk cache."""
    del n
    if jax.default_backend() == "cpu" \
            and not _os.environ.get("EZKL_TPU_KEEP_EXECUTABLES"):
        jax.clear_caches()


def _bcast(s, shape):
    return jnp.broadcast_to(s.reshape((NLIMBS,) + (1,) * (len(shape) - 1)), shape)


# ---------------------------------------------------------------------------
# per-circuit jitted stage kernels (cached on the ProvingKey)
# ---------------------------------------------------------------------------

class ProverKernels:
    """Builds the jitted stage functions for one (cs, domain) pair.

    Challenges are passed as (16,) Montgomery device scalars; structure
    (gates, chunks, lookups) is closed over statically.
    """

    def __init__(self, pk: ProvingKey):
        cs = pk.vk.cs
        dom = pk.vk.domain
        n = dom.n
        ext = dom.n_ext
        step = ext // n
        m_perm = len(cs.perm_columns)
        chunk = cs.perm_chunk_size()
        chunks = [list(range(i, min(i + chunk, m_perm)))
                  for i in range(0, m_perm, chunk)] if chunk else []
        self.cs, self.dom, self.chunks = cs, dom, chunks
        num_ch = cs.num_challenges

        with jax.ensure_compile_time_eval():
            wpow = limbs.jitted(FR).powers(dom.omega, n)
            dpow = limbs.jitted(FR).powers(DELTA, max(m_perm, 1))
            coset_pts = limbs.jitted(FR).mont_mul(
                limbs.jitted(FR).powers(dom.omega_ext, ext),
                jnp.broadcast_to(limbs.const(FR, FR.generator)[:, None],
                                 (NLIMBS, ext)))
        a = last_active_row(n)
        self.a = a
        # all needed basis vectors in ONE batched transform: l_0, l_a, and
        # the blinding rows (a, n)
        bases = _lagrange_bases_ext(dom, (0, a) + tuple(range(a + 1, n)))
        l0_ext = bases[:, 0]
        llast_ext = bases[:, 1]                       # closing row basis
        one_ext = limbs.ones_mont(FR, (ext,))
        # not_active = 1 - sum_{i in [a, n)} l_i: masks the running
        # constraints off the closing + blinding rows
        blind_sum = llast_ext
        for i in range(bases.shape[1] - 2):
            blind_sum = limbs.jitted(FR).add(blind_sum, bases[:, 2 + i])
        not_last = limbs.jitted(FR).sub(one_ext, blind_sum)
        sigma_l = pk.sigma_lagrange

        def ctx_of(cols, rot_step, ch_list):
            return EvalCtx(columns=cols, rot_step=rot_step,
                           challenges={i: c for i, c in enumerate(ch_list)})

        def compress(tup, ctx, theta):
            acc = None
            for e in tup:
                v = evaluate(e, ctx)
                acc = v if acc is None else limbs.add(
                    FR, limbs.mont_mul(FR, acc, _bcast(theta, v.shape)), v)
            return acc

        # ---- stage A: lookup + shuffle compression over H ----------------
        def stage_compress(advice_l, fixed_l, instance_l, theta, *ch):
            cols = {FIXED: fixed_l, ADVICE: advice_l, INSTANCE: instance_l}
            ctx = ctx_of(cols, 1, ch)
            fs_all, t_all = [], []
            for lk in cs.lookups:
                fs_all.append([compress(tup, ctx, theta) for tup in lk.inputs])
                t_all.append(compress(lk.table, ctx, theta))
            sh_in_all, sh_t_all = [], []
            for sh in cs.shuffles:
                sh_in_all.append(compress(sh.input, ctx, theta))
                sh_t_all.append(compress(sh.table, ctx, theta))
            return fs_all, t_all, sh_in_all, sh_t_all

        self.stage_compress = jax.jit(stage_compress)

        # ---- stage B: permutation Z + lookup phi + shuffle Z -------------
        def stage_zphi(advice_l, fixed_l, instance_l, beta, gamma,
                       fs_all, t_all, m_all, sh_in_all, sh_t_all):
            cols = {FIXED: fixed_l, ADVICE: advice_l, INSTANCE: instance_l}
            bb = beta[:, None]
            gg = gamma[:, None]

            def col_vals(j):
                c = cs.perm_columns[j]
                return cols[c.kind][c.index]

            z_list = []
            carry = limbs.ones_mont(FR, ())
            for cset in chunks:
                num = den = None
                for j in cset:
                    v = col_vals(j)
                    idj = limbs.mont_mul(FR, dpow[:, j][:, None], wpow)
                    fa = limbs.add(FR, limbs.add(FR, v, limbs.mont_mul(
                        FR, jnp.broadcast_to(bb, idj.shape), idj)), gg)
                    fb = limbs.add(FR, limbs.add(FR, v, limbs.mont_mul(
                        FR, jnp.broadcast_to(bb, v.shape), sigma_l[j])), gg)
                    num = fa if num is None else limbs.mont_mul(FR, num, fa)
                    den = fb if den is None else limbs.mont_mul(FR, den, fb)
                ratio = limbs.mont_mul(FR, num, limbs.batch_inv(FR, den))
                z = _running_product(ratio)
                z = limbs.mont_mul(FR, z, jnp.broadcast_to(carry[:, None], z.shape))
                carry = z[..., a]        # closing row (blind rows follow)
                z_list.append(z)

            phi_list = []
            active = jnp.arange(n) < a
            for fs, t, m_dev in zip(fs_all, t_all, m_all):
                inv_f = [limbs.batch_inv(FR, limbs.add(FR, f, bb)) for f in fs]
                inv_t = limbs.batch_inv(FR, limbs.add(FR, t, bb))
                term = None
                for invf in inv_f:
                    term = invf if term is None else limbs.add(FR, term, invf)
                term = limbs.sub(FR, term, limbs.mont_mul(FR, m_dev, inv_t))
                term = limbs.select(active, term, jnp.zeros_like(term))
                phi_list.append(_running_sum(term))

            shz_list = []
            for sa, sb in zip(sh_in_all, sh_t_all):
                num = limbs.add(FR, sa, gg)
                den = limbs.add(FR, sb, gg)
                # blind-row factors forced to 1 so z[a] is the active-row
                # product (A/B tails are blinded advice)
                one_col = limbs.ones_mont(FR, (n,))
                num = limbs.select(active, num, one_col)
                den = limbs.select(active, den, one_col)
                ratio = limbs.mont_mul(FR, num, limbs.batch_inv(FR, den))
                shz_list.append(_running_product(ratio))
            return z_list, phi_list, shz_list

        self.stage_zphi = jax.jit(stage_zphi)

        # ---- stage C: quotient over the extended coset ------------------
        # Split into several jits (transforms / term chunks / combine): one
        # monolithic graph is too deep for the XLA CPU compiler's stack.
        def to_ext(v):
            vv = v if v.ndim == 3 else v[None]
            vv = jnp.moveaxis(vv, 1, 0)
            out = dom.coeff_to_extended(nttmod.intt(FR, vv))
            out = jnp.moveaxis(out, 0, 1)
            return out if v.ndim == 3 else out[0]

        def empty_ext():
            return jnp.zeros((0, NLIMBS, ext), jnp.uint32)

        _to_ext_jit = jax.jit(to_ext)

        def stage_to_ext(advice_l, fixed_l, instance_l, z_list, phi_list,
                         m_all, shz_list):
            # ONE padded batched transform for every column stack: the
            # previous per-stack jits compiled a fresh multi-minute TPU
            # executable per distinct column count (the r4 cold-compile
            # wall); padding Ctot to a power of two makes one executable
            # serve every circuit in a bucket at a given k
            stacks = ([s for s, nz in ((fixed_l, cs.num_fixed),
                                       (advice_l, cs.num_advice),
                                       (instance_l, cs.num_instance),
                                       (sigma_l, m_perm)) if nz]
                      + [s[None] for s in
                         list(z_list) + list(phi_list) + list(m_all)
                         + list(shz_list)])
            if not stacks:
                e = empty_ext()
                return ({FIXED: e, ADVICE: e, INSTANCE: e}, e, [], [], [], [])
            big = jnp.concatenate(stacks, axis=0)      # (Ctot, 16, n)
            C = big.shape[0]
            Cp = 1 << (C - 1).bit_length()
            if Cp != C:
                big = jnp.concatenate(
                    [big, jnp.zeros((Cp - C,) + big.shape[1:], big.dtype)])
            # multi-chip: route the domain transforms through the
            # four-step sharded NTT when a mesh is active and the extended
            # domain divides it (bit-identical to the single-device path,
            # so mesh and non-mesh proofs agree byte-for-byte)
            from ..parallel import sharded as _sh
            mesh = _sh.active_mesh()
            if mesh is not None and _sh.shard_factors(mesh, ext) is not None:
                ext_all = _sh.to_ext_sharded(mesh, dom, big)[:C]
            else:
                ext_all = _to_ext_jit(big)[:C]

            off = 0

            def take(cnt):
                nonlocal off
                out = ext_all[off:off + cnt]
                off += cnt
                return out

            cols_ext = {
                FIXED: take(cs.num_fixed) if cs.num_fixed else empty_ext(),
                ADVICE: take(cs.num_advice) if cs.num_advice else empty_ext(),
                INSTANCE: take(cs.num_instance) if cs.num_instance else empty_ext(),
            }
            sig_ext = take(m_perm) if m_perm else empty_ext()
            z_ext = [take(1)[0] for _ in z_list]
            phi_ext = [take(1)[0] for _ in phi_list]
            m_ext = [take(1)[0] for _ in m_all]
            shz_ext = [take(1)[0] for _ in shz_list]
            return cols_ext, sig_ext, z_ext, phi_ext, m_ext, shz_ext

        self.stage_to_ext = stage_to_ext

        # term descriptors, each independently buildable
        term_descs = ([("gate", i) for i in range(len(cs.gates))]
                      + sum(([("perm_run", ci), ("perm_bound", ci)]
                             + ([("perm_last", ci)] if ci == len(chunks) - 1 else [])
                             for ci in range(len(chunks))), [])
                      + sum([[("lk_run", li), ("lk_l0", li), ("lk_last", li)]
                             for li in range(len(cs.lookups))], [])
                      + sum([[("sh_run", si), ("sh_l0", si), ("sh_last", si)]
                             for si in range(len(cs.shuffles))], []))
        self.num_terms = len(term_descs)

        def build_term(desc, cols_ext, sig_ext, z_ext, phi_ext, m_ext,
                       shz_ext, theta, beta, gamma, ch):
            kind, idx = desc
            bb = beta[:, None]
            gg = gamma[:, None]
            ctx = ctx_of(cols_ext, step, ch)
            if kind == "gate":
                return evaluate(cs.gates[idx].poly, ctx)
            if kind == "perm_run":
                cset = chunks[idx]
                z_e = z_ext[idx]
                z_next = jnp.roll(z_e, -step, axis=-1)
                num = den = None
                for j in cset:
                    c = cs.perm_columns[j]
                    v = cols_ext[c.kind][c.index]
                    idj = limbs.mont_mul(FR, dpow[:, j][:, None], coset_pts)
                    # NOTE: must not shadow the closure's closing-row `a`
                    # (read by the perm_bound carry branch below)
                    fa = limbs.add(FR, limbs.add(FR, v, limbs.mont_mul(
                        FR, jnp.broadcast_to(bb, idj.shape), idj)), gg)
                    fb = limbs.add(FR, limbs.add(FR, v, limbs.mont_mul(
                        FR, jnp.broadcast_to(bb, v.shape), sig_ext[j])), gg)
                    num = fa if num is None else limbs.mont_mul(FR, num, fa)
                    den = fb if den is None else limbs.mont_mul(FR, den, fb)
                running = limbs.sub(FR, limbs.mont_mul(FR, z_next, den),
                                    limbs.mont_mul(FR, z_e, num))
                return limbs.mont_mul(FR, not_last, running)
            if kind == "perm_bound":
                z_e = z_ext[idx]
                if idx == 0:
                    return limbs.mont_mul(FR, l0_ext, limbs.sub(FR, z_e, one_ext))
                # carry constraint: z_i(0) == z_{i-1}(closing row a), i.e.
                # query the previous chunk at rotation +a
                prev_last = jnp.roll(z_ext[idx - 1], -(a * step) % ext, axis=-1)
                return limbs.mont_mul(FR, l0_ext, limbs.sub(FR, z_e, prev_last))
            if kind == "perm_last":
                return limbs.mont_mul(FR, llast_ext,
                                      limbs.sub(FR, z_ext[idx], one_ext))
            if kind in ("sh_run", "sh_l0", "sh_last"):
                sh = cs.shuffles[idx]
                z_e = shz_ext[idx]
                if kind == "sh_l0":
                    return limbs.mont_mul(FR, l0_ext, limbs.sub(FR, z_e, one_ext))
                if kind == "sh_last":
                    return limbs.mont_mul(FR, llast_ext, limbs.sub(FR, z_e, one_ext))
                a_e = limbs.add(FR, compress(sh.input, ctx, theta), gg)
                b_e = limbs.add(FR, compress(sh.table, ctx, theta), gg)
                z_next = jnp.roll(z_e, -step, axis=-1)
                running = limbs.sub(FR, limbs.mont_mul(FR, z_next, b_e),
                                    limbs.mont_mul(FR, z_e, a_e))
                return limbs.mont_mul(FR, not_last, running)
            lk = cs.lookups[idx]
            phi_e = phi_ext[idx]
            if kind == "lk_l0":
                return limbs.mont_mul(FR, l0_ext, phi_e)
            if kind == "lk_last":
                return limbs.mont_mul(FR, llast_ext, phi_e)
            # lk_run
            m_e = m_ext[idx]
            f_exts = [limbs.add(FR, compress(tup, ctx, theta), bb)
                      for tup in lk.inputs]
            t_e = limbs.add(FR, compress(lk.table, ctx, theta), bb)
            prod_f = None
            for fpb in f_exts:
                prod_f = fpb if prod_f is None else limbs.mont_mul(FR, prod_f, fpb)
            if len(f_exts) == 1:
                sum_except = one_ext
            else:
                sum_except = None
                for kk in range(len(f_exts)):
                    pr = None
                    for jj, fpb in enumerate(f_exts):
                        if jj == kk:
                            continue
                        pr = fpb if pr is None else limbs.mont_mul(FR, pr, fpb)
                    sum_except = pr if sum_except is None else limbs.add(FR, sum_except, pr)
            phi_next = jnp.roll(phi_e, -step, axis=-1)
            diff = limbs.sub(FR, phi_next, phi_e)
            lhs = limbs.mont_mul(FR, limbs.mont_mul(FR, diff, prod_f), t_e)
            rhs = limbs.sub(FR, limbs.mont_mul(FR, t_e, sum_except),
                            limbs.mont_mul(FR, m_e, prod_f))
            return limbs.mont_mul(FR, not_last, limbs.sub(FR, lhs, rhs))

        # On CPU a big fused term graph overflows the XLA CPU compiler's
        # stack (k>=11); on TPU the terms are pallas-call chains whose
        # per-executable compile overhead (tunnel remote-compile RPC) is
        # the r4 cold wall — fewer, fatter jits win there.
        TERM_CHUNK = int(_os.environ.get("EZKL_TPU_TERM_CHUNK", "0")) or \
            (2 if jax.default_backend() == "cpu" else 6)
        self._term_jits = []
        for lo in range(0, len(term_descs), TERM_CHUNK):
            descs = term_descs[lo:lo + TERM_CHUNK]

            def chunk_fn(cols_ext, sig_ext, z_ext, phi_ext, m_ext, shz_ext,
                         theta, beta, gamma, ch, _descs=descs):
                return [build_term(d, cols_ext, sig_ext, z_ext, phi_ext,
                                   m_ext, shz_ext, theta, beta, gamma, ch)
                        for d in _descs]

            self._term_jits.append(jax.jit(chunk_fn))

        def stage_combine(terms, y):
            T = len(terms)
            ypows = limbs.powers_dynamic(FR, y, T)
            scaled = [
                limbs.mont_mul(FR, t, jnp.broadcast_to(
                    ypows[:, T - 1 - i][:, None], t.shape))
                for i, t in enumerate(terms)
            ]
            while len(scaled) > 1:
                nxt = []
                for i in range(0, len(scaled) - 1, 2):
                    nxt.append(limbs.add(FR, scaled[i], scaled[i + 1]))
                if len(scaled) % 2:
                    nxt.append(scaled[-1])
                scaled = nxt
            total = scaled[0]
            h_ext = limbs.mont_mul(FR, total, dom.vanishing_inv_on_extended())
            h_coeff = dom.extended_to_coeff(h_ext)
            return [h_coeff[..., i * n:(i + 1) * n] for i in range(ext // n)]

        self.stage_combine = jax.jit(stage_combine)

        def stage_quotient(advice_l, fixed_l, instance_l, theta, beta, gamma,
                           y, z_list, phi_list, m_all, shz_list, *ch):
            exts = self.stage_to_ext(advice_l, fixed_l, instance_l,
                                     z_list, phi_list, m_all, shz_list)
            terms = []
            for fn in self._term_jits:
                terms.extend(fn(*exts, theta, beta, gamma, list(ch)))
            return self.stage_combine(terms, y)

        self.stage_quotient = stage_quotient  # composition of jits

        # ---- stage D: batched evaluation at an opening point ------------
        def stage_eval(coeff_stack, z_mont):
            """coeff_stack (Q, 16, n) all at the SAME point -> (Q, 16)."""
            pw = limbs.powers_dynamic(FR, z_mont, n)
            vv = jnp.moveaxis(coeff_stack, 1, 0)              # (16, Q, n)
            prod = limbs.mont_mul(FR, vv, pw[:, None, :])
            return jnp.moveaxis(kzg._sum_last(prod), 0, 1)    # hm: (16,Q)->(Q,16)

        self.stage_eval = jax.jit(stage_eval)

        # ---- stage E: one opening witness --------------------------------
        def stage_open(lagrange_stack, evals_stack, v_ch, z_mont):
            """RLC-combine polys (Q, 16, n evals over H) + values (Q, 16),
            build (q - v)/(X - z) witness evals over H."""
            q_comb = lagrange_stack[0]
            v_comb = evals_stack[0]
            for i in range(1, lagrange_stack.shape[0]):
                q_comb = limbs.add(FR, limbs.mont_mul(
                    FR, q_comb, _bcast(v_ch, q_comb.shape)), lagrange_stack[i])
                v_comb = limbs.add(FR, limbs.mont_mul(FR, v_comb, v_ch),
                                   evals_stack[i])
            zb = jnp.broadcast_to(z_mont[:, None], (NLIMBS, n))
            inv = limbs.batch_inv(FR, limbs.sub(FR, wpow, zb))
            num = limbs.sub(FR, q_comb,
                            jnp.broadcast_to(v_comb[:, None], q_comb.shape))
            return limbs.mont_mul(FR, num, inv)

        self.stage_open = jax.jit(stage_open)


def _kernels(pk: ProvingKey) -> ProverKernels:
    kern = getattr(pk, "_kernels", None)
    if kern is None:
        kern = ProverKernels(pk)
        pk._kernels = kern
    return kern


# ---------------------------------------------------------------------------
# the prover
# ---------------------------------------------------------------------------

class _ProveCheckpoint:
    """Restartable prover phases for long (k>=20) runs.

    The reference has no analog (a killed halo2 prove restarts from
    scratch); for multi-minute TPU proofs we persist the two expensive
    cut points — after all column commitments (phase 4b) and after the
    quotient commitment (phase 5b) — so a crashed/preempted run resumes
    with at most one phase of rework. Enabled via
    `create_proof(..., checkpoint_dir=...)` or EZKL_TPU_CKPT_DIR.

    A checkpoint stores the blinded device columns (host npz), the
    transcript state bytes and the squeezed host scalars, keyed by
    (vk repr, witness digest, seed) — so a resume continues BYTE-IDENTICAL
    to the uninterrupted proof, and a different witness/seed can never
    pick up stale state. Cleared on success."""

    def __init__(self, root, pk, asg, seed):
        import hashlib
        h = hashlib.blake2b(digest_size=16)
        h.update(pk.vk.transcript_repr())
        h.update(asg.advice.tobytes())
        h.update(repr(asg.instance).encode())
        h.update(str(seed).encode())
        self.dir = pathlib.Path(root) / f"prove-{h.hexdigest()}"
        self.dir.mkdir(parents=True, exist_ok=True)

    def save(self, name: str, tr, meta: dict, arrays: dict):
        """arrays: name -> ndarray | list[ndarray] (device ok)."""
        flat = {}
        for kk, v in arrays.items():
            if isinstance(v, (list, tuple)):
                flat[f"{kk}__len"] = np.asarray(len(v))
                for i, a in enumerate(v):
                    flat[f"{kk}__{i}"] = np.asarray(a)
            else:
                flat[kk] = np.asarray(v)
        # np.savez appends ".npz" to names without it — keep the temp name
        # suffixed so the write goes where the rename expects
        tmp = self.dir / f".{name}.tmp.npz"
        np.savez(tmp, **flat)
        tmp.rename(self.dir / f"{name}.npz")
        meta = dict(meta, transcript_state=tr._state.hex())
        (self.dir / f"{name}.json").write_text(json.dumps(meta))

    def load(self, name: str):
        jf, nf = self.dir / f"{name}.json", self.dir / f"{name}.npz"
        if not (jf.exists() and nf.exists()):
            return None
        meta = json.loads(jf.read_text())
        data = np.load(nf)
        arrays = {}
        for kk in data.files:
            if kk.endswith("__len"):
                base = kk[:-5]
                arrays[base] = [jnp.asarray(data[f"{base}__{i}"])
                                for i in range(int(data[kk]))]
            elif "__" not in kk:
                arrays[kk] = jnp.asarray(data[kk])
        return meta, arrays

    def clear(self):
        import shutil
        shutil.rmtree(self.dir, ignore_errors=True)


def _pts_meta(pts):
    """Host affine points -> JSON-able [[hex,hex]|None]."""
    return [None if p is None else [hex(p[0]), hex(p[1])] for p in pts]


def _pts_unmeta(pts):
    return [None if p is None else (int(p[0], 16), int(p[1], 16))
            for p in pts]


def _rng_for_proof(seed: int | None) -> np.random.Generator:
    if seed is None:
        env = _os.environ.get("EZKL_TPU_DET_SEED")
        if env is not None:
            seed = int(env)
    if seed is None:
        seed = int.from_bytes(_os.urandom(16), "little")
    return np.random.default_rng(seed)


def _random_mont(rng: np.random.Generator, shape) -> jnp.ndarray:
    """Fresh blinding field elements as device Montgomery limbs.

    Raw values are < 2^253 (top limb masked) — statistically negligible bias
    against uniform over Fr; plenty for hiding."""
    raw = rng.integers(0, 1 << 16, size=(NLIMBS,) + tuple(shape),
                       dtype=np.int64).astype(np.uint32)
    raw[NLIMBS - 1] &= 0x1FFF
    return _to_mont_jit(jnp.asarray(raw))


_to_mont_jit = jax.jit(lambda v: limbs.to_mont(FR, v))


# number of _span phases fired before "done" in _create_proof_impl
_PROVE_PHASES = 9


def create_proof(pk: ProvingKey, srs: SRS, asg: Assignment,
                 transcript: Transcript | None = None,
                 seed: int | None = None,
                 checkpoint_dir: str | None = None) -> Proof:
    global _PROG
    from ..utils.progress import progress as _progress
    _PROG = _progress(f"prove k={pk.vk.k}", total=_PROVE_PHASES)
    try:
        return _create_proof_impl(pk, srs, asg, transcript, seed,
                                  checkpoint_dir)
    finally:
        # on an exception mid-proof, close the dangling progress line so a
        # subsequent create_proof starts with a fresh bar
        if _PROG is not None:
            _PROG.done()
            _PROG = None


def _create_proof_impl(pk: ProvingKey, srs: SRS, asg: Assignment,
                       transcript: Transcript | None = None,
                       seed: int | None = None,
                       checkpoint_dir: str | None = None) -> Proof:
    cs = pk.vk.cs
    dom = pk.vk.domain
    k, n, p = pk.vk.k, dom.n, FR.modulus
    tr = transcript or Transcript()
    kern = _kernels(pk)
    chunks = kern.chunks
    m_perm = len(cs.perm_columns)
    a = kern.a
    rng = _rng_for_proof(seed)

    ckpt_root = checkpoint_dir or _os.environ.get("EZKL_TPU_CKPT_DIR")
    if ckpt_root and seed is None and \
            _os.environ.get("EZKL_TPU_DET_SEED") is None:
        raise ValueError(
            "checkpointed proving needs a deterministic seed (seed= or "
            "EZKL_TPU_DET_SEED): a resume must replay the same blinding")
    ckpt = _ProveCheckpoint(ckpt_root, pk, asg, seed) if ckpt_root else None

    def blind_tail(cols, unblinded_mask=None):
        """Randomize rows (a, n) of a (..., 16, n) Montgomery column stack.

        unblinded_mask: optional (C,) bool — columns whose tail must stay
        untouched (kzgcommit/polycommit columns: their commitment must equal
        the plain KZG commitment of the data, `polycommit.rs:44-107`)."""
        nb = n - a - 1
        r = _random_mont(rng, cols.shape[:-2] + (nb,))
        if cols.ndim == 3:
            r = jnp.moveaxis(r, 1, 0)         # (C, 16, nb)
            if unblinded_mask is not None and unblinded_mask.any():
                keep = jnp.asarray(unblinded_mask)[:, None, None]
                r = jnp.where(keep, cols[:, :, a + 1:], r)
            return cols.at[:, :, a + 1:].set(r)
        return cols.at[:, a + 1:].set(r)

    fixed_l = pk.fixed_lagrange
    instance_l = asg.instance_device()
    cols_st = ckpt.load("cols") if ckpt else None
    if cols_st is None:
        _maybe_release_executables(n)
        _span("phase1: bind vk+instances")
        tr.common_bytes(pk.vk.transcript_repr())
        for col in asg.instance:
            for v in col:
                tr.common_scalar(v)

        _span("phase2: advice commitments")
        phases = asg.cs.advice_phase
        p0_cols = [i for i in range(cs.num_advice) if phases[i] == 0]
        p1_cols = [i for i in range(cs.num_advice) if phases[i] != 0]

        unbl = np.asarray([bool(b) for b in cs.advice_unblinded], bool) \
            if cs.advice_unblinded else np.zeros(cs.num_advice, bool)
        advice_l = blind_tail(asg.device_columns(ADVICE), unbl)  # (na,16,n)
        advice_comms: dict[int, object] = {}
        if p0_cols:
            for i, c in zip(
                    p0_cols,
                    kzg.commit_many(srs, advice_l[jnp.asarray(p0_cols)])):
                advice_comms[i] = c
                tr.common_point(c)
        challenges = [tr.challenge() for _ in range(cs.num_challenges)]
        ch_dev = [limbs.const(FR, v) for v in challenges]
        if p1_cols:
            asg.apply_phase1({i: v for i, v in enumerate(challenges)})
            refreshed = blind_tail(asg.device_columns(ADVICE), unbl)
            # keep the already-committed phase-0 blinding rows byte-identical
            keep = jnp.asarray([phases[i] == 0 for i in range(cs.num_advice)])
            advice_l = jnp.where(keep[:, None, None], advice_l, refreshed)
            for i, c in zip(p1_cols,
                            kzg.commit_many(srs, advice_l[jnp.asarray(p1_cols)])):
                advice_comms[i] = c
                tr.common_point(c)
        advice_comms = [advice_comms[i] for i in range(cs.num_advice)]

        _span("phase3: lookups m")
        theta = tr.challenge()
        theta_dev = limbs.const(FR, theta)
        fs_all, t_all, sh_in_all, sh_t_all = kern.stage_compress(
            advice_l, fixed_l, instance_l, theta_dev, *ch_dev)
        m_all, m_comms = [], []
        _from_mont = jax.jit(functools.partial(limbs.from_mont, FR))
        for lk, fs, t in zip(cs.lookups, fs_all, t_all):
            # vectorized multiplicity counting: pack field elements into
            # structured u64 rows, sorted-match inputs against the table,
            # count per first-occurrence table row (no Python loops)
            t_pack = limbs.pack_rows(np.asarray(_from_mont(t)))[:a]
            order = np.argsort(t_pack, kind="stable")
            t_sorted = t_pack[order]
            f_all = np.concatenate([
                limbs.pack_rows(np.asarray(_from_mont(f)))[:a] for f in fs])
            pos = np.searchsorted(t_sorted, f_all)
            pos_c = np.minimum(pos, t_sorted.size - 1)
            ok = t_sorted[pos_c] == f_all
            if not ok.all():
                raise ValueError(
                    f"lookup '{lk.name}': {int((~ok).sum())} input values not in table")
            # within runs of equal table values, map to the run's first
            # original row (stable argsort keeps row order inside runs)
            run_start = np.r_[True, t_sorted[1:] != t_sorted[:-1]]
            run_first = np.maximum.accumulate(
                np.where(run_start, np.arange(t_sorted.size), 0))
            rows_for_f = order[run_first[pos_c]]
            m_host = np.bincount(rows_for_f, minlength=n).astype(np.int64)
            m_dev = blind_tail(_to_mont_jit(jnp.asarray(limbs.encode_i64(FR, m_host))))
            m_all.append(m_dev)
        m_comms = kzg.commit_many(srs, m_all)
        for cpt in m_comms:
            tr.common_point(cpt)

        _span("phase4: perm z + phi")
        beta = tr.challenge()
        gamma = tr.challenge()
        beta_dev = limbs.const(FR, beta)
        gamma_dev = limbs.const(FR, gamma)
        z_list, phi_list, shz_list = kern.stage_zphi(
            advice_l, fixed_l, instance_l, beta_dev, gamma_dev, fs_all, t_all,
            m_all, sh_in_all, sh_t_all)
        z_list = [blind_tail(z) for z in z_list]
        phi_list = [blind_tail(phi) for phi in phi_list]
        shz_list = [blind_tail(z) for z in shz_list]
        # one batched MSM for z + phi + shuffle-z + the vanishing random
        # poly (transcript order: z's, phi's, shz's, random)
        _span("phase4b: random poly")
        r_evals = _random_mont(rng, (n,))
        batch_comms = kzg.commit_many(
            srs, z_list + phi_list + shz_list + [r_evals])
        for cpt in batch_comms:
            tr.common_point(cpt)
        nz, nphi, nshz = len(z_list), len(phi_list), len(shz_list)
        z_comms = batch_comms[:nz]
        phi_comms = batch_comms[nz:nz + nphi]
        shz_comms = batch_comms[nz + nphi:nz + nphi + nshz]
        r_comm = batch_comms[-1]
        if ckpt:
            ckpt.save(
                "cols", tr,
                meta=dict(theta=theta, beta=beta, gamma=gamma,
                          challenges=challenges,
                          advice_comms=_pts_meta(advice_comms),
                          m_comms=_pts_meta(m_comms),
                          z_comms=_pts_meta(z_comms),
                          phi_comms=_pts_meta(phi_comms),
                          shz_comms=_pts_meta(shz_comms),
                          r_comm=_pts_meta([r_comm])[0]),
                arrays=dict(advice_l=advice_l, m_all=m_all, z_list=z_list,
                            phi_list=phi_list, shz_list=shz_list,
                            r_evals=r_evals))
    else:
        _span("phase1-4b: resumed from checkpoint")
        meta, arrs = cols_st
        tr._state = bytes.fromhex(meta["transcript_state"])
        theta, beta, gamma = meta["theta"], meta["beta"], meta["gamma"]
        challenges = meta["challenges"]
        theta_dev = limbs.const(FR, theta)
        beta_dev = limbs.const(FR, beta)
        gamma_dev = limbs.const(FR, gamma)
        ch_dev = [limbs.const(FR, v) for v in challenges]
        advice_comms = _pts_unmeta(meta["advice_comms"])
        m_comms = _pts_unmeta(meta["m_comms"])
        z_comms = _pts_unmeta(meta["z_comms"])
        phi_comms = _pts_unmeta(meta["phi_comms"])
        shz_comms = _pts_unmeta(meta["shz_comms"])
        r_comm = _pts_unmeta([meta["r_comm"]])[0]
        advice_l = arrs["advice_l"]
        m_all = arrs["m_all"]
        z_list, phi_list = arrs["z_list"], arrs["phi_list"]
        shz_list, r_evals = arrs["shz_list"], arrs["r_evals"]

    h_st = ckpt.load("h") if ckpt else None
    if h_st is None:
        _span("phase5: quotient")
        y = tr.challenge()
        y_dev = limbs.const(FR, y)
        _maybe_release_executables(n)
        h_pieces = kern.stage_quotient(advice_l, fixed_l, instance_l, theta_dev,
                                       beta_dev, gamma_dev, y_dev, z_list,
                                       phi_list, m_all, shz_list, *ch_dev)
        h_pieces = [jnp.asarray(p) for p in h_pieces]
        _maybe_release_executables(n)
        _span("phase5b: commit h")
        h_comms = kzg.commit_many(srs, h_pieces, lagrange=False)
        for cpt in h_comms:
            tr.common_point(cpt)
        if ckpt:
            ckpt.save("h", tr, meta=dict(h_comms=_pts_meta(h_comms)),
                      arrays=dict(h_pieces=h_pieces))
    else:
        _span("phase5: resumed from checkpoint")
        meta_h, arrs_h = h_st
        tr._state = bytes.fromhex(meta_h["transcript_state"])
        h_comms = _pts_unmeta(meta_h["h_comms"])
        h_pieces = arrs_h["h_pieces"]

    _span("phase6: evaluations")
    x = tr.challenge()
    evals: dict[str, int] = {}

    # gather coefficient forms once
    coeff_cache: dict[str, jnp.ndarray] = {}
    cols_l = {FIXED: fixed_l, ADVICE: advice_l, INSTANCE: instance_l}

    def coeff_of_col(kind, index):
        key = f"{kind}{index}"
        if key not in coeff_cache:
            coeff_cache[key] = nttmod.intt(FR, cols_l[kind][index])
        return coeff_cache[key]

    queries = cs.all_queries()

    def rot_point(r):
        return dom.rotate_omega(x, r)

    # batch poly evaluations by point
    eval_jobs: dict[int, list] = defaultdict(list)  # point -> [(label, coeffs)]
    for q in queries:
        if q.column.kind == INSTANCE:
            continue
        label = _eval_label(q.column.kind, q.column.index, q.rotation)
        eval_jobs[rot_point(q.rotation)].append(
            (label, coeff_of_col(q.column.kind, q.column.index)))
    sigma_coeff = [nttmod.intt(FR, pk.sigma_lagrange[j]) for j in range(m_perm)]
    z_coeff = [nttmod.intt(FR, z) for z in z_list]
    phi_coeff = [nttmod.intt(FR, phi) for phi in phi_list]
    m_coeff = [nttmod.intt(FR, m) for m in m_all]
    shz_coeff = [nttmod.intt(FR, z) for z in shz_list]
    for j in range(m_perm):
        eval_jobs[x].append((f"sigma{j}@0", sigma_coeff[j]))
    for ci in range(len(chunks)):
        eval_jobs[x].append((f"permz{ci}@0", z_coeff[ci]))
        eval_jobs[rot_point(1)].append((f"permz{ci}@1", z_coeff[ci]))
        if ci > 0:
            # cross-chunk carry is read at the closing row: rotation +a
            eval_jobs[rot_point(a)].append((f"permz{ci - 1}@{a}", z_coeff[ci - 1]))
    for li in range(len(cs.lookups)):
        eval_jobs[x].append((f"phi{li}@0", phi_coeff[li]))
        eval_jobs[rot_point(1)].append((f"phi{li}@1", phi_coeff[li]))
        eval_jobs[x].append((f"lkm{li}@0", m_coeff[li]))
    for si in range(len(cs.shuffles)):
        eval_jobs[x].append((f"shz{si}@0", shz_coeff[si]))
        eval_jobs[rot_point(1)].append((f"shz{si}@1", shz_coeff[si]))
    eval_jobs[x].append(("r@0", nttmod.intt(FR, r_evals)))
    for i, piece in enumerate(h_pieces):
        eval_jobs[x].append((f"h{i}@0", piece))

    for point, jobs in eval_jobs.items():
        stack = jnp.stack([c for _, c in jobs])
        # pad the poly count to a power of two: one compiled executable per
        # bucket instead of one per distinct opening-group size
        Q = stack.shape[0]
        Qp = 1 << (Q - 1).bit_length()
        if Qp != Q:
            stack = jnp.concatenate(
                [stack, jnp.zeros((Qp - Q,) + stack.shape[1:], stack.dtype)])
        vals = kern.stage_eval(stack, limbs.const(FR, point))[:Q]
        for (label, _), row in zip(jobs, np.asarray(vals)):
            evals[label] = int(limbs.decode(FR, row[:, None])[0])

    for label in sorted(evals):
        tr.common_scalar(evals[label])

    _span("phase7: multiopen")
    v_ch = tr.challenge()
    v_dev = limbs.const(FR, v_ch)

    groups: dict[int, list] = defaultdict(list)  # point -> [(lagrange, eval_label)]
    for q in queries:
        if q.column.kind == INSTANCE:
            continue
        label = _eval_label(q.column.kind, q.column.index, q.rotation)
        groups[rot_point(q.rotation)].append(
            (cols_l[q.column.kind][q.column.index], label))
    for j in range(m_perm):
        groups[x].append((pk.sigma_lagrange[j], f"sigma{j}@0"))
    for ci in range(len(chunks)):
        groups[x].append((z_list[ci], f"permz{ci}@0"))
        groups[rot_point(1)].append((z_list[ci], f"permz{ci}@1"))
        if ci > 0:
            groups[rot_point(a)].append((z_list[ci - 1], f"permz{ci - 1}@{a}"))
    for li in range(len(cs.lookups)):
        groups[x].append((phi_list[li], f"phi{li}@0"))
        groups[rot_point(1)].append((phi_list[li], f"phi{li}@1"))
        groups[x].append((m_all[li], f"lkm{li}@0"))
    for si in range(len(cs.shuffles)):
        groups[x].append((shz_list[si], f"shz{si}@0"))
        groups[rot_point(1)].append((shz_list[si], f"shz{si}@1"))
    groups[x].append((r_evals, "r@0"))
    for i, piece in enumerate(h_pieces):
        groups[x].append((nttmod.ntt(FR, piece), f"h{i}@0"))

    w_stacks = []
    for point in sorted(groups):
        items = groups[point]
        lag_stack = jnp.stack([poly for poly, _ in items])
        ev_stack = jnp.stack(
            [limbs.const(FR, evals[label]) for _, label in items])
        # pad with LEADING zero rows to a power of two (a zero poly/value
        # contributes nothing to the running v-RLC, so the witness is
        # bit-identical) — one compiled executable per size bucket
        Q = lag_stack.shape[0]
        Qp = 1 << (Q - 1).bit_length()
        if Qp != Q:
            lag_stack = jnp.concatenate(
                [jnp.zeros((Qp - Q,) + lag_stack.shape[1:], lag_stack.dtype),
                 lag_stack])
            ev_stack = jnp.concatenate(
                [jnp.zeros((Qp - Q,) + ev_stack.shape[1:], ev_stack.dtype),
                 ev_stack])
        w_stacks.append(kern.stage_open(lag_stack, ev_stack, v_dev,
                                        limbs.const(FR, point)))
    opening_comms = kzg.commit_many(srs, w_stacks)
    for cpt in opening_comms:
        tr.common_point(cpt)

    _span("done")
    if ckpt:
        ckpt.clear()
    return Proof(
        advice_commitments=advice_comms,
        lookup_m_commitments=m_comms,
        perm_z_commitments=z_comms,
        lookup_phi_commitments=phi_comms,
        shuffle_z_commitments=shz_comms,
        random_commitment=r_comm,
        h_commitments=h_comms,
        evals=evals,
        opening_commitments=opening_comms,
        instances=[list(c) for c in asg.instance],
    )
