"""Proof creation — the TPU-native replacement for halo2's `create_proof`
(SURVEY.md §3.4: commit advice -> challenges -> lookup/permutation polys ->
quotient on the extended coset -> openings; every hot kernel is device NTT /
MSM / batched limb math).

Protocol (own verifier; see `verifier.py`):
 1. absorb vk repr + instance values
 2. per advice phase: commit advice columns, absorb, squeeze phase challenges
 3. theta; lookup multiplicities m committed
 4. beta, gamma; permutation Z chunks + lookup grand-sum phi committed
 5. y; quotient h computed over the extended coset, split, committed
 6. x; all query evaluations absorbed
 7. GWC multiopen: v (intra-point RLC), one witness commitment per point, u
Row n-1 is reserved (running constraints masked by (1 - l_last)); circuits
must keep their last row empty.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from ..fieldmath import limbs
from ..fieldmath.spec import bn254_fr, NLIMBS
from ..kernels import ntt as nttmod
from . import kzg
from .assign import Assignment
from .cs import ConstraintSystem, FIXED, ADVICE, INSTANCE, Query
from .domain import Domain
from .evaluator import EvalCtx, evaluate
from .keygen import ProvingKey, DELTA
from .srs import SRS
from .transcript import Transcript, decode_point_host, decode_scalar_host

FR = bn254_fr()

import os as _os
import time as _time

_TRACE = _os.environ.get("EZKL_TPU_TRACE", "")
_t0 = _time.time()


def _span(msg: str):
    if _TRACE:
        print(f"[prover +{_time.time() - _t0:7.1f}s] {msg}", flush=True)


@dataclasses.dataclass
class Proof:
    """Transcript-ordered proof contents (host-side ints/points)."""

    advice_commitments: list
    lookup_m_commitments: list
    perm_z_commitments: list
    lookup_phi_commitments: list
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
    incl = jax.lax.associative_scan(lambda a, b: limbs.add(FR, a, b), v, axis=v.ndim - 1)
    z = jnp.zeros(v.shape[:-1] + (1,), v.dtype)
    return jnp.concatenate([z, incl[..., :-1]], axis=-1)


def _running_product(v):
    """Exclusive prefix product along last axis (starts at 1)."""
    incl = jax.lax.associative_scan(lambda a, b: limbs.mont_mul(FR, a, b), v, axis=v.ndim - 1)
    one = limbs.ones_mont(FR, v.shape[1:-1] + (1,))
    return jnp.concatenate([one, incl[..., :-1]], axis=-1)


def lagrange_basis_ext(dom: Domain, index: int) -> jnp.ndarray:
    """l_index evaluated over the extended coset (16, n_ext)."""
    e = np.zeros((NLIMBS, dom.n), np.uint32)
    with jax.ensure_compile_time_eval():
        one = limbs.const(FR, 1)
        basis = jnp.asarray(e).at[:, index].set(one)
        coeff = nttmod.intt(FR, basis)
        return dom.coeff_to_extended(coeff)


def _queries_by_rotation(cs: ConstraintSystem):
    """All (kind, index, rotation) needed, plus Z/phi rotations."""
    return cs.all_queries()


def _eval_label(kind: str, index: int, rotation: int) -> str:
    return f"{kind}{index}@{rotation}"


# ---------------------------------------------------------------------------
# the prover
# ---------------------------------------------------------------------------

def create_proof(pk: ProvingKey, srs: SRS, asg: Assignment,
                 transcript: Transcript | None = None) -> Proof:
    cs = pk.vk.cs
    dom = pk.vk.domain
    k, n, p = pk.vk.k, dom.n, FR.modulus
    tr = transcript or Transcript()

    _span("phase1: bind vk+instances")
    # ---- 1. bind vk + instances
    tr.common_bytes(pk.vk.transcript_repr())
    for col in asg.instance:
        for v in col:
            tr.common_scalar(v)

    _span("phase2: advice commitments")
    # ---- 2. advice commitments (single phase for now)
    advice_l = asg.device_columns(ADVICE)            # (na, 16, n) mont
    advice_comms = []
    for i in range(cs.num_advice):
        c = decode_point_host(kzg.commit_lagrange(srs, advice_l[i]))
        advice_comms.append(c)
        tr.common_point(c)
    challenges = {i: tr.challenge() for i in range(cs.num_challenges)}

    fixed_l = pk.fixed_lagrange
    instance_l = asg.instance_device()
    cols_l = {FIXED: fixed_l, ADVICE: advice_l, INSTANCE: instance_l}
    ch_dev = {i: limbs.const(FR, v) for i, v in challenges.items()}
    ctx_l = EvalCtx(columns=cols_l, rot_step=1, challenges=ch_dev)

    _span("phase3: lookups m")
    # ---- 3. theta: lookup compression + multiplicities
    theta = tr.challenge()
    theta_dev = limbs.const(FR, theta)

    lookup_f = []      # per lookup: list of (16, n) compressed input streams
    lookup_t = []      # per lookup: (16, n) compressed table
    lookup_m = []      # per lookup: (16, n) multiplicities (mont)
    m_comms = []
    for lk in cs.lookups:
        def compress(tup):
            acc = None
            for e in tup:
                v = evaluate(e, ctx_l)
                acc = v if acc is None else limbs.add(
                    FR, limbs.mont_mul(FR, acc, jnp.broadcast_to(theta_dev[:, None], v.shape)), v)
            return acc

        fs = [compress(tup) for tup in lk.inputs]
        t = compress(lk.table)
        # multiplicities on host (counting); usable rows only
        t_ints = [int(x) for x in limbs.decode(FR, t)]
        counts = defaultdict(int)
        for f in fs:
            for x in limbs.decode(FR, f)[:n - 1]:
                counts[int(x)] += 1
        first_row = {}
        for i, tv in enumerate(t_ints[:n - 1]):
            if tv not in first_row:
                first_row[tv] = i
        m_host = [0] * n
        missing = 0
        for val, cnt in counts.items():
            if val in first_row:
                m_host[first_row[val]] += cnt
            else:
                missing += 1
        if missing:
            raise ValueError(f"lookup '{lk.name}': {missing} input values not in table")
        m_dev = jnp.asarray(limbs.encode(FR, m_host))
        lookup_f.append(fs)
        lookup_t.append(t)
        lookup_m.append(m_dev)
        cpt = decode_point_host(kzg.commit_lagrange(srs, m_dev))
        m_comms.append(cpt)
        tr.common_point(cpt)

    _span("phase4: perm z + phi")
    # ---- 4. beta, gamma: permutation Z + lookup phi
    beta = tr.challenge()
    gamma = tr.challenge()
    beta_dev = limbs.const(FR, beta)[:, None]
    gamma_dev = limbs.const(FR, gamma)[:, None]

    m_perm = len(cs.perm_columns)
    chunk = cs.perm_chunk_size()
    chunks = [list(range(i, min(i + chunk, m_perm))) for i in range(0, m_perm, chunk)]

    with jax.ensure_compile_time_eval():
        wpow = limbs.jitted(FR).powers(dom.omega, n)             # id row part
        dpow = limbs.jitted(FR).powers(DELTA, max(m_perm, 1))

    def col_vals(j):
        c = cs.perm_columns[j]
        return cols_l[c.kind][c.index]

    z_polys = []
    z_comms = []
    carry = limbs.ones_mont(FR, ())                              # chain value
    for ci, cset in enumerate(chunks):
        num = None
        den = None
        for j in cset:
            v = col_vals(j)
            idj = limbs.mont_mul(FR, dpow[:, j][:, None], wpow)  # delta^j w^i
            a = limbs.add(FR, limbs.add(FR, v, limbs.mont_mul(
                FR, jnp.broadcast_to(beta_dev, idj.shape), idj)), gamma_dev)
            s = pk.sigma_lagrange[j]
            b = limbs.add(FR, limbs.add(FR, v, limbs.mont_mul(
                FR, jnp.broadcast_to(beta_dev, s.shape), s)), gamma_dev)
            num = a if num is None else limbs.mont_mul(FR, num, a)
            den = b if den is None else limbs.mont_mul(FR, den, b)
        ratio = limbs.mont_mul(FR, num, limbs.batch_inv(FR, den))
        z = _running_product(ratio)                              # z[0] = 1
        z = limbs.mont_mul(FR, z, jnp.broadcast_to(carry[:, None], z.shape))
        # next chunk chains from Z_t(w^{n-1}) (product through row n-2; the
        # reserved last row's factor never enters any product)
        carry = z[..., n - 1]
        z_polys.append(z)
        cpt = decode_point_host(kzg.commit_lagrange(srs, z))
        z_comms.append(cpt)
        tr.common_point(cpt)

    phi_polys = []
    phi_comms = []
    for fs, t, m_dev in zip(lookup_f, lookup_t, lookup_m):
        inv_f = [limbs.batch_inv(FR, limbs.add(FR, f, beta_dev)) for f in fs]
        inv_t = limbs.batch_inv(FR, limbs.add(FR, t, beta_dev))
        term = None
        for invf in inv_f:
            term = invf if term is None else limbs.add(FR, term, invf)
        term = limbs.sub(FR, term, limbs.mont_mul(FR, m_dev, inv_t))
        # zero the reserved last row's contribution
        mask = jnp.ones((n,), dtype=bool).at[n - 1].set(False)
        term = limbs.select(mask[None, :].squeeze(0), term, jnp.zeros_like(term))
        phi = _running_sum(term)
        phi_polys.append(phi)
        cpt = decode_point_host(kzg.commit_lagrange(srs, phi))
        phi_comms.append(cpt)
        tr.common_point(cpt)

    _span("phase5: quotient")
    # ---- 5. y: quotient
    y = tr.challenge()

    ext = dom.n_ext
    step = ext // n

    def to_ext(v):
        # v: (..., 16, n) lagrange -> (..., 16, n_ext); batch over leading dims
        vv = v if v.ndim == 3 else v[None]
        vv = jnp.moveaxis(vv, 1, 0)                              # (16, B, n)
        coeff = nttmod.intt(FR, vv)
        out = dom.coeff_to_extended(coeff)
        out = jnp.moveaxis(out, 0, 1)
        return out if v.ndim == 3 else out[0]

    cols_ext = {
        FIXED: to_ext(fixed_l) if cs.num_fixed else fixed_l.reshape(0, NLIMBS, ext),
        ADVICE: to_ext(advice_l) if cs.num_advice else advice_l.reshape(0, NLIMBS, ext),
        INSTANCE: to_ext(instance_l) if cs.num_instance else instance_l.reshape(0, NLIMBS, ext),
    }
    ctx_ext = EvalCtx(columns=cols_ext, rot_step=step, challenges=ch_dev)

    y_dev = limbs.const(FR, y)[:, None]
    total = jnp.zeros((NLIMBS, ext), jnp.uint32)

    def acc(total, term):
        return limbs.add(FR, limbs.mont_mul(FR, total, jnp.broadcast_to(y_dev, total.shape)), term)

    for g in cs.gates:
        total = acc(total, evaluate(g.poly, ctx_ext))

    l0_ext = lagrange_basis_ext(dom, 0)
    llast_ext = lagrange_basis_ext(dom, n - 1)
    one_ext = limbs.ones_mont(FR, (ext,))
    not_last = limbs.sub(FR, one_ext, llast_ext)

    # permutation constraints on extended domain
    if m_perm:
        sig_ext = to_ext(pk.sigma_lagrange)
        z_ext = to_ext(jnp.stack(z_polys)) if z_polys else None
        with jax.ensure_compile_time_eval():
            # id poly on extended coset: value g*w'^i (the coset point itself)
            coset_pts = limbs.mont_mul(
                FR,
                limbs.jitted(FR).powers(dom.omega_ext, ext),
                jnp.broadcast_to(limbs.const(FR, FR.generator)[:, None], (NLIMBS, ext)),
            )
        for ci, cset in enumerate(chunks):
            z_e = z_ext[ci]
            z_next = jnp.roll(z_e, -step, axis=-1)
            num = None
            den = None
            for j in cset:
                c = cs.perm_columns[j]
                v = cols_ext[c.kind][c.index]
                idj = limbs.mont_mul(FR, dpow[:, j][:, None], coset_pts)
                a = limbs.add(FR, limbs.add(FR, v, limbs.mont_mul(
                    FR, jnp.broadcast_to(beta_dev, idj.shape), idj)), gamma_dev)
                b = limbs.add(FR, limbs.add(FR, v, limbs.mont_mul(
                    FR, jnp.broadcast_to(beta_dev, v.shape), sig_ext[j])), gamma_dev)
                num = a if num is None else limbs.mont_mul(FR, num, a)
                den = b if den is None else limbs.mont_mul(FR, den, b)
            running = limbs.sub(FR, limbs.mont_mul(FR, z_next, den),
                                limbs.mont_mul(FR, z_e, num))
            total = acc(total, limbs.mont_mul(FR, not_last, running))
            if ci == 0:
                total = acc(total, limbs.mont_mul(
                    FR, l0_ext, limbs.sub(FR, z_e, one_ext)))
            else:
                prev_last = jnp.roll(z_ext[ci - 1], step, axis=-1)  # Z_{t-1}(w^-1 X)
                total = acc(total, limbs.mont_mul(
                    FR, l0_ext, limbs.sub(FR, z_e, prev_last)))
            if ci == len(chunks) - 1:
                total = acc(total, limbs.mont_mul(
                    FR, llast_ext, limbs.sub(FR, z_e, one_ext)))

    # lookup constraints on extended domain
    phi_ext_list = []
    for li, lk in enumerate(cs.lookups):
        phi_e = to_ext(phi_polys[li])
        phi_ext_list.append(phi_e)
        m_e = to_ext(lookup_m[li])
        f_exts = []
        for tup in lk.inputs:
            accv = None
            for e in tup:
                v = evaluate(e, ctx_ext)
                accv = v if accv is None else limbs.add(
                    FR, limbs.mont_mul(FR, accv, jnp.broadcast_to(theta_dev[:, None], v.shape)), v)
            f_exts.append(limbs.add(FR, accv, beta_dev))        # f + beta
        accv = None
        for e in lk.table:
            v = evaluate(e, ctx_ext)
            accv = v if accv is None else limbs.add(
                FR, limbs.mont_mul(FR, accv, jnp.broadcast_to(theta_dev[:, None], v.shape)), v)
        t_e = limbs.add(FR, accv, beta_dev)                     # t + beta
        prod_f = None
        for fpb in f_exts:
            prod_f = fpb if prod_f is None else limbs.mont_mul(FR, prod_f, fpb)
        # sum_k prod_{j != k} (f_j + beta)
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
        running = limbs.sub(FR, lhs, rhs)
        total = acc(total, limbs.mont_mul(FR, not_last, running))
        total = acc(total, limbs.mont_mul(FR, l0_ext, phi_e))
        total = acc(total, limbs.mont_mul(FR, llast_ext, phi_e))

    _span("phase5b: divide+split h")
    # divide by Z_H and split
    h_ext = limbs.mont_mul(FR, total, dom.vanishing_inv_on_extended())
    h_coeff = dom.extended_to_coeff(h_ext)                       # (16, n_ext)
    num_pieces = ext // n
    h_pieces = [h_coeff[..., i * n:(i + 1) * n] for i in range(num_pieces)]
    h_comms = []
    for piece in h_pieces:
        cpt = decode_point_host(kzg.commit_coeff(srs, piece))
        h_comms.append(cpt)
        tr.common_point(cpt)

    _span("phase6: evaluations")
    # ---- 6. x: evaluations
    x = tr.challenge()
    evals: dict[str, int] = {}

    # coefficient forms for evaluation + opening
    coeff_cache: dict[str, jnp.ndarray] = {}

    def coeff_of(kind, index):
        key = f"{kind}{index}"
        if key not in coeff_cache:
            coeff_cache[key] = nttmod.intt(FR, cols_l[kind][index])
        return coeff_cache[key]

    def eval_poly_at(coeffs, point: int) -> int:
        return decode_scalar_host(kzg.eval_coeff_at(coeffs, point, k))

    queries = cs.all_queries()
    # point for rotation r: w^r * x
    def rot_point(r):
        return dom.rotate_omega(x, r)

    for q in queries:
        if q.column.kind == INSTANCE:
            continue  # verifier computes instance evals itself
        val = eval_poly_at(coeff_of(q.column.kind, q.column.index), rot_point(q.rotation))
        evals[_eval_label(q.column.kind, q.column.index, q.rotation)] = val

    for j in range(m_perm):
        evals[f"sigma{j}@0"] = eval_poly_at(nttmod.intt(FR, pk.sigma_lagrange[j]), x)
    for ci in range(len(chunks)):
        zc = nttmod.intt(FR, z_polys[ci])
        evals[f"permz{ci}@0"] = eval_poly_at(zc, x)
        evals[f"permz{ci}@1"] = eval_poly_at(zc, rot_point(1))
        if ci > 0:
            evals[f"permz{ci - 1}@-1"] = eval_poly_at(
                nttmod.intt(FR, z_polys[ci - 1]), rot_point(-1))
    for li in range(len(cs.lookups)):
        pc = nttmod.intt(FR, phi_polys[li])
        evals[f"phi{li}@0"] = eval_poly_at(pc, x)
        evals[f"phi{li}@1"] = eval_poly_at(pc, rot_point(1))
        evals[f"lkm{li}@0"] = eval_poly_at(nttmod.intt(FR, lookup_m[li]), x)
    for i, piece in enumerate(h_pieces):
        evals[f"h{i}@0"] = eval_poly_at(piece, x)

    for label in sorted(evals):
        tr.common_scalar(evals[label])

    _span("phase7: multiopen")
    # ---- 7. GWC multiopen
    v_ch = tr.challenge()

    # group (poly, eval) by opening point; include everything opened above
    groups: dict[int, list] = defaultdict(list)

    def poly_lagrange(kind, index):
        return cols_l[kind][index]

    for q in queries:
        if q.column.kind == INSTANCE:
            continue
        label = _eval_label(q.column.kind, q.column.index, q.rotation)
        groups[rot_point(q.rotation)].append(
            (poly_lagrange(q.column.kind, q.column.index), evals[label]))
    for j in range(m_perm):
        groups[x].append((pk.sigma_lagrange[j], evals[f"sigma{j}@0"]))
    for ci in range(len(chunks)):
        groups[x].append((z_polys[ci], evals[f"permz{ci}@0"]))
        groups[rot_point(1)].append((z_polys[ci], evals[f"permz{ci}@1"]))
        if ci > 0:
            groups[rot_point(-1)].append((z_polys[ci - 1], evals[f"permz{ci - 1}@-1"]))
    for li in range(len(cs.lookups)):
        groups[x].append((phi_polys[li], evals[f"phi{li}@0"]))
        groups[rot_point(1)].append((phi_polys[li], evals[f"phi{li}@1"]))
        groups[x].append((lookup_m[li], evals[f"lkm{li}@0"]))
    for i, piece in enumerate(h_pieces):
        groups[x].append((nttmod.ntt(FR, piece), evals[f"h{i}@0"]))

    opening_comms = []
    for point in sorted(groups):
        items = groups[point]
        q_comb = None
        v_comb = 0
        for poly, ev in items:
            if q_comb is None:
                q_comb = poly
                v_comb = ev
            else:
                vb = jnp.broadcast_to(limbs.const(FR, v_ch)[:, None], poly.shape)
                q_comb = limbs.add(FR, limbs.mont_mul(FR, q_comb, vb), poly)
                v_comb = (v_comb * v_ch + ev) % p
        w_evals = kzg.open_witness_evals(q_comb, limbs.const(FR, v_comb), point, k)
        cpt = decode_point_host(kzg.commit_lagrange(srs, w_evals))
        opening_comms.append(cpt)
        tr.common_point(cpt)

    _span("done")
    return Proof(
        advice_commitments=advice_comms,
        lookup_m_commitments=m_comms,
        perm_z_commitments=z_comms,
        lookup_phi_commitments=phi_comms,
        h_commitments=h_comms,
        evals=evals,
        opening_commitments=opening_comms,
        instances=[list(c) for c in asg.instance],
    )
