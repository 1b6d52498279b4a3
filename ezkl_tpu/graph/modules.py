"""Hash/commit "coprocessor" modules — the reference's module system
(`/root/reference/src/circuit/modules/{poseidon,polycommit}.rs` +
`graph/modules.rs` — SURVEY.md §2.2). Module 0: in-circuit Poseidon.

The Poseidon chip here lays one permutation as 65 chained rows over two
dedicated advice columns with degree-5 round gates (the Pow5 structure):

  full:    q_f * ( sum_k MDS[j][k]*(p_k + rc_k)^5  - p_j(next) ) = 0
  partial: q_p * ( MDS[j][0]*(p_0 + rc_0)^5
                   + MDS[j][1]*(p_1 + rc_1)      - p_j(next) ) = 0

Round constants live in fixed columns; the sponge absorb between
permutations reuses the base `add` gate and copy constraints. The final
state word is copied to the public instance column (hashed visibility).
"""

from __future__ import annotations

import numpy as np

from ..kernels import poseidon as pos
from ..plonk import cs as csmod
from .layout import BaseConfig, LayoutCtx, Span, TVal

P = pos.bn254_fr().modulus


class PoseidonModule:
    """Created on first use; one instance per BaseConfig."""

    def __init__(self, cfg: BaseConfig):
        cs = cfg.cs
        self.cfg = cfg
        self.p0 = cs.advice_column()
        self.p1 = cs.advice_column()
        self.rc0 = cs.fixed_column()
        self.rc1 = cs.fixed_column()
        self.q_full = cs.fixed_column()
        self.q_part = cs.fixed_column()
        for col in (self.p0, self.p1):
            cs.enable_equality(col)
        rc, mds = pos.generate_parameters(P)
        self.rc, self.mds = rc, mds

        v0, v1 = cs.query(self.p0), cs.query(self.p1)
        n0, n1 = cs.query(self.p0, 1), cs.query(self.p1, 1)
        c0, c1 = cs.query(self.rc0), cs.query(self.rc1)
        qf, qp = cs.query(self.q_full), cs.query(self.q_part)

        def pow5(e):
            e2 = e * e
            return e2 * e2 * e

        a0 = v0 + c0
        a1 = v1 + c1
        for j, nxt in ((0, n0), (1, n1)):
            m0 = csmod.Constant(mds[j][0])
            m1 = csmod.Constant(mds[j][1])
            cs.create_gate(f"poseidon_full_{j}",
                           qf * (m0 * pow5(a0) + m1 * pow5(a1) - nxt))
            cs.create_gate(f"poseidon_part_{j}",
                           qp * (m0 * pow5(a0) + m1 * a1 - nxt))

    def hash(self, ctx: LayoutCtx, tv: TVal) -> tuple[int, Span]:
        """Lay the sponge over all elements of tv (flattened, its quantized
        field values). Returns (hash_value_int, span_of_hash_cell)."""
        flat = tv.ints.reshape(-1)
        L = int(flat.size)
        src = ctx.materialize(tv)
        half = pos.FULL_ROUNDS // 2
        rounds = pos.FULL_ROUNDS + pos.PARTIAL_ROUNDS

        def felt(x):
            return int(x) % P

        state = [0, (L << 64) % P]
        carry_span = None  # span of current s0 cell (after previous perm)
        s1_carry_span = None
        for i in range(L):
            x = felt(flat[i])
            if i == 0:
                s0 = x
                # copy input element into p0 row0 directly
            else:
                s0 = (state[0] + x) % P
            s1 = state[1]
            trace = pos.host_permute_trace([s0, s1])
            r0 = ctx.alloc(rounds + 1)
            # state columns
            ctx.write_field(self.p0, r0, [t[0] for t in trace])
            ctx.write_field(self.p1, r0, [t[1] for t in trace])
            # round constants + selectors
            ctx.write_field(self.rc0, r0, [self.rc[r][0] for r in range(rounds)])
            ctx.write_field(self.rc1, r0, [self.rc[r][1] for r in range(rounds)])
            qf = ctx._arr(self.q_full)
            qp = ctx._arr(self.q_part)
            qf[r0:r0 + half] = 1
            qf[r0 + half + pos.PARTIAL_ROUNDS:r0 + rounds] = 1
            qp[r0 + half:r0 + half + pos.PARTIAL_ROUNDS] = 1

            # wire s0/s1 initial cells
            if i == 0:
                ctx.copy_rows(self.p0, [r0], src.col, [src.rows[0]])
                capc = TVal(np.zeros(1, np.int64), 0, None)
                cap_span = ctx.materialize(capc)
                ctx._overlay.setdefault((cap_span.col.kind, cap_span.col.index), {})[
                    int(cap_span.rows[0])] = (L << 64) % P
                ctx.copy_rows(self.p1, [r0], cap_span.col, [cap_span.rows[0]])
            else:
                # absorb add row: a0 = prev s0, a1 = x, a2 = s0
                ar = ctx.alloc(1)
                ctx._overlay.setdefault((self.cfg.a0.kind, self.cfg.a0.index), {})[ar] = state[0]
                ctx.write(self.cfg.a1, ar, np.asarray([flat[i]], np.int64))
                ctx._overlay.setdefault((self.cfg.a2.kind, self.cfg.a2.index), {})[ar] = s0
                ctx.enable("add", ar, 1)
                ctx.copy_rows(self.cfg.a0, [ar], self.p0, [carry_span])
                ctx.copy_rows(self.cfg.a1, [ar], src.col, [src.rows[i]])
                ctx.copy_rows(self.cfg.a2, [ar], self.p0, [r0])
                ctx.copy_rows(self.p1, [r0], self.p1, [s1_carry_span])
            carry_span = r0 + rounds
            s1_carry_span = r0 + rounds
            state = trace[-1]
        return state[0], Span(self.p0, np.asarray([carry_span]))


def get_poseidon(cfg: BaseConfig) -> PoseidonModule:
    mod = getattr(cfg, "_poseidon", None)
    if mod is None:
        mod = PoseidonModule(cfg)
        cfg._poseidon = mod
    return mod
