"""MockProver: direct satisfiability checking without cryptography.

The reference's workhorse test tool is halo2's `MockProver`
(SURVEY.md §4 tier 6, `/root/reference/src/execute.rs:1295-1302`). This is
its TPU-native analog: evaluate every gate over the whole domain at once
(vectorized), check copies and lookups by value.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax

from ..fieldmath import limbs
from ..fieldmath.spec import bn254_fr
from .assign import Assignment
from . import cs as csmod
from .cs import FIXED, ADVICE, INSTANCE
from .evaluator import ChunkCtx as _ChunkCtx, EvalCtx, evaluate

FR = bn254_fr()

# row-chunk size for gate checking on large domains (memory O(chunk))
_GATE_CHUNK = 1 << 17


@dataclasses.dataclass
class Failure:
    kind: str        # "gate" | "copy" | "lookup"
    name: str
    rows: list[int]

    def __repr__(self):
        head = f"{self.kind} '{self.name}' violated at rows {self.rows[:8]}"
        return head + ("..." if len(self.rows) > 8 else "")


def verify(asg: Assignment, challenges: dict | None = None) -> list[Failure]:
    """Returns a list of failures (empty = satisfied)."""
    cs = asg.cs
    failures: list[Failure] = []

    cols = {
        FIXED: asg.device_columns(FIXED),
        ADVICE: asg.device_columns(ADVICE),
        INSTANCE: asg.instance_device(),
    }
    ch = {
        i: limbs.const(FR, v) for i, v in (challenges or {}).items()
    }
    ctx = EvalCtx(columns=cols, rot_step=1, challenges=ch)

    # gates must vanish everywhere. Above _GATE_CHUNK rows, evaluate in
    # row chunks (wraparound gathers for rotations): the whole-domain jit
    # of every gate at k>=20 asks for 100+ GB of intermediate buffers.
    n = asg.n
    if n <= _GATE_CHUNK:
        @jax.jit
        def gate_nonzero_rows():
            return [~limbs.is_zero(evaluate(g.poly, ctx)) for g in cs.gates]

        for g, nz in zip(cs.gates, gate_nonzero_rows()):
            rows = np.nonzero(np.asarray(nz))[0]
            if rows.size:
                failures.append(Failure("gate", g.name, rows.tolist()))
    else:
        @jax.jit
        def gates_chunk(start):
            cctx = _ChunkCtx(columns=cols, rot_step=1, challenges=ch,
                             start=start, size=_GATE_CHUNK, n=n)
            return [~limbs.is_zero(evaluate(g.poly, cctx))
                    for g in cs.gates]

        bad: dict[str, list] = {}
        for s in range(0, n, _GATE_CHUNK):
            # np scalar => traced jit arg (a Python int would recompile
            # once per chunk)
            for g, nz in zip(cs.gates, gates_chunk(np.int32(s))):
                rows = np.nonzero(np.asarray(nz))[0]
                if rows.size:
                    bad.setdefault(g.name, []).extend(
                        (rows + s).tolist())
        for g in cs.gates:
            if g.name in bad:
                failures.append(Failure("gate", g.name, bad[g.name]))

    # copy constraints by value — whole index-array batches at once
    raw_of = _raw_columns(asg)
    for a, ra, b, rb in asg.copies:
        va = raw_of(a)[:, ra]                      # (16, K) raw limbs
        vb = raw_of(b)[:, rb]
        bad = np.flatnonzero(~np.all(va == vb, axis=0))
        for i in bad[:16]:
            failures.append(Failure(
                "copy", f"{a}@{int(ra[i])} == {b}@{int(rb[i])}",
                [int(ra[i]), int(rb[i])]))

    # lookups by value: pack (tuple of field elements) per row into
    # structured u64 rows, then one vectorized sorted-membership test
    for lk in cs.lookups:
        t_pack = np.sort(limbs.pack_rows_multi(
            [_raw_evals(e, ctx) for e in lk.table]))
        bad_rows = []
        for tup in lk.inputs:
            f_pack = limbs.pack_rows_multi([_raw_evals(e, ctx) for e in tup])
            pos = np.searchsorted(t_pack, f_pack)
            pos_c = np.minimum(pos, t_pack.size - 1)
            ok = t_pack[pos_c] == f_pack
            bad_rows.extend(np.flatnonzero(~ok).tolist())
        if bad_rows:
            failures.append(Failure("lookup", lk.name, bad_rows))

    # shuffles: multiset equality of compressed tuples over active rows
    # (rows >= last_active_row are reserved for closing/blinding and hold
    # zeros on both sides at layout time)
    act = csmod.last_active_row(asg.n)
    for sh in cs.shuffles:
        a_pack = limbs.pack_rows_multi(
            [_raw_evals(e, ctx)[:, :act] for e in sh.input])
        b_pack = limbs.pack_rows_multi(
            [_raw_evals(e, ctx)[:, :act] for e in sh.table])
        if not np.array_equal(np.sort(a_pack), np.sort(b_pack)):
            bad = np.flatnonzero(np.sort(a_pack) != np.sort(b_pack))
            failures.append(Failure("shuffle", sh.name, bad.tolist()[:16]))

    return failures


def _raw_columns(asg: Assignment):
    """Returns col -> (16, n) RAW limb array (instances padded with zeros)."""
    inst = np.zeros((asg.cs.num_instance, 16, asg.n), np.uint32)
    for i, vals in enumerate(asg.instance):
        if vals:
            inst[i][:, :len(vals)] = limbs.encode(FR, vals, mont=False)

    def get(col):
        if col.kind == INSTANCE:
            return inst[col.index]
        return (asg.fixed if col.kind == FIXED else asg.advice)[col.index]

    return get


def _raw_evals(expr, ctx) -> np.ndarray:
    """Evaluate an expression over the domain -> (16, n) RAW limbs (host)."""
    v = jax.jit(lambda: limbs.from_mont(FR, evaluate(expr, ctx)))()
    return np.asarray(v)
