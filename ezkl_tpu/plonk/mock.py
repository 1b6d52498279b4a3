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
from .cs import FIXED, ADVICE, INSTANCE
from .evaluator import EvalCtx, evaluate

FR = bn254_fr()


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

    # gates must vanish everywhere
    @jax.jit
    def gate_nonzero_rows(_dummy):
        outs = []
        for g in cs.gates:
            v = evaluate(g.poly, ctx)
            outs.append(~limbs.is_zero(v))
        return outs

    for g, nz in zip(cs.gates, gate_nonzero_rows(0)):
        rows = np.nonzero(np.asarray(nz))[0]
        if rows.size:
            failures.append(Failure("gate", g.name, rows.tolist()))

    # copy constraints by value
    for (a, ar), (b, br) in asg.copies:
        va, vb = asg.get_int(a, ar), asg.get_int(b, br)
        if va != vb:
            failures.append(Failure("copy", f"{a}@{ar} == {b}@{br} ({va} != {vb})", [ar, br]))

    # lookups by value (compress tuples to python tuples)
    for lk in cs.lookups:
        table_rows = set()
        tvals = [_host_evals(e, asg, ch) for e in lk.table]
        for i in range(asg.n):
            table_rows.add(tuple(t[i] for t in tvals))
        bad_rows = []
        for tup in lk.inputs:
            ivals = [_host_evals(e, asg, ch) for e in tup]
            for i in range(asg.n):
                if tuple(v[i] for v in ivals) not in table_rows:
                    bad_rows.append(i)
        if bad_rows:
            failures.append(Failure("lookup", lk.name, bad_rows))

    return failures


def _host_evals(expr, asg: Assignment, ch) -> list[int]:
    cols = {
        FIXED: asg.device_columns(FIXED),
        ADVICE: asg.device_columns(ADVICE),
        INSTANCE: asg.instance_device(),
    }
    ctx = EvalCtx(columns=cols, rot_step=1, challenges=ch)
    v = jax.jit(lambda: evaluate(expr, ctx))()
    return [int(x) for x in limbs.decode(FR, v)]
