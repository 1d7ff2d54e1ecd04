"""Alias-table ("binomial distribution") discrete sampler.

Host-side build mirrors the reference's stack construction
(/root/reference/src/sampler.h:79-121); device-side sampling is the O(1)
two-random-number lookup (sampler.h:203-207), vectorized for JAX:

    pass_id = min(int(L * r1), L - 1)
    return pass_id if r2 < prob[pass_id] else fail_id[pass_id]

The table is a pair of flat arrays (prob[L] float32, fail_id[L] int32),
so it drops straight into the frozen scene pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class AliasTable(NamedTuple):
    prob: jnp.ndarray  # [L] float32 — acceptance probability of slot i
    fail_id: jnp.ndarray  # [L] int32 — alias when rejected
    sum_all: float  # total (unnormalized) weight


def build_alias_table(values) -> AliasTable:
    """Build from unnormalized non-negative weights (numpy, host)."""
    values = np.asarray(values, np.float64)
    n = len(values)
    if n == 0:
        return AliasTable(
            jnp.zeros((0,), jnp.float32), jnp.zeros((0,), jnp.int32), 0.0
        )
    sum_all = float(values.sum())
    if sum_all <= 0:
        raise ValueError("alias table requires positive total weight")
    scaled = values * (n / sum_all)

    prob = np.zeros(n, np.float64)
    fail = np.arange(n, dtype=np.int64)

    # classic two-stack construction (same fixpoint as sampler.h:95-120)
    gt = [(v, i) for i, v in enumerate(scaled) if v > 1.0]
    ls = [(v, i) for i, v in enumerate(scaled) if v <= 1.0]

    while gt and ls:
        gv, gi = gt.pop()
        lv, li = ls.pop()
        prob[li] = lv
        fail[li] = gi
        gv -= 1.0 - lv
        if gv > 1.0:
            gt.append((gv, gi))
        else:
            ls.append((gv, gi))

    for v, i in gt + ls:
        prob[i] = 1.0
        fail[i] = i

    return AliasTable(
        jnp.asarray(prob, jnp.float32), jnp.asarray(fail, jnp.int32), sum_all
    )


def sample_alias(table_prob, table_fail, r1, r2):
    """O(1) vectorized sample — sampler.h:203-207. Returns int32 indices."""
    n = table_prob.shape[0]
    pass_id = jnp.minimum((r1 * n).astype(jnp.int32), n - 1)
    accept = r2 < table_prob[pass_id]
    return jnp.where(accept, pass_id, table_fail[pass_id])
