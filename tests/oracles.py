"""Brute-force enumeration oracles for the partition-function DPs.

Enumerate every non-crossing structure of a (tiny) sequence, score each with the
same scalar energy model (ractip_tpu.ops.eos.structure_energy), and accumulate
exact partition functions / posteriors.  DP implementations must reproduce these
numbers to float64 accuracy.  Only valid for sequences short enough that no
interior loop can exceed MAXLOOP (n <= ~30), where the DP's loop-size cap never
binds.
"""

from __future__ import annotations

import itertools
import math

import numpy as np

from ractip_tpu.constants import PAIR_TYPE, TURN
from ractip_tpu.ops import energy as E
from ractip_tpu.ops.eos import structure_energy
from ractip_tpu.params.tables import EnergyParams


def _pair_ok(S, i, j, cut):
    if PAIR_TYPE[S[i]][S[j]] == 0:
        return False
    if cut is not None and i < cut <= j:
        return True          # inter-strand pairs have no minimum span
    return j - i - 1 >= TURN


def enumerate_structures(S: np.ndarray, cut: int | None = None):
    """Yield every non-crossing set of pairs (as tuples of (i, j))."""
    n = len(S)

    memo = {}

    def rec(i, j):
        if (i, j) in memo:
            return memo[(i, j)]
        if i > j:
            return [()]
        out = []
        # i unpaired
        for s in rec(i + 1, j):
            out.append(s)
        # i paired with k
        for k in range(i + 1, j + 1):
            if _pair_ok(S, i, k, cut):
                for s1 in rec(i + 1, k - 1):
                    for s2 in rec(k + 1, j):
                        out.append(((i, k),) + s1 + s2)
        memo[(i, j)] = out
        return out

    return rec(0, n - 1)


def partition_oracle(p: EnergyParams, S: np.ndarray, cut: int | None = None):
    """Exact (Z, bpp, unpaired_prob) by enumeration.

    Returns Z (unscaled), bpp [n, n] (i < j), and pu [n, n] where
    pu[a, b] = P(no base in a..b is paired), for all a <= b.
    """
    n = len(S)
    kt = E.kt_cal(p)
    Z = 0.0
    bpp = np.zeros((n, n))
    pu = np.zeros((n, n))
    for s in enumerate_structures(S, cut):
        e = structure_energy(p, S, list(s), cut)
        w = math.exp(-e * 10.0 / kt)
        Z += w
        for (i, j) in s:
            bpp[i, j] += w
        paired = np.zeros(n, bool)
        for (i, j) in s:
            paired[i] = paired[j] = True
        free = ~paired
        for a in range(n):
            b = a
            while b < n and free[b]:
                pu[a, b] += w
                b += 1
    bpp /= Z
    pu /= Z
    return Z, bpp, pu
