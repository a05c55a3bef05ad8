"""CONTRAfold learned-score duplex (inter-molecular) engine.

Equivalent of the reference's vendored CONTRAfold DuplexEngine
(reference src/contrafold/DuplexEngine.ipp: ComputeInside :1015-1077,
ComputeOutside :1080-1143, ComputePosterior :1146-1169, LoopScore :974-1012,
driver usage src/ractip.cpp:226-246): the ensemble of pure antiparallel
duplexes -- chains of inter-strand pairs (i asc in s1, j desc in s2) whose
consecutive pairs are separated by at most C_MAX_SINGLE_LENGTH=30 unpaired
bases -- scored with the learned complementary weights.

Scoring per the reference: chain-start (5' s1 side) gets external-unpaired
counts + reversed-orientation base-pair/helix-closing/dangles; each extension
is either a helix stack (helix_stacking + base_pair) or a generic loop
(two terminal mismatches + base_pair + 0x1/1x1 nucleotide features); the
chain-end adds the mirrored closing scores.  Note the reference builds
cache_score_single but its duplex inside/outside never consume it
(DuplexEngine.ipp:1040-1060 add only mismatch/nucleotide terms), so bulge/
internal length features do NOT apply here; we mirror that behavior.

TPU design: log-space row scan (lax.scan over s1 positions) with a rolling
31-row buffer for the banded loop window; posterior pair marginals are
d logZ / d eps via jax.grad through the scan (reverse-mode == the outside
pass), exactly as in ops.contrafold.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import MAXLOOP
from ..params.contrafold import CFTables, get_cf_tables

W = MAXLOOP + 1
NEG = -1e30


def _shift_left(v, k):
    """out[..., j] = v[..., j+k], -inf fill (k >= 0)."""
    k = min(k, v.shape[-1])
    pad = jnp.full(v.shape[:-1] + (k,), NEG, v.dtype)
    return jnp.concatenate([v[..., k:], pad], axis=-1)


@partial(jax.jit, static_argnums=(5, 6))
def _cd_logz(tables: CFTables, S1, S2, n1, n2, L1: int, L2: int, eps):
    dtype = eps.dtype
    tb = jax.tree.map(lambda a: jnp.asarray(a, dtype)
                      if jnp.issubdtype(a.dtype, jnp.floating) else a, tables)
    # 1-based with sentinels on both ends
    s1 = jnp.concatenate([jnp.zeros((1,), S1.dtype), S1,
                          jnp.zeros((1,), S1.dtype)])
    s2 = jnp.concatenate([jnp.zeros((1,), S2.dtype), S2,
                          jnp.zeros((1,), S2.dtype)])
    jdx = jnp.arange(L2 + 1)
    t2 = s2[:L2 + 1]                      # s2[j]
    t2p = s2[1:L2 + 2]                    # s2[j+1]
    t2m = jnp.concatenate([jnp.zeros((1,), S2.dtype), s2[:L2]])   # s2[j-1]
    n1f = n1.astype(dtype)
    n2f = n2.astype(dtype)

    okj = (jdx >= 1) & (jdx <= n2)

    def row(carry, i):
        # INg[r]: inside row (i-r) + outer-mismatch factor; INr[0]: raw row i-1
        INg, INr1, logz = carry
        a1, a1m, a1p = s1[i], s1[i - 1], s1[i + 1]
        oki = (i >= 1) & (i <= n1)
        okp = okj & oki & tb.compl[a1, t2]

        epsrow = jax.lax.dynamic_slice(eps, (jnp.maximum(i - 1, 0), 0),
                                       (1, L2 + 1))[0]
        bp_f = tb.bp[a1, t2] + epsrow     # forward orientation BP + eps

        init = (tb.ext_unpaired * ((i - 1).astype(dtype)
                                   + (n2f - jdx.astype(dtype)))
                + tb.dangle_r[t2, a1, a1m] + tb.dangle_l[t2, a1, t2p]
                + tb.bp[t2, a1] + epsrow + tb.closing[t2, a1])

        # stack extension from (i-1, j+1)
        stk = (_shift_left(INr1, 1) + bp_f
               + tb.stack[a1m, t2p, a1, t2])

        # generic loops from (p, q) = (i-r, j+1+l2), (l1, l2) != (0, 0)
        h_ij = tb.tm[t2, a1, t2p, a1m] + bp_f      # inner-side mismatch + bp
        gen = jnp.full((L2 + 1,), NEG, dtype)
        for r in range(1, W + 1):
            l1 = r - 1
            lo = 1 if l1 == 0 else 0
            for l2 in range(lo, W - l1):
                y = _shift_left(INg[r - 1], 1 + l2)
                if l1 == 0 and l2 == 1:
                    y = y + tb.bulge0x1[t2p]               # s2[q-1] = s2[j+1]
                elif l1 == 1 and l2 == 0:
                    y = y + tb.bulge0x1[a1m]               # s1[p+1] = s1[i-1]
                elif l1 == 1 and l2 == 1:
                    y = y + tb.int1x1[a1m, t2p]
                gen = jnp.logaddexp(gen, y)
        gen = gen + h_ij

        inside = jnp.where(okp,
                           jnp.logaddexp(init, jnp.logaddexp(stk, gen)), NEG)

        close = (tb.ext_unpaired * ((n1f - i.astype(dtype))
                                    + (jdx.astype(dtype) - 1.0))
                 + tb.dangle_l[a1, t2, a1p] + tb.dangle_r[a1, t2, t2m]
                 + tb.closing[a1, t2])
        logz = jnp.logaddexp(
            logz, jax.nn.logsumexp(jnp.where(okp, inside + close, NEG)))

        # outer-mismatch factor for when this row is the previous pair (p, q):
        # tm[s1_p, s2_q, s1_{p+1}, s2_{q-1}]
        g = inside + tb.tm[a1, t2, a1p, t2m]
        INg = jnp.concatenate([g[None, :], INg[:-1]], axis=0)
        return (INg, inside, logz), None

    INg0 = jnp.full((W, L2 + 1), NEG, dtype)
    INr0 = jnp.full((L2 + 1,), NEG, dtype)
    (_, _, logz), _ = jax.lax.scan(row, (INg0, INr0, jnp.asarray(NEG, dtype)),
                                   jnp.arange(1, L1 + 1))
    return logz


def cd_logz(S1, S2, n1, n2, model: str = "complementary", dtype=jnp.float64):
    """log partition function of the CONTRAfold duplex ensemble."""
    L1, L2 = S1.shape[0], S2.shape[0]
    tables = get_cf_tables(model)
    eps = jnp.zeros((L1, L2 + 1), dtype)
    return _cd_logz(tables, jnp.asarray(S1), jnp.asarray(S2),
                    jnp.asarray(n1, jnp.int32), jnp.asarray(n2, jnp.int32),
                    L1, L2, eps)


def cd_hybrid_probs(S1, S2, n1, n2, model: str = "complementary",
                    dtype=jnp.float64) -> jnp.ndarray:
    """[L1, L2] posterior P(s1[i] pairs s2[j]) under the duplex ensemble
    (0-based; the reference driver's hp under --contraduplex,
    src/ractip.cpp:226-246)."""
    L1, L2 = S1.shape[0], S2.shape[0]
    tables = get_cf_tables(model)
    eps = jnp.zeros((L1, L2 + 1), dtype)

    def lz(e):
        return _cd_logz(tables, jnp.asarray(S1), jnp.asarray(S2),
                        jnp.asarray(n1, jnp.int32), jnp.asarray(n2, jnp.int32),
                        L1, L2, e)

    if jax.default_backend() == "cpu":
        # this image's XLA:CPU compiler loops forever (any optimization
        # level, any device count) on the TRANSPOSED duplex scan that
        # jax.grad of this program produces -- reproducible on unmodified
        # older revisions, i.e. a compiler bug, not a model change.  Eager
        # evaluation computes the identical gradient without that compile;
        # the duplex grid is small, so the op-by-op cost is acceptable on
        # the (latent --contrafold) CPU path.
        with jax.disable_jit():
            g = jax.grad(lz)(eps)
    else:
        g = jax.grad(lz)(eps)
    return g[:, 1:]
