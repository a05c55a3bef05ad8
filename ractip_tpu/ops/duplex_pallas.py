"""Pallas TPU kernel for the duplex partition-function row sweep.

Same math as ops.duplex._sweep (the inside/outside DP of the reference's
pf_duplex, reference src/pf_duplex.c:128-206), restructured for the TPU
memory hierarchy: the rolling W-row window buffers live in VMEM scratch and
persist across a (L1,)-grid of row steps, factor-matrix rows stream in as
pipelined (8, L2) row blocks (total VMEM ~460*L2 bytes, so accessibility-mode
targets of multi-knt L2 fit -- nothing is whole-matrix resident), and the
banded generic-interior-loop stencil is one small MXU matmul (K^T @ window)
followed by W+1 static diagonal slices instead of an im2col convolution.
Per-row adaptive renormalization keeps float32 in range exactly as in the
jnp fallback.

The kernel is written for one pair and resets its scratch at row 0, so it is
safe under jax.vmap (the batching rule prepends a batch grid axis; scratch
carries across the whole grid but is re-initialized at the start of every
row sweep).  The backward sweep reuses the forward kernel on factor matrices
flipped along both axes (the loop geometry is mirror-symmetric).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MAXLOOP
from ..params.boltz import BoltzTables

W = MAXLOOP + 1  # 31; generic-loop window and buffer depth


def _gen_kernel_t(bt: BoltzTables, dtype) -> jnp.ndarray:
    """[W+1, W] transposed stencil: Kt[u2+1, W-1-u1] = w2_raw[u1, u2].

    Row buffers store the row at distance d from the current row at index
    W-d, so the stencil row for u1 unpaired bases on s1 sits at W-1-u1; the
    transpose feeds the (W+1, W) x (W, L2pad) MXU contraction.
    """
    K = np.zeros((W + 1, W))
    for u1 in range(1, MAXLOOP):
        for u2 in range(1, MAXLOOP + 1 - u1):
            K[u2 + 1, W - 1 - u1] = bt.w2_raw[u1, u2]
    return jnp.asarray(K, dtype)


def _sweep_kernel(
    # factor matrices, STREAMED as (8, L2) row blocks (block index i//8):
    # nothing is whole-matrix VMEM-resident, so L2 scales to multi-knt
    # accessibility-mode targets (VMEM use ~ 460*L2 bytes total)
    start_ref, mm_here_ref, mm_other_ref, tau_ref, pstk_ref, p11_ref,
    p21a_ref, p21b_ref, p22_ref, pb1a_ref, pb1b_ref,
    kt_ref,    # (W+1, W) VMEM, generic-loop stencil (transposed)
    bk_ref,    # (1, W) SMEM, bulge Boltzmann factors by loop size
    m_ref,     # out: (8, L2) row block (one row written per step)
    lsc_ref,   # out: (L1, 1) SMEM cumulative log scales
    fbuf, fabuf, ftbuf,  # VMEM scratch (W, L2): raw / *mm_other / *tau windows
    off_ref,   # SMEM scratch (1, 1): running log scale
):
    L2 = m_ref.shape[1]
    dtype = m_ref.dtype
    i = pl.program_id(0)
    row = lambda ref: ref[pl.ds(i % 8, 1), :]

    @pl.when(i == 0)
    def _init():
        fbuf[...] = jnp.zeros((W, L2), dtype)
        fabuf[...] = jnp.zeros((W, L2), dtype)
        ftbuf[...] = jnp.zeros((W, L2), dtype)
        off_ref[0, 0] = jnp.zeros((), dtype)

    off = off_ref[0, 0]
    zpad = jnp.zeros((W, W + 1), dtype)

    # generic interior loops: one (W+1, W) x (W, L2+W+1) matmul, then W+1
    # diagonal slices tmp[c, j+c] summed over c.
    fap = jnp.concatenate([fabuf[...], zpad], axis=1)          # (W, L2+W+1)
    tmp = jnp.dot(kt_ref[...], fap, preferred_element_type=dtype)
    gen = jnp.zeros((1, L2), dtype)
    for c in range(2, W + 1):  # stencil rows c<2 are all-zero by construction
        gen = gen + tmp[c, c:c + L2][None, :]
    gen = gen * row(mm_here_ref)

    # bulges of size m >= 2: on s1 read row at distance m+1 with j-shift 1;
    # on s2 read the previous row (distance 1) with j-shift m+1.
    ftp = jnp.concatenate([ftbuf[...], zpad], axis=1)
    bul = jnp.zeros((1, L2), dtype)
    for m in range(2, MAXLOOP + 1):
        bkm = bk_ref[0, m]
        bul = bul + bkm * ftp[W - 1 - m, 1:1 + L2][None, :]
        bul = bul + bkm * ftp[W - 1, m + 1:m + 1 + L2][None, :]
    bul = bul * row(tau_ref)

    # stacks, 1-bulges and small interior loops: static shifted window rows.
    fp = jnp.concatenate([fbuf[...], zpad], axis=1)
    r1, r2, r3 = fp[W - 1][None, :], fp[W - 2][None, :], fp[W - 3][None, :]
    sh = lambda r, k: r[:, k:k + L2]
    val = (row(start_ref) * jnp.exp(-off)
           + gen + bul
           + row(pstk_ref) * sh(r1, 1)
           + row(p11_ref) * sh(r2, 2)
           + row(p21a_ref) * sh(r2, 3)
           + row(p21b_ref) * sh(r3, 2)
           + row(p22_ref) * sh(r3, 3)
           + row(pb1a_ref) * sh(r2, 1)
           + row(pb1b_ref) * sh(r1, 2))

    # adaptive renormalization (identical policy to the jnp sweep)
    m0 = jnp.maximum(jnp.max(val), jnp.asarray(1e-30, dtype))
    scale = jnp.where(m0 > 1e4, m0, jnp.asarray(1.0, dtype))
    inv = 1.0 / scale
    val_n = val * inv
    newoff = off + jnp.log(scale)

    m_ref[pl.ds(i % 8, 1), :] = val_n
    lsc_ref[i, 0] = newoff
    off_ref[0, 0] = newoff
    fbuf[...] = jnp.concatenate([fbuf[1:, :] * inv, val_n], axis=0)
    fabuf[...] = jnp.concatenate(
        [fabuf[1:, :] * inv, val_n * row(mm_other_ref)], axis=0)
    ftbuf[...] = jnp.concatenate(
        [ftbuf[1:, :] * inv, val_n * row(tau_ref)], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sweep_fwd(rows: tuple, kt: jnp.ndarray, bk: jnp.ndarray,
               interpret: bool = False):
    L1, L2 = rows[0].shape
    dtype = rows[0].dtype
    assert L1 % 8 == 0, "bucketed L1 must be a multiple of 8"
    fac_spec = pl.BlockSpec((8, L2), lambda i: (i // 8, 0),
                            memory_space=pltpu.VMEM)
    M, lsc = pl.pallas_call(
        _sweep_kernel,
        grid=(L1,),
        in_specs=[fac_spec] * 11 + [
            pl.BlockSpec((W + 1, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, L2), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L1, L2), dtype),
            jax.ShapeDtypeStruct((L1, 1), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, L2), dtype),
            pltpu.VMEM((W, L2), dtype),
            pltpu.VMEM((W, L2), dtype),
            pltpu.SMEM((1, 1), dtype),
        ],
        interpret=interpret,
    )(*rows, kt, bk)
    return M, lsc[:, 0]


def sweep_pallas(ff, bt: BoltzTables, dtype=jnp.float32, reverse: bool = False,
                 interpret: bool = False):
    """Drop-in replacement for ops.duplex._sweep on TPU.

    ff is a DuplexFactors (forward or backward tables); reverse=True runs the
    mirrored sweep by flipping the factor matrices along both axes, running
    the forward kernel, and flipping the results back — zero-masked padding
    guarantees flipped padding cells contribute nothing.
    """
    rows = (ff.start, ff.mm_here, ff.mm_other, ff.tau, ff.pstk, ff.p11,
            ff.p21a, ff.p21b, ff.p22, ff.pb1a, ff.pb1b)
    rows = tuple(jnp.asarray(r, dtype) for r in rows)
    if reverse:
        rows = tuple(jnp.flip(r, (0, 1)) for r in rows)
    kt = _gen_kernel_t(bt, dtype)
    bk = jnp.asarray(np.asarray(bt.bulge_raw, np.float64)[None, :W], dtype)
    M, lsc = _sweep_fwd(rows, kt, bk, interpret=interpret)
    if reverse:
        M = jnp.flip(M, (0, 1))
        lsc = jnp.flip(lsc, 0)
    return M, lsc
