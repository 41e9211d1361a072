"""Pallas TPU kernel: multi-RHS DIA SpMM (8 right-hand sides per pass).

Banded SpMV is dominated by streaming the diagonal data; with ``R`` right-
hand sides that stream is amortized ``R``-fold. This kernel maps the RHS
axis onto the *sublane* dimension — ``X (8, n)`` — so the per-diagonal
shifted windows are naturally full-sublane ``(8, L)`` rolls (the layout
lesson from the single-RHS kernel), and each block step does

    Y[:, blk] += data[k, blk] * roll(X_window)     for each diagonal k

Round-2 layout (v2): the first version materialized the full overlapped
X windows ``(nblocks, 8, block+2*pad)`` host-side and swapaxes-copied the
output — two extra full passes over X and Y (~50% of all traffic;
measured 33% of roofline). Now the *aligned* X block and the Y block ride
ordinary disjoint ``BlockSpec`` tilings (auto-pipelined by Pallas), and
only the two ``pad``-wide halo strips per block (~6% of X) are
prematerialized; the kernel assembles the overlapped window in VMEM.
Traffic per block: ``K_pad*block*4`` (data, once for all RHS) +
``~8*block*4*(1+2*pad/block)`` (X) + ``8*block*4`` (Y).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dia import _reblock_data, _unblock_data, prepare_dia
from ..core.dia import SparseDIA

Array = Any

__all__ = ["spmm_dia_mrhs_pallas", "RHS_BLOCK"]

RHS_BLOCK = 8


def _mrhs_kernel(data_ref, xmain_ref, halo_ref, y_ref, wscr, *,
                 offsets: tuple, pad: int, block: int, packed: bool,
                 interpret: bool):
    roll = jnp.roll if interpret else pltpu.roll
    L = block + 2 * pad
    # Assemble the overlapped window [left halo | main | right halo].
    wscr[:, :pad] = halo_ref[0, :, :pad]
    wscr[:, pad:pad + block] = xmain_ref[...]
    wscr[:, pad + block:] = halo_ref[0, :, pad:]
    w = wscr[...]
    acc = jnp.zeros((RHS_BLOCK, block), jnp.float32)
    for k, off in enumerate(offsets):
        s = off + pad
        shifted = roll(w, (L - s) % L, axis=1)[:, :block]
        if packed:                             # (1, 1, K*block)
            dk = data_ref[0, 0:1, k * block:(k + 1) * block]
        else:                                  # padded (1, K_pad, block)
            dk = data_ref[0, k:k + 1, :]
        acc = acc + dk.astype(jnp.float32) * shifted
    y_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "n", "block",
                                             "pad", "interpret"))
def _spmm_mrhs(data3, xmain, halos, *, offsets: tuple, n: int, block: int,
               pad: int, interpret: bool):
    nblocks = data3.shape[0]
    packed = data3.ndim == 2
    if packed:
        # Singleton sublane axis: a (1, Kb) block would violate the
        # 8-divisible sublane rule; (1, 1, Kb) blocks equal the array's
        # trailing dims, which Pallas accepts.
        data3 = data3[:, None, :]
    data_spec = pl.BlockSpec((1,) + data3.shape[1:], lambda b: (b, 0, 0))
    y = pl.pallas_call(
        functools.partial(_mrhs_kernel, offsets=offsets, pad=pad,
                          block=block, packed=packed, interpret=interpret),
        grid=(nblocks,),
        in_specs=[
            data_spec,
            pl.BlockSpec((RHS_BLOCK, block), lambda b: (0, b)),
            pl.BlockSpec((1, RHS_BLOCK, 2 * pad), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((RHS_BLOCK, block), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((RHS_BLOCK, nblocks * block),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RHS_BLOCK, block + 2 * pad), jnp.float32),
        ],
        interpret=interpret,
    )(data3, xmain, halos)
    return y[:, :n]


# --- autodiff -------------------------------------------------------------
# Forward math in padded-x coordinates (window assembly in _mrhs_kernel):
#     y[r, j] = sum_k data_flat[k, j] * Xp[r, pad + j + off_k],  j < npad
# so the VJP is the same pair of static-shift streaming passes as the
# single-RHS kernel (pallas_dia._spmv_dia_ad_bwd), summed over the RHS axis
# for d_data. Defined over the flat padded Xp so the halo/main slicing
# inside the primal needs no separate cotangent plumbing.


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _spmm_mrhs_ad(data3, Xp, offsets: tuple, n: int, block: int,
                  interpret: bool):
    nblocks = data3.shape[0]
    npad = nblocks * block
    pad = (Xp.shape[1] - npad - block) // 2
    xmain = Xp[:, pad:pad + npad]
    lefts = Xp[:, :npad].reshape(RHS_BLOCK, nblocks, block)[:, :, :pad]
    rights = (Xp[:, block + pad:block + pad + npad]
              .reshape(RHS_BLOCK, nblocks, block)[:, :, :pad])
    halos = jnp.concatenate([lefts, rights], axis=2).transpose(1, 0, 2)
    return _spmm_mrhs(data3, xmain, halos, offsets=offsets, n=n,
                      block=block, pad=pad, interpret=interpret)


def _spmm_mrhs_ad_fwd(data3, Xp, offsets, n, block, interpret):
    y = _spmm_mrhs_ad(data3, Xp, offsets, n, block, interpret)
    return y, (data3, Xp)


def _spmm_mrhs_ad_bwd(offsets, n, block, interpret, res, g):
    data3, Xp = res
    nblocks = data3.shape[0]
    npad = nblocks * block
    pad = (Xp.shape[1] - npad - block) // 2
    data, K_pad = _unblock_data(data3, block)
    g_pad = jnp.zeros((RHS_BLOCK, npad), jnp.float32)
    g_pad = g_pad.at[:, :n].set(g.astype(jnp.float32))
    d_Xp = jnp.zeros_like(Xp)
    d_rows = []
    for k, off in enumerate(offsets):
        s = pad + off  # static, >= 0
        d_Xp = d_Xp.at[:, s:s + npad].add(data[k][None, :] * g_pad)
        d_rows.append(jnp.sum(
            g_pad * jax.lax.slice_in_dim(Xp, s, s + npad, axis=1), axis=0))
    if len(offsets) < K_pad:
        d_rows.extend([jnp.zeros((npad,), jnp.float32)]
                      * (K_pad - len(offsets)))
    d_data = jnp.stack(d_rows)
    d_data3 = _reblock_data(d_data, data3, block)
    return d_data3, d_Xp


_spmm_mrhs_ad.defvjp(_spmm_mrhs_ad_fwd, _spmm_mrhs_ad_bwd)


# --- zero-copy fast path ---------------------------------------------------
# The padded-Xp entry materializes a full (8, npad+2*pad+block) copy of X
# plus the halo strips EVERY call (~70 MB round trip at n=1M — charged to
# the kernel, not the model; measured as the 2b gap: 68.6-68.8% of the
# 84 MB bytes model on two days, round 5). When X is already the kernel's
# native operand layout — (8, nblocks*block) f32, i.e. the lane extent is
# an exact block multiple — X itself IS the xmain the BlockSpec tiles, and
# the only derived operand is the (nblocks, 8, 2*pad) halo strip array
# (~1 MB at n=1M): gathered from the block edges, zero at the boundary
# blocks (x outside [0, m) is zero — matrix edge).


def _halos_from_x(X, nblocks: int, block: int, pad: int):
    xb = X.reshape(RHS_BLOCK, nblocks, block)
    z = jnp.zeros((RHS_BLOCK, 1, pad), X.dtype)
    lefts = jnp.concatenate([z, xb[:, :-1, block - pad:]], axis=1)
    rights = jnp.concatenate([xb[:, 1:, :pad], z], axis=1)
    return jnp.concatenate([lefts, rights], axis=2).transpose(1, 0, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _spmm_mrhs_fast(data3, X, offsets: tuple, n: int, block: int,
                    pad: int, interpret: bool):
    nblocks = data3.shape[0]
    halos = _halos_from_x(X, nblocks, block, pad)
    return _spmm_mrhs(data3, X, halos, offsets=offsets, n=n, block=block,
                      pad=pad, interpret=interpret)


def _spmm_mrhs_fast_fwd(data3, X, offsets, n, block, pad, interpret):
    y = _spmm_mrhs_fast(data3, X, offsets, n, block, pad, interpret)
    return y, (data3, X)


def _spmm_mrhs_fast_bwd(offsets, n, block, pad, interpret, res, g):
    # Same streaming-shift math as _spmm_mrhs_ad_bwd, restated in padded-x
    # coordinates then stripped back to raw X (the backward is not the hot
    # path; the forward's zero-copy property is what the fast path buys).
    data3, X = res
    npad = data3.shape[0] * block
    Xp = jnp.zeros((RHS_BLOCK, npad + 2 * pad + block), jnp.float32)
    Xp = Xp.at[:, pad:pad + X.shape[1]].set(X.astype(jnp.float32))
    d_data3, d_Xp = _spmm_mrhs_ad_bwd(offsets, n, block, interpret,
                                      (data3, Xp), g)
    return d_data3, d_Xp[:, pad:pad + X.shape[1]].astype(X.dtype)


_spmm_mrhs_fast.defvjp(_spmm_mrhs_fast_fwd, _spmm_mrhs_fast_bwd)


def spmm_dia_mrhs_pallas(dia, X: Array, *, block: int = 4096,
                         interpret: bool = False) -> Array:
    """``Y = A @ X`` for diagonal storage with ``X (R, n)`` (R right-hand
    sides as rows; R is padded up to 8). Returns ``(R, n)``."""
    if isinstance(dia, SparseDIA):
        dia = prepare_dia(dia, block=block)
    n, m = dia.shape
    block = dia.block
    offsets = dia.offsets
    maxoff = max((abs(o) for o in offsets), default=0)
    pad = -(-max(maxoff, 1) // 128) * 128
    nblocks = dia.data3.shape[0]
    npad = nblocks * block

    X = jnp.asarray(X)
    squeeze = X.ndim == 1
    if squeeze:
        X = X[None, :]
    R = X.shape[0]
    if R > RHS_BLOCK:
        raise ValueError(f"at most {RHS_BLOCK} right-hand sides per call")
    if (R == RHS_BLOCK and m == npad and pad <= block
            and X.dtype == jnp.float32):
        # zero-copy: X is already the (8, nblocks*block) f32 xmain layout
        return _spmm_mrhs_fast(dia.data3, X, offsets, n, block, pad,
                               interpret)
    # Xp layout: [pad zeros | x (m) | zeros]; window b = Xp[b*block :
    # b*block + block + 2*pad]. One extra trailing block so the strided
    # halo reshape below stays in bounds.
    Xp = jnp.zeros((RHS_BLOCK, npad + 2 * pad + block), jnp.float32)
    Xp = Xp.at[:R, pad:pad + m].set(X.astype(jnp.float32))
    # Halo/main slicing happens inside _spmm_mrhs_ad (left strip =
    # Xp[:, b*block : b*block+pad], right = Xp[:, (b+1)*block+pad :
    # (b+1)*block+2*pad] — strided views via reshape, ~2*pad/block of X in
    # extra traffic) so the custom VJP covers it.
    y = _spmm_mrhs_ad(dia.data3, Xp, offsets, n, block, interpret)
    y = y[:R]
    return y[0] if squeeze else y
