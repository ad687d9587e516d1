"""Pallas TPU kernels for the matching inner loop.

`masked_best_two` fuses what `matching.hamming_matrix` + `matching.best_two`
do in XLA: XOR + popcount over 8 uint32 words, candidate masking, and the
per-row best/second-best reduction — WITHOUT materializing the (N, M) int32
distance matrix in HBM (the XLA version writes + re-reads it several times
per frame across the five search variants). The kernel tiles the source rows,
keeps the whole target descriptor set in VMEM (M <= 8192 -> 256KB), and
produces only the (N,) reduction outputs.

Falls back to the jnp implementation on non-TPU backends (tests run the
kernel in interpreter mode for bit-exactness).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 512
TILE_N = 128  # rank-1 output blocks must be 128-multiples; 3 int32
# (TILE_N, M) tiles at M=8192 use ~12MB VMEM (cap M accordingly)


def _best_two_kernel(a_ref, b_ref, mask_ref, best_ref, idx_ref, second_ref):
    a = a_ref[...]                        # (TILE_N, 8) uint32
    b = b_ref[...]                        # (M, 8) uint32
    m = mask_ref[...]                     # (TILE_N, M) int32

    M = b.shape[0]
    dist = jnp.zeros((a.shape[0], M), jnp.int32)
    for w in range(8):
        x = jnp.bitwise_xor(a[:, w][:, None], b[:, w][None, :])
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)

    dist = jnp.where(m > 0, dist, BIG)
    # Mosaic argmin is float32-only: reduce an integer key dist*M+col instead
    # (primary order distance, secondary lowest column — same tie-break as
    # jnp.argmin). 512*8192 < 2^31 so the key fits int32.
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    key = dist * M + col
    key_min = jnp.min(key, axis=1)
    best = key_min // M
    bidx = key_min - best * M
    key2 = jnp.where(col == bidx[:, None], BIG * M, key)
    second = jnp.min(key2, axis=1) // M

    # outputs are (TILE_N, 128) lane-padded: rank-1 vmem outputs hit XLA/Mosaic
    # layout mismatches, a full 128-lane tile does not
    best_ref[...] = jnp.broadcast_to(best[:, None], (a.shape[0], 128))
    idx_ref[...] = jnp.broadcast_to(bidx[:, None], (a.shape[0], 128))
    second_ref[...] = jnp.broadcast_to(second[:, None], (a.shape[0], 128))


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_best_two_pallas(desc_a, desc_b, cand_mask, interpret: bool = False):
    """desc_a: (N,8) uint32; desc_b: (M,8) uint32; cand_mask: (N,M) bool.
    Returns (best (N,), best_idx (N,), second (N,)) — masked-out rows give
    BIG/0/BIG like matching.best_two."""
    N = desc_a.shape[0]
    M = desc_b.shape[0]
    if M > 8192:
        raise ValueError("masked_best_two_pallas: M must be <= 8192 (VMEM)")
    pad = (-N) % TILE_N
    if pad:
        desc_a = jnp.pad(desc_a, ((0, pad), (0, 0)))
        cand_mask = jnp.pad(cand_mask, ((0, pad), (0, 0)))
    n_pad = desc_a.shape[0]

    grid = (n_pad // TILE_N,)
    best, idx, second = pl.pallas_call(
        _best_two_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_N, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 128), jnp.int32),
        ),
        interpret=interpret,
    )(desc_a, desc_b, cand_mask.astype(jnp.int32))
    return best[:N, 0], idx[:N, 0], second[:N, 0]


def _proj_match_kernel(pu, pv, pr, plvl, pur, pval, pdesc,
                       ku, kv, klvl, kur, kval, kdesc,
                       best_ref, idx_ref, second_ref):
    """Fused projection matcher tile: window + octave + stereo candidate
    mask, Hamming, best/best-idx, and the LEVEL-AWARE second-best — all in
    VMEM. The XLA path materializes ~6 (P,N) HBM arrays per call (window
    masks, candidate mask, distance matrix, level-masked copies)."""
    T = pdesc.shape[0]
    N = kdesc.shape[0]
    du = jnp.abs(pu[...] - ku[...])                    # (T,N)
    dv = jnp.abs(pv[...] - kv[...])
    r = pr[...]                                        # (T,1) -> broadcast
    win = (du < r) & (dv < r)
    kl = klvl[...]                                     # (1,N) int32
    pl_ = plvl[...]                                    # (T,1) int32
    lvl_ok = (kl >= pl_ - 1) & (kl <= pl_)
    has_st = (pur[...] >= 0.0) & (kur[...] >= 0.0)
    # pure logical form (a bool jnp.where lowers to an i8->i1 truncation
    # Mosaic rejects): stereo gate passes when not applicable or within r
    st_ok = (~has_st) | (jnp.abs(pur[...] - kur[...]) < r)
    cand = win & lvl_ok & st_ok & (pval[...] > 0) & (kval[...] > 0)

    dist = jnp.zeros((T, N), jnp.int32)
    a = pdesc[...]
    b = kdesc[...]
    for w in range(8):
        x = jnp.bitwise_xor(a[:, w][:, None], b[:, w][None, :])
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)

    d = jnp.where(cand, dist, BIG)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    key = d * N + col                                  # BIG*N < 2^31
    key_min = jnp.min(key, axis=1)
    best = key_min // N
    bidx = key_min - best * N
    # level of the best hit, then second-best restricted to that level
    # (the ratio test of SearchByProjection(Frame&, vpMapPoints) only fires
    # when best and second share an octave, src/ORBmatcher.cc:160-170)
    best_lvl = jnp.sum(jnp.where(col == bidx[:, None],
                                 jnp.broadcast_to(kl, (T, N)), 0), axis=1)
    same = cand & (kl == best_lvl[:, None]) & (col != bidx[:, None])
    second = jnp.min(jnp.where(same, dist, BIG), axis=1)

    best_ref[...] = jnp.broadcast_to(best[:, None], (T, 128))
    idx_ref[...] = jnp.broadcast_to(bidx[:, None], (T, 128))
    second_ref[...] = jnp.broadcast_to(second[:, None], (T, 128))


@functools.partial(jax.jit, static_argnames=("interpret",))
def projection_best_two_pallas(uv, radius, pred_level, p_ur, p_valid, p_desc,
                               kp_xy, kp_level, kp_ur, kp_valid, kp_desc,
                               interpret: bool = False):
    """Fused local-map projection search reduction. Sources: (P,...) map
    points with projected uv, per-point window radius, predicted octave,
    projected right-x (-1 mono), validity, descriptors. Targets: (N,...)
    frame keypoints. Returns (best (P,), best_idx (P,), second_same_level
    (P,)) with BIG for masked rows."""
    P = uv.shape[0]
    N = kp_xy.shape[0]
    if N > 8192:
        raise ValueError("projection_best_two_pallas: N must be <= 8192")
    pad = (-P) % TILE_N
    pc = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    uv, radius, pred_level, p_ur, p_valid, p_desc = (
        pc(uv), pc(radius), pc(pred_level), pc(p_ur),
        pc(p_valid.astype(jnp.int32)), pc(p_desc))
    Pp = uv.shape[0]
    grid = (Pp // TILE_N,)
    col = lambda x: x[:, None]
    row = lambda x: x[None, :]
    src_spec = pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tgt_spec = pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TILE_N, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    best, idx, second = pl.pallas_call(
        _proj_match_kernel,
        grid=grid,
        in_specs=[src_spec, src_spec, src_spec, src_spec, src_spec, src_spec,
                  pl.BlockSpec((TILE_N, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  tgt_spec, tgt_spec, tgt_spec, tgt_spec, tgt_spec,
                  pl.BlockSpec((N, 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((Pp, 128), jnp.int32),
                   jax.ShapeDtypeStruct((Pp, 128), jnp.int32),
                   jax.ShapeDtypeStruct((Pp, 128), jnp.int32)),
        interpret=interpret,
    )(col(uv[:, 0]), col(uv[:, 1]), col(radius),
      col(pred_level.astype(jnp.int32)), col(p_ur), col(p_valid), p_desc,
      row(kp_xy[:, 0]), row(kp_xy[:, 1]), row(kp_level.astype(jnp.int32)),
      row(kp_ur), row(kp_valid.astype(jnp.int32)), kp_desc)
    return best[:P, 0], idx[:P, 0], second[:P, 0]


def backend_supports_pallas() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
