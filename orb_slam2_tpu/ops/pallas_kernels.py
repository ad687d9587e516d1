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


def backend_supports_pallas() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
