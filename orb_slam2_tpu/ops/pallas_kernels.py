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


def _pose_hbe_kernel(par_ref, xw_ref, obs_ref, invs2_ref, mask_ref, st_ref,
                     out_ref, *, robust: bool):
    """Motion-only BA normal equations, one fused sweep (solvers/pose_opt.py
    `_build_normal_eqs` ≡ g2o pose-only edges, src/Optimizer.cc:375-622):
    residuals, pose Jacobians, Huber weights, and the 6x6 H / 6 b / error
    reductions — ~45 XLA op launches per LM iteration collapse into one
    kernel (the LM loop is pure launch latency on TPU, PERF.md round 3).

    par (VMEM, (1,128)): R row-major (9), t (3), fx fy cx cy bf (5),
    delta2_mono, delta2_stereo. (Params lived in SMEM first; an SMEM input
    read ZEROS when the kernel was inlined inside a larger jit on the axon
    backend — standalone it was bit-exact — which silently no-opped the
    whole pose optimization. VMEM scalar reads behave.) Per-edge rows
    (VMEM, (1,E) / (3,E)).
    out (VMEM, (32,128)): row r lanes broadcast — rows 0-20 the upper
    triangle of H (row-major), 21-26 b, 27 err."""
    x = xw_ref[0:1, :]
    y = xw_ref[1:2, :]
    z = xw_ref[2:3, :]
    p = lambda i: par_ref[0, i]
    pcx = p(0) * x + p(1) * y + p(2) * z + p(9)
    pcy = p(3) * x + p(4) * y + p(5) * z + p(10)
    pcz = p(6) * x + p(7) * y + p(8) * z + p(11)
    fx, fy, cx, cy, bf = p(12), p(13), p(14), p(15), p(16)
    # behind-camera points: zero invz instead of 1/1e-9 — their Jacobian
    # PRODUCTS (c*c ~ (fx*x*invz^2)^2 ~ 1e43) overflow f32 to inf and
    # 0-weight * inf = NaN poisons H (the XLA einsum contracts the weight
    # first and never forms the raw product; this kernel must not either)
    invz = jnp.where(pcz > 1e-6, 1.0 / jnp.maximum(pcz, 1e-9), 0.0)
    invz2 = invz * invz
    u = fx * pcx * invz + cx
    v = fy * pcy * invz + cy
    ur = u - bf * invz
    eu = obs_ref[0:1, :] - u
    ev = obs_ref[1:2, :] - v
    eur = obs_ref[2:3, :] - ur
    st = st_ref[...]                       # (1,E) f32: 1 stereo / 0 mono
    inv_s2 = invs2_ref[...]
    chi2 = inv_s2 * (eu * eu + ev * ev + st * eur * eur)
    delta2 = p(17) + st * (p(18) - p(17))
    if robust:
        w_rob = jnp.where(chi2 <= delta2, 1.0,
                          jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
    else:
        w_rob = 1.0
    depth_ok = (pcz > 1e-6).astype(x.dtype)
    mask = mask_ref[...] * depth_ok
    w = w_rob * inv_s2 * mask

    # pose Jacobians of e = obs - pred wrt xi=(rho, phi), left-mult update
    # (solvers/reproj.pose_point_jacobians): A_u=(a,0,c), A_v=(0,b,d),
    # A_ur=(a,0,cr); J = -A @ [I | -hat(pc)]
    a = fx * invz
    b_ = fy * invz
    c = -fx * pcx * invz2
    d = -fy * pcy * invz2
    cr = c + bf * invz2
    Ju = (-a, 0.0, -c, -(c * pcy), -(a * pcz - c * pcx), a * pcy)
    Jv = (0.0, -b_, -d, -(-b_ * pcz + d * pcy), d * pcx, -b_ * pcx)
    Jr = (-a, 0.0, -cr, -(cr * pcy), -(a * pcz - cr * pcx), a * pcy)

    zero = jnp.zeros_like(x)
    asv = lambda t: zero + t                # scalars -> (1,E) vectors
    # all 28 reductions kept 2-D ((1,1) keepdims), concatenated along
    # sublanes, stored as ONE full-tile write — per-row scalar stores into
    # the (32,128) f32 tile executed incorrectly on Mosaic (fine in
    # interpret mode): the kernel returned zeros and pose opt silently
    # no-opped on hardware
    # stack all 28 weighted per-edge product rows into one (32,E) matrix and
    # reduce ONCE along lanes — 28 separate full reductions ran as serial
    # VPU passes; the weight multiplies each FACTOR group before any
    # Jacobian product is formed (see invz guard above)
    rows = []
    wJu = [w * asv(Ju[i]) for i in range(6)]
    wJv = [w * asv(Jv[i]) for i in range(6)]
    wJr = [w * st * asv(Jr[i]) for i in range(6)]
    for i in range(6):
        for j in range(i, 6):
            rows.append(wJu[i] * asv(Ju[j]) + wJv[i] * asv(Jv[j]) +
                        wJr[i] * asv(Jr[j]))
    for i in range(6):
        rows.append(-(wJu[i] * eu + wJv[i] * ev + wJr[i] * eur))
    rows.append(chi2 * mask)
    z = jnp.zeros_like(x)
    rows += [z, z, z, z]
    mat = jnp.concatenate(rows, axis=0)                 # (32, E)
    vec = jnp.sum(mat, axis=1, keepdims=True)           # (32, 1)
    out_ref[...] = jnp.broadcast_to(vec, (32, 128))


_TRI = [(i, j) for i in range(6) for j in range(i, 6)]


@functools.partial(jax.jit, static_argnames=("robust", "interpret"))
def pose_normal_eqs_pallas(Tcw, fx, fy, cx, cy, bf, Xw_t, obs_t, inv_sigma2,
                           mask, stereo_f, delta2_mono, delta2_stereo,
                           robust: bool, interpret: bool = False):
    """Fused (H (6,6), b (6,), err ()) for pose-only BA. Xw_t/obs_t: (3,E)
    transposed once per solve; inv_sigma2/mask/stereo_f: (1,E) f32."""
    E = Xw_t.shape[1]
    assert E % 128 == 0, "pad edges to a lane multiple"
    par = jnp.concatenate([
        Tcw[:3, :3].reshape(-1), Tcw[:3, 3],
        jnp.stack([fx, fy, cx, cy, bf, delta2_mono, delta2_stereo])
    ]).astype(jnp.float32)
    par = jnp.pad(par, (0, 128 - par.shape[0]))[None, :]
    out = pl.pallas_call(
        functools.partial(_pose_hbe_kernel, robust=robust),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        interpret=interpret,
    )(par, Xw_t, obs_t, inv_sigma2, mask, stereo_f)
    tri = out[:21, 0]
    H = tri[_tri_index()]                   # (6,6) via one gather
    b = out[21:27, 0]
    err = out[27, 0]
    return H, b, err


@functools.lru_cache(maxsize=None)
def _tri_index():
    import numpy as np
    idx = np.zeros((6, 6), np.int32)
    for r, (i, j) in enumerate(_TRI):
        idx[i, j] = r
        idx[j, i] = r
    return idx


# ---------------------------------------------------------------------------
# Fused local/global-BA edge assembly (binary pose-point edges)
# ---------------------------------------------------------------------------

BA_TILE_E = 2048      # lanes per grid step; inputs ~90KB, output 512KB VMEM

# output row layout of _ba_edge_kernel (rows of the (64, E) result)
_TRI3 = [(i, j) for i in range(3) for j in range(i, 3)]
BA_ROW_HCC = 0        # 21 rows: upper triangle of the 6x6 pose block
BA_ROW_W = 21         # 18 rows: the 6x3 pose-point block, row-major
BA_ROW_HPP = 39       # 6 rows: upper triangle of the 3x3 point block
BA_ROW_BC = 45        # 6 rows: pose rhs
BA_ROW_BP = 51        # 3 rows: point rhs
BA_ROW_ERR = 54       # chi2 * mask (the LM accept/reject error term)
BA_ROW_CHI2 = 55      # raw chi2 (penalty form — for reclassification)
BA_ROW_DEPTH = 56     # depth_ok flag


def _ba_edge_kernel(par_ref, T_ref, xw_ref, obs_ref, invs2_ref, st_ref,
                    mask_ref, out_ref, *, robust: bool):
    """Binary-edge BA normal-equation terms, one fused sweep per edge tile
    (solvers/schur_ba._edge_terms + the five per-edge einsums of _assemble
    ≡ g2o EdgeSE3ProjectXYZ/EdgeStereoSE3ProjectXYZ linearization,
    src/Optimizer.cc:646-1067): residuals, pose AND point Jacobians, Huber
    weights, and all per-edge block products — the XLA chain is ~40 op
    launches per LM iteration and materializes several (Q,O,6,6)-class HBM
    tensors.

    par (VMEM, (1,128)): fx fy cx cy bf delta2_mono delta2_stereo.
    T (VMEM, (12,E)): per-edge camera pose, R row-major (9) then t (3) —
    gathered by obs camera OUTSIDE the kernel. xw/obs (3,E);
    invs2/st/mask (1,E).
    out (VMEM, (64,E)): per-edge weighted products, see BA_ROW_* above.
    Same hardware pitfalls as _pose_hbe_kernel: params in VMEM not SMEM;
    invz guarded to 0 behind the camera so Jacobian PRODUCTS stay finite
    (0-weight * inf = NaN); full-tile stores only."""
    x = xw_ref[0:1, :]
    y = xw_ref[1:2, :]
    z = xw_ref[2:3, :]
    p = lambda i: par_ref[0, i]
    r = lambda i: T_ref[i:i + 1, :]
    pcx = r(0) * x + r(1) * y + r(2) * z + r(9)
    pcy = r(3) * x + r(4) * y + r(5) * z + r(10)
    pcz = r(6) * x + r(7) * y + r(8) * z + r(11)
    fx, fy, cx, cy, bf = p(0), p(1), p(2), p(3), p(4)

    # chi2 in the SAME penalty form as the XLA path (z clamped to 1e-9, so a
    # step that pushes a point behind a camera scores a huge error and gets
    # rejected by LM — the guarded-invz chi2 would silently score it small)
    invz_p = 1.0 / jnp.maximum(pcz, 1e-9)
    u_p = fx * pcx * invz_p + cx
    v_p = fy * pcy * invz_p + cy
    ur_p = u_p - bf * invz_p
    eu = obs_ref[0:1, :] - u_p
    ev = obs_ref[1:2, :] - v_p
    eur = obs_ref[2:3, :] - ur_p
    st = st_ref[...]
    inv_s2 = invs2_ref[...]
    chi2 = inv_s2 * (eu * eu + ev * ev + st * eur * eur)
    delta2 = p(5) + st * (p(6) - p(5))
    if robust:
        w_rob = jnp.where(chi2 <= delta2, 1.0,
                          jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
    else:
        w_rob = 1.0
    depth_ok = (pcz > 1e-6).astype(x.dtype)
    mask = mask_ref[...]
    w = w_rob * inv_s2 * mask * depth_ok

    # Jacobian path: invz guarded to 0 behind the camera (products finite)
    invz = jnp.where(pcz > 1e-6, invz_p, 0.0)
    invz2 = invz * invz
    a = fx * invz
    b_ = fy * invz
    c = -fx * pcx * invz2
    d = -fy * pcy * invz2
    cr = c + bf * invz2
    # pose Jacobians of e = obs - pred wrt xi=(rho,phi), left-mult update
    Ju = (-a, 0.0, -c, -(c * pcy), -(a * pcz - c * pcx), a * pcy)
    Jv = (0.0, -b_, -d, -(-b_ * pcz + d * pcy), d * pcx, -b_ * pcx)
    Jr = (-a, 0.0, -cr, -(cr * pcy), -(a * pcz - cr * pcx), a * pcy)
    # point Jacobians: Jl = -A @ R  (A rows: (a,0,c), (0,b,d), (a,0,cr))
    Jlu = tuple(-(a * r(k) + c * r(6 + k)) for k in range(3))
    Jlv = tuple(-(b_ * r(3 + k) + d * r(6 + k)) for k in range(3))
    Jlr = tuple(-(a * r(k) + cr * r(6 + k)) for k in range(3))

    zero = jnp.zeros_like(x)
    asv = lambda t: zero + t
    wst = w * st
    wJu = [w * asv(Ju[i]) for i in range(6)]
    wJv = [w * asv(Jv[i]) for i in range(6)]
    wJr = [wst * asv(Jr[i]) for i in range(6)]
    wJlu = [w * Jlu[k] for k in range(3)]
    wJlv = [w * Jlv[k] for k in range(3)]
    wJlr = [wst * Jlr[k] for k in range(3)]

    rows = []
    for i, j in _TRI:               # Hcc upper triangle (21)
        rows.append(wJu[i] * asv(Ju[j]) + wJv[i] * asv(Jv[j]) +
                    wJr[i] * asv(Jr[j]))
    for i in range(6):              # W 6x3 row-major (18)
        for k in range(3):
            rows.append(wJu[i] * Jlu[k] + wJv[i] * Jlv[k] +
                        wJr[i] * Jlr[k])
    for i, j in _TRI3:              # Hpp upper triangle (6)
        rows.append(wJlu[i] * Jlu[j] + wJlv[i] * Jlv[j] + wJlr[i] * Jlr[j])
    for i in range(6):              # bc (6)
        rows.append(-(wJu[i] * eu + wJv[i] * ev + wJr[i] * eur))
    for k in range(3):              # bp (3)
        rows.append(-(wJlu[k] * eu + wJlv[k] * ev + wJlr[k] * eur))
    rows.append(chi2 * mask)        # err contribution (no depth_ok — XLA par)
    rows.append(chi2)               # raw chi2 for reclassification
    rows.append(depth_ok)
    rows += [zero] * (64 - len(rows))
    out_ref[...] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("robust", "interpret"))
def ba_edge_terms_pallas(fx, fy, cx, cy, bf, T_edges, Xw_t, obs_t, inv_sigma2,
                         stereo_f, mask, delta2_mono, delta2_stereo,
                         robust: bool, interpret: bool = False):
    """Fused per-edge BA assembly. T_edges: (12,E) per-edge pose rows;
    Xw_t/obs_t: (3,E); inv_sigma2/stereo_f/mask: (1,E) f32. E must be a
    lane multiple (pad with mask=0). Returns the (64,E) row matrix — see
    BA_ROW_* for the layout."""
    E = Xw_t.shape[1]
    assert E % 128 == 0, "pad edges to a lane multiple"
    par = jnp.stack([fx, fy, cx, cy, bf, delta2_mono, delta2_stereo]
                    ).astype(jnp.float32)
    par = jnp.pad(par, (0, 128 - par.shape[0]))[None, :]
    tile = min(BA_TILE_E, E)
    grid = (E // tile,)
    espec = lambda rows: pl.BlockSpec((rows, tile), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ba_edge_kernel, robust=robust),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            espec(12), espec(3), espec(3), espec(1), espec(1), espec(1),
        ],
        out_specs=espec(64),
        out_shape=jax.ShapeDtypeStruct((64, E), jnp.float32),
        interpret=interpret,
    )(par, T_edges, Xw_t, obs_t, inv_sigma2, stereo_f, mask)
    return out


def backend_supports_pallas() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Fused epipolar-gated Hamming matcher (triangulation's SearchForTriangulation)
# ---------------------------------------------------------------------------

def _epi_match_kernel(a_ref, un1_ref, la_ref, lb_ref, lc_ref,
                      b_ref, x2_ref, y2_ref, un2_ref, sig_ref, far_ref,
                      best_ref, idx_ref):
    """One (kf1-feature tile) x (one neighbor's full feature set) step of the
    epipolar-guided match in `mapping_ops._triangulate_decide`
    (SearchForTriangulation, src/ORBmatcher.cc:1006-1116): the epipolar
    point-line test, unbound masks, epipole-distance gate, Hamming distances,
    and the per-row argmin — all in VMEM. The XLA formulation materialized
    ~6 (N,N) f32/int arrays in HBM per covisible neighbor (x10 neighbors per
    keyframe event)."""
    a = a_ref[...]                       # (T, 8) uint32 kf1 descriptors
    b = b_ref[0]                         # (N, 8) uint32 neighbor descriptors
    N = b.shape[0]
    la = la_ref[...]                     # (T, 1) epipolar line coeffs
    lb = lb_ref[...]
    lc = lc_ref[...]
    x2 = x2_ref[0]                       # (1, N) from the (1, 1, N) block
    y2 = y2_ref[0]
    num = la * x2 + lb * y2 + lc         # (T, N)
    den = jnp.maximum(la * la + lb * lb, 1e-12)
    epi_ok = num * num < sig_ref[0] * den
    cand = epi_ok & (un1_ref[...] > 0) & (un2_ref[0] > 0) \
        & (far_ref[0] > 0)

    dist = jnp.zeros((a.shape[0], N), jnp.int32)
    for w in range(8):
        x = jnp.bitwise_xor(a[:, w][:, None], b[:, w][None, :])
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)
    d = jnp.where(cand, dist, BIG)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    key = d * N + col
    key_min = jnp.min(key, axis=1)
    best = key_min // N
    bidx = key_min - best * N
    best_ref[...] = jnp.broadcast_to(best[:, None], (a.shape[0], 128))
    idx_ref[...] = jnp.broadcast_to(bidx[:, None], (a.shape[0], 128))


@functools.partial(jax.jit, static_argnames=("interpret",))
def epi_best_two_pallas(desc1, un1, la_b, lb_b, lc_b,
                        desc2_b, xy2_b, un2_b, sig_b, far_b,
                        interpret: bool = False):
    """Batched over B neighbors. desc1 (N,8) uint32; un1 (N,) bool;
    la/lb/lc (B,N) f32 per-neighbor epipolar lines of each kf1 feature;
    desc2_b (B,N,8); xy2_b (B,N,2); un2_b (B,N) bool; sig_b (B,N) f32
    (3.84*sigma2 of the kf2 octave); far_b (B,N) f32/bool epipole-distance
    gate. Returns (best (B,N), best_idx (B,N))."""
    B, N = la_b.shape
    if N > 8192:
        raise ValueError("epi_best_two_pallas: N must be <= 8192")
    pad = (-N) % TILE_N
    if pad:
        raise ValueError("epi_best_two_pallas: N must be a TILE_N multiple")
    nT = N // TILE_N
    colf = lambda x: x.reshape(B * N, 1).astype(jnp.float32)
    # per-neighbor row vectors ride as (B, 1, N): Mosaic requires the last
    # two block dims divisible by (8, 128) or equal to the array dims
    rowf = lambda x: x.astype(jnp.float32).reshape(B, 1, N)

    src_spec = pl.BlockSpec((TILE_N, 1), lambda b, i: (i, 0),
                            memory_space=pltpu.VMEM)
    per_bn_col = pl.BlockSpec((TILE_N, 1), lambda b, i: (b * nT + i, 0),
                              memory_space=pltpu.VMEM)
    nb_row = pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TILE_N, 128), lambda b, i: (b * nT + i, 0),
                            memory_space=pltpu.VMEM)
    best, idx = pl.pallas_call(
        _epi_match_kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((TILE_N, 8), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            src_spec, per_bn_col, per_bn_col, per_bn_col,
            pl.BlockSpec((1, N, 8), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            nb_row, nb_row, nb_row, nb_row, nb_row,
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((B * N, 128), jnp.int32),
                   jax.ShapeDtypeStruct((B * N, 128), jnp.int32)),
        interpret=interpret,
    )(desc1, un1.astype(jnp.float32)[:, None], colf(la_b), colf(lb_b),
      colf(lc_b), desc2_b,
      rowf(xy2_b[..., 0]), rowf(xy2_b[..., 1]),
      rowf(un2_b), rowf(sig_b), rowf(far_b))
    return best[:, 0].reshape(B, N), idx[:, 0].reshape(B, N)


# ---------------------------------------------------------------------------
# Fully-fused pose optimization: the entire 4x10 LM schedule in ONE launch
# ---------------------------------------------------------------------------

def _pose_sweep(T, p, xw_ref, obs_ref, invs2_ref, st_ref, mask, robust):
    """One linearization sweep at pose T (tuple of 12 scalars, row-major R
    then t): returns the (32,1) reduced [H upper-tri(21), b(6), err, chi2?]
    vector — the vectorized body shared with _pose_hbe_kernel."""
    x = xw_ref[0:1, :]
    y = xw_ref[1:2, :]
    z = xw_ref[2:3, :]
    pcx = T[0] * x + T[1] * y + T[2] * z + T[9]
    pcy = T[3] * x + T[4] * y + T[5] * z + T[10]
    pcz = T[6] * x + T[7] * y + T[8] * z + T[11]
    fx, fy, cx, cy, bf = p(12), p(13), p(14), p(15), p(16)
    invz = jnp.where(pcz > 1e-6, 1.0 / jnp.maximum(pcz, 1e-9), 0.0)
    invz2 = invz * invz
    u = fx * pcx * invz + cx
    v = fy * pcy * invz + cy
    ur = u - bf * invz
    eu = obs_ref[0:1, :] - u
    ev = obs_ref[1:2, :] - v
    eur = obs_ref[2:3, :] - ur
    st = st_ref[...]
    inv_s2 = invs2_ref[...]
    chi2 = inv_s2 * (eu * eu + ev * ev + st * eur * eur)
    delta2 = p(17) + st * (p(18) - p(17))
    if robust:
        w_rob = jnp.where(chi2 <= delta2, 1.0,
                          jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
    else:
        w_rob = 1.0
    depth_ok = (pcz > 1e-6).astype(x.dtype)
    m = mask * depth_ok
    w = w_rob * inv_s2 * m

    a = fx * invz
    b_ = fy * invz
    c = -fx * pcx * invz2
    d = -fy * pcy * invz2
    cr = c + bf * invz2
    Ju = (-a, 0.0, -c, -(c * pcy), -(a * pcz - c * pcx), a * pcy)
    Jv = (0.0, -b_, -d, -(-b_ * pcz + d * pcy), d * pcx, -b_ * pcx)
    Jr = (-a, 0.0, -cr, -(cr * pcy), -(a * pcz - cr * pcx), a * pcy)

    zero = jnp.zeros_like(x)
    asv = lambda t: zero + t
    rows = []
    wJu = [w * asv(Ju[i]) for i in range(6)]
    wJv = [w * asv(Jv[i]) for i in range(6)]
    wJr = [w * st * asv(Jr[i]) for i in range(6)]
    for i in range(6):
        for j in range(i, 6):
            rows.append(wJu[i] * asv(Ju[j]) + wJv[i] * asv(Jv[j]) +
                        wJr[i] * asv(Jr[j]))
    for i in range(6):
        rows.append(-(wJu[i] * eu + wJv[i] * ev + wJr[i] * eur))
    rows.append(chi2 * m)
    rows += [zero] * (32 - len(rows))
    mat = jnp.concatenate(rows, axis=0)                 # (32, E)
    return jnp.sum(mat, axis=1, keepdims=True)          # (32, 1)


def _pose_classify(T, p, xw_ref, obs_ref, invs2_ref, st_ref, valid):
    """chi2 + depth reclassification at pose T — the between-rounds inlier
    update of optimize_pose (penalty z-clamp form, matching the XLA
    project_residual)."""
    x = xw_ref[0:1, :]
    y = xw_ref[1:2, :]
    z = xw_ref[2:3, :]
    pcx = T[0] * x + T[1] * y + T[2] * z + T[9]
    pcy = T[3] * x + T[4] * y + T[5] * z + T[10]
    pcz = T[6] * x + T[7] * y + T[8] * z + T[11]
    fx, fy, cx, cy, bf = p(12), p(13), p(14), p(15), p(16)
    invz = 1.0 / jnp.maximum(pcz, 1e-9)    # project_residual's z clamp
    u = fx * pcx * invz + cx
    v = fy * pcy * invz + cy
    ur = u - bf * invz
    eu = obs_ref[0:1, :] - u
    ev = obs_ref[1:2, :] - v
    eur = obs_ref[2:3, :] - ur
    st = st_ref[...]
    chi2 = invs2_ref[...] * (eu * eu + ev * ev + st * eur * eur)
    delta2 = p(17) + st * (p(18) - p(17))
    inl = valid * (chi2 <= delta2).astype(x.dtype) * \
        (pcz > 0).astype(x.dtype)
    return inl, chi2


def _chol6_solve(H, b, lam):
    """Damped 6x6 Cholesky solve on scalars. H: dict[(i,j)] upper-tri
    scalars; b: list of 6. Returns dx list of 6. A non-SPD system yields
    NaNs, which the LM accept test rejects (NaN < err is False)."""
    A = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i, 6):
            A[i][j] = A[j][i] = H[(i, j)]
    for i in range(6):
        A[i][i] = A[i][i] * (1.0 + lam) + 1e-10
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        s = A[i][i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(s)
        inv_d = 1.0 / L[i][i]
        for j in range(i + 1, 6):
            s = A[j][i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s * inv_d
    # forward then backward substitution
    yv = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * yv[k]
        yv[i] = s / L[i][i]
    dx = [None] * 6
    for i in range(5, -1, -1):
        s = yv[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * dx[k]
        dx[i] = s / L[i][i]
    return dx


def _se3_retract_scalars(T, dx):
    """exp((rho,phi)) @ T on 12 scalars (se3.retract / g2o oplusImpl).
    dx = (rho0..2, phi0..2)."""
    rho = dx[:3]
    w0, w1, w2 = dx[3], dx[4], dx[5]
    th2 = w0 * w0 + w1 * w1 + w2 * w2
    th = jnp.sqrt(jnp.maximum(th2, 0.0))
    small = th2 < 1e-12
    safe = jnp.where(small, 1.0, th2)
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / jnp.sqrt(safe))
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / safe)
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (th - jnp.sin(th)) / (safe * jnp.sqrt(safe)))
    # W = hat(phi); R_exp = I + A W + B W^2 ; V = I + B W + C W^2
    W = [[0.0, -w2, w1], [w2, 0.0, -w0], [-w1, w0, 0.0]]
    W2 = [[sum(W[i][k] * W[k][j] for k in range(3)) for j in range(3)]
          for i in range(3)]
    I3 = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    Re = [[I3[i][j] + A * W[i][j] + B * W2[i][j] for j in range(3)]
          for i in range(3)]
    V = [[I3[i][j] + B * W[i][j] + C * W2[i][j] for j in range(3)]
         for i in range(3)]
    te = [sum(V[i][j] * rho[j] for j in range(3)) for i in range(3)]
    R = [[T[3 * i + j] for j in range(3)] for i in range(3)]
    t = [T[9], T[10], T[11]]
    Rn = [[sum(Re[i][k] * R[k][j] for k in range(3)) for j in range(3)]
          for i in range(3)]
    tn = [sum(Re[i][k] * t[k] for k in range(3)) + te[i] for i in range(3)]
    return tuple(Rn[0] + Rn[1] + Rn[2] + tn)


def _pose_lm_kernel(par_ref, xw_ref, obs_ref, invs2_ref, st_ref, valid_ref,
                    pose_ref, inl_ref, chi2_ref, *, n_rounds, n_iters):
    """The COMPLETE PoseOptimization schedule (src/Optimizer.cc:375-622) in
    one launch: n_rounds rounds of n_iters LM steps (Huber on the first two
    rounds) with chi2 reclassification between rounds. The per-iteration
    host graph (6x6 solve, retract, accept/reject) was ~25 small XLA ops x
    40 iterations of pure launch latency; here it is scalar-unit work
    between the fused edge sweeps."""
    p = lambda i: par_ref[0, i]
    T = tuple(p(i) for i in range(12))
    valid = valid_ref[...]
    inl = valid
    chi2 = jnp.zeros_like(valid)
    for r in range(n_rounds):
        robust = r < 2
        vec = _pose_sweep(T, p, xw_ref, obs_ref, invs2_ref, st_ref, inl,
                          robust)
        H = {}
        kidx = 0
        for i in range(6):
            for j in range(i, 6):
                H[(i, j)] = vec[kidx, 0]
                kidx += 1
        b = [vec[21 + i, 0] for i in range(6)]
        err = vec[27, 0]
        lam = jnp.float32(1e-4)
        for _ in range(n_iters):
            dx = _chol6_solve(H, b, lam)
            T_new = _se3_retract_scalars(T, dx)
            vec2 = _pose_sweep(T_new, p, xw_ref, obs_ref, invs2_ref, st_ref,
                               inl, robust)
            err_new = vec2[27, 0]
            acc = err_new < err
            T = tuple(jnp.where(acc, tn, to) for tn, to in zip(T_new, T))
            kidx = 0
            for i in range(6):
                for j in range(i, 6):
                    H[(i, j)] = jnp.where(acc, vec2[kidx, 0], H[(i, j)])
                    kidx += 1
            b = [jnp.where(acc, vec2[21 + i, 0], b[i]) for i in range(6)]
            err = jnp.where(acc, err_new, err)
            lam = jnp.where(acc, jnp.maximum(lam * 0.5, 1e-9),
                            jnp.minimum(lam * 4.0, 1e6))
        inl, chi2 = _pose_classify(T, p, xw_ref, obs_ref, invs2_ref, st_ref,
                                   valid)
    rows = [jnp.full((1, 128), T[i], jnp.float32) for i in range(12)]
    rows.append(jnp.full((1, 128), jnp.sum(inl), jnp.float32))
    rows += [jnp.zeros((1, 128), jnp.float32)] * 3
    pose_ref[...] = jnp.concatenate(rows, axis=0)
    inl_ref[...] = inl
    chi2_ref[...] = chi2


@functools.partial(jax.jit, static_argnames=("n_rounds", "n_iters",
                                             "interpret"))
def pose_lm_pallas(Tcw, fx, fy, cx, cy, bf, Xw_t, obs_t, inv_sigma2,
                   stereo_f, valid, delta2_mono, delta2_stereo,
                   n_rounds: int, n_iters: int, interpret: bool = False):
    """Fused full pose solve. Xw_t/obs_t (3,E); inv_sigma2/stereo_f/valid
    (1,E) f32; E a 128 multiple. Returns (Tcw (4,4), inliers (E,) bool,
    n_inliers (), chi2 (E,))."""
    E = Xw_t.shape[1]
    assert E % 128 == 0, "pad edges to a lane multiple"
    par = jnp.concatenate([
        Tcw[:3, :3].reshape(-1), Tcw[:3, 3],
        jnp.stack([fx, fy, cx, cy, bf, delta2_mono, delta2_stereo])
    ]).astype(jnp.float32)
    par = jnp.pad(par, (0, 128 - par.shape[0]))[None, :]
    pose, inl, chi2 = pl.pallas_call(
        functools.partial(_pose_lm_kernel, n_rounds=n_rounds,
                          n_iters=n_iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        out_shape=(jax.ShapeDtypeStruct((16, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, E), jnp.float32),
                   jax.ShapeDtypeStruct((1, E), jnp.float32)),
        interpret=interpret,
    )(par, Xw_t, obs_t, inv_sigma2, stereo_f, valid)
    R = pose[:9, 0].reshape(3, 3)
    t = pose[9:12, 0]
    T = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R).at[:3, 3].set(t)
    return T, inl[0] > 0, pose[12, 0].astype(jnp.int32), chi2[0]
