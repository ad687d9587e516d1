"""Bundle adjustment via Schur complement — batched, dense-reduced, MXU-shaped.

Replaces g2o's BlockSolver_6_3 + LM pipeline (`Thirdparty/g2o/g2o/core/
block_solver.hpp`, `optimization_algorithm_levenberg.cpp`) used by
`Optimizer::LocalBundleAdjustment` / `GlobalBundleAdjustemnt`
(`src/Optimizer.cc:646-1067`, `62-353`).

Problem layout (fixed shapes): C camera slots (opt or fixed), Q point slots,
observations stored point-major as (Q, O) — each point sees at most O of the
C cameras. The landmark block H_pp is block-diagonal 3x3 (closed-form
inverse); the reduced camera system

    S = H_cc - W H_pp^-1 W^T        (6C x 6C dense)

is assembled as ONE matmul: A[q] = W[q] L[q] with L the Cholesky factor of
H_pp[q]^-1 gives S_corr = sum_q A[q] A[q]^T = A2 A2^T with A2: (6C, 3Q) —
exactly the systolic-array-shaped contraction the MXU wants. Solve by dense
Cholesky, back-substitute points, LM-damp, iterate.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera
from . import reproj


class BAProblem(NamedTuple):
    poses: jnp.ndarray      # (C,4,4) Tcw
    cam_valid: jnp.ndarray  # (C,) bool — slot used
    cam_fixed: jnp.ndarray  # (C,) bool — pose held constant
    points: jnp.ndarray     # (Q,3)
    pt_valid: jnp.ndarray   # (Q,) bool
    obs_cam: jnp.ndarray    # (Q,O) int32 -> camera slot (-1 pad)
    obs_uvr: jnp.ndarray    # (Q,O,3) observations (uR=-1 mono)
    obs_level: jnp.ndarray  # (Q,O) int32


class BAResult(NamedTuple):
    poses: jnp.ndarray
    points: jnp.ndarray
    edge_inlier: jnp.ndarray  # (Q,O) bool final chi2 classification
    chi2: jnp.ndarray         # (Q,O)


def _edge_terms(cam: Camera, prob: BAProblem, poses, points, inv_sigma2,
                edge_mask, robust: bool):
    """Per-edge residual/Jacobian/weight. Returns flattened per-edge tensors
    shaped (Q,O,...)."""
    Q, O = prob.obs_cam.shape
    ci = jnp.clip(prob.obs_cam, 0, poses.shape[0] - 1)
    T = poses[ci]                                       # (Q,O,4,4)
    X = jnp.broadcast_to(points[:, None, :], (Q, O, 3))
    stereo = prob.obs_uvr[..., 2] >= 0
    e, pc, comp_w = reproj.project_residual(cam, T, X, prob.obs_uvr, stereo)
    Jp, Jl = reproj.pose_point_jacobians(cam, T, pc)    # (Q,O,3,6), (Q,O,3,3)
    chi2 = reproj.edge_chi2(e, comp_w, inv_sigma2)
    delta2 = jnp.where(stereo, reproj.CHI2_STEREO, reproj.CHI2_MONO)
    w_rob = reproj.huber_weight(chi2, delta2) if robust else jnp.ones_like(chi2)
    depth_ok = pc[..., 2] > 1e-6
    w = w_rob * inv_sigma2 * edge_mask * depth_ok
    return e, Jp, Jl, comp_w, w, chi2, depth_ok


def _inv3x3(A):
    """Closed-form batched 3x3 inverse (adjugate/determinant) — pure VPU
    elementwise work; jnp.linalg.inv lowers to batched LU, which runs on the
    TPU's scalar unit and dominates small-problem BA iterations."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack([
        jnp.stack([A11, A12, A13], axis=-1),
        jnp.stack([A21, A22, A23], axis=-1),
        jnp.stack([A31, A32, A33], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


class Lin(NamedTuple):
    """Undamped normal-equation pieces at one linearization point, plus the
    per-edge chi2/depth classification of that same edge pass (so the
    reclassification between LM phases costs no extra pass). The
    pose-point coupling is carried PER EDGE (We) — the dense (Q,C,6,3)
    form the previous version materialized per linearization is built
    lazily in `_solve_step` in its Cholesky-factored A-form."""
    Hcc: jnp.ndarray       # (C,6,6)
    bc: jnp.ndarray        # (C,6)
    Hpp: jnp.ndarray       # (Q,3,3)
    bp: jnp.ndarray        # (Q,3)
    We: jnp.ndarray        # (Q,O,6,3) per-edge pose-point blocks
    pt_on: jnp.ndarray     # (Q,)
    err: jnp.ndarray       # ()
    chi2: jnp.ndarray      # (Q,O)
    depth_ok: jnp.ndarray  # (Q,O) bool


def _onehot_cam(prob, C):
    # padded obs (cam -1) match no column; mask gating is NOT folded in —
    # per-edge contributions already carry the mask through their weights,
    # and the Pallas path reuses this tensor to reconstruct per-edge poses
    # (which must stay REAL for masked edges so their chi2 lets outliers
    # re-enter at reclassification, g2o's computeError-on-level-1 edges)
    return (prob.obs_cam[:, :, None] ==
            jnp.arange(C, dtype=jnp.int32)[None, None, :]
            ).astype(jnp.float32)                          # (Q,O,C)


def _assemble_pallas(cam, prob, poses, points, inv_sigma2, edge_mask, robust,
                     onehot):
    """Pallas-fused edge pass (ops/pallas_kernels.ba_edge_terms_pallas): the
    kernel emits every per-edge weighted block product in one sweep; XLA
    keeps only the MXU-friendly one-hot reductions. All geometry products
    run f32 on the VPU inside the kernel, so this path is immune to the
    bf16 matmul truncation the package-wide precision pin guards against."""
    from ..ops import pallas_kernels as pk

    C = poses.shape[0]
    Q, O = prob.obs_cam.shape
    E0 = Q * O
    oh_flat = onehot.reshape(E0, C)
    # per-edge poses via the one-hot MXU contraction — poses[ci] as a
    # (Q,O,4,4) gather measured 2.2 ms alone (TPU random gathers serialize,
    # PERF.md); the matmul form is ~75 MFLOP of systolic work. Padded obs
    # rows (cam -1) get an all-zero pose row: the kernel's mask zeroes them.
    T_edges = (oh_flat @ jnp.concatenate(
        [poses[:, :3, :3].reshape(C, 9), poses[:, :3, 3]], axis=-1))
    Xw = jnp.broadcast_to(points[:, None, :], (Q, O, 3)).reshape(E0, 3)
    obs = prob.obs_uvr.reshape(E0, 3)
    stereo_f = (prob.obs_uvr[..., 2] >= 0).reshape(E0).astype(jnp.float32)
    invs2 = inv_sigma2.reshape(E0)
    maskf = edge_mask.reshape(E0)
    pad = (-E0) % 128
    if pad:
        T_edges = jnp.pad(T_edges, ((0, pad), (0, 0)))
        Xw = jnp.pad(Xw, ((0, pad), (0, 0)))
        obs = jnp.pad(obs, ((0, pad), (0, 0)))
        stereo_f = jnp.pad(stereo_f, (0, pad))
        invs2 = jnp.pad(invs2, (0, pad))
        maskf = jnp.pad(maskf, (0, pad))
        oh_flat = jnp.pad(oh_flat, ((0, pad), (0, 0)))
    out = pk.ba_edge_terms_pallas(
        cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
        T_edges.T, Xw.T, obs.T, invs2[None, :], stereo_f[None, :],
        maskf[None, :], jnp.float32(reproj.CHI2_MONO),
        jnp.float32(reproj.CHI2_STEREO), robust=robust)

    edge_on = edge_mask > 0
    tri6 = pk._tri_index().reshape(-1)                     # (36,) -> 21 rows
    Hcc = (out[pk.BA_ROW_HCC:pk.BA_ROW_HCC + 21] @ oh_flat
           ).T[:, tri6].reshape(C, 6, 6)
    bc = (out[pk.BA_ROW_BC:pk.BA_ROW_BC + 6] @ oh_flat).T  # (C,6)
    ebody = out[:, :E0]
    tri3 = _tri3_index().reshape(-1)
    Hpp = ebody[pk.BA_ROW_HPP:pk.BA_ROW_HPP + 6].reshape(6, Q, O).sum(-1
           ).T[:, tri3].reshape(Q, 3, 3)
    bp = ebody[pk.BA_ROW_BP:pk.BA_ROW_BP + 3].reshape(3, Q, O).sum(-1).T
    We = ebody[pk.BA_ROW_W:pk.BA_ROW_W + 18].reshape(18, Q, O
           ).transpose(1, 2, 0).reshape(Q, O, 6, 3)
    err = jnp.sum(ebody[pk.BA_ROW_ERR])
    chi2 = ebody[pk.BA_ROW_CHI2].reshape(Q, O)
    depth_ok = ebody[pk.BA_ROW_DEPTH].reshape(Q, O) > 0
    pt_on = prob.pt_valid & (jnp.sum(edge_on, axis=1) > 0)
    return Lin(Hcc, bc, Hpp, bp, We, pt_on, err, chi2, depth_ok)


@functools.lru_cache(maxsize=None)
def _tri3_index():
    import numpy as np
    tri = [(i, j) for i in range(3) for j in range(i, 3)]
    idx = np.zeros((3, 3), np.int32)
    for r, (i, j) in enumerate(tri):
        idx[i, j] = r
        idx[j, i] = r
    return idx


def _assemble(cam, prob, poses, points, inv_sigma2, edge_mask, robust,
              use_pallas=False, onehot=None):
    """UNDAMPED normal-equation pieces at the current linearization point
    (see Lin). Damping + Schur + solve live in `_solve_step` so a rejected
    LM step can retry with a larger lambda WITHOUT re-running the edge pass
    (the same carried-linearization trick as pose_opt's _lm_rounds)."""
    if use_pallas:
        return _assemble_pallas(cam, prob, poses, points, inv_sigma2,
                                edge_mask, robust, onehot)
    C = poses.shape[0]
    Q, O = prob.obs_cam.shape
    e, Jp, Jl, comp_w, w, chi2, depth_ok = _edge_terms(
        cam, prob, poses, points, inv_sigma2, edge_mask, robust)

    cw = comp_w * w[..., None]                          # (Q,O,3)
    # per-edge blocks
    Hcc_e = jnp.einsum("qoci,qoc,qocj->qoij", Jp, cw, Jp)      # (Q,O,6,6)
    Hpp_e = jnp.einsum("qoci,qoc,qocj->qoij", Jl, cw, Jl)      # (Q,O,3,3)
    W_e = jnp.einsum("qoci,qoc,qocj->qoij", Jp, cw, Jl)        # (Q,O,6,3)
    bc_e = -jnp.einsum("qoci,qoc,qoc->qoi", Jp, cw, e)          # (Q,O,6)
    bp_e = -jnp.einsum("qoci,qoc,qoc->qoi", Jl, cw, e)          # (Q,O,3)

    ci = jnp.clip(prob.obs_cam, 0, C - 1)
    edge_on = edge_mask > 0

    # Per-camera accumulation. TPU scatters serialize, so for local-BA-sized
    # problems the (Q,O)->C reductions run as one-hot CONTRACTIONS on the MXU
    # instead (the one-hot is (Q,O,C) f32 — only viable when that fits);
    # giant GBA problems keep the scatter path.
    if onehot is not None:
        Hcc = jnp.einsum("qoc,qoij->cij", onehot, Hcc_e)
        bc = jnp.einsum("qoc,qoi->ci", onehot, bc_e)
    else:
        Hcc = jnp.zeros((C, 6, 6)).at[jnp.where(edge_on, ci, C)].add(
            Hcc_e, mode="drop")
        bc = jnp.zeros((C, 6)).at[jnp.where(edge_on, ci, C)].add(
            bc_e, mode="drop")

    Hpp = jnp.sum(Hpp_e, axis=1)                        # (Q,3,3)
    bp = jnp.sum(bp_e, axis=1)                          # (Q,3)
    pt_on = prob.pt_valid & (jnp.sum(edge_on, axis=1) > 0)
    # zero masked edges' W blocks so the lazy A-form aggregation in
    # _solve_step needs no mask of its own (cw already carries the mask)
    err = jnp.sum(chi2 * edge_mask)
    return Lin(Hcc, bc, Hpp, bp, W_e, pt_on, err, chi2, depth_ok)


def _chol3x3(H):
    """Closed-form batched lower Cholesky of SPD 3x3 — elementwise VPU work
    (jnp.linalg.cholesky lowers to the scalar unit at this batch shape).
    Feed it DAMPED matrices: the eps clamps only guard exact zeros."""
    eps = 1e-20
    h11, h12, h13 = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    h22, h23, h33 = H[..., 1, 1], H[..., 1, 2], H[..., 2, 2]
    l11 = jnp.sqrt(jnp.maximum(h11, eps))
    l21 = h12 / l11
    l31 = h13 / l11
    l22 = jnp.sqrt(jnp.maximum(h22 - l21 * l21, eps))
    l32 = (h23 - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(h33 - l31 * l31 - l32 * l32, eps))
    zero = jnp.zeros_like(l11)
    return jnp.stack([
        jnp.stack([l11, zero, zero], axis=-1),
        jnp.stack([l21, l22, zero], axis=-1),
        jnp.stack([l31, l32, l33], axis=-1),
    ], axis=-2)


def _tri_inv_t(L):
    """Transposed inverse of a batched lower-triangular 3x3: F = (L^-1)^T
    (upper-triangular), in closed form — divisions only by the Cholesky
    diagonal of a damped SPD matrix, so every step is well-conditioned."""
    l11, l21, l31 = L[..., 0, 0], L[..., 1, 0], L[..., 2, 0]
    l22, l32, l33 = L[..., 1, 1], L[..., 2, 1], L[..., 2, 2]
    m11 = 1.0 / l11
    m22 = 1.0 / l22
    m33 = 1.0 / l33
    m21 = -l21 * m11 * m22
    m32 = -l32 * m22 * m33
    m31 = (l21 * l32 - l31 * l22) * m11 * m22 * m33
    zero = jnp.zeros_like(l11)
    return jnp.stack([
        jnp.stack([m11, m21, m31], axis=-1),
        jnp.stack([zero, m22, m32], axis=-1),
        jnp.stack([zero, zero, m33], axis=-1),
    ], axis=-2)


def _solve_step(prob, lin, lam, onehot):
    """Damped Schur solve from an existing linearization, in A-form:
    with L = chol(Hpp_d^-1) and A_e = W_e L, the aggregated
    U = sum_o onehot A_e (C6 x Q3) gives S_corr = U U^T in ONE symmetric
    MXU matmul, b_red = bc - U (L^T bp), and the landmark back-substitution
    dx_p = L (L^T bp - U^T dx_c) — no dense (Q,C,6,3) W / M tensors, no
    HBM transposes of them, and one aggregation instead of two (the
    previous M/W chain measured 3.4 ms/iter at Q=4096,O=12,C=64; PERF.md).
    Returns (dx_c (C,6), dx_p (Q,3))."""
    C = lin.Hcc.shape[0]
    Q, O = lin.chi2.shape
    Hpp_d = lin.Hpp + lam * jnp.eye(3) * jnp.maximum(
        jnp.diagonal(lin.Hpp, axis1=-2, axis2=-1).max(-1), 1e-6)[:, None, None]
    Hpp_d = jnp.where(lin.pt_on[:, None, None], Hpp_d, jnp.eye(3))
    # Factor the DAMPED SPD landmark block itself: with L_H = chol(Hpp_d),
    # F = L_H^-T satisfies F F^T = Hpp_d^-1 — the only property the A-form
    # needs. (Factoring chol(_inv3x3(Hpp_d)) instead was the round-5 mono
    # regression: the adjugate inverse of a thin-parallax landmark block is
    # not numerically SPD, the clamped Cholesky emitted ~1e10 factors, and
    # the poisoned Schur steps under-converged local BA until monocular
    # maps degraded map-wide.)
    L = _tri_inv_t(_chol3x3(Hpp_d))                     # (Q,3,3) upper

    # A_e = W_e @ L_q, unrolled over the 3-dim contraction so XLA fuses it
    # elementwise (a (Q*O)-batched (6,3)@(3,3) einsum runs as tiny serial
    # MXU ops)
    We = lin.We                                         # (Q,O,6,3)
    A_e = (We[..., 0:1] * L[:, None, None, 0, :] +
           We[..., 1:2] * L[:, None, None, 1, :] +
           We[..., 2:3] * L[:, None, None, 2, :])       # (Q,O,6,3)
    if onehot is not None:
        U = jnp.einsum("qoc,qoil->ciql", onehot, A_e)
    else:
        # masked edges already carry zero A_e rows (cw had the mask), and
        # padded obs (cam -1) clip to slot 0 adding zeros — no extra mask
        ci = jnp.clip(prob.obs_cam, 0, C - 1)
        Uq = jnp.zeros((Q, C, 6, 3)).at[
            jnp.arange(Q)[:, None], ci].add(A_e, mode="drop")
        U = Uq.transpose(1, 2, 0, 3)
    U2 = U.reshape(C * 6, Q * 3)
    S_corr = U2 @ U2.T                                  # (6C,6C), symmetric

    # assemble block-diagonal H_cc into dense, with LM damping
    Hcc_d = lin.Hcc + lam * jnp.eye(6) * jnp.maximum(
        jnp.diagonal(lin.Hcc, axis1=-2, axis2=-1).max(-1), 1e-6)[:, None, None]
    Hcc_dense = jnp.zeros((C * 6, C * 6))
    idx = jnp.arange(C * 6).reshape(C, 6)
    Hcc_dense = Hcc_dense.at[idx[:, :, None], idx[:, None, :]].set(Hcc_d)
    S = Hcc_dense - S_corr

    y = jnp.einsum("qkl,qk->ql", L, lin.bp)             # L^T bp
    b_red = lin.bc.reshape(C * 6) - U2 @ y.reshape(Q * 3)

    # mask fixed/unused cameras: identity rows/cols, zero rhs
    free = (prob.cam_valid & ~prob.cam_fixed)
    free6 = jnp.repeat(free, 6)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.where(free6, 0.0, 1.0) * jnp.eye(C * 6)
    b_red = jnp.where(free6, b_red, 0.0)

    dx_flat = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S + 1e-8 * jnp.eye(C * 6), lower=True),
        b_red)
    dx_c = jnp.where(free[:, None], dx_flat.reshape(C, 6), 0.0)

    # back-substitute landmarks: dx_p = L (L^T bp - L^T W^T dx_c)
    z = (U2.T @ jnp.where(free6, dx_flat, 0.0)).reshape(Q, 3)
    dx_p = jnp.einsum("qil,ql->qi", L, y - z)
    dx_p = jnp.where(lin.pt_on[:, None], dx_p, 0.0)
    return dx_c, dx_p


def _lm_iterations(cam, prob, poses, points, inv_sigma2, edge_mask, robust,
                   n_iters, use_pallas=False):
    """ONE edge pass per iteration: the assembly at the tentatively-stepped
    state provides BOTH the accept/reject error and (if accepted) the next
    step's linearization; a rejected step reuses the carried linearization
    with a larger lambda. Returns (poses, points, lin) — lin is always the
    linearization AT the returned state, so its chi2/depth_ok double as the
    between-phase reclassification (no extra edge pass)."""
    C = prob.poses.shape[0]
    Q, O = prob.obs_cam.shape
    # loop-invariant: the camera-incidence one-hot depends only on the
    # problem wiring, built once per phase (XLA CSEs it across phases)
    onehot = None if Q * O * C > (1 << 26) else _onehot_cam(prob, C)

    def body(_, carry):
        poses, points, lam, lin = carry
        dx_c, dx_p = _solve_step(prob, lin, lam, onehot)
        poses_new = se3.retract(poses, dx_c)
        points_new = points + dx_p
        lin_new = _assemble(cam, prob, poses_new, points_new, inv_sigma2,
                            edge_mask, robust, use_pallas, onehot)
        accept = lin_new.err < lin.err
        poses = jnp.where(accept, poses_new, poses)
        points = jnp.where(accept, points_new, points)
        lin = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), lin_new, lin)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9),
                        jnp.minimum(lam * 5.0, 1e4))
        return poses, points, lam, lin

    lin0 = _assemble(cam, prob, poses, points, inv_sigma2, edge_mask, robust,
                     use_pallas, onehot)
    poses, points, _, lin = jax.lax.fori_loop(
        0, n_iters, body, (poses, points, jnp.float32(1e-4), lin0))
    return poses, points, lin


@functools.partial(jax.jit, static_argnames=("iters_a", "iters_b", "robust",
                                             "use_pallas"))
def solve_ba(cam: Camera, prob: BAProblem, level_sigma2,
             iters_a: int = 5, iters_b: int = 10, robust: bool = True,
             use_pallas: bool = False) -> BAResult:
    """The reference LocalBA schedule (`src/Optimizer.cc:880-1010`): iters_a
    robust iterations, chi2 reclassification (5.991/7.815 + positive depth),
    iters_b more, final classification returned for observation erasure.

    use_pallas: fuse the per-edge assembly into the TPU kernel
    (ops/pallas_kernels.ba_edge_terms_pallas); falls back to XLA when the
    problem is too large for the one-hot aggregation."""
    C = prob.poses.shape[0]
    Q, O = prob.obs_cam.shape
    use_pallas = use_pallas and Q * O * C <= (1 << 26)
    sigma2 = jnp.asarray(level_sigma2, jnp.float32)
    inv_sigma2 = 1.0 / sigma2[jnp.clip(prob.obs_level, 0, sigma2.shape[0] - 1)]
    base_mask = (prob.obs_cam >= 0) & prob.pt_valid[:, None] & \
        prob.cam_valid[jnp.clip(prob.obs_cam, 0, C - 1)]
    stereo = prob.obs_uvr[..., 2] >= 0
    delta2 = jnp.where(stereo, reproj.CHI2_STEREO, reproj.CHI2_MONO)

    poses, points = prob.poses, prob.points
    mask = base_mask
    poses, points, lin = _lm_iterations(
        cam, prob, poses, points, inv_sigma2, mask.astype(jnp.float32),
        robust, iters_a, use_pallas)

    # reclassification from the carried linearization (chi2 is at the
    # current state and mask-independent — no extra edge pass)
    mask = base_mask & (lin.chi2 <= delta2) & lin.depth_ok

    poses, points, lin = _lm_iterations(
        cam, prob, poses, points, inv_sigma2, mask.astype(jnp.float32),
        robust, iters_b, use_pallas)

    inlier = base_mask & (lin.chi2 <= delta2) & lin.depth_ok
    return BAResult(poses=poses, points=points, edge_inlier=inlier,
                    chi2=lin.chi2)
