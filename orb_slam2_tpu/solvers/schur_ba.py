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


def _assemble(cam, prob, poses, points, inv_sigma2, edge_mask, robust):
    """UNDAMPED normal-equation pieces at the current linearization point:
    (Hcc (C,6,6), bc (C,6), Hpp (Q,3,3), bp (Q,3), Wd (Q,C,6,3), pt_on,
    err). Damping + Schur + solve live in `_solve_step` so a rejected LM
    step can retry with a larger lambda WITHOUT re-running the edge pass
    (the same carried-linearization trick as pose_opt's _lm_rounds)."""
    C = poses.shape[0]
    Q, O = prob.obs_cam.shape
    e, Jp, Jl, comp_w, w, chi2, _ = _edge_terms(
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
    use_onehot = Q * O * C <= (1 << 26)
    if use_onehot:
        onehot = ((prob.obs_cam[:, :, None] ==
                   jnp.arange(C, dtype=jnp.int32)[None, None, :]) &
                  edge_on[:, :, None]).astype(jnp.float32)   # (Q,O,C)
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

    # dense W layout (Q, C, 6, 3) for the big Schur matmul
    if use_onehot:
        Wd = jnp.einsum("qoc,qoij->qcij", onehot, W_e)
    else:
        Wd = jnp.zeros((Q, C, 6, 3)).at[
            jnp.arange(Q)[:, None], jnp.where(edge_on, ci, C)
        ].add(W_e, mode="drop")

    err = jnp.sum(chi2 * edge_mask)
    return Hcc, bc, Hpp, bp, Wd, pt_on, err


def _solve_step(prob, lin, lam):
    """Damped Schur solve from an existing linearization. Returns
    (dx_c (C,6), dx_p (Q,3))."""
    Hcc, bc, Hpp, bp, Wd, pt_on, _ = lin
    C = Hcc.shape[0]
    Hpp_d = Hpp + lam * jnp.eye(3) * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1).max(-1), 1e-6)[:, None, None]
    Hpp_d = jnp.where(pt_on[:, None, None], Hpp_d, jnp.eye(3))
    Hpp_inv = _inv3x3(Hpp_d)

    # A = W H^-1/2 would need a factor; use M = W Hpp_inv then S_corr = sum_q
    # M W^T as one contraction (Q*3 inner axis) — MXU-shaped.
    Q = Wd.shape[0]
    M = jnp.einsum("qcij,qjk->qcik", Wd, Hpp_inv)       # (Q,C,6,3)
    M2 = M.transpose(1, 2, 0, 3).reshape(C * 6, Q * 3)
    W2 = Wd.transpose(1, 2, 0, 3).reshape(C * 6, Q * 3)
    S_corr = M2 @ W2.T                                   # (6C, 6C)

    # assemble block-diagonal H_cc into dense, with LM damping
    Hcc_d = Hcc + lam * jnp.eye(6) * jnp.maximum(
        jnp.diagonal(Hcc, axis1=-2, axis2=-1).max(-1), 1e-6)[:, None, None]
    Hcc_dense = jnp.zeros((C * 6, C * 6))
    idx = jnp.arange(C * 6).reshape(C, 6)
    Hcc_dense = Hcc_dense.at[idx[:, :, None], idx[:, None, :]].set(Hcc_d)
    S = Hcc_dense - S_corr

    b_red = (bc - jnp.einsum("qcik,qk->ci", M, bp)).reshape(C * 6)

    # mask fixed/unused cameras: identity rows/cols, zero rhs
    free = (prob.cam_valid & ~prob.cam_fixed)
    free6 = jnp.repeat(free, 6)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.where(free6, 0.0, 1.0) * jnp.eye(C * 6)
    b_red = jnp.where(free6, b_red, 0.0)

    dx_c = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S + 1e-8 * jnp.eye(C * 6), lower=True), b_red
    ).reshape(C, 6)
    dx_c = jnp.where(free[:, None], dx_c, 0.0)

    # back-substitute landmarks: dx_p = Hpp^-1 (bp - W^T dx_c summed over obs)
    Wt_dx = jnp.einsum("qcij,ci->qj", Wd, dx_c)          # (Q,3)
    dx_p = jnp.einsum("qij,qj->qi", Hpp_inv, bp - Wt_dx)
    dx_p = jnp.where(pt_on[:, None], dx_p, 0.0)
    return dx_c, dx_p


def _lm_iterations(cam, prob, poses, points, inv_sigma2, edge_mask, robust,
                   n_iters):
    """ONE edge pass per iteration: the assembly at the tentatively-stepped
    state provides BOTH the accept/reject error and (if accepted) the next
    step's linearization; a rejected step reuses the carried linearization
    with a larger lambda. The previous version paid a second full edge
    pass per iteration (_total_chi2) just for the accept decision — ~40%
    of the local-BA device time at Q=4096/O=12."""
    def body(_, carry):
        poses, points, lam, lin = carry
        dx_c, dx_p = _solve_step(prob, lin, lam)
        poses_new = se3.retract(poses, dx_c)
        points_new = points + dx_p
        lin_new = _assemble(cam, prob, poses_new, points_new, inv_sigma2,
                            edge_mask, robust)
        err = lin[-1]
        err_new = lin_new[-1]
        accept = err_new < err
        poses = jnp.where(accept, poses_new, poses)
        points = jnp.where(accept, points_new, points)
        lin = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), lin_new, lin)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9),
                        jnp.minimum(lam * 5.0, 1e4))
        return poses, points, lam, lin

    lin0 = _assemble(cam, prob, poses, points, inv_sigma2, edge_mask, robust)
    poses, points, _, _ = jax.lax.fori_loop(
        0, n_iters, body, (poses, points, jnp.float32(1e-4), lin0))
    return poses, points


@functools.partial(jax.jit, static_argnames=("iters_a", "iters_b", "robust"))
def solve_ba(cam: Camera, prob: BAProblem, level_sigma2,
             iters_a: int = 5, iters_b: int = 10, robust: bool = True) -> BAResult:
    """The reference LocalBA schedule (`src/Optimizer.cc:880-1010`): iters_a
    robust iterations, chi2 reclassification (5.991/7.815 + positive depth),
    iters_b more, final classification returned for observation erasure."""
    sigma2 = jnp.asarray(level_sigma2, jnp.float32)
    inv_sigma2 = 1.0 / sigma2[jnp.clip(prob.obs_level, 0, sigma2.shape[0] - 1)]
    base_mask = (prob.obs_cam >= 0) & prob.pt_valid[:, None] & \
        prob.cam_valid[jnp.clip(prob.obs_cam, 0, prob.poses.shape[0] - 1)]
    stereo = prob.obs_uvr[..., 2] >= 0
    delta2 = jnp.where(stereo, reproj.CHI2_STEREO, reproj.CHI2_MONO)

    poses, points = prob.poses, prob.points
    mask = base_mask
    poses, points = _lm_iterations(
        cam, prob, poses, points, inv_sigma2, mask.astype(jnp.float32), robust, iters_a)

    e, _, _, comp_w, _, chi2, depth_ok = _edge_terms(
        cam, prob, poses, points, inv_sigma2, mask.astype(jnp.float32), robust)
    mask = base_mask & (chi2 <= delta2) & depth_ok

    poses, points = _lm_iterations(
        cam, prob, poses, points, inv_sigma2, mask.astype(jnp.float32), robust, iters_b)

    e, _, _, comp_w, _, chi2, depth_ok = _edge_terms(
        cam, prob, poses, points, inv_sigma2,
        base_mask.astype(jnp.float32), robust)
    inlier = base_mask & (chi2 <= delta2) & depth_ok
    return BAResult(poses=poses, points=points, edge_inlier=inlier, chi2=chi2)
