"""EPnP + RANSAC camera-pose-from-matches (relocalization solver).

Replaces `PnPsolver` (`src/PnPsolver.cc`): EPnP control-point
parameterization (Lepetit et al.) solved per RANSAC hypothesis — all
hypotheses in one vmapped batch instead of the reference's sequential
`iterate(5)` loop. The beta-case search + Gauss-Newton of the reference is
replaced by the dominant-kernel (N=1) solution followed by a Horn alignment,
which the subsequent motion-only BA refine makes equivalent in practice
(`Tracking::Relocalization` always re-optimizes, `src/Tracking.cc:2130-2241`).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3


def _horn_rigid(src, dst, w=None):
    """Closed-form rigid alignment dst = R src + t (Kabsch/Umeyama SVD —
    equivalent to the quaternion method of `Sim3Solver::ComputeSim3`)."""
    if w is None:
        w = jnp.ones(src.shape[0])
    ws = jnp.sum(w)
    mu_s = jnp.sum(src * w[:, None], axis=0) / ws
    mu_d = jnp.sum(dst * w[:, None], axis=0) / ws
    cs = src - mu_s
    cd = dst - mu_d
    H = jnp.einsum("ni,nj,n->ij", cs, cd, w)     # src x dst correlation
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([jnp.float32(1.0), jnp.float32(1.0), d]))
    R = Vt.T @ D @ U.T
    t = mu_d - R @ mu_s
    return R, t


def _epnp_pose(Xw, uv, fx, fy, cx, cy):
    """EPnP on n>=4 points (single hypothesis). Xw: (n,3); uv: (n,2)."""
    n = Xw.shape[0]
    # control points: centroid + principal axes (choose_control_points)
    c0 = jnp.mean(Xw, axis=0)
    A = Xw - c0
    cov = A.T @ A / n
    vals, vecs = jnp.linalg.eigh(cov)
    # eigh ascending; use sqrt(eigval) scaled axes
    cw = jnp.stack([
        c0,
        c0 + jnp.sqrt(jnp.maximum(vals[2], 1e-12)) * vecs[:, 2],
        c0 + jnp.sqrt(jnp.maximum(vals[1], 1e-12)) * vecs[:, 1],
        c0 + jnp.sqrt(jnp.maximum(vals[0], 1e-12)) * vecs[:, 0],
    ])                                    # (4,3)

    # barycentric coordinates (compute_barycentric_coordinates)
    CC = jnp.concatenate([cw.T, jnp.ones((1, 4))], axis=0)    # (4,4)
    Xh = jnp.concatenate([Xw.T, jnp.ones((1, n))], axis=0)    # (4,n)
    alphas = jnp.linalg.solve(CC, Xh).T                        # (n,4)

    # M matrix (fill_M): 2n x 12
    u = uv[:, 0]
    v = uv[:, 1]
    rows = []
    for j in range(4):
        a = alphas[:, j]
        rows.append(jnp.stack([a * fx, jnp.zeros_like(a), a * (cx - u)], axis=-1))
    r_u = jnp.concatenate(rows, axis=-1)                       # (n,12)
    rows = []
    for j in range(4):
        a = alphas[:, j]
        rows.append(jnp.stack([jnp.zeros_like(a), a * fy, a * (cy - v)], axis=-1))
    r_v = jnp.concatenate(rows, axis=-1)
    M = jnp.concatenate([r_u, r_v], axis=0)                    # (2n,12)

    MtM = M.T @ M
    _, vecs12 = jnp.linalg.eigh(MtM)
    kern = vecs12[:, 0].reshape(4, 3)                          # control pts in cam, up to scale

    # beta (N=1 case): match inter-control-point distances
    def pdists(P):
        d = P[:, None, :] - P[None, :, :]
        return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-18))

    dc = pdists(kern)
    dw = pdists(cw)
    iu = jnp.triu_indices(4, 1)
    beta = jnp.sum(dc[iu] * dw[iu]) / jnp.maximum(jnp.sum(dc[iu] ** 2), 1e-12)
    ccs = beta * kern                                          # (4,3)
    pcs = alphas @ ccs                                         # (n,3) cam-frame points
    # enforce positive depth (solve_for_sign)
    sign = jnp.where(jnp.sum(pcs[:, 2] < 0) > n // 2, -1.0, 1.0)
    pcs = pcs * sign

    R, t = _horn_rigid(Xw, pcs)
    return se3.make(R, t)


def _planar_pose(Xw, uv, fx, fy, cx, cy):
    """Pose from (near-)coplanar points via plane homography decomposition.

    EPnP's 4-control-point barycentric solve is singular when the scene is
    planar (the reference's beta-case Gauss-Newton covers this,
    `src/PnPsolver.cc:718-1020`; OpenCV falls back to a homography). Here:
    PCA plane basis -> DLT homography (plane coords -> normalized image) ->
    R,t from the orthonormalized first two columns. Exact for planar scenes,
    harmless elsewhere (RANSAC scores it against the EPnP hypothesis)."""
    n = Xw.shape[0]
    c0 = jnp.mean(Xw, axis=0)
    A = Xw - c0
    cov = A.T @ A / n
    _, vecs = jnp.linalg.eigh(cov)
    e1, e2, nrm = vecs[:, 2], vecs[:, 1], vecs[:, 0]
    s = jnp.stack([A @ e1, A @ e2], axis=-1)                  # (n,2) plane coords
    mx = (uv[:, 0] - cx) / fx
    my = (uv[:, 1] - cy) / fy

    z = jnp.zeros_like(s[:, 0])
    o = jnp.ones_like(s[:, 0])
    r1 = jnp.stack([s[:, 0], s[:, 1], o, z, z, z,
                    -mx * s[:, 0], -mx * s[:, 1], -mx], axis=-1)
    r2 = jnp.stack([z, z, z, s[:, 0], s[:, 1], o,
                    -my * s[:, 0], -my * s[:, 1], -my], axis=-1)
    M = jnp.concatenate([r1, r2], axis=0)                     # (2n,9)
    _, vecs9 = jnp.linalg.eigh(M.T @ M)
    G = vecs9[:, 0].reshape(3, 3)

    # sign: plane barycentre must sit in front of the camera
    zc = G[2, 2]
    G = G * jnp.where(zc < 0, -1.0, 1.0)
    U2, S2, Vt2 = jnp.linalg.svd(G[:, :2], full_matrices=False)
    Rc = U2 @ Vt2                                             # closest orthonormal pair
    lam = 2.0 / jnp.maximum(S2[0] + S2[1], 1e-12)
    r3 = jnp.cross(Rc[:, 0], Rc[:, 1])
    R_pl = jnp.stack([Rc[:, 0], Rc[:, 1], r3], axis=1)
    t_pl = lam * G[:, 2]
    E = jnp.stack([e1, e2, nrm], axis=1)                      # world -> plane coords: E^T (X - c0)
    R_cw = R_pl @ E.T
    t_cw = t_pl - R_cw @ c0
    return se3.make(R_cw, t_cw)


class PnPResult(NamedTuple):
    Tcw: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "n_hyp"))
def ransac_pnp(Xw, uv, level, valid, level_sigma2,
               fx: float, fy: float, cx: float, cy: float,
               n_hyp: int = 256, key=None) -> PnPResult:
    """Batched EPnP RANSAC (PnPsolver::iterate semantics; chi2 threshold
    5.991 * sigma^2(octave); best-hypothesis refinement is left to the
    caller's pose optimization). Samples of 6 rather than the reference's 4:
    the dominant-kernel EPnP solution is exact at n>=6 while n=4 needs the
    beta-case search — more hypotheses at batch cost ~zero beat the harder
    minimal solver on TPU. Xw (E,3), uv (E,2)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    E = Xw.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    packed = jnp.argsort(~valid, stable=True)
    draws = jax.random.randint(key, (n_hyp, 6), 0, jnp.maximum(n_valid, 1))
    sets = packed[draws]

    sigma2 = jnp.asarray(level_sigma2, jnp.float32)
    th2 = 5.991 * sigma2[jnp.clip(level, 0, sigma2.shape[0] - 1)]

    def score(T):
        pc = se3.apply(T, Xw)
        z = pc[:, 2]
        u = fx * pc[:, 0] / jnp.maximum(z, 1e-9) + cx
        v = fy * pc[:, 1] / jnp.maximum(z, 1e-9) + cy
        err = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        inl = valid & (z > 0) & (err < th2)
        return jnp.sum(inl.astype(jnp.int32)), inl

    def one(idx):
        # two hypotheses per sample: general EPnP + the planar-homography
        # pose (EPnP is singular on coplanar scenes); score picks per sample
        Ta = _epnp_pose(Xw[idx], uv[idx], fx, fy, cx, cy)
        Tb = _planar_pose(Xw[idx], uv[idx], fx, fy, cx, cy)
        na, _ = score(Ta)
        nb, _ = score(Tb)
        T = jnp.where(nb > na, Tb, Ta)
        return T, jnp.maximum(na, nb)

    Ts, ns = jax.vmap(one)(sets)
    best = jnp.argmax(ns)
    T_best = Ts[best]
    n_best, inl = score(T_best)
    ok = n_best >= jnp.minimum(10, jnp.maximum(n_valid // 2, 4))
    return PnPResult(Tcw=T_best, inliers=inl, n_inliers=n_best, ok=ok)
