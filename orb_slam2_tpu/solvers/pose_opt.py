"""Motion-only bundle adjustment (pose optimization).

Device LM replacing `Optimizer::PoseOptimization` (`src/Optimizer.cc:375-622`):
unary reprojection edges on one SE3 vertex, Huber kernel
(delta = sqrt(5.991) mono / sqrt(7.815) stereo), information scaled by
1/sigma^2 of the keypoint octave, and the reference's schedule of 4 rounds x
10 iterations with chi2(0.95) inlier re-classification between rounds and the
robust kernel dropped for the last two rounds (`src/Optimizer.cc:531-611`).

The whole solve is one jitted fixed-shape computation: E edges (padded,
masked), 6x6 normal equations, LM damping loop via lax.fori_loop.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera
from . import reproj


class PoseOptResult(NamedTuple):
    Tcw: jnp.ndarray        # (4,4)
    inliers: jnp.ndarray    # (E,) bool — final chi2 classification
    n_inliers: jnp.ndarray  # () int32
    chi2: jnp.ndarray       # (E,) float32


def _build_normal_eqs(cam, Tcw, Xw, obs, comp_stereo, inv_sigma2, weight_mask,
                      robust: bool):
    e, pc, comp_w = reproj.project_residual(cam, Tcw, Xw, obs, comp_stereo)
    depth_ok = pc[..., 2] > 1e-6
    J, _ = reproj.pose_point_jacobians(cam, Tcw, pc)
    chi2 = reproj.edge_chi2(e, comp_w, inv_sigma2)
    delta2 = jnp.where(comp_stereo, reproj.CHI2_STEREO, reproj.CHI2_MONO)
    w_rob = reproj.huber_weight(chi2, delta2) if robust else jnp.ones_like(chi2)
    w = w_rob * inv_sigma2 * weight_mask * depth_ok
    # Gauss-Newton normal equations for min ||e||^2 with J = de/dxi:
    # H dx = b with H = sum w J^T diag(comp_w) J, b = -sum w J^T diag(comp_w) e
    Jw = J * comp_w[..., None]
    H = jnp.einsum("eci,ecj,e->ij", Jw, J, w)
    b = -jnp.einsum("eci,ec,e->i", Jw, e, w)
    # robust total error (g2o uses rho(chi2); for monitoring plain sum works)
    err = jnp.sum(chi2 * weight_mask * depth_ok)
    return H, b, err


def _lm_rounds(cam, Tcw, Xw, obs, comp_stereo, inv_sigma2, mask, robust: bool,
               n_iters: int, use_pallas: bool = False, aux=None):
    """One reference 'round': n_iters LM steps at fixed inlier mask.

    ONE normal-equation build per iteration: the build at the accepted pose
    doubles as the next iteration's linearization (a rejected step reuses the
    carried H, b — identical to rebuilding at the unchanged pose, which the
    round-2 version paid a second full residual+Jacobian pass per step for).

    use_pallas: build H/b/err with the fused TPU kernel
    (ops/pallas_kernels.pose_normal_eqs_pallas) — the XLA build is ~45 op
    launches per iteration of pure latency; aux carries the transposed
    per-edge arrays shared across iterations."""

    def build(T, m):
        if not use_pallas:
            return _build_normal_eqs(cam, T, Xw, obs, comp_stereo,
                                     inv_sigma2, m, robust)
        from ..ops import pallas_kernels as pk
        Xw_t, obs_t, invs2_row, st_row = aux
        return pk.pose_normal_eqs_pallas(
            T, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, Xw_t, obs_t,
            invs2_row, m[None, :], st_row,
            jnp.float32(reproj.CHI2_MONO), jnp.float32(reproj.CHI2_STEREO),
            robust=robust)

    def body(_, carry):
        T, lam, H, b, err = carry
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-10 * jnp.eye(6)
        dx = jnp.linalg.solve(Hd, b)
        T_new = se3.retract(T, dx)
        H_new, b_new, err_new = build(T_new, mask)
        accept = err_new < err
        T = jnp.where(accept, T_new, T)
        H = jnp.where(accept, H_new, H)
        b = jnp.where(accept, b_new, b)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        return T, lam, H, b, jnp.where(accept, err_new, err)

    H0, b0, err0 = build(Tcw, mask)
    T, _, _, _, _ = jax.lax.fori_loop(
        0, n_iters, body, (Tcw, jnp.float32(1e-4), H0, b0, err0))
    return T


@functools.partial(jax.jit, static_argnames=("n_rounds", "n_iters",
                                             "use_pallas"))
def optimize_pose(cam: Camera, Tcw0, Xw, obs_uvr, level, valid, level_sigma2,
                  n_rounds: int = 4, n_iters: int = 10,
                  use_pallas: bool = False) -> PoseOptResult:
    """Xw: (E,3) world points; obs_uvr: (E,3) with uR = -1 for mono edges;
    level: (E,) keypoint octave; valid: (E,) edge mask."""
    sigma2 = jnp.asarray(level_sigma2, dtype=jnp.float32)
    inv_sigma2 = 1.0 / sigma2[jnp.clip(level, 0, sigma2.shape[0] - 1)]
    comp_stereo = obs_uvr[:, 2] >= 0
    delta2 = jnp.where(comp_stereo, reproj.CHI2_STEREO, reproj.CHI2_MONO)

    # The fused kernel tiles edges along 128 lanes; a non-multiple edge
    # count falls back to the XLA build. Every engine call site passes the
    # pow2-padded keypoint capacity (cfg.max_keypoints >= 128), so the
    # kernel path is never silently lost in practice — external callers
    # should pad their edge arrays to a 128-multiple to keep it.
    use_pallas = use_pallas and Xw.shape[0] % 128 == 0
    aux = None
    if use_pallas:
        # transpose the per-edge constants ONCE per solve
        aux = (Xw.T.astype(jnp.float32),
               obs_uvr.T.astype(jnp.float32),
               inv_sigma2[None, :].astype(jnp.float32),
               comp_stereo[None, :].astype(jnp.float32))

    # kill inherited rotation non-orthogonality: the retract chain
    # (exp(dx) @ T) preserves whatever error the seed carries, and on-device
    # pose chains (pipelined tracking) would otherwise compound it
    Tcw = se3.orthonormalize(Tcw0)
    if use_pallas:
        # the ENTIRE schedule in one Pallas launch (ops/pallas_kernels.
        # pose_lm_pallas): the per-iteration host graph (6x6 solve, retract,
        # accept/reject) was ~25 small op launches x n_rounds*n_iters of
        # pure latency
        from ..ops import pallas_kernels as pk
        Xw_t, obs_t, invs2_row, st_row = aux
        T, inliers, n_inl, chi2 = pk.pose_lm_pallas(
            Tcw, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, Xw_t, obs_t,
            invs2_row, st_row, valid.astype(jnp.float32)[None, :],
            jnp.float32(reproj.CHI2_MONO), jnp.float32(reproj.CHI2_STEREO),
            n_rounds=n_rounds, n_iters=n_iters)
        return PoseOptResult(Tcw=T, inliers=inliers, n_inliers=n_inl,
                             chi2=chi2)
    inlier = valid
    for r in range(n_rounds):
        robust = r < 2  # reference drops the Huber kernel after round 2
        Tcw = _lm_rounds(cam, Tcw, Xw, obs_uvr, comp_stereo, inv_sigma2,
                         inlier.astype(jnp.float32), robust, n_iters,
                         use_pallas=use_pallas, aux=aux)
        # re-classify ALL valid edges (outliers can come back, like g2o's
        # computeError-on-level-1 edges)
        e, pc, comp_w = reproj.project_residual(cam, Tcw, Xw, obs_uvr, comp_stereo)
        chi2 = reproj.edge_chi2(e, comp_w, inv_sigma2)
        inlier = valid & (chi2 <= delta2) & (pc[..., 2] > 0)

    return PoseOptResult(Tcw=Tcw, inliers=inlier,
                         n_inliers=jnp.sum(inlier.astype(jnp.int32)),
                         chi2=chi2)
