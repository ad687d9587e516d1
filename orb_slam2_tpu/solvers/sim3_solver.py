"""Sim3 from 3D-3D correspondences: Horn closed form + RANSAC.

Replaces `Sim3Solver` (`src/Sim3Solver.cc`): Horn 1987 absolute orientation
(centroids, M -> 4x4 N matrix, max-eigen quaternion, scale from projections)
on 3-point minimal sets, inliers by two-view reprojection with chi2
9.21*sigma^2 both directions (`CheckInliers`, `src/Sim3Solver.cc:313-330`).
All hypotheses evaluated in one vmapped batch (reference: sequential
`iterate(5)` per candidate keyframe).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3


def horn_sim3(p1, p2, fix_scale: bool = False, w=None):
    """Closed-form Sim3 g21 mapping points p1 -> p2 (both (n,3)):
    p2 ~ s R p1 + t (ComputeSim3, `src/Sim3Solver.cc:205-310`; rotation by
    Kabsch/Umeyama SVD, equivalent to Horn's quaternion method). Optional
    per-point weights enable the inlier-refine pass."""
    if w is None:
        w = jnp.ones(p1.shape[0])
    ws = jnp.maximum(jnp.sum(w), 1e-9)
    mu1 = jnp.sum(p1 * w[:, None], axis=0) / ws
    mu2 = jnp.sum(p2 * w[:, None], axis=0) / ws
    c1 = p1 - mu1
    c2 = p2 - mu2
    H = jnp.einsum("ni,nj,n->ij", c1, c2, w)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([jnp.ones(()), jnp.ones(()), d]))
    R = Vt.T @ D @ U.T
    rc1 = c1 @ R.T
    num = jnp.sum(c2 * rc1 * w[:, None])
    den = jnp.sum(rc1 * rc1 * w[:, None])
    s = jnp.where(fix_scale, 1.0, num / jnp.maximum(den, 1e-12))
    t = mu2 - s * (R @ mu1)
    return sim3.Sim3(R=R, t=t, s=s)


class Sim3Result(NamedTuple):
    g12: sim3.Sim3          # maps frame-2 camera points into frame 1
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "bf",
                                             "n_hyp", "fix_scale",
                                             "min_inliers"))
def ransac_sim3(pc1, pc2, level1, level2, valid, level_sigma2,
                fx: float, fy: float, cx: float, cy: float,
                n_hyp: int = 128, fix_scale: bool = False,
                min_inliers: int = 20, key=None,
                ur1=None, ur2=None, bf: float = 0.0) -> Sim3Result:
    """pc1, pc2: (E,3) matched 3D points in camera frames 1 and 2. Computes
    g12 with p1 ~ g12(p2). Inlier test: project g12 p2 into image 1 and
    g12^-1 p1 into image 2, chi2 < 9.21 * sigma^2 of the keypoint octave.

    ur1/ur2 (+bf): optional measured stereo right-x per feature (-1 = none).
    When given, the inlier chi2 adds the disparity residual — a TPU-native
    extension over the reference's mono-only `Sim3Solver::CheckInliers`
    (`src/Sim3Solver.cc:313-330`) that resolves the two-fold planar pose
    ambiguity (flat scenes under weak perspective reproject equally well
    from the flipped solution; the depth channel does not)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    E = pc1.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    packed = jnp.argsort(~valid, stable=True)
    draws = jax.random.randint(key, (n_hyp, 3), 0, jnp.maximum(n_valid, 1))
    sets = packed[draws]

    sigma2 = jnp.asarray(level_sigma2, jnp.float32)
    # chi2 99% quantile: 9.21 for the 2-dof (u,v) residual (the reference's
    # CheckInliers), 11.34 for 3 dof when the disparity channel is active
    s1 = sigma2[jnp.clip(level1, 0, sigma2.shape[0] - 1)]
    s2 = sigma2[jnp.clip(level2, 0, sigma2.shape[0] - 1)]
    if ur1 is not None and bf > 0:
        th1 = jnp.where(ur1 >= 0, 11.34, 9.21) * s1
    else:
        th1 = 9.21 * s1
    if ur2 is not None and bf > 0:
        th2 = jnp.where(ur2 >= 0, 11.34, 9.21) * s2
    else:
        th2 = 9.21 * s2

    def project(p):
        z = jnp.maximum(p[:, 2], 1e-9)
        return jnp.stack([fx * p[:, 0] / z + cx, fy * p[:, 1] / z + cy], -1)

    def ur_err(p, ur_meas, uv_pred):
        # disparity residual (u_pred - bf/z_pred) vs measured right-x
        if ur_meas is None or bf <= 0:
            return 0.0
        z = jnp.maximum(p[:, 2], 1e-9)
        ur_pred = uv_pred[:, 0] - bf / z
        return jnp.where(ur_meas >= 0, (ur_pred - ur_meas) ** 2, 0.0)

    uv1 = project(pc1)
    uv2 = project(pc2)

    def score(g):
        p1h = sim3.apply(g, pc2)
        uv1h = project(p1h)
        e1 = jnp.sum((uv1h - uv1) ** 2, axis=-1) + ur_err(p1h, ur1, uv1h)
        gi = sim3.inverse(g)
        p2h = sim3.apply(gi, pc1)
        uv2h = project(p2h)
        e2 = jnp.sum((uv2h - uv2) ** 2, axis=-1) + ur_err(p2h, ur2, uv2h)
        inl = valid & (e1 < th1) & (e2 < th2)
        return jnp.sum(inl.astype(jnp.int32)), inl

    def one(idx):
        g = horn_sim3(pc2[idx], pc1[idx], fix_scale=fix_scale)
        n, _ = score(g)
        return g, n

    gs, ns = jax.vmap(one)(sets)
    best = jnp.argmax(ns)
    g_best = jax.tree.map(lambda x: x[best], gs)
    # refine on the best hypothesis's inliers (Sim3Solver::Refine spirit)
    n0, inl0 = score(g_best)
    w = inl0.astype(jnp.float32)
    g_ref = horn_sim3(pc2, pc1, fix_scale=fix_scale, w=w)
    n1, inl1 = score(g_ref)
    use_ref = n1 >= n0
    g = jax.tree.map(lambda a, b: jnp.where(use_ref, a, b), g_ref, g_best)
    n = jnp.where(use_ref, n1, n0)
    inl = jnp.where(use_ref, inl1, inl0)
    return Sim3Result(g12=g, inliers=inl, n_inliers=n, ok=n >= min_inliers)


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "bf",
                                             "fix_scale", "iters_a", "iters_b"))
def optimize_sim3(g12: sim3.Sim3, pc1, pc2, uv1, uv2, level1, level2, valid,
                  level_sigma2, fx: float, fy: float, cx: float, cy: float,
                  fix_scale: bool = False, th2: float = 10.0,
                  iters_a: int = 5, iters_b: int = 10,
                  ur1=None, ur2=None, bf: float = 0.0):
    """Reprojection-error Sim3 refinement (`Optimizer::OptimizeSim3`,
    `src/Optimizer.cc:1405-1640`): minimize, over g12, the two-view pixel
    residuals e1 = proj(g12 pc2) - uv1 and e2 = proj(g12^-1 pc1) - uv2 with
    per-octave information, Huber delta sqrt(10); after `iters_a` iterations
    drop edges with chi2 > th2 (both directions), run `iters_b` more, and
    count surviving inliers. Critically more accurate than 3D-3D Horn when
    the paired map points carry accumulated drift: the image keypoints
    (uv1/uv2) are exact measurements while the 3D duplicates are not.

    pc1/pc2: (E,3) matched points in camera frames 1/2; uv1/uv2: (E,2) the
    matched keypoints' pixel coords. Returns (g12', inliers, n_inliers)."""
    sigma2 = jnp.asarray(level_sigma2, jnp.float32)
    w1 = 1.0 / sigma2[jnp.clip(level1, 0, sigma2.shape[0] - 1)]
    w2 = 1.0 / sigma2[jnp.clip(level2, 0, sigma2.shape[0] - 1)]

    def project3(p, ur_meas):
        """(u, v, ur) prediction; ur channel zeroed when unmeasured so the
        residual vanishes (mono / far points)."""
        z = jnp.maximum(p[..., 2], 1e-9)
        u = fx * p[..., 0] / z + cx
        v = fy * p[..., 1] / z + cy
        if ur_meas is None or bf <= 0:
            ur_r = jnp.zeros_like(u)
        else:
            ur_r = jnp.where(ur_meas >= 0, (u - bf / z) - ur_meas, 0.0)
        return jnp.stack([u, v, ur_r], axis=-1)

    z31 = jnp.zeros(uv1.shape[:-1] + (1,))
    obs1 = jnp.concatenate([uv1, z31], axis=-1)
    obs2 = jnp.concatenate([uv2, z31], axis=-1)

    def residuals(zeta, g):
        gz = sim3.compose(sim3.exp(zeta), g)
        e1 = project3(sim3.apply(gz, pc2), ur1) - obs1
        e2 = project3(sim3.apply(sim3.inverse(gz), pc1), ur2) - obs2
        return e1, e2

    delta2 = 10.0  # Huber delta^2 (reference deltaHuber = sqrt(10))

    def huber_w(chi2):
        # IRLS weight implementing the Huber kernel
        return jnp.where(chi2 <= delta2, 1.0,
                         jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))

    def gn_step(g, mask):
        zeta0 = jnp.zeros((7,))
        e1, e2 = residuals(zeta0, g)
        jac = jax.jacfwd(lambda z: jnp.concatenate(
            [residuals(z, g)[0], residuals(z, g)[1]], axis=0))(zeta0)
        r = jnp.concatenate([e1, e2], axis=0)              # (2E,2)
        w = jnp.concatenate([w1, w2], axis=0)
        m = jnp.concatenate([mask, mask], axis=0)
        chi2 = jnp.sum(r * r, axis=-1) * w
        wr = w * huber_w(chi2) * m
        J = jac.reshape(-1, 3, 7)
        H = jnp.einsum("eij,e,eik->jk", J, wr, J)
        b = jnp.einsum("eij,e,ei->j", J, wr, r)
        if fix_scale:
            # freeze the log-scale coordinate
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            b = b.at[6].set(0.0)
        H = H + 1e-6 * jnp.eye(7)
        dz = -jnp.linalg.solve(H, b)
        ok = jnp.all(jnp.isfinite(dz))
        dz = jnp.where(ok, dz, 0.0)
        return sim3.compose(sim3.exp(dz), g)

    def chi2_both(g):
        e1, e2 = residuals(jnp.zeros((7,)), g)
        c1 = jnp.sum(e1 * e1, axis=-1) * w1
        c2 = jnp.sum(e2 * e2, axis=-1) * w2
        return c1, c2

    g = g12
    mask = valid
    for _ in range(iters_a):
        g = gn_step(g, mask)
    c1, c2 = chi2_both(g)
    mask = mask & (c1 <= th2) & (c2 <= th2)
    for _ in range(iters_b):
        g = gn_step(g, mask)
    c1, c2 = chi2_both(g)
    inl = mask & (c1 <= th2) & (c2 <= th2)
    return g, inl, jnp.sum(inl.astype(jnp.int32))
