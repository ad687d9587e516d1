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


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "n_hyp",
                                             "fix_scale", "min_inliers"))
def ransac_sim3(pc1, pc2, level1, level2, valid, level_sigma2,
                fx: float, fy: float, cx: float, cy: float,
                n_hyp: int = 128, fix_scale: bool = False,
                min_inliers: int = 20, key=None) -> Sim3Result:
    """pc1, pc2: (E,3) matched 3D points in camera frames 1 and 2. Computes
    g12 with p1 ~ g12(p2). Inlier test: project g12 p2 into image 1 and
    g12^-1 p1 into image 2, chi2 < 9.21 * sigma^2 of the keypoint octave."""
    if key is None:
        key = jax.random.PRNGKey(0)
    E = pc1.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    packed = jnp.argsort(~valid, stable=True)
    draws = jax.random.randint(key, (n_hyp, 3), 0, jnp.maximum(n_valid, 1))
    sets = packed[draws]

    sigma2 = jnp.asarray(level_sigma2, jnp.float32)
    th1 = 9.21 * sigma2[jnp.clip(level1, 0, sigma2.shape[0] - 1)]
    th2 = 9.21 * sigma2[jnp.clip(level2, 0, sigma2.shape[0] - 1)]

    def project(p):
        z = jnp.maximum(p[:, 2], 1e-9)
        return jnp.stack([fx * p[:, 0] / z + cx, fy * p[:, 1] / z + cy], -1)

    uv1 = project(pc1)
    uv2 = project(pc2)

    def score(g):
        p1h = sim3.apply(g, pc2)
        e1 = jnp.sum((project(p1h) - uv1) ** 2, axis=-1)
        gi = sim3.inverse(g)
        p2h = sim3.apply(gi, pc1)
        e2 = jnp.sum((project(p2h) - uv2) ** 2, axis=-1)
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
