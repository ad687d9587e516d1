"""Monocular two-view bootstrap: parallel H/F RANSAC + reconstruction.

TPU-native `Initializer` (`src/Initializer.cc`): the reference runs
FindHomography and FindFundamental in two std::threads with 200 shared RANSAC
sets (`:189-205`); here all 200 hypotheses of BOTH models are scored in one
batched computation (vmapped 8-point solves + dense symmetric-transfer
scoring), then the RH = SH/(SH+SF) > 0.40 rule (`:207-227`) picks the model,
and reconstruction enumerates the candidate (R,t) decompositions (4 from E,
8 from the Faugeras homography decomposition) and scores cheirality /
parallax / reprojection in parallel (`CheckRT`, `:1452-1719`).

Everything is fixed-shape: matches are padded with a validity mask, RANSAC
sampling uses a fixed PRNG key (reference seeds DUtils::Random with 0).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.triangulation import triangulate

RANSAC_ITERS = 200
SIGMA = 1.0
CHI2_H = 5.991
CHI2_F = 3.841
SCORE_TH = 5.991
MIN_PARALLAX_DEG = 1.0
MIN_TRIANGULATED = 50


def _normalize(pts, valid):
    """Reference `Normalize` (`src/Initializer.cc:1378-1449`): subtract mean,
    scale by mean absolute deviation per axis. Returns (pts_n, T (3,3))."""
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / n
    dev = jnp.abs(pts - mean)
    mean_dev = jnp.sum(jnp.where(valid[:, None], dev, 0.0), axis=0) / n
    s = 1.0 / jnp.maximum(mean_dev, 1e-12)
    pts_n = (pts - mean) * s
    T = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return pts_n, T


def _solve_h(p1, p2):
    """8-point DLT homography H21 (p2 ~ H21 p1). p1,p2: (8,2) normalized."""
    x, y = p1[:, 0], p1[:, 1]
    u, v = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=-1)
    r2 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)             # (16,9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[8].reshape(3, 3)


def _solve_f(p1, p2):
    """8-point fundamental with rank-2 projection. F21: p2^T F p1 = 0."""
    x, y = p1[:, 0], p1[:, 1]
    u, v = p2[:, 0], p2[:, 1]
    o = jnp.ones_like(x)
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, o], axis=-1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[8].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return U @ jnp.diag(S) @ Vt


def _score_h(H21, p1, p2, valid):
    """Symmetric transfer chi2 scoring (`CheckHomography`,
    `src/Initializer.cc:897-1024`). Returns (score, inlier_mask)."""
    H12 = jnp.linalg.inv(H21)
    inv_s2 = 1.0 / (SIGMA * SIGMA)

    def transfer(H, a, b):
        # chi2 of |b - H a|
        w = H[2, 0] * a[:, 0] + H[2, 1] * a[:, 1] + H[2, 2]
        w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
        u = (H[0, 0] * a[:, 0] + H[0, 1] * a[:, 1] + H[0, 2]) / w
        v = (H[1, 0] * a[:, 0] + H[1, 1] * a[:, 1] + H[1, 2]) / w
        return ((b[:, 0] - u) ** 2 + (b[:, 1] - v) ** 2) * inv_s2

    chi2_1 = transfer(H12, p2, p1)
    chi2_2 = transfer(H21, p1, p2)
    ok = (chi2_1 <= CHI2_H) & (chi2_2 <= CHI2_H) & valid
    score = jnp.sum(jnp.where((chi2_1 <= CHI2_H) & valid, CHI2_H - chi2_1, 0.0)) + \
        jnp.sum(jnp.where((chi2_2 <= CHI2_H) & valid, CHI2_H - chi2_2, 0.0))
    return score, ok


def _score_f(F21, p1, p2, valid):
    """Epipolar-distance chi2 scoring (`CheckFundamental`,
    `src/Initializer.cc:1024-1066`): th 3.841 per direction, score adds
    (5.991 - chi2)."""
    inv_s2 = 1.0 / (SIGMA * SIGMA)

    def epi_chi2(F, a, b):
        # distance of b to the epipolar line F [a;1]
        la = F[0, 0] * a[:, 0] + F[0, 1] * a[:, 1] + F[0, 2]
        lb = F[1, 0] * a[:, 0] + F[1, 1] * a[:, 1] + F[1, 2]
        lc = F[2, 0] * a[:, 0] + F[2, 1] * a[:, 1] + F[2, 2]
        num = la * b[:, 0] + lb * b[:, 1] + lc
        den = la * la + lb * lb
        den = jnp.where(den < 1e-12, 1e-12, den)
        return num * num / den * inv_s2

    chi2_1 = epi_chi2(F21, p1, p2)                     # line in image 2
    chi2_2 = epi_chi2(F21.T, p2, p1)
    ok = (chi2_1 <= CHI2_F) & (chi2_2 <= CHI2_F) & valid
    score = jnp.sum(jnp.where((chi2_1 <= CHI2_F) & valid, SCORE_TH - chi2_1, 0.0)) + \
        jnp.sum(jnp.where((chi2_2 <= CHI2_F) & valid, SCORE_TH - chi2_2, 0.0))
    return score, ok


def _check_rt(R, t, p1, p2, valid, K, th2: float = 4.0):
    """Cheirality + parallax + reprojection check (`CheckRT`,
    `src/Initializer.cc:1452-1650`). p1/p2 are pixel coords. Returns
    (n_good, parallax_deg, X (N,3), good_mask)."""
    fx, fy, cx, cy = K
    P1 = jnp.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1.0, 0]])
    Rt = jnp.concatenate([R, t[:, None]], axis=1)      # (3,4)
    Km = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    P2 = Km @ Rt
    X = triangulate(P1, P2, p1, p2)                    # (N,3) in cam1 frame
    finite = jnp.all(jnp.isfinite(X), axis=-1)

    O2 = -R.T @ t
    n1 = X
    n2 = X - O2
    d1 = jnp.linalg.norm(n1, axis=-1)
    d2 = jnp.linalg.norm(n2, axis=-1)
    cos_par = jnp.sum(n1 * n2, axis=-1) / jnp.maximum(d1 * d2, 1e-12)

    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]
    depth_ok = (z1 > 0) & (z2 > 0)
    # the reference only enforces positive depth when parallax is measurable
    depth_ok = depth_ok | (cos_par >= 0.99998)

    u1 = fx * X[:, 0] / jnp.where(z1 == 0, 1e-9, z1) + cx
    v1 = fy * X[:, 1] / jnp.where(z1 == 0, 1e-9, z1) + cy
    e1 = (u1 - p1[:, 0]) ** 2 + (v1 - p1[:, 1]) ** 2
    u2 = fx * Xc2[:, 0] / jnp.where(z2 == 0, 1e-9, z2) + cx
    v2 = fy * Xc2[:, 1] / jnp.where(z2 == 0, 1e-9, z2) + cy
    e2 = (u2 - p2[:, 0]) ** 2 + (v2 - p2[:, 1]) ** 2

    good = valid & finite & depth_ok & (e1 < th2) & (e2 < th2) & (z1 > 0) & (z2 > 0)
    good = good & (cos_par < 0.99998)
    n_good = jnp.sum(good.astype(jnp.int32))

    # parallax: 50th smallest cosParallax among good (or the largest index)
    cp = jnp.where(good, cos_par, 1.0)
    cp_sorted = jnp.sort(cp)
    idx = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    parallax = jnp.degrees(jnp.arccos(jnp.clip(cp_sorted[idx], -1.0, 1.0)))
    parallax = jnp.where(n_good > 0, parallax, 0.0)
    return n_good, parallax, X, good


class InitResult(NamedTuple):
    success: jnp.ndarray    # () bool
    R21: jnp.ndarray        # (3,3)
    t21: jnp.ndarray        # (3,) unit-ish translation
    points: jnp.ndarray     # (N,3) triangulated in frame-1 coords
    good: jnp.ndarray       # (N,) bool triangulation validity
    used_homography: jnp.ndarray  # () bool


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy"))
def initialize(p1, p2, valid, fx: float, fy: float, cx: float, cy: float,
               key=None) -> InitResult:
    """p1, p2: (N,2) matched undistorted pixel coords (ref frame, cur frame);
    valid: (N,) mask. Camera intrinsics static."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = p1.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))

    # packed indices of valid matches (valid first, stable order)
    packed = jnp.argsort(~valid, stable=True)
    draws = jax.random.randint(key, (RANSAC_ITERS, 8), 0, jnp.maximum(n_valid, 1))
    sets = packed[draws]                                # (200, 8)

    p1n, T1 = _normalize(p1, valid)
    p2n, T2 = _normalize(p2, valid)
    T2inv = jnp.linalg.inv(T2)

    def one_hypo(idx):
        a = p1n[idx]
        b = p2n[idx]
        Hn = _solve_h(a, b)
        Fn = _solve_f(a, b)
        H21 = T2inv @ Hn @ T1
        F21 = T2.T @ Fn @ T1
        sh, _ = _score_h(H21, p1, p2, valid)
        sf, _ = _score_f(F21, p1, p2, valid)
        return H21, F21, sh, sf

    H_all, F_all, sh_all, sf_all = jax.vmap(one_hypo)(sets)
    bi_h = jnp.argmax(sh_all)
    bi_f = jnp.argmax(sf_all)
    SH = sh_all[bi_h]
    SF = sf_all[bi_f]
    H21 = H_all[bi_h]
    F21 = F_all[bi_f]
    use_h = SH / jnp.maximum(SH + SF, 1e-12) > 0.40

    _, inl_h = _score_h(H21, p1, p2, valid)
    _, inl_f = _score_f(F21, p1, p2, valid)

    K = (fx, fy, cx, cy)
    Km = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    # --- E-decomposition candidates (ReconstructF, src/Initializer.cc:250-350)
    E = Km.T @ F21 @ Km
    U, _, Vt = jnp.linalg.svd(E)
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    tE = U[:, 2]
    tE = tE / jnp.maximum(jnp.linalg.norm(tE), 1e-12)
    cand_f = [(R1, tE), (R1, -tE), (R2, tE), (R2, -tE)]

    # --- Faugeras homography decomposition (ReconstructH,
    # src/Initializer.cc:354-560): A = K^-1 H K, 8 hypotheses
    A = jnp.linalg.inv(Km) @ H21 @ Km
    Ua, Sa, Vta = jnp.linalg.svd(A)
    s_det = jnp.linalg.det(Ua) * jnp.linalg.det(Vta)
    d1, d2, d3 = Sa[0], Sa[1], Sa[2]
    V = Vta.T

    eps = 1e-8
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    aux_st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum((d1 + d3) * d2, eps)
    aux_st_n = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum((d1 - d3) * d2, eps)
    ctheta = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    cphi = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)

    cand_h = []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            x1 = e1 * aux1
            x3 = e3 * aux3
            # d' = +d2
            st = e1 * e3 * aux_st
            Rp = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
            Rp = Rp.at[0, 0].set(ctheta).at[0, 2].set(-st)
            Rp = Rp.at[2, 0].set(st).at[2, 2].set(ctheta)
            R = s_det * Ua @ Rp @ Vta
            tp = jnp.array([x1, 0.0, -x3]) * (d1 - d3)
            t = Ua @ tp
            cand_h.append((R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)))
            # d' = -d2
            sphi = e1 * e3 * aux_st_n
            Rn = jnp.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, 1.0]])
            Rn = Rn.at[0, 0].set(cphi).at[0, 2].set(sphi)
            Rn = Rn.at[2, 0].set(sphi).at[2, 2].set(-cphi)
            R = s_det * Ua @ Rn @ Vta
            tn = jnp.array([x1, 0.0, x3]) * (d1 + d3)
            t = Ua @ tn
            cand_h.append((R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)))

    def eval_cands(cands, inl):
        Rs = jnp.stack([c[0] for c in cands])
        ts = jnp.stack([c[1] for c in cands])
        ng, par, X, good = jax.vmap(lambda R, t: _check_rt(R, t, p1, p2, inl, K))(Rs, ts)
        return ng, par, X, good, Rs, ts

    ngf, parf, Xf, goodf, Rsf, tsf = eval_cands(cand_f, inl_f)
    ngh, parh, Xh, goodh, Rsh, tsh = eval_cands(cand_h, inl_h)

    n_inl_f = jnp.sum(inl_f.astype(jnp.int32))
    n_inl_h = jnp.sum(inl_h.astype(jnp.int32))

    # F acceptance (src/Initializer.cc:587-735)
    bf = jnp.argmax(ngf)
    max_f = ngf[bf]
    n_similar_f = jnp.sum((ngf > 0.7 * max_f).astype(jnp.int32))
    min_good_f = jnp.maximum((0.9 * n_inl_f).astype(jnp.int32), MIN_TRIANGULATED)
    ok_f = (max_f >= min_good_f) & (n_similar_f == 1) & (parf[bf] > MIN_PARALLAX_DEG)

    # H acceptance (src/Initializer.cc:520-560)
    bh = jnp.argmax(ngh)
    max_h = ngh[bh]
    second_h = jnp.sort(ngh)[-2]
    ok_h = (second_h < 0.75 * max_h) & (parh[bh] >= MIN_PARALLAX_DEG) & \
        (max_h > MIN_TRIANGULATED) & (max_h > 0.9 * n_inl_h)

    R = jnp.where(use_h, Rsh[bh], Rsf[bf])
    t = jnp.where(use_h, tsh[bh], tsf[bf])
    X = jnp.where(use_h, Xh[bh], Xf[bf])
    good = jnp.where(use_h, goodh[bh], goodf[bf])
    success = jnp.where(use_h, ok_h, ok_f)
    return InitResult(success=success, R21=R, t21=t, points=X, good=good,
                      used_homography=use_h)
