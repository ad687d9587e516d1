"""Distributed global bundle adjustment over a device mesh.

The multi-chip story required by BASELINE.json (SURVEY §2.3 P7): the landmark
axis (points + their observations) is sharded across devices with
`shard_map`; every device Schur-reduces its own landmark blocks into a
partial reduced camera system, one `psum` over the mesh produces the full
6C x 6C system on every device, the dense solve is replicated (cheap), and
the landmark back-substitution stays fully local. Per LM iteration the only
communication is that single psum of (6C)^2 + 6C floats — it rides ICI, and
scales independently of the number of points.

The reference has no distributed mode at all (single process, g2o); this is
the from-scratch design the survey calls for, not a translation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry import se3
from ..solvers import reproj
from ..solvers.schur_ba import BAProblem, BAResult, _edge_terms


def _assemble_partial(cam, prob, poses, points, inv_sigma2, edge_mask, robust,
                      lam, axis_name: Optional[str]):
    """Local Schur reduction of this shard's landmarks; psum over axis_name
    yields the global reduced system."""
    C = poses.shape[0]
    Q, O = prob.obs_cam.shape
    e, Jp, Jl, comp_w, w, chi2, _ = _edge_terms(
        cam, prob, poses, points, inv_sigma2, edge_mask, robust)

    cw = comp_w * w[..., None]
    Hcc_e = jnp.einsum("qoci,qoc,qocj->qoij", Jp, cw, Jp)
    Hpp_e = jnp.einsum("qoci,qoc,qocj->qoij", Jl, cw, Jl)
    W_e = jnp.einsum("qoci,qoc,qocj->qoij", Jp, cw, Jl)
    bc_e = -jnp.einsum("qoci,qoc,qoc->qoi", Jp, cw, e)
    bp_e = -jnp.einsum("qoci,qoc,qoc->qoi", Jl, cw, e)

    ci = jnp.clip(prob.obs_cam, 0, C - 1)
    edge_on = edge_mask > 0
    # one-hot MXU contraction when it fits (see schur_ba._assemble)
    use_onehot = Q * O * C <= (1 << 26)
    if use_onehot:
        onehot = ((prob.obs_cam[:, :, None] ==
                   jnp.arange(C, dtype=jnp.int32)[None, None, :]) &
                  edge_on[:, :, None]).astype(jnp.float32)
        Hcc = jnp.einsum("qoc,qoij->cij", onehot, Hcc_e)
        bc = jnp.einsum("qoc,qoi->ci", onehot, bc_e)
    else:
        Hcc = jnp.zeros((C, 6, 6)).at[jnp.where(edge_on, ci, C)].add(
            Hcc_e, mode="drop")
        bc = jnp.zeros((C, 6)).at[jnp.where(edge_on, ci, C)].add(
            bc_e, mode="drop")

    Hpp = jnp.sum(Hpp_e, axis=1)
    Hpp_d = Hpp + lam * jnp.eye(3) * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1).max(-1), 1e-6)[:, None, None]
    pt_on = prob.pt_valid & (jnp.sum(edge_on, axis=1) > 0)
    Hpp_d = jnp.where(pt_on[:, None, None], Hpp_d, jnp.eye(3))
    from ..solvers.schur_ba import _inv3x3 as __inv3
    Hpp_inv = __inv3(Hpp_d)
    bp = jnp.sum(bp_e, axis=1)

    if use_onehot:
        Wd = jnp.einsum("qoc,qoij->qcij", onehot, W_e)
    else:
        Wd = jnp.zeros((Q, C, 6, 3)).at[
            jnp.arange(Q)[:, None], jnp.where(edge_on, ci, C)
        ].add(W_e, mode="drop")
    M = jnp.einsum("qcij,qjk->qcik", Wd, Hpp_inv)
    M2 = M.transpose(1, 2, 0, 3).reshape(C * 6, Q * 3)
    W2 = Wd.transpose(1, 2, 0, 3).reshape(C * 6, Q * 3)
    S_corr = M2 @ W2.T

    Hcc_d = Hcc + lam * jnp.eye(6) * jnp.maximum(
        jnp.diagonal(Hcc, axis1=-2, axis2=-1).max(-1), 1e-6)[:, None, None]
    idx = jnp.arange(C * 6).reshape(C, 6)
    Hcc_dense = jnp.zeros((C * 6, C * 6)).at[
        idx[:, :, None], idx[:, None, :]].set(Hcc_d)
    S = Hcc_dense - S_corr
    b_red = (bc - jnp.einsum("qcik,qk->ci", M, bp)).reshape(C * 6)
    err = jnp.sum(chi2 * edge_mask)

    if axis_name is not None:
        # ONE collective per iteration: the reduced camera system
        S = jax.lax.psum(S, axis_name)
        b_red = jax.lax.psum(b_red, axis_name)
        err = jax.lax.psum(err, axis_name)

    free = (prob.cam_valid & ~prob.cam_fixed)
    free6 = jnp.repeat(free, 6)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.where(free6, 0.0, 1.0) * jnp.eye(C * 6)
    b_red = jnp.where(free6, b_red, 0.0)

    dx_c = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S + 1e-8 * jnp.eye(C * 6), lower=True), b_red
    ).reshape(C, 6)
    dx_c = jnp.where(free[:, None], dx_c, 0.0)

    Wt_dx = jnp.einsum("qcij,ci->qj", Wd, dx_c)
    dx_p = jnp.einsum("qij,qj->qi", Hpp_inv, bp - Wt_dx)
    dx_p = jnp.where(pt_on[:, None], dx_p, 0.0)
    return dx_c, dx_p, err


def _chi2_total(cam, prob, poses, points, inv_sigma2, edge_mask, robust,
                axis_name):
    *_, chi2, _ = _edge_terms(cam, prob, poses, points, inv_sigma2,
                              edge_mask, robust)
    err = jnp.sum(chi2 * edge_mask)
    if axis_name is not None:
        err = jax.lax.psum(err, axis_name)
    return err


def _sharded_solve_body(cam, level_sigma2, n_iters, robust, axis_name, prob):
    """Runs inside shard_map: prob's point-axis arrays are the local shard,
    poses/cam masks replicated."""
    sigma2 = jnp.asarray(level_sigma2, jnp.float32)
    inv_sigma2 = 1.0 / sigma2[jnp.clip(prob.obs_level, 0, sigma2.shape[0] - 1)]
    base_mask = (prob.obs_cam >= 0) & prob.pt_valid[:, None] & \
        prob.cam_valid[jnp.clip(prob.obs_cam, 0, prob.poses.shape[0] - 1)]
    mask = base_mask.astype(jnp.float32)

    def body(_, carry):
        poses, points, lam = carry
        dx_c, dx_p, err = _assemble_partial(
            cam, prob, poses, points, inv_sigma2, mask, robust, lam, axis_name)
        poses_new = se3.retract(poses, dx_c)
        points_new = points + dx_p
        err_new = _chi2_total(cam, prob, poses_new, points_new, inv_sigma2,
                              mask, robust, axis_name)
        accept = err_new < err
        poses = jnp.where(accept, poses_new, poses)
        points = jnp.where(accept, points_new, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9),
                        jnp.minimum(lam * 5.0, 1e4))
        return poses, points, lam

    poses, points, _ = jax.lax.fori_loop(
        0, n_iters, body, (prob.poses, prob.points, jnp.float32(1e-4)))

    stereo = prob.obs_uvr[..., 2] >= 0
    delta2 = jnp.where(stereo, reproj.CHI2_STEREO, reproj.CHI2_MONO)
    e, _, _, _, _, chi2, depth_ok = _edge_terms(
        cam, prob, poses, points, inv_sigma2, mask, robust)
    inlier = base_mask & (chi2 <= delta2) & depth_ok
    return BAResult(poses=poses, points=points, edge_inlier=inlier, chi2=chi2)


def solve_global_ba_sharded(cam, prob: BAProblem, level_sigma2, mesh: Mesh,
                            n_iters: int = 10, robust: bool = False,
                            axis: str = "shard") -> BAResult:
    """Distributed GBA: point/observation axis sharded over `mesh`'s `axis`.

    Replaces `Optimizer::GlobalBundleAdjustemnt` (`src/Optimizer.cc:62-353`;
    the reference signature runs 10 non-robust iterations when triggered by
    loop closing, `src/LoopClosing.cc:884-888`). Q must be divisible by the
    mesh size."""
    shard = P(axis)
    repl = P()
    in_specs = BAProblem(
        poses=repl, cam_valid=repl, cam_fixed=repl,
        points=shard, pt_valid=shard, obs_cam=shard, obs_uvr=shard,
        obs_level=shard)
    out_specs = BAResult(poses=repl, points=shard, edge_inlier=shard,
                         chi2=shard)
    fn = functools.partial(_sharded_solve_body, cam, tuple(level_sigma2),
                           n_iters, robust, axis)
    solver = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(in_specs,),
                                   out_specs=out_specs))
    return solver(prob)
