"""Large-map bundle adjustment: PCG on the implicit Schur complement.

`schur_ba.solve_ba` materializes a dense (Q, C, 6, 3) landmark-to-camera
block tensor — ideal for local BA (small C), prohibitive for global BA at
K=512+/P=65536 (GBs). This solver never forms S = Hcc - W Hpp^-1 W^T:
preconditioned conjugate gradients runs on matvecs assembled from the
per-edge Jacobians (gather x at the edge's camera, push through
Jp^T.Omega.Jl, reduce per landmark through Hpp^-1, push back, scatter-add) —
the same structure Ceres' ITERATIVE_SCHUR uses, mapped to fixed-shape
einsums + segment-sums. Block-Jacobi (camera 6x6) preconditioning.

Sharding: the landmark/edge axis partitions cleanly; each matvec needs ONE
psum of a (C,6) vector over the mesh (axis_name), so the communication per
PCG iteration is tiny and independent of map size.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera
from . import reproj
from .schur_ba import BAProblem, BAResult, _edge_terms


def _precompute(cam, prob, poses, points, inv_sigma2, edge_mask, robust, lam):
    """Fixed per-LM-iteration tensors: Jacobians, weights, Hpp^-1, Hcc blocks,
    rhs pieces."""
    C = poses.shape[0]
    e, Jp, Jl, comp_w, w, chi2, _ = _edge_terms(
        cam, prob, poses, points, inv_sigma2, edge_mask, robust)
    cw = comp_w * w[..., None]                           # (Q,O,3)
    ci = jnp.clip(prob.obs_cam, 0, C - 1)
    edge_on = edge_mask > 0

    Hpp = jnp.einsum("qoci,qoc,qocj->qij", Jl, cw, Jl)
    Hpp_d = Hpp + lam * jnp.eye(3) * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1).max(-1), 1e-6)[:, None, None]
    pt_on = prob.pt_valid & (jnp.sum(edge_on, axis=1) > 0)
    Hpp_d = jnp.where(pt_on[:, None, None], Hpp_d, jnp.eye(3))
    from .schur_ba import _inv3x3 as __inv3
    Hpp_inv = __inv3(Hpp_d)

    Hcc_e = jnp.einsum("qoci,qoc,qocj->qoij", Jp, cw, Jp)
    Hcc = jnp.zeros((C, 6, 6)).at[jnp.where(edge_on, ci, C)].add(
        Hcc_e, mode="drop")
    Hcc_d = Hcc + lam * jnp.eye(6) * jnp.maximum(
        jnp.diagonal(Hcc, axis1=-2, axis2=-1).max(-1), 1e-6)[:, None, None]

    bc = jnp.zeros((C, 6)).at[jnp.where(edge_on, ci, C)].add(
        -jnp.einsum("qoci,qoc,qoc->qoi", Jp, cw, e), mode="drop")
    bp = -jnp.einsum("qoci,qoc,qoc->qi", Jl, cw, e)

    err = jnp.sum(chi2 * edge_mask)
    return dict(Jp=Jp, Jl=Jl, cw=cw, ci=ci, edge_on=edge_on,
                Hpp_inv=Hpp_inv, Hcc_d=Hcc_d, bc=bc, bp=bp, pt_on=pt_on,
                err=err)


def _schur_matvec(pre, x, free, axis_name):
    """y = S x with S = Hcc_d - W Hpp^-1 W^T, implicit. x: (C,6)."""
    C = x.shape[0]
    x = jnp.where(free[:, None], x, 0.0)
    xe = x[pre["ci"]]                                     # (Q,O,6)
    # v_q = sum_o W_{qo}^T x = sum_o Jl^T.Omega.Jp x
    Jp_x = jnp.einsum("qocj,qoj->qoc", pre["Jp"], xe)     # (Q,O,3 comp)
    v = jnp.einsum("qoci,qoc->qi", pre["Jl"], pre["cw"] * Jp_x)
    u = jnp.einsum("qij,qj->qi", pre["Hpp_inv"], v)       # (Q,3)
    # y_e = W u: Jp^T.Omega.Jl u ; scatter per camera
    Jl_u = jnp.einsum("qoci,qi->qoc", pre["Jl"], u)
    ye = jnp.einsum("qocj,qoc->qoj", pre["Jp"], pre["cw"] * Jl_u)  # (Q,O,6)
    corr = jnp.zeros((C, 6)).at[
        jnp.where(pre["edge_on"], pre["ci"], C)].add(ye, mode="drop")
    hx = jnp.einsum("cij,cj->ci", pre["Hcc_d"], x)
    y = hx - corr
    if axis_name is not None:
        y = jax.lax.psum(y, axis_name)
    return jnp.where(free[:, None], y, 0.0)


def _reduced_rhs(pre, free, axis_name):
    """b_red = bc - W Hpp^-1 bp."""
    C = pre["bc"].shape[0]
    u = jnp.einsum("qij,qj->qi", pre["Hpp_inv"], pre["bp"])
    Jl_u = jnp.einsum("qoci,qi->qoc", pre["Jl"], u)
    ye = jnp.einsum("qocj,qoc->qoj", pre["Jp"], pre["cw"] * Jl_u)
    corr = jnp.zeros((C, 6)).at[
        jnp.where(pre["edge_on"], pre["ci"], C)].add(ye, mode="drop")
    b = pre["bc"] - corr
    if axis_name is not None:
        b = jax.lax.psum(b, axis_name)
    return jnp.where(free[:, None], b, 0.0)


def _pcg(pre, b, free, n_iters, axis_name):
    """Block-Jacobi preconditioned CG on the reduced camera system."""
    # preconditioner: inverse of the (psum'd) camera diagonal blocks
    M = pre["Hcc_d"]
    if axis_name is not None:
        M = jax.lax.psum(M, axis_name)
    M = jnp.where(free[:, None, None], M, jnp.eye(6))
    Minv = jnp.linalg.inv(M + 1e-8 * jnp.eye(6))

    def apply_M(r):
        return jnp.einsum("cij,cj->ci", Minv, r)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def body(_, carry):
        x, r, p, rz = carry
        Ap = _schur_matvec(pre, p, free, axis_name)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        p = z + beta * p
        return x, r, p, rz_new

    x, r, _, _ = jax.lax.fori_loop(0, n_iters, body, (x0, r0, p0, rz0))
    return x


def _step(cam, prob, poses, points, inv_sigma2, mask, robust, lam, free,
          cg_iters, axis_name):
    pre = _precompute(cam, prob, poses, points, inv_sigma2, mask, robust, lam)
    b = _reduced_rhs(pre, free, axis_name)
    dx_c = _pcg(pre, b, free, cg_iters, axis_name)
    # back-substitute landmarks
    xe = dx_c[pre["ci"]]
    Jp_x = jnp.einsum("qocj,qoj->qoc", pre["Jp"], xe)
    v = jnp.einsum("qoci,qoc->qi", pre["Jl"], pre["cw"] * Jp_x)
    dx_p = jnp.einsum("qij,qj->qi", pre["Hpp_inv"], pre["bp"] - v)
    dx_p = jnp.where(pre["pt_on"][:, None], dx_p, 0.0)
    return dx_c, dx_p, pre["err"]


def _chi2_only(cam, prob, poses, points, inv_sigma2, mask, robust, axis_name):
    *_, chi2, _ = _edge_terms(cam, prob, poses, points, inv_sigma2, mask, robust)
    err = jnp.sum(chi2 * mask)
    if axis_name is not None:
        err = jax.lax.psum(err, axis_name)
    return err


def solve_body(cam, level_sigma2, n_iters, cg_iters, robust, axis_name, prob):
    """LM loop (shard_map-compatible body; axis_name=None -> single device)."""
    sigma2 = jnp.asarray(level_sigma2, jnp.float32)
    inv_sigma2 = 1.0 / sigma2[jnp.clip(prob.obs_level, 0, sigma2.shape[0] - 1)]
    base_mask = (prob.obs_cam >= 0) & prob.pt_valid[:, None] & \
        prob.cam_valid[jnp.clip(prob.obs_cam, 0, prob.poses.shape[0] - 1)]
    mask = base_mask.astype(jnp.float32)
    free = prob.cam_valid & ~prob.cam_fixed

    def body(_, carry):
        poses, points, lam = carry
        dx_c, dx_p, err = _step(cam, prob, poses, points, inv_sigma2, mask,
                                robust, lam, free, cg_iters, axis_name)
        poses_new = se3.retract(poses, dx_c)
        points_new = points + dx_p
        err_new = _chi2_only(cam, prob, poses_new, points_new, inv_sigma2,
                             mask, robust, axis_name)
        accept = err_new < err
        poses = jnp.where(accept, poses_new, poses)
        points = jnp.where(accept, points_new, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9),
                        jnp.minimum(lam * 5.0, 1e4))
        return poses, points, lam

    init_poses = prob.poses
    init_lam = jnp.float32(1e-4)
    if axis_name is not None:
        # replicated inputs must be marked varying to match the psum'd outputs
        init_poses = jax.lax.pvary(init_poses, axis_name)
        init_lam = jax.lax.pvary(init_lam, axis_name)
    poses, points, _ = jax.lax.fori_loop(
        0, n_iters, body, (init_poses, prob.points, init_lam))

    stereo = prob.obs_uvr[..., 2] >= 0
    delta2 = jnp.where(stereo, reproj.CHI2_STEREO, reproj.CHI2_MONO)
    e, _, _, _, _, chi2, depth_ok = _edge_terms(
        cam, prob, poses, points, inv_sigma2, mask, robust)
    inlier = base_mask & (chi2 <= delta2) & depth_ok
    return BAResult(poses=poses, points=points, edge_inlier=inlier, chi2=chi2)


@functools.partial(jax.jit, static_argnames=("n_iters", "cg_iters", "robust"))
def solve_ba_pcg(cam: Camera, prob: BAProblem, level_sigma2,
                 n_iters: int = 10, cg_iters: int = 50,
                 robust: bool = False) -> BAResult:
    return solve_body(cam, tuple(level_sigma2), n_iters, cg_iters, robust,
                      None, prob)


def solve_ba_pcg_sharded(cam, prob: BAProblem, level_sigma2, mesh,
                         n_iters: int = 10, cg_iters: int = 50,
                         robust: bool = False, axis: str = "shard") -> BAResult:
    """Landmark-sharded PCG GBA: per-matvec communication is one (C,6) psum."""
    from jax.sharding import PartitionSpec as P

    shard = P(axis)
    repl = P()
    in_specs = BAProblem(poses=repl, cam_valid=repl, cam_fixed=repl,
                         points=shard, pt_valid=shard, obs_cam=shard,
                         obs_uvr=shard, obs_level=shard)
    out_specs = BAResult(poses=repl, points=shard, edge_inlier=shard,
                         chi2=shard)
    fn = functools.partial(solve_body, cam, tuple(level_sigma2), n_iters,
                           cg_iters, robust, axis)
    # check_vma=False: poses/err are psum-reduced (identical on every shard)
    # but the static checker can't infer replication through the LM loop
    solver = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(in_specs,),
                                   out_specs=out_specs, check_vma=False))
    return solver(prob)
