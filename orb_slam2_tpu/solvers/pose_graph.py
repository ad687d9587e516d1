"""Sim3 pose-graph optimization (essential graph).

Replaces `Optimizer::OptimizeEssentialGraph` (`src/Optimizer.cc:1069-1404`)
and g2o's `VertexSim3Expmap`/`EdgeSim3`: nodes are Sim3 world-to-camera
transforms (7-dof mono, scale frozen for stereo/RGBD), edges carry relative
Sim3 measurements with identity information. Residual r = log(Sji_meas^-1 *
Sjw * Siw^-1); Jacobians come from vmapped forward-mode autodiff through the
Sim3 exp/compose/log chain (the g2o fork hand-codes none either — it uses
numeric differentiation for EdgeSim3); the normal system is assembled dense
(7K x 7K) and solved by Cholesky — at the reference's keyframe counts this
is a single small MXU-friendly solve per iteration.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3
from ..geometry.sim3 import Sim3


class PoseGraphProblem(NamedTuple):
    nodes: Sim3              # (K,...) Siw per keyframe
    node_valid: jnp.ndarray  # (K,)
    node_fixed: jnp.ndarray  # (K,) — the loop keyframe
    edge_i: jnp.ndarray      # (E,)
    edge_j: jnp.ndarray      # (E,)
    edge_meas: Sim3          # (E,...) Sji = Sjw * Siw^-1 measurements
    edge_valid: jnp.ndarray  # (E,)


def _edge_residual(zeta_i, zeta_j, Si, Sj, meas_inv):
    """r = log(meas^-1 * exp(zeta_j) Sj * (exp(zeta_i) Si)^-1) : (7,)."""
    Si_new = sim3.compose(sim3.exp(zeta_i), Si)
    Sj_new = sim3.compose(sim3.exp(zeta_j), Sj)
    rel = sim3.compose(Sj_new, sim3.inverse(Si_new))
    return sim3.log(sim3.compose(meas_inv, rel))


def _edge_terms(prob: PoseGraphProblem, nodes: Sim3):
    K = prob.node_valid.shape[0]
    Si = jax.tree.map(lambda x: x[jnp.clip(prob.edge_i, 0, K - 1)], nodes)
    Sj = jax.tree.map(lambda x: x[jnp.clip(prob.edge_j, 0, K - 1)], nodes)
    meas_inv = sim3.inverse(prob.edge_meas)
    z0 = jnp.zeros(7)

    def one(si_R, si_t, si_s, sj_R, sj_t, sj_s, mi_R, mi_t, mi_s):
        si = Sim3(si_R, si_t, si_s)
        sj = Sim3(sj_R, sj_t, sj_s)
        mi = Sim3(mi_R, mi_t, mi_s)
        r = _edge_residual(z0, z0, si, sj, mi)
        Ji = jax.jacfwd(lambda z: _edge_residual(z, z0, si, sj, mi))(z0)
        Jj = jax.jacfwd(lambda z: _edge_residual(z0, z, si, sj, mi))(z0)
        return r, Ji, Jj

    r, Ji, Jj = jax.vmap(one)(Si.R, Si.t, Si.s, Sj.R, Sj.t, Sj.s,
                              meas_inv.R, meas_inv.t, meas_inv.s)
    return r, Ji, Jj


def _solve_iteration(prob, nodes, lam, fix_scale: bool):
    K = prob.node_valid.shape[0]
    r, Ji, Jj = _edge_terms(prob, nodes)
    w = prob.edge_valid.astype(jnp.float32)

    H = jnp.zeros((K, 7, K, 7))
    b = jnp.zeros((K, 7))
    ei = jnp.clip(prob.edge_i, 0, K - 1)
    ej = jnp.clip(prob.edge_j, 0, K - 1)
    on = prob.edge_valid
    Hii = jnp.einsum("eai,eaj,e->eij", Ji, Ji, w)
    Hjj = jnp.einsum("eai,eaj,e->eij", Jj, Jj, w)
    Hij = jnp.einsum("eai,eaj,e->eij", Ji, Jj, w)
    bi = -jnp.einsum("eai,ea,e->ei", Ji, r, w)
    bj = -jnp.einsum("eai,ea,e->ei", Jj, r, w)

    drop_i = jnp.where(on, ei, K)
    drop_j = jnp.where(on, ej, K)
    H = H.at[drop_i, :, drop_i, :].add(Hii, mode="drop")
    H = H.at[drop_j, :, drop_j, :].add(Hjj, mode="drop")
    H = H.at[drop_i, :, drop_j, :].add(Hij, mode="drop")
    H = H.at[drop_j, :, drop_i, :].add(jnp.swapaxes(Hij, -1, -2), mode="drop")
    b = b.at[drop_i].add(bi, mode="drop")
    b = b.at[drop_j].add(bj, mode="drop")

    free = prob.node_valid & ~prob.node_fixed
    free7 = jnp.repeat(free, 7)
    if fix_scale:
        # freeze the sigma coordinate of every node (stereo/RGBD 6-dof case)
        scale_coord = jnp.tile(jnp.arange(7) == 6, (K,))
        free7 = free7 & ~scale_coord
    Hd = H.reshape(K * 7, K * 7)
    Hd = Hd + lam * jnp.eye(K * 7)
    Hd = jnp.where(free7[:, None] & free7[None, :], Hd, 0.0)
    Hd = Hd + jnp.where(free7, 0.0, 1.0) * jnp.eye(K * 7)
    bd = jnp.where(free7, b.reshape(-1), 0.0)

    dx = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(Hd + 1e-8 * jnp.eye(K * 7), lower=True), bd
    ).reshape(K, 7)
    dx = jnp.where(free[:, None], dx, 0.0)
    upd = sim3.exp(dx)
    nodes_new = sim3.compose(upd, nodes)
    err = jnp.sum(r * r * w[:, None])
    return nodes_new, err


@functools.partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def optimize_pose_graph(prob: PoseGraphProblem, n_iters: int = 20,
                        fix_scale: bool = False) -> Sim3:
    """Gauss-Newton with tiny damping (the reference sets lambda_init=1e-16,
    `src/Optimizer.cc:1084`), 20 iterations."""

    w = prob.edge_valid.astype(jnp.float32)

    def eval_err(nodes):
        r, _, _ = _edge_terms(prob, nodes)
        return jnp.sum(r * r * w[:, None])

    def body(_, carry):
        nodes, lam, cur_err = carry
        nodes_new, _ = _solve_iteration(prob, nodes, lam, fix_scale)
        err_new = eval_err(nodes_new)
        accept = err_new < cur_err
        nodes = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), nodes_new, nodes)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-12),
                        jnp.minimum(lam * 10.0, 1e4))
        return nodes, lam, jnp.where(accept, err_new, cur_err)

    nodes, _, _ = jax.lax.fori_loop(
        0, n_iters, body, (prob.nodes, jnp.float32(1e-8), eval_err(prob.nodes)))
    return nodes
