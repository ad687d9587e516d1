"""Distributed Sim3 pose-graph (essential graph) optimization over a mesh.

The second half of BASELINE.json's multi-chip story: loop closure's
essential-graph solve executed as a sharded pose-graph optimization. The
EDGE axis is sharded with `shard_map` — each device computes residuals and
Jacobians for its own edge shard (the expensive vmapped autodiff through
Sim3 exp/compose/log) and scatter-adds them into a local (7K x 7K) normal
system; ONE `psum` per Gauss-Newton iteration produces the global system on
every device, and the dense Cholesky solve is replicated (7K is small —
3.5k x 3.5k at the 512-KF capacity, a single MXU-friendly solve).

The reference has no distributed mode (`Optimizer::OptimizeEssentialGraph`,
`src/Optimizer.cc:1069-1404`, is a single-threaded g2o solve); this is the
from-scratch TPU design, sharing the edge-term math with the single-device
solver in solvers/pose_graph.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry import sim3
from ..geometry.sim3 import Sim3
from ..solvers.pose_graph import PoseGraphProblem, _edge_terms


def _sharded_body(n_iters: int, fix_scale: bool, axis_name: str,
                  prob: PoseGraphProblem) -> Sim3:
    """Runs inside shard_map: edge arrays are the local shard, nodes
    replicated. Mirrors pose_graph._solve_iteration with a psum after the
    local assembly."""
    K = prob.node_valid.shape[0]
    free = prob.node_valid & ~prob.node_fixed
    free7 = jnp.repeat(free, 7)
    if fix_scale:
        scale_coord = jnp.tile(jnp.arange(7) == 6, (K,))
        free7 = free7 & ~scale_coord

    def assemble(nodes, lam):
        r, Ji, Jj = _edge_terms(prob, nodes)
        w = prob.edge_valid.astype(jnp.float32)
        ei = jnp.clip(prob.edge_i, 0, K - 1)
        ej = jnp.clip(prob.edge_j, 0, K - 1)
        on = prob.edge_valid
        Hii = jnp.einsum("eai,eaj,e->eij", Ji, Ji, w)
        Hjj = jnp.einsum("eai,eaj,e->eij", Jj, Jj, w)
        Hij = jnp.einsum("eai,eaj,e->eij", Ji, Jj, w)
        bi = -jnp.einsum("eai,ea,e->ei", Ji, r, w)
        bj = -jnp.einsum("eai,ea,e->ei", Jj, r, w)

        H = jnp.zeros((K, 7, K, 7))
        b = jnp.zeros((K, 7))
        drop_i = jnp.where(on, ei, K)
        drop_j = jnp.where(on, ej, K)
        H = H.at[drop_i, :, drop_i, :].add(Hii, mode="drop")
        H = H.at[drop_j, :, drop_j, :].add(Hjj, mode="drop")
        H = H.at[drop_i, :, drop_j, :].add(Hij, mode="drop")
        H = H.at[drop_j, :, drop_i, :].add(
            jnp.swapaxes(Hij, -1, -2), mode="drop")
        b = b.at[drop_i].add(bi, mode="drop")
        b = b.at[drop_j].add(bj, mode="drop")
        err = jnp.sum(r * r * w[:, None])

        # ONE collective per iteration: the assembled normal system
        H = jax.lax.psum(H, axis_name)
        b = jax.lax.psum(b, axis_name)
        err = jax.lax.psum(err, axis_name)

        Hd = H.reshape(K * 7, K * 7) + lam * jnp.eye(K * 7)
        Hd = jnp.where(free7[:, None] & free7[None, :], Hd, 0.0)
        Hd = Hd + jnp.where(free7, 0.0, 1.0) * jnp.eye(K * 7)
        bd = jnp.where(free7, b.reshape(-1), 0.0)
        dx = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Hd + 1e-8 * jnp.eye(K * 7),
                                        lower=True), bd).reshape(K, 7)
        dx = jnp.where(free[:, None], dx, 0.0)
        return dx, err

    def eval_err(nodes):
        r, _, _ = _edge_terms(prob, nodes)
        w = prob.edge_valid.astype(jnp.float32)
        return jax.lax.psum(jnp.sum(r * r * w[:, None]), axis_name)

    def body(_, carry):
        nodes, lam, cur_err = carry
        dx, _ = assemble(nodes, lam)
        nodes_new = sim3.compose(sim3.exp(dx), nodes)
        err_new = eval_err(nodes_new)
        accept = err_new < cur_err
        nodes = jax.tree.map(
            lambda a, b_: jnp.where(accept, a, b_), nodes_new, nodes)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-12),
                        jnp.minimum(lam * 10.0, 1e4))
        return nodes, lam, jnp.where(accept, err_new, cur_err)

    nodes, _, _ = jax.lax.fori_loop(
        0, n_iters, body,
        (prob.nodes, jnp.float32(1e-8), eval_err(prob.nodes)))
    return nodes


def optimize_pose_graph_sharded(prob: PoseGraphProblem, mesh: Mesh,
                                n_iters: int = 20, fix_scale: bool = False,
                                axis: str = "shard") -> Sim3:
    """Sharded essential-graph solve: edge axis over `mesh`'s `axis`.

    E (the padded edge count) must be divisible by the mesh size — the
    caller pads edges to a power of two (loop_closing._essential_graph).
    Returns the optimized Sim3 nodes, identical (up to fp reduction order)
    to solvers.pose_graph.optimize_pose_graph."""
    shard = P(axis)
    repl = P()
    in_specs = PoseGraphProblem(
        nodes=Sim3(repl, repl, repl), node_valid=repl, node_fixed=repl,
        edge_i=shard, edge_j=shard,
        edge_meas=Sim3(shard, shard, shard), edge_valid=shard)
    out_specs = Sim3(repl, repl, repl)
    fn = functools.partial(_sharded_body, n_iters, fix_scale, axis)
    solver = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(in_specs,),
                                   out_specs=out_specs))
    return solver(prob)
