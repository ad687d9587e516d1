"""Batched reprojection residuals and analytic Jacobians.

Device-kernel replacement for g2o's edge types
(`Thirdparty/g2o/g2o/types/types_six_dof_expmap.h:59-176`):
`EdgeSE3ProjectXYZ` (mono, 2D), `EdgeStereoSE3ProjectXYZ` (3D with u_R) and
their pose-only variants. Every edge is represented in the unified 3-component
form (u, v, u_R); monocular edges simply carry zero weight on the third
component, so mono and stereo batch into ONE kernel.

Pose tangent convention: left-multiplicative update exp(xi) * Tcw with
xi = (rho, phi) — matches `VertexSE3Expmap::oplusImpl` up to ordering.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera

CHI2_MONO = 5.991    # chi2(0.95, 2dof) — src/Optimizer.cc:507
CHI2_STEREO = 7.815  # chi2(0.95, 3dof) — src/Optimizer.cc:510


def project_residual(cam: Camera, Tcw, Xw, obs_uvr, is_stereo):
    """Residual e = obs - predicted, in unified (u, v, uR) form.

    Tcw: (...,4,4); Xw: (E,3); obs_uvr: (E,3); is_stereo: (E,) bool.
    Returns e: (E,3), pc: (E,3) camera-frame points, comp_w: (E,3)
    per-component weights (1,1,1) stereo / (1,1,0) mono.
    """
    pc = se3.apply(Tcw, Xw)
    z = jnp.maximum(pc[..., 2], 1e-9)
    inv_z = 1.0 / z
    u = cam.fx * pc[..., 0] * inv_z + cam.cx
    v = cam.fy * pc[..., 1] * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    pred = jnp.stack([u, v, ur], axis=-1)
    e = obs_uvr - pred
    comp_w = jnp.stack(
        [jnp.ones_like(z), jnp.ones_like(z), is_stereo.astype(z.dtype)], axis=-1
    )
    return e, pc, comp_w


def proj_jacobians(cam: Camera, pc):
    """d(pred)/d(pc): (E,3,3) for the unified (u,v,uR) prediction."""
    x, y = pc[..., 0], pc[..., 1]
    z = jnp.maximum(pc[..., 2], 1e-9)
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    zero = jnp.zeros_like(z)
    # u  = fx x/z + cx;  v = fy y/z + cy;  uR = u - bf/z
    du = jnp.stack([cam.fx * inv_z, zero, -cam.fx * x * inv_z2], axis=-1)
    dv = jnp.stack([zero, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    dur = du + jnp.stack([zero, zero, cam.bf * inv_z2], axis=-1)
    return jnp.stack([du, dv, dur], axis=-2)


def pose_point_jacobians(cam: Camera, Tcw, pc):
    """Jacobians of the residual e = obs - pred (note the minus sign).

    Returns J_pose: (E,3,6) wrt xi=(rho,phi) of the left-mult pose update,
    and J_point: (E,3,3) wrt the world point.
    """
    A = proj_jacobians(cam, pc)                     # d pred / d pc
    # d pc / d xi = [ I  -hat(pc) ]  (left-mult update: pc' = exp(xi) applied)
    H = se3.hat(pc)                                  # (E,3,3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), H.shape)
    dpc_dxi = jnp.concatenate([eye, -H], axis=-1)    # (E,3,6)
    J_pose = -jnp.einsum("...ij,...jk->...ik", A, dpc_dxi)
    R = se3.rotation(Tcw)
    J_point = -jnp.einsum("...ij,...jk->...ik", A, jnp.broadcast_to(R, H.shape))
    return J_pose, J_point


def edge_chi2(e, comp_w, inv_sigma2):
    """chi2 = e^T Omega e with Omega = inv_sigma2 * diag(comp_w)."""
    return inv_sigma2 * jnp.sum(e * e * comp_w, axis=-1)


def huber_weight(chi2, delta2):
    """rho'(chi2) for the Huber kernel with delta^2 = delta2: 1 inside,
    delta/sqrt(chi2) outside (g2o RobustKernelHuber linearization)."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
