"""DLT triangulation (`Initializer::Triangulate`, `src/Initializer.cc:1069-1124`),
batched over correspondences via one SVD of the stacked 4x4 systems."""
from __future__ import annotations

import jax.numpy as jnp


def triangulate(P1, P2, x1, x2):
    """P1, P2: (3,4) projection matrices; x1, x2: (...,2) pixel/normalized
    coords consistent with the Ps. Returns (...,3) world points.

    Rows of A: x*P[2]-P[0], y*P[2]-P[1] for each view; X = null(A).
    """
    a0 = x1[..., 0, None] * P1[2] - P1[0]
    a1 = x1[..., 1, None] * P1[2] - P1[1]
    a2 = x2[..., 0, None] * P2[2] - P2[0]
    a3 = x2[..., 1, None] * P2[2] - P2[1]
    A = jnp.stack([a0, a1, a2, a3], axis=-2)          # (...,4,4)
    # inhomogeneous DLT: solve A[:, :3] X = -A[:, 3] by 3x3 normal equations
    # (batched tiny SVDs are iterative and slow on TPU; scene points are at
    # finite depth so the w=1 chart is well-conditioned, and every consumer
    # re-gates by reprojection error anyway)
    M = A[..., :3]
    b = -A[..., 3]
    N = jnp.einsum("...ri,...rj->...ij", M, M)
    Mb = jnp.einsum("...ri,...r->...i", M, b)
    N = N + 1e-9 * jnp.eye(3, dtype=A.dtype)
    return jnp.linalg.solve(N, Mb[..., None])[..., 0]
