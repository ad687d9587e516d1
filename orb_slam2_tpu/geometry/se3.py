"""SE(3) rigid transforms as JAX arrays.

TPU-native replacement for the reference's pose machinery (cv::Mat 4x4 in
`Frame::SetPose` / `KeyFrame` plus g2o's `SE3Quat`, see reference
`src/Frame.cc:430-466`, `Thirdparty/g2o/g2o/types/se3quat.h:41`). Poses are
stored as (..., 4, 4) homogeneous matrices in float32/float64; the tangent space
uses the g2o convention xi = (omega, upsilon) -> here we use (rho, phi) ordering
(translation first) documented per-function. All ops are batched: leading axes
broadcast, so a whole keyframe set is one array.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def hat(w):
    """so(3) hat operator: (...,3) -> (...,3,3) skew matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w):
    """Rodrigues: (...,3) axis-angle -> (...,3,3) rotation."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    # Taylor-safe coefficients: A=sin(t)/t, B=(1-cos(t))/t^2
    small = theta2 < 1e-12
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_log(R):
    """(...,3,3) rotation -> (...,3) axis-angle.

    Written to be forward-mode-differentiation-safe at the identity (the
    pose-graph optimizer linearizes log at residual == 0): the small-angle
    branch only touches polynomial functions of sin^2(theta), never
    sqrt/arccos at their singular points.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # vee of the antisymmetric part: v = 2 sin(theta) * axis
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    s2 = 0.25 * jnp.sum(v * v, axis=-1)      # sin^2(theta), tangent-clean
    small = s2 < 1e-10
    sin_t = jnp.sqrt(jnp.where(small, 1.0, s2))
    theta = jnp.arctan2(sin_t, cos_t)
    scale_generic = theta / (2.0 * sin_t)
    scale_small = 0.5 + s2 / 12.0            # theta ~ 0 Taylor in sin^2
    w = jnp.where(small, scale_small, scale_generic)[..., None] * v
    # theta ~= pi: |v| ~ 0 but the rotation is large -> diagonal formula
    near_pi = cos_t < -0.999999
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    one_m_c = jnp.where(jnp.abs(1.0 - cos_t) < _EPS, 1.0, 1.0 - cos_t)
    axis = jnp.sqrt(jnp.maximum((diag - cos_t[..., None]) / one_m_c[..., None], 1e-12))
    s0 = R[..., 2, 1] - R[..., 1, 2]
    s1 = R[..., 0, 2] - R[..., 2, 0]
    s2o = R[..., 1, 0] - R[..., 0, 1]
    sgn = jnp.stack([jnp.where(s0 >= 0, 1.0, -1.0), jnp.where(s1 >= 0, 1.0, -1.0), jnp.where(s2o >= 0, 1.0, -1.0)], axis=-1)
    w_pi = axis * sgn * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def make(R, t):
    """Build (...,4,4) from (...,3,3) rotation and (...,3) translation."""
    shape = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, shape + (3, 3))
    t = jnp.broadcast_to(t, shape + (3,))
    T = jnp.zeros(shape + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def rotation(T):
    return T[..., :3, :3]


def translation(T):
    return T[..., :3, 3]


def inverse(T):
    """Closed-form SE3 inverse (replaces cv::Mat::inv on poses)."""
    R = rotation(T)
    t = translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return make(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(A, B):
    return A @ B


def orthonormalize(T):
    """Project the rotation block onto SO(3) (nearest rotation, two Newton
    iterations of R <- R(3I - R^T R)/2) and pin the homogeneous row.

    Long f32 pose chains (pipelined tracking: predict -> optimize -> chain,
    never leaving the device) accumulate non-orthogonality that the
    transpose-form `inverse` then amplifies as e_{i+1} = 2 e_i + e_{i-1}
    — growth rate 1 + sqrt(2) per frame, measured exactly on the stream
    before this projection was added. A true matrix inverse (the host path's
    np.linalg.inv) hides the drift; on-device chains must re-project."""
    R = rotation(T)
    I = jnp.eye(3, dtype=T.dtype)
    for _ in range(2):
        R = R @ (1.5 * I - 0.5 * jnp.swapaxes(R, -1, -2) @ R)
    return make(R, translation(T))


def apply(T, p):
    """Transform points: (...,4,4) x (...,3) -> (...,3)."""
    return jnp.einsum("...ij,...j->...i", rotation(T), p) + translation(T)


def exp(xi):
    """se(3) exp. xi = (...,6) with xi[:3]=rho (translation part), xi[3:]=phi (rotation).

    Matches g2o SE3Quat::exp up to the (rho, phi) ordering used here.
    """
    rho = xi[..., :3]
    phi = xi[..., 3:]
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta2 < 1e-12
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta2 * theta))
    W = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = I + B[..., None, None] * W + C[..., None, None] * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return make(R, t)


def log(T):
    """SE3 log -> (...,6) (rho, phi)."""
    phi = so3_log(rotation(T))
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    W = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    small = theta2 < 1e-12
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    coef = jnp.where(small, 1.0 / 12.0, (1.0 - A / (2.0 * B)) / jnp.where(small, 1.0, theta2))
    Vinv = I - 0.5 * W + coef[..., None, None] * (W @ W)
    rho = jnp.einsum("...ij,...j->...i", Vinv, translation(T))
    return jnp.concatenate([rho, phi], axis=-1)


def retract(T, xi):
    """Left-multiplicative update exp(xi) * T (g2o VertexSE3Expmap::oplusImpl order)."""
    return compose(exp(xi), T)


def to_quat(R):
    """(...,3,3) -> (...,4) quaternion (x, y, z, w) — TUM trajectory convention."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, _EPS)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], axis=-1)

    def case_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], axis=-1)

    def case_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], axis=-1)

    def case_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], axis=-1)

    qw, qx, qy, qz = case_w(), case_x(), case_y(), case_z()
    use_w = tr > 0
    use_x = (~use_w) & (m00 >= m11) & (m00 >= m22)
    use_y = (~use_w) & (~use_x) & (m11 >= m22)
    q = jnp.where(use_w[..., None], qw, jnp.where(use_x[..., None], qx, jnp.where(use_y[..., None], qy, qz)))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_quat(q):
    """(...,4) quaternion (x,y,z,w) -> (...,3,3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
