"""Sim(3) similarity transforms (rotation R, translation t, scale s).

Replaces g2o's `Sim3` type (reference `Thirdparty/g2o/g2o/types/sim3/sim3.h`)
used by loop closing and essential-graph optimization. Stored as a pytree of
arrays (R: (...,3,3), t: (...,3), s: (...,)), batched over leading axes.
Tangent: zeta = (rho(3), phi(3), sigma(1)) with exp per Strasdat's Sim3 map.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import se3


class Sim3(NamedTuple):
    R: jnp.ndarray  # (...,3,3)
    t: jnp.ndarray  # (...,3)
    s: jnp.ndarray  # (...,)

    @staticmethod
    def identity(dtype=jnp.float32):
        return Sim3(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype), jnp.ones((), dtype=dtype))

    @staticmethod
    def from_se3(T, s=None):
        R = se3.rotation(T)
        t = se3.translation(T)
        if s is None:
            s = jnp.ones(T.shape[:-2], dtype=T.dtype)
        return Sim3(R, t, s)

    def to_se3(self):
        """Project to SE3 the way LoopClosing does when writing corrected poses
        back to keyframes: R kept, translation divided by scale
        (reference `src/LoopClosing.cc:648-660`)."""
        return se3.make(self.R, self.t / self.s[..., None])


def compose(a: Sim3, b: Sim3) -> Sim3:
    """a * b : x -> s_a R_a (s_b R_b x + t_b) + t_a."""
    R = a.R @ b.R
    t = a.s[..., None] * jnp.einsum("...ij,...j->...i", a.R, b.t) + a.t
    return Sim3(R, t, a.s * b.s)


def inverse(g: Sim3) -> Sim3:
    Rt = jnp.swapaxes(g.R, -1, -2)
    s_inv = 1.0 / g.s
    t = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, g.t)
    return Sim3(Rt, t, s_inv)


def apply(g: Sim3, p):
    """Map points: s R p + t. p: (...,3)."""
    return g.s[..., None] * jnp.einsum("...ij,...j->...i", g.R, p) + g.t


def exp(zeta):
    """(...,7) = (rho, phi, sigma) -> Sim3. Matches Strasdat/g2o Sim3 exp
    (t = V rho with V = I_coef*I + W_coef*W + W2_coef*W^2; the four
    small/large sigma x theta cases follow Sophus' calcW, each written so the
    SELECTED branch is forward-mode-differentiation-safe at its limit)."""
    rho = zeta[..., :3]
    phi = zeta[..., 3:6]
    sigma = zeta[..., 6]
    s = jnp.exp(sigma)
    R = se3.so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    W = se3.hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=zeta.dtype), W.shape)

    eps = 1e-5
    sig_small = jnp.abs(sigma) < eps
    th_small = theta2 < eps * eps
    sigma_safe = jnp.where(sig_small, 1.0, sigma)
    theta2_safe = jnp.where(th_small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)          # only used in non-small branches

    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    a = s * sin_t
    b = s * cos_t
    c2 = theta2_safe + sigma_safe * sigma_safe

    I_coef = jnp.where(sig_small, 1.0, (s - 1.0) / sigma_safe)

    W_sig0 = jnp.where(th_small, 0.5 - theta2 / 24.0,
                       (1.0 - cos_t) / theta2_safe)
    W_sig = jnp.where(th_small,
                      ((sigma_safe - 1.0) * s + 1.0) / (sigma_safe * sigma_safe),
                      (a * sigma_safe + (1.0 - b) * theta) / (theta * c2))
    W_coef = jnp.where(sig_small, W_sig0, W_sig)

    W2_sig0 = jnp.where(th_small, 1.0 / 6.0 - theta2 / 120.0,
                        (theta - sin_t) / (theta2_safe * theta))
    W2_sig = jnp.where(
        th_small,
        ((0.5 * sigma_safe * sigma_safe - sigma_safe + 1.0) * s - 1.0)
        / (sigma_safe ** 3),
        (I_coef - ((b - 1.0) * sigma_safe + a * theta) / c2) / theta2_safe)
    W2_coef = jnp.where(sig_small, W2_sig0, W2_sig)

    V = I_coef[..., None, None] * I + W_coef[..., None, None] * W + \
        W2_coef[..., None, None] * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return Sim3(R, t, s)


def log(g: Sim3):
    """Sim3 -> (...,7) via a fixed-iteration numeric inverse of exp on the V system."""
    phi = se3.so3_log(g.R)
    sigma = jnp.log(g.s)
    # Solve V rho = t with the same V as in exp (V depends only on phi, sigma).
    zeta0 = jnp.concatenate([jnp.zeros_like(g.t), phi, sigma[..., None]], axis=-1)
    # Build V by calling exp with rho = e_i basis: V columns = t(exp with rho=e_i)
    eye = jnp.eye(3, dtype=g.t.dtype)
    cols = []
    for i in range(3):
        rho = jnp.broadcast_to(eye[i], g.t.shape)
        z = jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
        cols.append(exp(z).t)
    V = jnp.stack(cols, axis=-1)
    rho = jnp.linalg.solve(V, g.t[..., None])[..., 0]
    del zeta0
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
