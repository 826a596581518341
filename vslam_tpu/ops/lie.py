"""SE(3) / SO(3) Lie-group operations as batched JAX array programs.

Replaces the Eigen `TransformMatrix3D` arithmetic scattered through the
reference (e.g. manifold update + rotation re-orthonormalization in
src/aligners/stereouv_aligner.cpp:190-207, pose composition in
src/types/frame.cpp:41-59).  All functions are f32, shape-polymorphic over
leading batch dimensions via vmap-compatible formulations, and safe to
differentiate (Taylor fallbacks at the theta->0 singularities use
jnp.where-on-both-branches style guards).

Convention: a pose T is a (4, 4) homogeneous matrix mapping points from the
local frame to the parent frame.  Twists are (6,) = [v, w] (translation
first, rotation last), matching the reference's g2o ordering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric matrix."""
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


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta_sq: jnp.ndarray):
    """Numerically-safe A = sin(t)/t, B = (1-cos(t))/t^2, C = (t-sin(t))/t^3.

    The Taylor switch must be generous in f32: 1-cos(t) is exactly 0.0f for
    t < ~3e-4, so switching only below t^2=1e-8 produces 0/0 -> NaN.  At
    t^2 = 1e-4 the truncation error is O(t^4) ~ 1e-8 — below f32 eps.
    """
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    small = theta_sq < 1e-4
    theta_sq_safe = jnp.where(small, 1.0, theta_sq)  # avoid 0/0 in unused lane
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq_safe)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / (theta_sq_safe * theta),
    )
    return a, b, c


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle, (..., 3, 3) -> (..., 3).

    Uses the quaternion route for stability near theta = pi.
    """
    q = rot_to_quat(R)  # (w, x, y, z), w >= 0
    qw = q[..., 0]
    qv = q[..., 1:]
    n = jnp.linalg.norm(qv, axis=-1)
    # theta = 2*atan2(|qv|, qw); axis = qv/|qv|
    theta = 2.0 * jnp.arctan2(n, qw)
    scale = jnp.where(n < _EPS, 2.0 / jnp.maximum(qw, _EPS), theta / jnp.maximum(n, _EPS))
    return qv * scale[..., None]


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exponential: (..., 6) twist [v, w] -> (..., 4, 4) transform."""
    v, w = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, c = _sinc_coeffs(theta_sq)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * WW
    V = eye + b[..., None, None] * W + c[..., None, None] * WW
    t = jnp.einsum("...ij,...j->...i", V, v)
    return make_transform(R, t)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm: (..., 4, 4) -> (..., 6) twist [v, w]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^-1 = I - W/2 + coef * W^2, coef = (1 - A/(2B)) / theta^2.
    # Same f32 Taylor-threshold consideration as _sinc_coeffs: A/(2B) loses
    # all precision for theta^2 below ~1e-4.
    small = theta_sq < 1e-4
    b_safe = jnp.where(small, 0.5, b)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - a / (2.0 * b_safe)) / jnp.maximum(theta_sq, _EPS),
    )
    V_inv = eye - 0.5 * W + coef[..., None, None] * WW
    v = jnp.einsum("...ij,...j->...i", V_inv, t)
    return jnp.concatenate([v, w], axis=-1)


def make_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) from (..., 3, 3) rotation and (..., 3) translation."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse (no linear solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to batched points (..., 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", R, p) + t


def transform_point_cloud(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a single (4, 4) transform to an (N, 3) cloud."""
    return pts @ T[:3, :3].T + T[:3, 3]


def orthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation onto SO(3) (SVD; det +1 enforced).

    Reference counterpart: the hand-rolled Gram-Schmidt style fix in
    src/aligners/stereouv_aligner.cpp:200-206 after each manifold update.
    """
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    d = jnp.ones(R.shape[:-2] + (3,), dtype=R.dtype).at[..., 2].set(det)
    return (u * d[..., None, :]) @ vt


def orthonormalize_transform(T: jnp.ndarray) -> jnp.ndarray:
    return make_transform(orthonormalize(T[..., :3, :3]), T[..., :3, 3])


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z) with w >= 0.

    Branch-free Shepperd-style formulation (all four candidates computed,
    the numerically best selected with where) so it vmaps/jits cleanly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions, each scaled by 4*component^2 >= 0.
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    cand = jnp.stack(
        [
            jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4, 4): candidate i scaled by 2*sqrt(q_i^2)
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, axis=-1), axis=-2)[
        ..., 0, :
    ]
    denom = 2.0 * jnp.sqrt(jnp.maximum(jnp.take_along_axis(mags, best[..., None], axis=-1)[..., 0], _EPS))
    q = q / denom[..., None]
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = 2.0 / jnp.maximum(n, _EPS)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def adjoint_se3(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint: (..., 4, 4) -> (..., 6, 6) acting on [v, w] twists.

    Ad_T [v, w] = [R v + hat(t) R w, R w], so with translation-first twist
    ordering Ad = [[R, hat(t) R], [0, R]].  Satisfies
    T exp(xi) T^-1 = exp(Ad_T xi).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = hat(t) @ R
    zero = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([zero, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _jl_so3_coeffs(theta_sq: jnp.ndarray):
    """Coefficients for the SO(3) left Jacobian inverse:
    Jl(w)^-1 = I - W/2 + e * W^2 with e = 1/t^2 - (1+cos t)/(2 t sin t)."""
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    small = theta_sq < 1e-4
    ts = jnp.where(small, 1.0, theta_sq)
    t = jnp.sqrt(ts)
    e = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        1.0 / ts - (1.0 + jnp.cos(t)) / (2.0 * t * jnp.sin(t)),
    )
    return e


def jl_inv_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian of SO(3): (..., 3) -> (..., 3, 3)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    e = _jl_so3_coeffs(theta_sq)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + e[..., None, None] * (W @ W)


def _se3_Q(v: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Barfoot's Q matrix: the off-diagonal block of the SE(3) left
    Jacobian, Jl(xi) = [[Jl(w), Q(v,w)], [0, Jl(w)]] for xi = [v, w]
    (translation-first ordering; Barfoot, State Estimation, eq. 7.86)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    small = theta_sq < 1e-4
    ts = jnp.where(small, 1.0, theta_sq)
    t = jnp.sqrt(ts)
    st, ct = jnp.sin(t), jnp.cos(t)
    # c2 = (t - sin t)/t^3; c3 = (t^2 + 2 cos t - 2)/(2 t^4);
    # c4 = (t - sin t - t^3/6)/t^5.  Signs/coefficients validated against
    # jacfwd of log(exp(d) exp(xi)) to f32 roundoff at theta up to ~pi
    # (tests/test_lie.py).
    c2 = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (t - st) / (ts * t))
    c3 = jnp.where(
        small,
        1.0 / 24.0 - theta_sq / 720.0,
        (ts + 2.0 * ct - 2.0) / (2.0 * ts * ts),
    )
    c4 = jnp.where(
        small,
        -1.0 / 120.0 + theta_sq / 5040.0,
        (t - st - t * ts / 6.0) / (ts * ts * t),
    )
    coef4 = 0.5 * (c3 + 3.0 * c4)
    V = hat(v)
    W = hat(w)
    WV = W @ V
    VW = V @ W
    WVW = WV @ W
    Q = (
        0.5 * V
        + c2[..., None, None] * (WV + VW + W @ VW)
        + c3[..., None, None] * (W @ WV + VW @ W - 3.0 * WVW)
        + coef4[..., None, None] * (WVW @ W + W @ WVW)
    )
    return Q


def jl_inv_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian of SE(3): (..., 6) -> (..., 6, 6).

    Satisfies log(exp(delta) exp(xi)) ~= xi + Jl(xi)^-1 delta for small
    delta — the closed form that replaces jacfwd through log∘exp in the
    pose-graph edge linearization (VERDICT r3 #1a; the same lesson as the
    tracker's analytic-Jacobian fast path, solve/aligners.py).
    """
    v, w = xi[..., :3], xi[..., 3:]
    Jli = jl_inv_so3(w)
    Q = _se3_Q(v, w)
    upper_right = -Jli @ Q @ Jli
    zero = jnp.zeros_like(Jli)
    top = jnp.concatenate([Jli, upper_right], axis=-1)
    bot = jnp.concatenate([zero, Jli], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation angle in radians (used by the local-map trigger,
    reference src/types/world_map.cpp:108-111)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    c = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arccos(c)
