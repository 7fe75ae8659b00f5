"""SE(3) Lie-group operations in pure JAX.

Replaces the reference's lietorch CUDA extension (thirdparty/lietorch,
declared in reference .gitmodules:4-6) and the in-kernel C implementations
(reference src/lib/droid_kernels.cu:58-175 actSO3/actSE3/adjSE3/relSE3/
expSO3/expSE3 and droid_kernels.cu:877-895 retrSE3).

Conventions (identical to the reference so checkpoints/trajectories interop):
  * Pose storage layout is a 7-vector ``[tx, ty, tz, qx, qy, qz, qw]``
    (reference src/depth_video.py:55).
  * Poses map world -> camera; the relative transform used by the tracker is
    ``G_ij = T_j ∘ T_i^{-1}`` (reference src/geom/projective_ops.py:103).
  * Retraction is a LEFT update ``T <- exp(xi) ∘ T`` with the twist ordered
    ``xi = [tau(3), phi(3)]`` (reference droid_kernels.cu:877-895).

All functions broadcast over arbitrary leading batch dimensions and are
jit/vmap-safe (no data-dependent control flow; small-angle branches use
``jnp.where`` with Taylor fallbacks).
"""

import jax
import jax.numpy as jnp

# Identity pose 7-vector.
ID = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)

_EPS = 1e-8


def identity(shape=(), dtype=jnp.float32):
    """Identity pose(s) with given leading batch shape."""
    return jnp.broadcast_to(ID.astype(dtype), tuple(shape) + (7,))


# ---------------------------------------------------------------------------
# quaternion helpers (xyzw layout)
# ---------------------------------------------------------------------------

def quat_mul(q1, q2):
    """Hamilton product, xyzw layout: rot(q1*q2) = rot(q1) @ rot(q2)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_inv(q):
    """Conjugate (assumes unit quaternion)."""
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v by unit quaternion(s) q.

    Same algebra as reference droid_kernels.cu:58-69 (actSO3):
    v' = v + w*(2 u x v) + u x (2 u x v) with u = q.xyz.
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = 2.0 * jnp.cross(u, v)
    return v + w * uv + jnp.cross(u, uv)


def quat_to_matrix(q):
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_matrix(R):
    """Rotation matrix -> quaternion (xyzw), branchless Shepperd's method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _case0():  # w largest
        s = jnp.sqrt(jnp.maximum(tr + 1.0, _EPS)) * 2
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], -1)

    def _case1():  # x largest
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], -1)

    def _case2():  # y largest
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], -1)

    def _case3():  # z largest
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], -1)

    c0, c1, c2, c3 = _case0(), _case1(), _case2(), _case3()
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        (tr > 0.0)[..., None],
        c0,
        jnp.where(cond1[..., None], c1, jnp.where(cond2[..., None], c2, c3)),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# SE(3) group operations on 7-vectors
# ---------------------------------------------------------------------------

def mul(a, b):
    """Compose: (a ∘ b)(x) = a(b(x))."""
    t = a[..., :3] + quat_rotate(a[..., 3:7], b[..., :3])
    q = quat_mul(a[..., 3:7], b[..., 3:7])
    return jnp.concatenate([t, q], axis=-1)


def inv(a):
    qi = quat_inv(a[..., 3:7])
    t = -quat_rotate(qi, a[..., :3])
    return jnp.concatenate([t, qi], axis=-1)


def rel(pose_i, pose_j):
    """Relative transform G_ij = T_j ∘ T_i^{-1}.

    Maps points in camera-i coordinates to camera-j coordinates
    (reference droid_kernels.cu:96-108 relSE3 / projective_ops.py:103).
    """
    return mul(pose_j, inv(pose_i))


def act(pose, X):
    """Act on homogeneous points ``X=[x,y,z,h]``: [R x + h t, h].

    Matches reference droid_kernels.cu:70-77 (actSE3): the homogeneous weight
    multiplies the translation, which implements the inverse-depth
    parameterization (points stored as [x/z, y/z, 1, disp]).
    """
    v = quat_rotate(pose[..., 3:7], X[..., :3]) + X[..., 3:4] * pose[..., :3]
    return jnp.concatenate([v, X[..., 3:4]], axis=-1)


def act3(pose, X):
    """Act on ordinary 3D points."""
    return quat_rotate(pose[..., 3:7], X) + pose[..., :3]


def _so3_coeffs(theta_sq):
    """(imag, real) coefficients for quaternion exp, with Taylor fallback.

    Mirrors reference droid_kernels.cu:112-134 (expSO3).
    """
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    theta_p4 = theta_sq * theta_sq
    small = theta_sq < 1e-8
    # Guard against 0/0 in the non-taken branch.
    safe_theta = jnp.where(small, 1.0, theta)
    imag = jnp.where(
        small,
        0.5 - theta_sq / 48.0 + theta_p4 / 3840.0,
        jnp.sin(0.5 * safe_theta) / safe_theta,
    )
    real = jnp.where(
        small,
        1.0 - theta_sq / 8.0 + theta_p4 / 384.0,
        jnp.cos(0.5 * safe_theta),
    )
    return imag, real


def exp_so3(phi):
    """so(3) -> unit quaternion (xyzw)."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    imag, real = _so3_coeffs(theta_sq)
    return jnp.concatenate([imag * phi, real], axis=-1)


def exp(xi):
    """se(3) -> SE(3): xi = [tau, phi] -> 7-vector pose.

    t = V(phi) tau with V = I + a*[phi]x + b*[phi]x^2,
    a = (1-cos θ)/θ², b = (θ-sin θ)/θ³ (reference droid_kernels.cu:148-175).
    """
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = exp_so3(phi)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    small = theta_sq < 1e-8
    safe_sq = jnp.where(small, 1.0, theta_sq)
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / safe_sq)
    b = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / (safe_sq * jnp.where(small, 1.0, theta)),
    )
    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    t = tau + a * c1 + b * c2
    return jnp.concatenate([t, q], axis=-1)


def log_so3(q):
    """Unit quaternion -> so(3)."""
    u = q[..., :3]
    w = q[..., 3:4]
    # Make w >= 0 for a unique principal log.
    sign = jnp.where(w < 0, -1.0, 1.0)
    u, w = u * sign, w * sign
    norm_u = jnp.linalg.norm(u, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(norm_u[..., 0], w[..., 0])[..., None]
    small = norm_u < 1e-8
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / jnp.where(small, 1.0, norm_u))
    return scale * u


def log(pose):
    """SE(3) -> se(3) twist [tau, phi] such that exp(log(T)) = T."""
    phi = log_so3(pose[..., 3:7])
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    small = theta_sq < 1e-8
    safe_sq = jnp.where(small, 1.0, theta_sq)
    # V^{-1} = I - 1/2 [phi]x + e [phi]x^2, e = 1/θ² - (1+cos θ)/(2 θ sin θ)
    half_theta = 0.5 * theta
    cot = jnp.where(
        small, 0.0, jnp.cos(half_theta) / jnp.where(small, 1.0, jnp.sin(half_theta))
    )
    e = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0, (1.0 - half_theta * cot) / safe_sq)
    t = pose[..., :3]
    c1 = jnp.cross(phi, t)
    c2 = jnp.cross(phi, c1)
    tau = t - 0.5 * c1 + e * c2
    return jnp.concatenate([tau, phi], axis=-1)


def retr(pose, xi):
    """Left retraction T <- exp(xi) ∘ T (reference droid_kernels.cu:877-895)."""
    return mul(exp(xi), pose)


def adjT(pose, X):
    """Dual adjoint action on row covectors, Ad_G^T X.

    X = [Xv(3), Xw(3)] (translation part, rotation part). Matches reference
    droid_kernels.cu:80-94 (adjSE3, whose ``u`` is Xv x t = -(t x Xv)):
      Y_v = R^T Xv ;  Y_w = R^T (Xw - t x Xv).
    This is Ad_G^T for Ad_G = [[R, [t]x R], [0, R]] (left-perturbation
    convention). Used to map a pose-j Jacobian into a pose-i Jacobian:
    Ji = -adjT(G_ij, Jj) (reference projective_ops.py:117-118).
    """
    t, q = pose[..., :3], pose[..., 3:7]
    qi = quat_inv(q)
    Xv, Xw = X[..., :3], X[..., 3:6]
    Yv = quat_rotate(qi, Xv)
    Yw = quat_rotate(qi, Xw - jnp.cross(t, Xv))
    return jnp.concatenate([Yv, Yw], axis=-1)


def to_matrix(pose):
    """7-vector -> 4x4 homogeneous matrix."""
    R = quat_to_matrix(pose[..., 3:7])
    t = pose[..., :3]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), pose.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(T):
    """4x4 homogeneous matrix -> 7-vector."""
    q = quat_from_matrix(T[..., :3, :3])
    return jnp.concatenate([T[..., :3, 3], q], axis=-1)


def normalize(pose):
    """Re-normalize the quaternion part."""
    q = pose[..., 3:7]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    return jnp.concatenate([pose[..., :3], q], axis=-1)


def interp(pose_a, pose_b, alpha):
    """Geodesic interpolation T(alpha) = exp(alpha * log(Tb ∘ Ta^{-1})) ∘ Ta.

    Used to seed non-keyframe poses between bracketing keyframes
    (reference src/trajectory_filler.py:56-60).
    """
    d = log(mul(pose_b, inv(pose_a)))
    return mul(exp(alpha * d), pose_a)


def scale_translation(pose, s):
    """Rescale the translation part (monocular gauge fixes,
    reference depth_video.py:146-153 normalize)."""
    return jnp.concatenate([pose[..., :3] * s, pose[..., 3:7]], axis=-1)
