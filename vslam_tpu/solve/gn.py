"""The generic robust Gauss-Newton engine.

One engine, instantiated four ways (SURVEY.md §7.1), collapsing the
reference's aligner class hierarchy (src/aligners/base_aligner.h:7-106 and
its four subclasses) plus the per-landmark refinement
(src/types/landmark.cpp:66-167) into a single functional component:

    x* = argmin_x  sum_i  rho( r_i(x)^T Omega_i r_i(x) )

- residuals are vmapped over measurements (the reference's serial
  per-point `linearize` loops become one batched Jacobian evaluation);
- H = J^T Omega J and b = J^T Omega r are einsum reductions (MXU-shaped);
- the robust kernel is the reference's error-clamping reweighting
  (omega *= kernel/chi2 beyond the threshold, stereouv_aligner.cpp:127-134);
- iteration runs under lax.while_loop with damping, so the whole solve is
  one XLA program with no host round-trips.

State updates are pluggable (manifold retraction for SE(3), plain addition
for Euclidean landmark positions).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from vslam_tpu.ops import lie


class GNConfig(NamedTuple):
    """Mirrors reference AlignerParameters (src/types/parameters.h:66-95)."""

    max_iterations: int = 100
    kernel_max_error: float = 25.0  # chi2 threshold for robust reweighting
    damping: float = 1.0
    min_num_inliers: int = 10
    tolerance: float = 1e-5  # stop when |delta chi2| / chi2 below this
    step_tolerance: float = 1e-3  # ...AND the GN step norm is below this
    refine_iterations: int = 10  # inlier-only refinement rounds (converge())
    max_step_norm: float = 1.0  # trust-region clamp on |dx| per round


class GNResult(NamedTuple):
    x: jnp.ndarray  # final state
    chi2: jnp.ndarray  # mean inlier chi2
    num_inliers: jnp.ndarray  # int32
    num_iterations: jnp.ndarray  # int32
    inlier_mask: jnp.ndarray  # (N,) bool over measurements
    converged: jnp.ndarray  # bool


def _robust_weights(chi2: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Reference-style clamping kernel: weight = kernel/chi2 beyond it."""
    return jnp.where(chi2 > kernel, kernel / jnp.maximum(chi2, 1e-12), 1.0)


def solve_normal_equations(H: jnp.ndarray, b: jnp.ndarray, damping) -> jnp.ndarray:
    """Damped solve of (H + damping*I) dx = -b via Cholesky (H is SPD+damped)."""
    dim = H.shape[-1]
    Hd = H + damping * jnp.eye(dim, dtype=H.dtype)
    # cho_factor is fine for the small (6x6 / 3x3) systems here, and is
    # cheaper + more stable than the reference's fullPivLu.
    L = jax.scipy.linalg.cho_factor(Hd, lower=True)
    return -jax.scipy.linalg.cho_solve(L, b)


def gauss_newton(
    residual_fn: Callable,
    x0: jnp.ndarray,
    data,
    mask: jnp.ndarray,
    config: GNConfig,
    retract: Callable | None = None,
    info_fn: Callable | None = None,
    state_dim: int | None = None,
):
    """Run robust GN to convergence, then inlier-only refinement rounds.

    Args:
      residual_fn: (x, datum) -> (r (R,), J (R, D)) for one measurement.
        Vmapped internally over the leading axis of `data`.
      x0: initial state (any array; if `retract` given, a manifold point).
      data: pytree of per-measurement arrays, leading dim N.
      mask: (N,) bool of valid measurements.
      config: GNConfig.
      retract: (x, dx (D,)) -> x.  Defaults to x + dx.
      info_fn: optional (x, datum, r) -> Omega (R, R) per-measurement
        information matrix (e.g. inverse-depth weighting,
        stereouv_aligner.cpp:57-61). Defaults to identity.
      state_dim: D; inferred from a probe evaluation if None.

    Returns GNResult. Fully jittable; no data-dependent Python control flow.
    """
    if retract is None:
        retract = lambda x, dx: x + dx

    batched_res = jax.vmap(residual_fn, in_axes=(None, 0))

    def linearize(x, inlier_only_mask):
        r, J = batched_res(x, data)  # (N, R), (N, R, D)
        if info_fn is not None:
            omega = jax.vmap(info_fn, in_axes=(None, 0, 0))(x, data, r)
        else:
            omega = jnp.broadcast_to(
                jnp.eye(r.shape[-1], dtype=r.dtype), r.shape + (r.shape[-1],)
            )
        chi2 = jnp.einsum("ni,nij,nj->n", r, omega, r)
        w = _robust_weights(chi2, jnp.asarray(config.kernel_max_error, r.dtype))
        m = (mask & inlier_only_mask).astype(r.dtype)
        w_eff = w * m
        omega_w = omega * w_eff[:, None, None]
        H = jnp.einsum("nri,nrs,nsj->ij", J, omega_w, J)
        b = jnp.einsum("nri,nrs,ns->i", J, omega_w, r)
        inliers = (chi2 <= config.kernel_max_error) & mask & inlier_only_mask
        total_chi2 = jnp.sum(chi2 * w_eff)
        return H, b, total_chi2, inliers, chi2

    def one_round(x, inlier_only_mask):
        H, b, total_chi2, inliers, chi2 = linearize(x, inlier_only_mask)
        dx = solve_normal_equations(H, b, jnp.asarray(config.damping, H.dtype))
        # Trust-region clamp: an unbounded GN step from a bad linearization
        # (e.g. points driven behind the camera) overflows f32 downstream.
        norm = jnp.linalg.norm(dx)
        dx = dx * jnp.minimum(1.0, config.max_step_norm / jnp.maximum(norm, 1e-12))
        x_new = retract(x, dx)
        # Reject non-finite updates outright (singular H under degenerate
        # masks) — keep the previous iterate instead.
        ok = jnp.all(jnp.isfinite(dx))
        x_new = jnp.where(ok, x_new, x)
        return x_new, total_chi2, inliers, jnp.where(ok, norm, 0.0)

    # Phase 1: robust GN over all measurements until chi2 stalls AND the
    # step norm is small.  The chi2 test alone is a trap with the clamping
    # kernel: every outlier contributes exactly `kernel` to the weighted
    # cost, so a far-from-converged solve where ALL residuals exceed the
    # kernel has CONSTANT cost and would stop after 2 rounds even though
    # the IRLS steps are still large (the closure-ICP failure mode).
    def cond(state):
        x, prev_chi2, chi2, it, _, step = state
        rel = jnp.abs(prev_chi2 - chi2) / jnp.maximum(chi2, 1e-12)
        return (it < config.max_iterations) & (
            (it < 2) | (rel > config.tolerance) | (step > config.step_tolerance)
        )

    all_true = jnp.ones_like(mask)

    def body(state):
        x, _, chi2, it, inl, _ = state
        x_new, new_chi2, inliers, step = one_round(x, all_true)
        return (x_new, chi2, new_chi2, it + 1, inliers, step)

    init = (x0, jnp.float32(jnp.inf), jnp.float32(1e30), jnp.int32(0), mask,
            jnp.float32(jnp.inf))
    x, _, chi2, iters, inliers, _ = jax.lax.while_loop(cond, body, init)

    # Phase 2: fixed number of inlier-only refinement rounds
    # (reference `converge` pattern, stereouv_aligner.cpp:210-255).
    def refine_body(i, carry):
        x, inliers = carry
        x_new, _, new_inl, _ = one_round(x, inliers)
        # Reject a refinement round that collapses the inlier set
        # (reference keeps the previous estimate in that case).
        keep = jnp.sum(new_inl) >= config.min_num_inliers
        return (jnp.where(keep, x_new, x), jnp.where(keep, new_inl, inliers))

    x, inliers = jax.lax.fori_loop(0, config.refine_iterations, refine_body, (x, inliers))

    num_inliers = jnp.sum(inliers).astype(jnp.int32)
    # Final statistics on inliers only.
    _, _, final_chi2, _, chi2_all = linearize(x, inliers)
    mean_chi2 = final_chi2 / jnp.maximum(num_inliers.astype(jnp.float32), 1.0)
    converged = num_inliers >= config.min_num_inliers
    return GNResult(
        x=x,
        chi2=mean_chi2,
        num_inliers=num_inliers,
        num_iterations=iters,
        inlier_mask=inliers,
        converged=converged,
    )


def se3_retract(T: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative SE(3) update with re-orthonormalization
    (reference stereouv_aligner.cpp:190-207)."""
    return lie.orthonormalize_transform(lie.exp_se3(dx) @ T)
