"""Dense Gauss-Newton / Levenberg-Marquardt solvers + Schur marginalization.

Replaces the reference's optimizer substrate — ``LevenbergMarquardtOptimizerExt``
(with per-iteration callback + custom termination criteria,
reference: src/glim/odometry/odometry_estimation_cpu.cpp:116-140,
mapping/sub_mapping.cpp:421-452) and, together with the sliding-window logic
in the odometry modules, ``ISAM2Ext`` / ``IncrementalFixedLagSmootherExt``.

Design (SURVEY.md §7): problems here are small-and-dense — a handful to a few
hundred states of 6-15 dof — so incremental sparse factorization is replaced
by whole-system dense solves on the MXU. ``linearize_fn`` is any jitted
function returning (H, b, err) for the current estimate; the LM loop runs
either in Python (cheap dispatch, callback-friendly) or fully on device under
``lax.while_loop``.

Normal-equation convention: residual r, Jacobian J = dr/dx, H = J^T W J,
b = J^T W r, step = -solve(H + damping, b), retract x <- x (+) step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass
class TerminationCriteria:
    """Convergence thresholds (the reference's custom LM termination:
    odometry_estimation_cpu.cpp:120-133 uses eps_trans/eps_rot on the
    update)."""

    max_iterations: int = 8
    eps_rot: float = 1e-4
    eps_trans: float = 1e-4
    relative_error_tol: float = 1e-6


@dataclass
class LMStatus:
    """Per-iteration status handed to callbacks (LevenbergMarquardtExtParams
    status_callback equivalent)."""

    iteration: int = 0
    error: float = 0.0
    new_error: float = 0.0
    lambda_: float = 0.0
    accepted: bool = True
    delta_norm: float = 0.0


@dataclass
class LMResult:
    x: Any = None
    error: float = 0.0
    iterations: int = 0
    converged: bool = False
    statuses: List[LMStatus] = field(default_factory=list)


@jax.jit
def solve_damped(H: jnp.ndarray, b: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Solve (H + lam * diag(H) + eps I) delta = -b.

    H is a damped GN Hessian (symmetric positive definite), so Cholesky —
    about 3x cheaper than the LU path and friendlier to the TPU. The system
    is solved with Jacobi equilibration (D^-1 A D^-1 on the unit-diagonal
    scale) plus one iterative-refinement step: global-mapping Hessians mix
    pose-prior rows at 1e10 with junction regularization at 1e-4, and a raw
    f32 factorization loses the small blocks entirely. If the factorization
    still degenerates (NaNs from an indefinite f32 H), fall back to LU for
    that call; callers' corruption guards handle the rest."""
    damping = lam * jnp.diag(H) + 1e-9
    A = H + jnp.diag(damping)
    d_inv = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(A), 1e-12))
    As = A * d_inv[:, None] * d_inv[None, :]
    bs = b * d_inv
    L = jnp.linalg.cholesky(As)
    y = jax.scipy.linalg.cho_solve((L, True), bs)
    y = y + jax.scipy.linalg.cho_solve((L, True), bs - As @ y)
    x = y * d_inv
    return -jax.lax.cond(jnp.all(jnp.isfinite(x)),
                         lambda _: x,
                         lambda _: jnp.linalg.solve(A, b), None)


def lm_optimize(linearize_fn: Callable[[Any], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
                retract_fn: Callable[[Any, jnp.ndarray], Any],
                x0: Any,
                criteria: Optional[TerminationCriteria] = None,
                init_lambda: float = 1e-5,
                lambda_factor: float = 10.0,
                callback: Optional[Callable[[LMStatus], None]] = None,
                host_f64_solve: bool = False) -> LMResult:
    """Host-loop LM: jitted linearize/solve, Python-level lambda control.

    ``retract_fn(x, delta)`` applies the full stacked update. ``callback``
    fires after every trial step (accepted or not).

    ``host_f64_solve`` factorizes the damped system on the HOST in f64
    instead of the device's equilibrated f32 Cholesky. Pose-graph Hessians
    (1e6 gauge prior + 1e4-stiff odometry chains hundreds of links long)
    condition at ~1e10+, where the f32 solve returns a step 35% rotated off
    the true Gauss-Newton direction (measured cos 0.74) and LM stalls
    rejecting steps; the D2H copy of H/b (~2 MB at 128 poses) costs ~60 ms
    per iteration — nothing at global-optimize cadence."""
    import numpy as _np
    crit = criteria or TerminationCriteria()
    x = x0
    H, b, err = linearize_fn(x)
    err = float(err)
    lam = init_lambda
    result = LMResult(x=x, error=err)

    def _host_solve(H, b, lam):
        Hn = _np.asarray(H, _np.float64)
        bn = _np.asarray(b, _np.float64)
        A = Hn + _np.diag(lam * _np.diag(Hn) + 1e-9)
        try:
            return jnp.asarray(_np.linalg.solve(A, -bn), jnp.float32)
        except _np.linalg.LinAlgError:
            return jnp.asarray(_np.linalg.lstsq(A, -bn, rcond=None)[0],
                               jnp.float32)

    for it in range(crit.max_iterations):
        delta = (_host_solve(H, b, lam) if host_f64_solve
                 else solve_damped(H, b, jnp.float32(lam)))
        x_new = retract_fn(x, delta)
        H_new, b_new, err_new = linearize_fn(x_new)
        err_new = float(err_new)
        delta_norm = float(jnp.linalg.norm(delta))

        accepted = err_new < err
        st = LMStatus(iteration=it, error=err, new_error=err_new, lambda_=lam,
                      accepted=accepted, delta_norm=delta_norm)
        if callback is not None:
            callback(st)
        result.statuses.append(st)

        if accepted:
            rel_decrease = (err - err_new) / max(err, 1e-12)
            x, H, b, err = x_new, H_new, b_new, err_new
            lam = max(lam / lambda_factor, 1e-10)
            d = jax.numpy.asarray(delta).reshape(-1, 6) if delta.size % 6 == 0 else None
            small = delta_norm < min(crit.eps_rot, crit.eps_trans)
            if d is not None:
                rot_n = float(jnp.max(jnp.linalg.norm(d[:, :3], axis=-1)))
                trans_n = float(jnp.max(jnp.linalg.norm(d[:, 3:], axis=-1)))
                small = rot_n < crit.eps_rot and trans_n < crit.eps_trans
            if small or rel_decrease < crit.relative_error_tol:
                result.converged = True
                result.iterations = it + 1
                break
        else:
            lam = min(lam * lambda_factor, 1e6)
        result.iterations = it + 1

    result.x = x
    result.error = err
    return result


def gn_optimize_scan(linearize_fn, retract_fn, x0, num_iters: int = 8,
                     lam: float = 1e-6):
    """Fully-on-device Gauss-Newton: fixed iteration count under lax.scan,
    constant damping. The hot-path variant for per-frame odometry solves
    (no host sync per iteration; callbacks unavailable by design)."""

    def step(x, _):
        H, b, err = linearize_fn(x)
        delta = solve_damped(H, b, jnp.float32(lam))
        return retract_fn(x, delta), err

    x, errs = jax.lax.scan(step, x0, None, length=num_iters)
    return x, errs


from functools import partial


@partial(jax.jit, static_argnames=("n_keep",))
def schur_marginalize(H: jnp.ndarray, b: jnp.ndarray, n_keep: int):
    """Marginalize trailing variables by Schur complement.

    Layout: x = [keep (n_keep dof) | marg (rest)]. Returns the reduced
    (H', b') acting on the kept variables — the dense-prior replacement for
    fixed-lag-smoother marginalization (SURVEY.md §7 Phase 4).
    """
    Hkk = H[:n_keep, :n_keep]
    Hkm = H[:n_keep, n_keep:]
    Hmm = H[n_keep:, n_keep:]
    bk = b[:n_keep]
    bm = b[n_keep:]
    Hmm_reg = Hmm + 1e-8 * jnp.eye(Hmm.shape[0], dtype=H.dtype)
    sol_H = jnp.linalg.solve(Hmm_reg, Hkm.T)
    sol_b = jnp.linalg.solve(Hmm_reg, bm)
    H_red = Hkk - Hkm @ sol_H
    b_red = bk - Hkm @ sol_b
    return H_red, b_red


def scatter_block(H: jnp.ndarray, b: jnp.ndarray, Hblk: jnp.ndarray,
                  bblk: jnp.ndarray, i: int, j: int, di: int = 6, dj: int = 6):
    """Add a (di, dj) block at block-position (i, j) plus the b-block at i.
    Host-side helper for assembling multi-state systems."""
    H = H.at[i * di:(i + 1) * di, j * dj:(j + 1) * dj].add(Hblk)
    if bblk is not None:
        b = b.at[i * di:(i + 1) * di].add(bblk)
    return H, b
