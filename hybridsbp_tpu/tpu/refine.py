"""Mixed-precision iterative refinement (SURVEY §7 risk item).

TPU serving solves run in float32; validation demands float64 accuracy.
Classic iterative refinement closes the gap: solve in f32 (fast CG with
the fastdiag preconditioner), compute the residual in f64, re-solve for
the correction, repeat.  Each sweep multiplies the error by
O(kappa * eps_f32), so 2-3 sweeps reach f64 levels for the
well-preconditioned SPD systems of this framework.
"""
from typing import Callable

import jax
import jax.numpy as jnp


def iterative_refinement(solve32: Callable, matvec64: Callable, b64,
                         sweeps=3):
    """Solve A x = b64 to (near-)f64 accuracy using an f32 inner solver.

    solve32(r32) -> approximate A^{-1} r in float32;
    matvec64(x64) -> A @ x in float64.
    Returns (x64, residual_norms) with one norm per sweep.
    """
    b64 = jnp.asarray(b64, dtype=jnp.float64)
    x = jnp.zeros_like(b64)
    norms = []
    r = b64
    for _ in range(sweeps):
        dx = solve32(jnp.asarray(r, dtype=jnp.float32))
        x = x + jnp.asarray(dx, dtype=jnp.float64)
        r = b64 - matvec64(x)
        norms.append(jnp.sqrt(jnp.sum(r * r)))
    return x, norms


def make_refined_solver(bp32, bp64, trace_inv, *, inner_tol=2e-3,
                        inner_maxiter=60, inner_iters=8, stencil="auto",
                        fused=True):
    """Device-only mixed-precision solver for problem sizes whose f32
    attainable-accuracy floor sits far above serving tolerance.

    At ~4.2M DOF (p=6 N=272 — one level past the reference ladder's
    finest, square_circle.jl:207-210) the f32 coupled solve stalls at a
    relative residual of ~1.5e-3 regardless of preconditioner quality:
    that is the kappa(A)*eps_f32 attainable-accuracy floor (kappa ~ N^2
    per block), the same reason both the unpreconditioned-trace and the
    banded-Woodbury runs bottom out at the SAME level.  Classic
    iterative refinement breaks the floor: each sweep does one f32
    two-level (banded-Woodbury FCG) solve for a correction and ONE f64
    residual against a separately f64-assembled operator, contracting
    the true residual by ~max(inner resnorm, kappa * |dA32|/|A|) per
    sweep — 3-4 sweeps reach ~1e-9, the accuracy class of the host f64
    direct path (itself floor-limited at ~1.4e-10, RESULTS.md p=6
    ladder), with no host factorization anywhere.

    ``bp32``: the f32 operator (flat layout) + ``trace_inv`` (banded,
    see :func:`multiblock.banded_from_device`); ``bp64``: the f64
    residual operator — build with
    ``build_blocked(prob, dtype=jnp.float64, assemble_on_device=True,
    assemble_chunk=8, with_fastdiag=False)`` (flat-only; the padded
    f64 plane transient never materializes).

    Returns ``refine(gb64, gd64, sweeps=4, tol=1e-9, verbose=False)``
    -> ``(x64, rel_residuals)`` — one jitted sweep program (inner
    while_loop solve + f64 apply, operator arrays as jit arguments per
    the HTTP-413 lesson), so each sweep costs one device round trip.
    """
    from .multiblock import (bp_arrays, bp_with, displacement_matvec,
                             displacement_rhs, make_jit_solver)

    sj = make_jit_solver(bp32, method="displacements",
                         trace_inv=trace_inv, tol=inner_tol,
                         maxiter=inner_maxiter, inner_iters=inner_iters,
                         stencil=stencil)
    nfaces, L = bp32.Dinv.shape
    zero_gd = jnp.zeros((nfaces, L), dtype=jnp.float32)

    # (x64, r64) -> (x64', r64', |r'|): one f32 inner solve on the
    # current residual + one f64 true residual.  ``fused=False``
    # compiles the two halves as separate programs: the inner-solver
    # program is the SAME shape make_jit_solver already compiles (so
    # it is known-good at the target scale) and the residual program
    # is a single f64 apply — the one-program fused form crashed the
    # remote compile helper (HTTP 500) at p=6 N=384 while both halves
    # compile fine (r5h/r5j logs); costs one extra device round trip
    # per sweep.
    @jax.jit
    def _sweep(a, a64, b64, x64, r64):
        res = sj.fn(a, r64.astype(jnp.float32), zero_gd)
        x64 = x64 + res.x.astype(jnp.float64)
        r = b64 - displacement_matvec(bp_with(bp64, a64), x64,
                                      stencil=stencil)
        return x64, r, jnp.sqrt(jnp.sum(r * r)), res.iters

    @jax.jit
    def _update(a64, b64, x64, dx32):
        x64 = x64 + dx32.astype(jnp.float64)
        r = b64 - displacement_matvec(bp_with(bp64, a64), x64,
                                      stencil=stencil)
        return x64, r, jnp.sqrt(jnp.sum(r * r))

    def _sweep_split(a, a64, b64, x64, r64):
        res = sj.fn(a, r64.astype(jnp.float32), zero_gd)
        x64, r, rn = _update(a64, b64, x64, res.x)
        return x64, r, rn, res.iters

    @jax.jit
    def _rhs(a64, g64, gd64):
        b = displacement_rhs(bp_with(bp64, a64), g64, gd64)
        return b, jnp.sqrt(jnp.sum(b * b))

    arrs64 = bp_arrays(bp64)

    def refine(gb64, gd64, sweeps=4, tol=1e-9, verbose=False):
        b64, bn = _rhs(arrs64, jnp.asarray(gb64, jnp.float64),
                       jnp.asarray(gd64, jnp.float64))
        bn = float(bn)
        x = jnp.zeros_like(b64)
        r = b64
        rels = []
        step = _sweep if fused else _sweep_split
        for s in range(sweeps):
            x, r, rn, it = step(sj.arrs, arrs64, b64, x, r)
            rels.append(float(rn) / bn)
            if verbose:
                print(f"  refine sweep {s + 1}: true rel residual "
                      f"{rels[-1]:.3e} ({int(it)} inner FCG iters)",
                      flush=True)
            if rels[-1] < tol:
                break
        return x, rels

    refine.solver32 = sj
    refine.arrs64 = arrs64
    return refine


def make_fixed_refined(bp, trace_inv, *, coef_dtype=jnp.bfloat16,
                       sweeps=3, inner_tol=1e-3, inner_maxiter=40,
                       inner_iters=8, stencil="auto"):
    """ONE-program refined serving solve whose inner FCG matvecs stream
    ``coef_dtype`` (bf16) coefficients — the realization of the r4
    whole-chunk-upcast kernel win (683.5 vs 1100.6 us/apply at the
    flagship shape) in an end-to-end solve (VERDICT r4 next #4).

    Unlike :func:`make_refined_solver` (host-looped f64 sweeps for the
    device-only accuracy path), this builds a FIXED-sweep-count jitted
    program in the operator's own working dtype: each sweep is one
    Woodbury-two-level FCG solve on the ``coef_dtype``-perturbed
    system (operator AND preconditioner consistently narrowed — the r3
    ``precond_coef_dtype`` negative was the *mismatched* case: bf16
    preconditioner sweeps against an exact f32 outer) followed by one
    full-precision residual.  The refinement wrapper absorbs the ~3e-3
    bf16 operator perturbation, so the final error matches the plain
    f32 solve's.

    Returns ``solve(g, gdelta_faces) -> (x, rel_residual)`` with
    ``.fn``/``.arrs`` exposed for chained (RTT-free) timing, like
    :func:`multiblock.make_jit_solver`.
    """
    from .multiblock import (bp_arrays, bp_with, displacement_matvec,
                             displacement_rhs, make_jit_solver,
                             with_coef_dtype)

    bp_lo = with_coef_dtype(bp, coef_dtype)
    sj = make_jit_solver(bp_lo, method="displacements",
                         trace_inv=trace_inv, tol=inner_tol,
                         maxiter=inner_maxiter, inner_iters=inner_iters,
                         stencil=stencil, stall_iters=None)
    nfaces, L = bp.Dinv.shape
    zero_gd = jnp.zeros((nfaces, L), dtype=_f(bp))

    def solve_fn(a_lo, a_hi, g, gdelta_faces):
        bp_hi = bp_with(bp, a_hi)
        b = displacement_rhs(bp_hi, g, gdelta_faces)
        bn = jnp.sqrt(jnp.sum(b * b))
        x = jnp.zeros_like(b)
        r = b
        for _ in range(sweeps):
            res = sj.fn(a_lo, r, zero_gd)
            x = x + res.x
            r = b - displacement_matvec(bp_hi, x, stencil=stencil)
        rn = jnp.sqrt(jnp.sum(r * r)) / jnp.where(bn == 0, 1.0, bn)
        return x, rn

    solve_jit = jax.jit(solve_fn)
    arrs = {"lo": sj.arrs, "hi": bp_arrays(bp)}

    def solve(g, gdelta_faces):
        return solve_jit(arrs["lo"], arrs["hi"], g, gdelta_faces)

    solve.fn = solve_fn
    solve.arrs = arrs
    return solve


def _f(bp):
    from .multiblock import _bp_dtype
    return _bp_dtype(bp)


def refined_displacement_solve(bp, g, gdelta_faces, *, sweeps=3,
                               coef_dtype=jnp.bfloat16, inner_tol=1e-4,
                               inner_maxiter=300, tol=None, stencil="auto",
                               precond="auto"):
    """Displacement solve whose CG matvecs stream **bf16 coefficient
    planes** (half the dominant HBM traffic of the hot op), refined
    against the full-precision operator.

    Each sweep: CG on the ``coef_dtype``-perturbed system for a
    correction (cheap matvecs), then one full-precision residual.  The
    bf16 operator perturbation is ~4e-3 relative, so each sweep
    contracts the true residual by O(kappa_precond * 4e-3) — measured
    ~0.08/sweep on a curved two-block problem, i.e. ~1 digit per sweep
    while the inner matvec traffic runs at half the coefficient
    bandwidth.  For serving tolerances (1e-5-ish) 2-4 sweeps suffice;
    deep tolerances take ~10.

    Returns (x, residual_norms) — one relative residual per sweep,
    measured with the full-precision operator.  ``tol``: stop early
    once the true relative residual falls below it.
    """
    from .multiblock import (displacement_matvec, displacement_rhs,
                             solve_displacements, with_coef_dtype)

    bp_lo = with_coef_dtype(bp, coef_dtype)
    b = displacement_rhs(bp, g, gdelta_faces)
    bnorm = jnp.sqrt(jnp.sum(b * b))
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    x = jnp.zeros_like(b)
    r = b
    norms = []
    zero_gd = jnp.zeros_like(gdelta_faces)
    for _ in range(sweeps):
        dx = solve_displacements(bp_lo, r, zero_gd, tol=inner_tol,
                                 maxiter=inner_maxiter, stencil=stencil,
                                 precond=precond).x
        x = x + dx
        r = b - displacement_matvec(bp, x, stencil=stencil)
        rn = jnp.sqrt(jnp.sum(r * r)) / bnorm
        norms.append(rn)
        if tol is not None and float(rn) < tol:
            break
    return x, norms
