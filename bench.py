#!/usr/bin/env python
"""Headline benchmark: SBP block-operator matvec throughput on one chip.

Measures the DIA stencil apply (the hot op under every iterative solve in
the framework) on a batch of BP1-sized blocks in float32, against the
chip's measured HBM bandwidth roofline.  The north-star target
(BASELINE.md) is >= 70% of the HBM roofline in GDOF/s; ``vs_baseline`` is
achieved / (0.7 * roofline), so >= 1.0 beats the target.

Methodology: this environment reaches the TPU through a high-latency
tunnel (host<->device RTT ~27 ms, and block_until_ready does not actually
synchronize), so each measurement chains K dependent kernel applications
inside one jitted ``lax.fori_loop``, reduces to a scalar, and uses a
two-point (K1, K2) fit to cancel launch/RTT overhead.

Prints exactly one JSON line.
"""
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("HYBRIDSBP_X64", "0")   # f32 serving path


def _probe_backend():
    """The axon TPU worker can wedge (hangs any XLA call).  Probe it in a
    subprocess with a timeout; fall back to CPU if unresponsive."""
    if os.environ.get("HYBRIDSBP_PLATFORM"):
        return
    for attempt in range(2):
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import os; os.environ['HYBRIDSBP_X64']='0';"
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.sum(jnp.ones(8))))"],
                timeout=300, check=True, capture_output=True)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if attempt == 0:
                time.sleep(60)
    os.environ["HYBRIDSBP_PLATFORM"] = "cpu"
    print("# TPU backend unresponsive; benching on CPU", file=sys.stderr)


_probe_backend()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed_chain(step_fn, init, iters):
    """Wall time of `iters` chained applications, forced by scalar fetch."""
    @jax.jit
    def runner(x):
        x = jax.lax.fori_loop(0, iters, lambda i, v: step_fn(v), x)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(lambda v: jnp.sum(v), x))

    s = float(runner(init))           # warm/compile + sync
    assert np.isfinite(s), "benchmark chain diverged"
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(runner(init))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter_time(step_fn, init, k1=50, k2=200):
    t1 = timed_chain(step_fn, init, k1)
    t2 = timed_chain(step_fn, init, k2)
    return max((t2 - t1) / (k2 - k1), 1e-9)


def measure_hbm_bw():
    """Effective HBM bandwidth from a chained axpy x = a*x + b (2 reads +
    1 write per element per iteration... x read, x written: 8 bytes/elt,
    counted as 2 planes)."""
    n = 64 * 1024 * 1024  # 256 MB (f32)
    x = jnp.ones((n,), dtype=jnp.float32)
    dt = per_iter_time(lambda v: 0.999999 * v + 1e-7, x, k1=20, k2=80)
    return 2 * 4 * n / dt


def main():
    from hybridsbp_tpu.mesh import create_metrics
    from hybridsbp_tpu.ops2d import locoperator
    from hybridsbp_tpu.seas.bp1 import BP1Params, tan_stretch_maps
    from hybridsbp_tpu.tpu import to_dia
    from hybridsbp_tpu.tpu.pallas_stencil import dia_apply_batched

    backend = jax.default_backend()
    p, N, E = 2, 256, 64
    par = BP1Params(N=N, el=10.0)
    xt, yt = tan_stretch_maps(par)
    metrics = create_metrics(p, N, N, xt, yt)
    lop = locoperator(p, N, N, metrics)
    op = to_dia(lop.M, N + 1, N + 1, dtype=jnp.float32)
    noff = len(op.offsets)

    coefs = jnp.asarray(
        np.broadcast_to(np.asarray(op.coefs)[None],
                        (E,) + op.coefs.shape).copy(), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((E, N + 1, N + 1)),
                    dtype=jnp.float32)

    # normalize each application so the chain stays finite
    scale = np.float32(1.0 / abs(lop.M).sum(axis=1).max())
    dofs = E * (N + 1) ** 2

    candidates = {}
    if backend == "tpu":
        try:
            dt = per_iter_time(
                lambda v: scale * dia_apply_batched(
                    coefs, op.offsets, v, use_pallas=True), u)
            candidates["pallas"] = dt
        except Exception:
            pass
    dt = per_iter_time(
        lambda v: scale * dia_apply_batched(
            coefs, op.offsets, v, use_pallas=False), u)
    candidates["xla"] = dt

    best_name = min(candidates, key=candidates.get)
    best = candidates[best_name]
    gdof_s = dofs / best / 1e9

    bw = measure_hbm_bw()
    # irreducible traffic: noff coefficient planes + read u + write out
    bytes_per_dof = (noff + 2) * 4
    roofline_gdof_s = bw / bytes_per_dof / 1e9
    target = 0.7 * roofline_gdof_s

    print(json.dumps({
        "metric": "sbp_matvec_gdof_s",
        "value": round(gdof_s, 3),
        "unit": "GDOF/s",
        "vs_baseline": round(gdof_s / target, 3),
        "detail": {
            "backend": backend, "kernel": best_name, "p": p, "N": N,
            "blocks": E, "noff": noff,
            "us_per_apply": round(best * 1e6, 2),
            "all_kernels_us": {k: round(v * 1e6, 2)
                               for k, v in candidates.items()},
            "hbm_bw_GBs": round(bw / 1e9, 1),
            "roofline_gdof_s": round(roofline_gdof_s, 3),
            "pct_roofline": round(100 * gdof_s / roofline_gdof_s, 1),
        },
    }))


if __name__ == "__main__":
    main()
