#!/usr/bin/env python
"""Optimized-HLO diff of the flagship chunked-flat apply: f32 vs bf16
coefficient storage (VERDICT r3 next #6 / TODO OPEN item 3).

bf16 coefficients halve the dominant HBM stream of the apply, but the
measured speedup at the flagship shape was only 1.26x (1040.3 us ->
832.6 us) against an ~1.8x traffic-ideal.  This tool compiles BOTH
variants at the real shape (56 blocks, p=6 fully-curved offset set,
137x137), saves the optimized TPU HLO to artifacts/, and prints the
compiler's own cost analysis (bytes accessed / flops) plus a fusion
inventory — so the repayment mechanism (u-side traffic? upcast
placement? extra fusions?) is named from evidence, not hypothesis.

Usage: python tools/bf16_hlo_probe.py [--N 136] [--E 56] [--echunk 8]
"""
import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "drivers"))

os.environ.setdefault("HYBRIDSBP_X64", "0")


def _log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def fusion_inventory(txt):
    """Counts of HLO ops that matter for the traffic question."""
    inv = {}
    for pat, name in [
            (r"\bfusion\(", "fusion_calls"),
            (r"convert\(", "converts"),
            (r"bf16\[", "bf16_tensors"),
            (r"f32\[", "f32_tensors"),
            (r"copy\(", "copies"),
            (r"transpose\(", "transposes"),
            (r"dynamic-slice\(", "dynamic_slices"),
            (r"\bslice\(", "slices"),
    ]:
        inv[name] = len(re.findall(pat, txt))
    return inv


def hbm_param_bytes(txt):
    """Sum of entry-parameter and output buffer sizes (rough HBM
    residency of the program's I/O) from the entry layout line."""
    m = re.search(r"entry_computation_layout=\{(.*)\}\n", txt)
    if not m:
        return None
    sizes = 0
    for dt, dims in re.findall(r"(bf16|f32|s32)\[([\d,]*)\]", m.group(1)):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        sizes += n * (2 if dt == "bf16" else 4)
    return sizes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=6)
    ap.add_argument("--N", type=int, default=136)
    ap.add_argument("--E", type=int, default=56)
    ap.add_argument("--coarse", type=int, default=16)
    ap.add_argument("--echunk", type=int, default=8)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from square_circle import assemble_level

    from hybridsbp_tpu.tpu import build_blocked
    from hybridsbp_tpu.tpu.stencil import dia_apply_flat

    _log(f"backend = {jax.default_backend()}")
    _log(f"coarse assembly p={a.p} N={a.coarse} for the offset pattern")
    prob, *_ = assemble_level(a.p, a.coarse)
    bp0 = build_blocked(prob, dtype=jnp.float32, with_fastdiag=False,
                        flat=False)
    offsets = tuple(tuple(int(x) for x in o)
                    for o in np.asarray(bp0.offsets))
    E, Np = a.E, a.N + 1
    Nvol = Np * Np
    offs = tuple(sorted({ds * Np + dr for ds, dr in offsets}))
    K = a.echunk
    _log(f"E={E}, {len(offs)} flat offsets, block {Np}x{Np}, chunk {K}")

    def apply_chunked(cf, uf):
        out = jax.lax.map(
            lambda cv: dia_apply_flat(cv[0], offs, cv[1]),
            (cf.reshape(E // K, K, *cf.shape[1:]),
             uf.reshape(E // K, K, uf.shape[-1])))
        return out.reshape(E, -1)

    def apply_chunked_upcast(cf, uf):
        """bf16 storage, ONE whole-chunk upcast inside the map body:
        the converted f32 chunk is a single intermediate the compute
        fusion can consume like the f32 path's staged chunk — instead
        of XLA's per-plane slice+convert split (the measured 1.26x
        repayment mechanism)."""
        out = jax.lax.map(
            lambda cv: dia_apply_flat(cv[0].astype(jnp.float32), offs,
                                      cv[1]),
            (cf.reshape(E // K, K, *cf.shape[1:]),
             uf.reshape(E // K, K, uf.shape[-1])))
        return out.reshape(E, -1)

    key = jax.random.PRNGKey(0)
    cf32 = jax.jit(lambda k: jax.random.normal(
        k, (E, len(offs), Nvol), dtype=jnp.float32) / len(offs))(key)
    uf = jax.jit(lambda k: jax.random.normal(
        k, (E, Nvol), dtype=jnp.float32))(jax.random.PRNGKey(1))

    os.makedirs("artifacts", exist_ok=True)
    cbf = cf32.astype(jnp.bfloat16)
    variants = (("f32", apply_chunked, cf32),
                ("bf16", apply_chunked, cbf),
                ("bf16_upcast", apply_chunked_upcast, cbf))
    results = {}
    for name, fn, cf in variants:
        _log(f"compiling {name} variant")
        co = jax.jit(fn).lower(cf, uf).compile()
        txt = co.as_text()
        path = f"artifacts/hlo_flat_{name}.txt"
        with open(path, "w") as fh:
            fh.write(txt)
        ca = co.cost_analysis() or {}
        res = {
            "hlo_path": path, "hlo_len": len(txt),
            "bytes_accessed": ca.get("bytes accessed"),
            "flops": ca.get("flops"),
            "out_bytes": ca.get("bytes accessedout{}"),
            "io_bytes": hbm_param_bytes(txt),
            **fusion_inventory(txt),
        }
        # chained on-chip timing (the repo's RTT-free harness)
        from hybridsbp_tpu.utils.profiling import chained_time
        try:
            # serialize through the FIELD (default would add a dep to
            # the big coef array — an extra 2x coef stream per link)
            ser = lambda res, a0: (  # noqa: E731
                a0[0], a0[1] + 0.0 * jnp.sum(res).astype(a0[1].dtype))
            dt = chained_time(lambda c, u: fn(c, u), (cf, uf),
                              k1=30, k2=120, reps=5, serialize=ser)
            res["us_per_apply"] = round(dt * 1e6, 1)
        except Exception as e:  # noqa: BLE001
            _log(f"timing failed: {e}")
        results[name] = res
        print(json.dumps({name: res}), flush=True)
    if all(results[n]["bytes_accessed"] for n in results):
        ratio = (results["f32"]["bytes_accessed"]
                 / results["bf16"]["bytes_accessed"])
        print(json.dumps({"bytes_accessed_ratio_f32_over_bf16":
                          round(ratio, 3)}))


if __name__ == "__main__":
    main()
