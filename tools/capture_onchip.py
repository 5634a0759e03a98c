#!/usr/bin/env python
"""One-shot on-chip measurement capture (run when the TPU tunnel is
healthy; VERDICT r2 next #1/#2/#3 evidence).

Stages (each in its own bounded subprocess so a wedged worker cannot
take down the whole capture; progress + JSON lines appended to
artifacts/onchip_r3.log):

  1. bench.py                      — headline + hybrid + bp1 + hybrid_ref
  2. flagship setup comparison     — p=6 N=136 --device-solve with
     (a) dense B^-1 + host planes, (b) banded + --assemble-device
     (setup-time/transfer evidence for the VERDICT #3 claim)
  3. cold-start sample             — fresh-process time-to-first-result
     of a small jitted solve (VERDICT #8 datum)
  4. kernel-variant matrix         — tools/measure_flat_variants.py:
     XLA flat/chunked vs SYMMETRIC (half the coefficient stream) vs
     the Pallas streaming kernel (full/sym/bf16).  XLA-only first;
     Pallas in a separate bounded subprocess LAST (Mosaic can wedge
     the worker).
  5. flagship --flat-sym solve     — p=6 N=136 banded+assemble-device
     with the symmetric flat layout (run after 4 confirms sym wins)

Usage: python tools/capture_onchip.py [--stages 1 2 3 4 5]
"""
import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
LOG = os.path.join(ROOT, "artifacts", "onchip_r3.log")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, file=sys.stderr, flush=True)
    with open(LOG, "a") as fh:
        fh.write(line + "\n")


def run_stage(name, cmd, timeout):
    log(f"=== {name}: {' '.join(cmd)}")
    t0 = time.time()
    try:
        out = subprocess.run(cmd, cwd=ROOT, timeout=timeout,
                             capture_output=True, text=True)
        dt = time.time() - t0
        log(f"{name}: rc={out.returncode} ({dt:.0f}s)")
        for line in out.stdout.strip().splitlines()[-30:]:
            log(f"  {line}")
        for line in out.stderr.strip().splitlines()[-15:]:
            log(f"  [err] {line}")
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        log(f"{name}: TIMED OUT after {timeout}s")
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=int, nargs="+",
                    default=[1, 2, 3, 4, 5])
    a = ap.parse_args()
    os.makedirs(os.path.dirname(LOG), exist_ok=True)

    py = sys.executable
    if 1 in a.stages:
        run_stage("bench", [py, "bench.py"], timeout=5400)
    if 2 in a.stages:
        run_stage(
            "flagship-dense",
            [py, "drivers/square_circle.py", "--device-solve", "--p", "6",
             "--N0", "136", "--binv-dtype", "bfloat16",
             "--method", "displacements"], timeout=3600)
        run_stage(
            "flagship-fast-setup",
            [py, "drivers/square_circle.py", "--device-solve", "--p", "6",
             "--N0", "136", "--assemble-device", "--trace-mode", "banded",
             "--method", "displacements"], timeout=3600)
    if 3 in a.stages:
        code = ("import time; t0=time.time(); "
                "import os; os.environ['HYBRIDSBP_X64']='0'; "
                "import sys; sys.path.insert(0, 'drivers'); "
                "from square_circle import run_device; "
                "r = run_device(p=2, N=32, verbose=False, repeats=1, "
                "trace_mode='banded'); "
                "print('cold-start time-to-first-result: "
                "%.1fs' % (time.time()-t0))")
        run_stage("cold-start", [py, "-c", code], timeout=1200)
    if 4 in a.stages:
        run_stage("kernel-matrix-xla",
                  [py, "tools/measure_flat_variants.py", "--skip-pallas"],
                  timeout=3600)
        run_stage("kernel-matrix-pallas",
                  [py, "tools/measure_flat_variants.py",
                   "--only", "pallas,pallas_sym,pallas_sym_bf16"],
                  timeout=3600)
    if 5 in a.stages:
        run_stage(
            "flagship-flat-sym",
            [py, "drivers/square_circle.py", "--device-solve", "--p", "6",
             "--N0", "136", "--assemble-device", "--trace-mode", "banded",
             "--flat-sym", "--method", "trace"], timeout=3600)
    log("capture complete")


if __name__ == "__main__":
    main()
