"""Viz + config + profiling smoke gates."""
import os


from hybridsbp_tpu.config import MMSConfig
from hybridsbp_tpu.mesh import read_inp_2d
from hybridsbp_tpu.ops2d import locoperator
from hybridsbp_tpu.utils import reset_timings, timer, timings
from hybridsbp_tpu.viz import plot_blocks, plot_connectivity

MESHES = os.path.join(os.path.dirname(__file__), "..", "meshes")


def test_plot_connectivity_text(capsys):
    verts, EToV, *_ = read_inp_2d(
        os.path.join(MESHES, "square_circle.inp"),
        bc_map=[1, 1, 2, 2, 7])
    text = plot_connectivity(verts, EToV, width=40, height=12)
    lines = text.splitlines()
    assert len(lines) == 12 and all(len(l) == 40 for l in lines)
    # something was drawn
    assert any(ch != "⠀" for l in lines for ch in l)


def test_plot_blocks_file(tmp_path):
    lops = {0: locoperator(2, 8, 8), 1: locoperator(2, 8, 8)}
    out = tmp_path / "mesh.png"
    plot_blocks(lops, file=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_config_defaults_match_reference():
    c = MMSConfig()
    assert c.N0 == 17 and c.levels == 4
    assert c.solver.method == "trace" and c.solver.p == 6
    assert c.solver.tau_scale == 2.0


def test_timers():
    reset_timings()
    with timer("unit"):
        sum(range(1000))
    n, tot, mean = timings()["unit"]
    assert n == 1 and tot >= 0


def test_registry_and_cli_listing(capsys):
    from hybridsbp_tpu.registry import REGISTRY, get
    assert {"square_circle", "bp1", "bp1_multiblock", "flower",
            "single_block"} <= set(REGISTRY)
    import pytest
    with pytest.raises(KeyError):
        get("nope")
    from hybridsbp_tpu.__main__ import main
    assert main(["list"]) == 0


def test_chained_time_harness():
    """utils.profiling.chained_time: the shared RTT-free two-point-fit
    harness (used by run_device_multi and tune_inner).  Gates: (a) it
    returns a non-negative per-application time, (b) the chain really
    RUNS k applications serially — verified by a step function whose
    fixed point differs from its one-step image (if the chain didn't
    execute, the compile/warm call would diverge or the sum assert
    would trip), (c) a custom serialize hook is honored."""
    import jax.numpy as jnp

    from hybridsbp_tpu.utils.profiling import chained_time

    calls = []

    def step(x, y):
        calls.append(1)             # traced once per jit, not per link
        return 0.5 * x + y

    x0 = jnp.ones((64,))
    y0 = jnp.full((64,), 0.25)
    dt = chained_time(step, (x0, y0), k1=1, k2=3, reps=5)
    assert dt >= 0.0
    # the step traced exactly once inside the fori_loop body per
    # compiled program (two trip counts share one program)
    assert len(calls) == 1

    # custom serialize: thread the result itself forward
    def serialize(res, a0):
        return (res, a0[1])

    dt2 = chained_time(step, (x0, y0), k1=1, k2=3, reps=5,
                       serialize=serialize)
    assert dt2 >= 0.0
