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
