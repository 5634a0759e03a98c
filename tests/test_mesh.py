"""Mesh layer gates: .inp parsing, connectivity invariants, blending and
metric identities on the checked-in Cubit assets."""
import os

import numpy as np
import pytest

from hybridsbp_tpu import (
    BC_DIRICHLET,
    BC_JUMP_INTERFACE,
    BC_LOCKED_INTERFACE,
    BC_NEUMANN,
)
from hybridsbp_tpu.mesh import (
    connectivityarrays,
    create_metrics,
    read_inp_2d,
    transfinite_blend_corners,
    transfinite_blend_sbp,
)

MESHES = os.path.join(os.path.dirname(__file__), "..", "meshes")
BC_MAP = [BC_DIRICHLET, BC_DIRICHLET, BC_NEUMANN, BC_NEUMANN,
          BC_JUMP_INTERFACE, 6, BC_JUMP_INTERFACE, 8]


@pytest.mark.parametrize("fname,nv,ne", [
    ("square_circle.inp", 73, 56),
    ("flower_v2.inp", 85, 67),
    (os.path.join("seas_bp1", "1_1_block.inp"), 4, 1),
    (os.path.join("seas_bp1", "BP1_v1.inp"), 215, 194),
])
def test_read_inp_counts(fname, nv, ne):
    verts, EToV, EToF, FToB, EToBlock = read_inp_2d(
        os.path.join(MESHES, fname), bc_map=BC_MAP)
    assert verts.shape == (2, nv)
    assert EToV.shape == (4, ne)
    assert np.isfinite(verts).all()
    assert EToF.max() + 1 == len(FToB)
    # all bc codes valid
    for b in np.unique(FToB):
        assert b in (BC_DIRICHLET, BC_NEUMANN, BC_LOCKED_INTERFACE) \
            or b >= BC_JUMP_INTERFACE


def test_square_circle_bc_distribution():
    _, EToV, EToF, FToB, EToBlock = read_inp_2d(
        os.path.join(MESHES, "square_circle.inp"), bc_map=BC_MAP)
    # jump faces form the circle: each of them is interior (2 elements)
    FToE, FToLF, EToO, EToS = connectivityarrays(EToV, EToF)
    jumps = np.where(FToB == BC_JUMP_INTERFACE)[0]
    assert len(jumps) > 0
    assert (FToE[1, jumps] >= 0).all()
    # domains: 1 inside circle, 2 outside — both present
    assert set(np.unique(EToBlock)) == {1, 2}


@pytest.mark.parametrize("fname", ["square_circle.inp", "flower_v2.inp"])
def test_connectivity_invariants(fname):
    _, EToV, EToF, FToB, _ = read_inp_2d(os.path.join(MESHES, fname),
                                         bc_map=BC_MAP)
    FToE, FToLF, EToO, EToS = connectivityarrays(EToV, EToF)
    ne = EToV.shape[1]
    for f in range(len(FToB)):
        e0, lf0 = FToE[0, f], FToLF[0, f]
        assert 0 <= e0 < ne and EToF[lf0, e0] == f
        # minus side is always orientation-true
        assert EToO[lf0, e0] and EToS[lf0, e0] == 0
        e1, lf1 = FToE[1, f], FToLF[1, f]
        if e1 >= 0:
            assert EToF[lf1, e1] == f and EToS[lf1, e1] == 1


def test_blend_corners_affine():
    """Bilinear blend reproduces an affine map exactly, and its
    derivatives are consistent with finite differences."""
    Nr, Ns = 8, 12
    r1 = np.linspace(-1, 1, Nr + 1)
    s1 = np.linspace(-1, 1, Ns + 1)
    s, r = np.meshgrid(s1, r1, indexing="ij")
    x, xr, xs = transfinite_blend_corners(0.0, 2.0, 1.0, 3.0, r, s)
    np.testing.assert_allclose(x, (1 + r) + (1 + s) / 2, atol=1e-13)
    np.testing.assert_allclose(xr, np.ones_like(r), atol=1e-13)
    np.testing.assert_allclose(xs, 0.5 * np.ones_like(r), atol=1e-13)


def test_blend_sbp_matches_analytic():
    Nr = Ns = 24
    r1 = np.linspace(-1, 1, Nr + 1)
    s1 = np.linspace(-1, 1, Ns + 1)
    s, r = np.meshgrid(s1, r1, indexing="ij")
    # curved south edge, straight elsewhere; analytic derivative variant
    e1 = lambda a: -1.0 + 0 * a
    e2 = lambda a: 1.0 + 0 * a
    e3 = lambda a: np.asarray(a, dtype=float)
    e4 = lambda a: np.asarray(a, dtype=float)
    x_sbp, xr_sbp, xs_sbp = transfinite_blend_sbp(e1, e2, e3, e4, r, s, 6)
    np.testing.assert_allclose(x_sbp, r, atol=1e-10)
    np.testing.assert_allclose(xr_sbp, np.ones_like(r), atol=1e-8)
    np.testing.assert_allclose(xs_sbp, np.zeros_like(r), atol=1e-10)


def test_metrics_identity_map():
    m = create_metrics(4, 10, 14)
    np.testing.assert_allclose(m.J, 1.0)
    np.testing.assert_allclose(m.crr, 1.0)
    np.testing.assert_allclose(m.css, 1.0)
    np.testing.assert_allclose(m.crs, 0.0, atol=1e-15)
    for f in range(4):
        np.testing.assert_allclose(m.sJ[f], 1.0)
    # outward unit normals of the unit square
    np.testing.assert_allclose(m.nx[0], -1.0)
    np.testing.assert_allclose(m.nx[1], 1.0)
    np.testing.assert_allclose(m.ny[2], -1.0)
    np.testing.assert_allclose(m.ny[3], 1.0)


def test_metrics_polar_patch():
    """Annulus patch: metric identities rx*xr + ry*yr = 1 etc., J>0,
    normals unit length, coefficient matrix SPD."""
    def xf(r, s):
        R = 1.5 + 0.5 * r
        th = np.pi / 4 * s
        return R * np.cos(th), 0.5 * np.cos(th), -R * np.pi / 4 * np.sin(th)

    def yf(r, s):
        R = 1.5 + 0.5 * r
        th = np.pi / 4 * s
        return R * np.sin(th), 0.5 * np.sin(th), R * np.pi / 4 * np.cos(th)

    m = create_metrics(4, 16, 20, xf, yf)
    one = m.rx * (0.5 * np.cos(np.pi / 4 * 0)) if False else None
    # inverse-function identities
    np.testing.assert_allclose(m.rx * m.sy - m.ry * m.sx, 1 / m.J, atol=1e-12)
    assert m.J.min() > 0
    for f in range(4):
        np.testing.assert_allclose(np.hypot(m.nx[f], m.ny[f]), 1.0, atol=1e-12)
    # SPD coefficient matrix: crr*css - crs^2 > 0, crr > 0
    assert (m.crr * m.css - m.crs**2).min() > 0
    assert m.crr.min() > 0


def test_metrics_nonpositive_jacobian_raises():
    bad_x = lambda r, s: (-r, -np.ones_like(r), np.zeros_like(r))
    with pytest.raises(ValueError, match="Jacobian"):
        create_metrics(2, 4, 4, bad_x)


def test_blend_corner_mismatch_raises():
    from hybridsbp_tpu.mesh import transfinite_blend
    e1 = lambda a: -1.0 + 0 * a
    e2 = lambda a: 1.0 + 0 * a
    e3 = lambda a: np.asarray(a, dtype=float)
    e4 = lambda a: np.asarray(a, dtype=float) + 0.5   # corners inconsistent
    z = lambda a: 0 * a
    with pytest.raises(ValueError, match="corners"):
        transfinite_blend(e1, e2, e3, e4, z, z, z, z, 0.0, 0.0)


def test_inp_reader_errors(tmp_path):
    bad = tmp_path / "bad.inp"
    bad.write_text("*HEADING\nnothing here\n")
    with pytest.raises(ValueError, match="ALLNODES"):
        read_inp_2d(str(bad))
