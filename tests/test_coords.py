"""Ported golden assertions from /root/reference/tests/test_s2coords_port.rs
(themselves ports of Google C++ s2coords tests) against the NumPy kernels."""

import numpy as np
import pytest

from s2_geometry_rust_ray.functions import coords

LIMIT = coords.LIMIT_IJ


def swap_axes(ij):
    return ((ij >> 1) & 1) + ((ij & 1) << 1)


def invert_bits(ij):
    return ij ^ 3


def test_traversal_order_tables():
    """test_s2coords_port.rs:27-68 — swap/invert symmetry + inverses."""
    IJ, PO = coords.IJ_TO_POS, coords.POS_TO_IJ
    for r in range(4):
        for i in range(4):
            assert IJ[r][i] == IJ[r ^ coords.SWAP_MASK][swap_axes(i)]
            assert PO[r][i] == swap_axes(PO[r ^ coords.SWAP_MASK][i])
            assert IJ[r][i] == IJ[r ^ coords.INVERT_MASK][invert_bits(i)]
            assert PO[r][i] == invert_bits(PO[r ^ coords.INVERT_MASK][i])
            assert IJ[r][PO[r][i]] == i
            assert PO[r][IJ[r][i]] == i


def test_st_to_ij_boundaries():
    """test_s2coords_port.rs:73-77."""
    assert coords.st_to_ij(0.0) == 0
    assert coords.st_to_ij(1.0) == LIMIT - 1


def test_st_to_ij_halfway():
    """test_s2coords_port.rs:81-101."""
    r = 1.0 / LIMIT
    vals = np.array([0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5]) * r
    assert list(coords.st_to_ij(vals)) == [0, 1, 1, 2, 2, 3, 3, 4, 4]
    hi = np.array([LIMIT - 2.5, LIMIT - 2.0, LIMIT - 1.5, LIMIT - 1.0, LIMIT - 0.5]) * r
    assert list(coords.st_to_ij(hi)) == [LIMIT - 3, LIMIT - 2, LIMIT - 2, LIMIT - 1, LIMIT - 1]


def test_ij_to_st_to_ij_roundtrip():
    """test_s2coords_port.rs:106-123 — i -> st_min -> ij is the identity."""
    rng = np.random.default_rng(12345)
    i = rng.integers(0, LIMIT, 5000)
    s = coords.ij_to_st_min(i)
    assert np.array_equal(coords.st_to_ij(s), i)
    # center of the cell also maps back
    s_mid = coords.ij_to_st_min(i) + 0.5 / LIMIT
    assert np.array_equal(coords.st_to_ij(s_mid), i)


def test_uv_st_quadratic_inverses():
    """test_s2coords_port.rs:128-167 — exact boundary identities + 1e-15
    roundtrips for the QUADRATIC projection."""
    assert coords.st_to_uv(0.0) == -1.0
    assert coords.st_to_uv(0.5) == 0.0
    assert coords.st_to_uv(1.0) == 1.0
    assert coords.uv_to_st(-1.0) == 0.0
    assert coords.uv_to_st(0.0) == 0.5
    assert coords.uv_to_st(1.0) == 1.0
    # quadratic shape: st_to_uv(0.75) = (4*0.5625-1)/3 = 0.41666...
    assert abs(coords.st_to_uv(0.75) - 5.0 / 12.0) < 1e-15
    rng = np.random.default_rng(7)
    s = rng.uniform(0, 1, 10000)
    assert np.max(np.abs(coords.uv_to_st(coords.st_to_uv(s)) - s)) < 1e-15
    u = rng.uniform(-1, 1, 10000)
    assert np.max(np.abs(coords.st_to_uv(coords.uv_to_st(u)) - u)) < 1e-15


def test_face_uv_xyz_roundtrip():
    """test_s2coords_port.rs:171-220 — face frames and uv->xyz->uv identity."""
    rng = np.random.default_rng(99)
    face = rng.integers(0, 6, 10000)
    u = rng.uniform(-1, 1, 10000)
    v = rng.uniform(-1, 1, 10000)
    x, y, z = coords.face_uv_to_xyz(face, u, v)
    f2, u2, v2 = coords.xyz_to_face_uv(x, y, z)
    assert np.array_equal(face, f2)
    assert np.max(np.abs(u - u2)) < 1e-14
    assert np.max(np.abs(v - v2)) < 1e-14
    # face centers: face_uv_to_xyz(f, 0, 0) is the face normal
    for f in range(6):
        x, y, z = coords.face_uv_to_xyz(f, 0.0, 0.0)
        norm = coords.FACE_UVW_AXES[f][2]
        assert (float(x), float(y), float(z)) == tuple(norm)


def test_face_frames_right_handed():
    """u_axis x v_axis == norm for every face (right-handedness)."""
    for f in range(6):
        u_ax, v_ax, n_ax = coords.FACE_UVW_AXES[f]
        assert np.allclose(np.cross(u_ax, v_ax), n_ax)


def test_si_ti_conversions():
    assert coords.st_to_si_ti(0.0) == 0
    assert coords.st_to_si_ti(1.0) == coords.MAX_SI_TI
    assert coords.st_to_si_ti(0.5) == coords.MAX_SI_TI // 2
    si = np.array([1, 2, 4, coords.MAX_SI_TI // 2, coords.MAX_SI_TI])
    assert np.array_equal(coords.st_to_si_ti(coords.si_ti_to_st(si)), si)


def test_xyz_to_face_si_ti_center_levels():
    """Cell centers decode to their level; off-center points give -1
    (src/math.rs:283-344)."""
    from s2_geometry_rust_ray.functions import cellid

    rng = np.random.default_rng(5)
    for lvl in [0, 5, 15, 29, 30]:
        leaf = cellid.from_latlng_deg(
            rng.uniform(-80, 80, 50), rng.uniform(-180, 180, 50)
        )
        cid = cellid.parent(leaf, lvl)
        x, y, z = cellid.to_xyz(cid)
        f, si, ti, out_lvl = coords.xyz_to_face_si_ti(x, y, z)
        assert np.all(out_lvl == lvl)
    # a random (non-center) point should give level -1
    x, y, z = coords.latlng_deg_to_xyz(np.array([33.123]), np.array([-111.179]))
    _, _, _, lv = coords.xyz_to_face_si_ti(x, y, z)
    assert lv[0] == -1
