import numpy as np

from visitron_tpu import geometry as geo


def test_view_index_roundtrip():
    for v in range(36):
        h = geo.heading_of_view(v)
        e = geo.elevation_of_view(v)
        assert geo.view_of(geo.snap_heading(h), geo.snap_elevation(e)) == v


def test_snap_heading_wraps():
    assert geo.snap_heading(2 * np.pi - 0.01) == 0
    assert geo.snap_heading(-0.01) == 0
    assert geo.snap_heading(np.pi) == 6


def test_angle_feature_matches_reference_formula():
    f = geo.angle_feature(0.5, -0.25)
    np.testing.assert_allclose(
        f, [np.sin(0.5), np.cos(0.5), np.sin(-0.25), np.cos(-0.25)], rtol=1e-6
    )
    assert f.dtype == np.float32


def test_point_angle_feature_base_shift():
    # Relative to base view b, view b itself has rel heading 0, elevation by row.
    for b in [0, 5, 13, 35]:
        t = geo.point_angle_feature(b)
        assert t.shape == (36, 4)
        np.testing.assert_allclose(t[b, 0], 0.0, atol=1e-6)  # sin(rel_heading)=0
        np.testing.assert_allclose(t[b, 1], 1.0, atol=1e-6)


def test_all_point_angle_feature_shape():
    t = geo.all_point_angle_feature()
    assert t.shape == (36, 36, 4)


def test_loc_embedding_structure():
    e = geo.viewpoint_loc_embedding(7)
    assert e.shape == (36, 128)
    # Same row, same view => rel heading 0: sin block 0, cos block 1.
    np.testing.assert_allclose(e[7, 0:32], 0.0, atol=1e-6)
    np.testing.assert_allclose(e[7, 32:64], 1.0, atol=1e-6)
    # Elevation blocks depend only on the absolute row.
    np.testing.assert_allclose(e[7, 64:96], np.sin(0 * np.pi / 6 - np.pi / 6), atol=1e-6)
    # Blocks are constant within themselves.
    for row in range(36):
        for blk in range(4):
            seg = e[row, blk * 32 : (blk + 1) * 32]
            assert np.allclose(seg, seg[0])


def test_heading_elevation_to_convention():
    # +Y is heading 0; +X is heading pi/2 (clockwise from north).
    h, e = geo.heading_elevation_to(np.zeros(3), np.array([0.0, 1.0, 0.0]))
    assert abs(h) < 1e-9 and abs(e) < 1e-9
    h, _ = geo.heading_elevation_to(np.zeros(3), np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(h, np.pi / 2, atol=1e-9)
    _, e = geo.heading_elevation_to(np.zeros(3), np.array([0.0, 1.0, 1.0]))
    np.testing.assert_allclose(e, np.pi / 4, atol=1e-9)
