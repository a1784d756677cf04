"""Element-wise interpolation tests (reference: src/Interpolations/)."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.models.interpolation import (
    barycentric_coordinates,
    bilinear,
    interpolate_elementwise,
)


def test_barycentric_vertices_and_centroid():
    xv = np.array([[0.0, 1.0, 0.0]])
    zv = np.array([[0.0, 0.0, 1.0]])
    N1, N2, N3 = barycentric_coordinates(xv, zv, np.array([0.0]), np.array([0.0]))
    assert N1[0] == pytest.approx(1.0)
    N1, N2, N3 = barycentric_coordinates(xv, zv, np.array([1 / 3]), np.array([1 / 3]))
    assert N1[0] == pytest.approx(1 / 3)
    assert N2[0] == pytest.approx(1 / 3)
    assert N3[0] == pytest.approx(1 / 3)


def test_bilinear_reproduces_linear_field():
    # quad in (theta, r): [bl, br, tr, tl]
    th = np.array([[0.1, 0.2, 0.2, 0.1]])
    r = np.array([[1.0, 1.0, 2.0, 2.0]])
    f = lambda t, rr: 3.0 * t + 0.5 * rr
    vals = f(th, r)
    tp = np.array([0.15, 0.12])
    rp = np.array([1.5, 1.9])
    out = bilinear(th, r, tp, rp, vals)
    np.testing.assert_allclose(out, f(tp, rp), rtol=1e-12)


def test_interpolate_elementwise_linear_in_r(tiny_annulus):
    """A field linear in r must be reproduced exactly on radial-edge
    secondary nodes (which share the vertex theta)."""
    gr, _, _ = tiny_annulus
    V = 2.0 + 0.001 * gr.r
    Vi = interpolate_elementwise(V, gr)
    # primary vertices untouched
    nprim = gr.ntheta * gr.nr + 1
    np.testing.assert_allclose(Vi[:nprim], V[:nprim])
    assert np.isfinite(Vi).all()
    # interpolated values stay within the global field range
    assert Vi.min() >= V.min() - 1e-9 and Vi.max() <= V.max() + 1e-9
