"""Element tabulation unit tests: partition of unity, nodal delta property,
gradient correctness (finite differences), quadrature exactness."""

import numpy as np
import pytest

from fem_glass_tempering_tpu.fem.elements import lagrange_element
from fem_glass_tempering_tpu.fem.quadrature import cell_quadrature, facet_quadrature
from fem_glass_tempering_tpu.fem.reference_elements import get_cell

CELLS = ["interval", "triangle", "quad", "tet", "hex"]
DEGREES = [1, 2, 3]


@pytest.mark.parametrize("cell", CELLS)
@pytest.mark.parametrize("degree", DEGREES)
def test_nodal_delta(cell, degree):
    el = lagrange_element(cell, degree)
    tab = el.tabulate(el.nodes)
    np.testing.assert_allclose(tab, np.eye(el.nloc), atol=1e-9)


@pytest.mark.parametrize("cell", CELLS)
@pytest.mark.parametrize("degree", DEGREES)
def test_partition_of_unity(cell, degree):
    el = lagrange_element(cell, degree)
    rng = np.random.default_rng(0)
    pts = rng.random((20, get_cell(cell).tdim))
    if get_cell(cell).simplex and get_cell(cell).tdim > 1:
        pts /= pts.sum(axis=1, keepdims=True) * 1.5  # keep inside simplex
    np.testing.assert_allclose(el.tabulate(pts).sum(axis=1), 1.0, atol=1e-9)
    np.testing.assert_allclose(
        el.tabulate_grad(pts).sum(axis=1), 0.0, atol=1e-8
    )


@pytest.mark.parametrize("cell", CELLS)
@pytest.mark.parametrize("degree", [1, 2])
def test_gradient_fd(cell, degree):
    el = lagrange_element(cell, degree)
    tdim = get_cell(cell).tdim
    rng = np.random.default_rng(1)
    pts = 0.1 + 0.3 * rng.random((5, tdim))
    g = el.tabulate_grad(pts)
    eps = 1e-6
    for ax in range(tdim):
        dp = np.zeros(tdim)
        dp[ax] = eps
        fd = (el.tabulate(pts + dp) - el.tabulate(pts - dp)) / (2 * eps)
        np.testing.assert_allclose(g[:, :, ax], fd, atol=1e-6)


@pytest.mark.parametrize("cell,vol", [
    ("interval", 1.0), ("triangle", 0.5), ("quad", 1.0),
    ("tet", 1.0 / 6.0), ("hex", 1.0),
])
def test_quadrature_volume(cell, vol):
    for degree in (1, 2, 3, 4):
        _, w = cell_quadrature(cell, degree)
        np.testing.assert_allclose(w.sum(), vol, rtol=1e-12)


def _analytic_moment(cell, exps):
    """∫ x^a y^b z^c over the reference cell, analytic.

    Tensor cells: Π 1/(e_i+1). Simplex: Π e_i! / (Σe_i + tdim)!."""
    from math import factorial

    rc = get_cell(cell)
    if not rc.simplex or rc.tdim == 1:
        return np.prod([1.0 / (e + 1) for e in exps])
    num = np.prod([factorial(int(e)) for e in exps])
    return num / factorial(int(sum(exps)) + rc.tdim)


@pytest.mark.parametrize("cell", CELLS)
def test_quadrature_poly_exactness(cell):
    """∫ x^a y^b z^c over the reference cell matches analytic moments."""
    tdim = get_cell(cell).tdim
    deg = 3
    p, w = cell_quadrature(cell, 2 * deg)
    rng = np.random.default_rng(2)
    for _ in range(8):
        exps = rng.integers(0, deg + 1, size=tdim)
        val = np.sum(w * np.prod(p ** exps, axis=1))
        np.testing.assert_allclose(val, _analytic_moment(cell, exps), rtol=1e-10)


@pytest.mark.parametrize("cell", CELLS)
def test_facet_quadrature_measure(cell):
    p, w = facet_quadrature(cell, 3)
    fc = {"interval": 1.0, "triangle": 1.0, "quad": 1.0, "tet": 0.5, "hex": 1.0}
    np.testing.assert_allclose(w.sum(), fc[cell], rtol=1e-12)
