import numpy as np
import pytest

from brdrq_ray.geom import core as g
from brdrq_ray.geom.buffer import closing, dilate, erode, opening


def sq(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], dtype=float)


def area(parts):
    return g.geom_area(g.GEOM_POLYGON, parts)


def test_dilate_square():
    out = dilate([[sq(0, 0, 10, 10)]], 1.0)
    # area = 100 + perimeter*r + pi*r^2 (round corners, discretized slightly under)
    expect = 100 + 40 * 1.0 + np.pi
    assert area(out) == pytest.approx(expect, rel=0.01)


def test_erode_square():
    out = erode([[sq(0, 0, 10, 10)]], 1.0)
    assert area(out) == pytest.approx(64.0, rel=0.02)


def test_erode_kills_sliver():
    out = erode([[sq(0, 0, 100, 0.5)]], 1.0)
    assert area(out) == pytest.approx(0.0, abs=1e-6)


def test_opening_removes_thin_protrusion():
    # square with a thin spike attached
    body = [[sq(0, 0, 10, 10)], [sq(10, 4.8, 30, 5.2)]]
    out = opening(body, 1.0)
    assert area(out) == pytest.approx(100.0, rel=0.05)


def test_closing_fills_crack():
    # two squares separated by a 0.5 m crack; closing with r=1 bridges it
    body = [[sq(0, 0, 10, 10)], [sq(10.5, 0, 20, 10)]]
    out = closing(body, 1.0)
    assert area(out) >= 195.0 + 4.0  # crack (5 m2) mostly filled
