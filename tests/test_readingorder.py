"""
Reading-order heuristics (reference: tests/test_readingorder.py): geometric
scenarios for the topological bbox reading order, topsort, and region
membership tests.
"""
import numpy as np
import pytest

from kraken_tpu.containers import BBoxLine
from kraken_tpu.lib.geometry import is_in_region, reading_order, topsort


def bbox_from_polygon(polygon):
    arr = np.asarray(polygon)
    return BBoxLine(id='_test', bbox=(int(arr[:, 0].min()), int(arr[:, 1].min()),
                                      int(arr[:, 0].max()), int(arr[:, 1].max())))


def test_is_in_region():
    assert is_in_region([(0, 0), (1, 1)], [(0, 0), (1, 0), (1, 1), (0, 1)])


def test_is_in_region_real():
    line = [(268, 656), (888, 656)]
    poly = [(268, 656), (265, 613), (885, 611), (888, 656), (885, 675), (265, 672)]
    assert is_in_region(line, poly)


def test_is_not_in_region():
    assert not is_in_region([(2, 2), (1, 1)], [(0, 0), (1, 0), (1, 1), (0, 1)])


def test_order_simple_over_under():
    """Vertically stacked, separated lines keep their order in both directions."""
    p0 = [[10, 10], [10, 20], [100, 20], [100, 10], [10, 10]]
    p1 = [[10, 30], [10, 40], [100, 40], [100, 30], [10, 30]]
    lines = [bbox_from_polygon(p) for p in (p0, p1)]
    assert list(reading_order(lines)) == [0, 1]
    assert list(reading_order(lines, 'rl')) == [0, 1]


def test_order_simple_over_under_touching():
    p0 = [[10, 10], [10, 30], [100, 30], [100, 10], [10, 10]]
    p1 = [[10, 30], [10, 40], [100, 40], [100, 30], [10, 30]]
    lines = [bbox_from_polygon(p) for p in (p0, p1)]
    assert list(reading_order(lines)) == [0, 1]
    assert list(reading_order(lines, 'rl')) == [0, 1]


def test_order_simple_left_right():
    p0 = [[10, 10], [10, 20], [100, 20], [100, 10], [10, 10]]
    p1 = [[150, 10], [150, 20], [250, 20], [250, 10], [150, 10]]
    assert list(reading_order([bbox_from_polygon(p) for p in (p0, p1)])) == [0, 1]


def test_order_simple_right_left():
    p0 = [[10, 10], [10, 20], [100, 20], [100, 10], [10, 10]]
    p1 = [[150, 10], [150, 20], [250, 20], [250, 10], [150, 10]]
    assert list(reading_order([bbox_from_polygon(p) for p in (p0, p1)], 'rl')) == [1, 0]


def test_order_simple_left_right_touching():
    """Horizontally touching extents order correctly (xfail in the
    reference test suite, tests/test_readingorder.py:103-117 — the
    half-open slice comparison here resolves the shared edge)."""
    p0 = [[10, 10], [10, 20], [100, 20], [100, 10], [10, 10]]
    p1 = [[100, 10], [100, 20], [250, 20], [250, 10], [100, 10]]
    assert list(reading_order([bbox_from_polygon(p) for p in (p0, p1)])) == [0, 1]


def test_order_simple_right_left_touching():
    p0 = [[10, 10], [10, 20], [100, 20], [100, 10], [10, 10]]
    p1 = [[100, 10], [100, 20], [250, 20], [250, 10], [100, 10]]
    assert list(reading_order([bbox_from_polygon(p) for p in (p0, p1)], 'rl')) == [1, 0]


def test_order_real_reverse():
    """Real example with lines listed in reverse vertical order."""
    p0 = [[474, 2712], [466, 2669], [1741, 2655], [1749, 2696], [1746, 2709], [474, 2725]]
    p1 = [[493, 2409], [488, 2374], [1733, 2361], [1741, 2395], [1738, 2409], [493, 2422]]
    lines = [bbox_from_polygon(p) for p in (p0, p1)]
    assert list(reading_order(lines)) == [1, 0]
    assert list(reading_order(lines, 'rl')) == [1, 0]


def test_order_real_in_order():
    p0 = [[493, 2409], [488, 2374], [1733, 2361], [1741, 2395], [1738, 2409], [493, 2422]]
    p1 = [[474, 2712], [466, 2669], [1741, 2655], [1749, 2696], [1746, 2709], [474, 2725]]
    lines = [bbox_from_polygon(p) for p in (p0, p1)]
    assert list(reading_order(lines)) == [0, 1]
    assert list(reading_order(lines, 'rl')) == [0, 1]


@pytest.mark.parametrize('partial,expected', [
    (np.array([[1, 1, 1], [0, 1, 1], [0, 0, 1]]), [0, 1, 2]),
    (np.array([[0, 1, 1], [0, 0, 1], [0, 0, 0]]), [0, 1, 2]),
    (np.array([[1, 1, 1], [0, 1, 0], [0, 1, 1]]), [0, 2, 1]),
    (np.array([[0, 1, 1], [0, 0, 0], [0, 1, 0]]), [0, 2, 1]),
])
def test_topsort(partial, expected):
    assert np.array_equal(topsort(partial), expected)


def test_partial_order_matches_scalar_oracle():
    """The vectorized _partial_order must reproduce the scalar triple-loop
    semantics exactly, including the value-equality separator exclusion
    (duplicate extents) and both text directions."""
    import random
    import numpy as np
    from kraken_tpu.lib.geometry import _partial_order

    def scalar(extents, text_direction='lr'):
        n = len(extents)
        order = np.zeros((n, n), 'B')

        def x_overlaps(u, v):
            return u[1].start < v[1].stop and u[1].stop > v[1].start

        def above(u, v):
            return u[0].start < v[0].start

        def left_of(u, v):
            return u[1].stop < v[1].start

        def separates(w, u, v):
            if w == u or w == v:
                return False
            if w[0].stop < min(u[0].start, v[0].start):
                return False
            if w[0].start > max(u[0].stop, v[0].stop):
                return False
            return w[1].start < u[1].stop and w[1].stop > v[1].start
        if text_direction == 'rl':
            def horizontal_order(u, v):
                return not left_of(u, v)
        else:
            horizontal_order = left_of
        for i, u in enumerate(extents):
            for j, v in enumerate(extents):
                if x_overlaps(u, v):
                    if above(u, v):
                        order[i, j] = 1
                elif (not any(separates(w, u, v) for w in extents)
                      and horizontal_order(u, v)):
                    order[i, j] = 1
        return order

    random.seed(7)
    for trial in range(25):
        n = random.randint(0, 40)
        ex = []
        for _ in range(n):
            r0 = random.randint(0, 100)
            c0 = random.randint(0, 100)
            ex.append((slice(r0, r0 + random.randint(1, 40)),
                       slice(c0, c0 + random.randint(1, 40))))
        if trial % 4 == 0 and n > 2:
            ex[1] = ex[0]
        td = random.choice(['lr', 'rl'])
        assert np.array_equal(_partial_order(ex, td), scalar(ex, td)), (n, td)
