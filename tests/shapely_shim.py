"""Pure-NumPy shapely shim for the reference LIDAR env's geometry.

The reference's `LIDARLocalization2DEnv` uses exactly five shapely
operations (reference lidar_localization2d.py:288-290, 496-536):

  - ``shapely.box(x0, y0, x1, y1)`` on integer unit cells,
  - ``shapely.union_all([boxes])`` over those cells,
  - ``shapely.LineString([pos, target]).intersection(map_union)``,
  - result typing: empty / ``LineString`` / ``Point`` / ``MultiPoint`` /
    ``MultiLineString`` (anything else, e.g. a mixed-dimension
    GeometryCollection, falls through the env's ``else`` branch),
  - accessors ``.is_empty``, ``.xy`` (first coordinate = nearest entry
    point along the query segment), ``.geoms``.

For a union of axis-aligned closed unit boxes, segment-vs-region
intersection is a union of closed parameter intervals [t0, t1] along the
segment, computed exactly (to double rounding) by the slab method.  GEOS
semantics reproduced here:

  * the intersection is taken against the *closed* region (boundary
    included), so a segment running along a wall face yields a
    1-D overlap and a segment grazing a corner yields a 0-D point;
  * intervals from face-adjacent cells merge (the union polygon has no
    interior wall there), including single-point pinches at
    corner-adjacent cells — the point-set union of touching closed
    intervals is one interval;
  * parts are emitted in increasing-t order and each part's coordinates
    run in the segment's direction, so ``.xy[0][0]`` is the entry point
    (what the env reads at lidar_localization2d.py:506-508);
  * a mixed 0-D/1-D result is a :class:`GeometryCollection`, which the
    env's isinstance chain does not recognise (→ treated as "no hit"),
    matching what real GEOS would return.

This module is installed as ``sys.modules["shapely"]`` by
``tests/conftest.py`` when the real shapely is absent, which lets the
actual reference env run in-container for golden-trajectory parity.
"""

from __future__ import annotations

import numpy as np


class _Geometry:
    is_empty = False


class Point(_Geometry):
    def __init__(self, x, y=None):
        if y is None:
            x, y = x
        self._x = float(x)
        self._y = float(y)

    @property
    def xy(self):
        return [self._x], [self._y]


class LineString(_Geometry):
    def __init__(self, coords=()):
        self._coords = np.asarray(coords, dtype=np.float64).reshape(-1, 2)

    @property
    def is_empty(self):
        return len(self._coords) == 0

    @property
    def xy(self):
        return list(self._coords[:, 0]), list(self._coords[:, 1])

    def intersection(self, other):
        if not isinstance(other, _BoxUnion):
            raise NotImplementedError(
                "shim supports LineString ∩ union_all(box(...)) only"
            )
        return other._intersect_segment(self._coords[0], self._coords[-1])


class MultiPoint(_Geometry):
    def __init__(self, geoms):
        self.geoms = list(geoms)


class MultiLineString(_Geometry):
    def __init__(self, geoms):
        self.geoms = list(geoms)


class GeometryCollection(_Geometry):
    """Mixed-dimension result. The reference env never isinstance-checks
    this type, so it falls through to the no-hit branch
    (lidar_localization2d.py:526-528) — same as with real GEOS."""

    def __init__(self, geoms):
        self.geoms = list(geoms)


class _Box(_Geometry):
    def __init__(self, x0, y0, x1, y1):
        self.bounds = (float(x0), float(y0), float(x1), float(y1))


def box(x0, y0, x1, y1):
    return _Box(x0, y0, x1, y1)


class _BoxUnion(_Geometry):
    def __init__(self, boxes):
        # (N, 4) float64 [x0, y0, x1, y1]
        self._boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)

    def _intersect_segment(self, p, q):
        p = np.asarray(p, np.float64)
        d = np.asarray(q, np.float64) - p
        b = self._boxes
        if len(b) == 0:
            return LineString()
        t0 = np.zeros(len(b))
        t1 = np.ones(len(b))
        valid = np.ones(len(b), dtype=bool)
        for k in (0, 1):
            lo, hi = b[:, k], b[:, k + 2]
            if d[k] == 0.0:
                valid &= (p[k] >= lo) & (p[k] <= hi)
            else:
                ta = (lo - p[k]) / d[k]
                tb = (hi - p[k]) / d[k]
                t0 = np.maximum(t0, np.minimum(ta, tb))
                t1 = np.minimum(t1, np.maximum(ta, tb))
        valid &= t0 <= t1
        if not valid.any():
            return LineString()
        iv = np.stack([t0[valid], t1[valid]], axis=-1)
        iv = iv[np.lexsort((iv[:, 1], iv[:, 0]))]
        # Union of closed intervals: touching intervals merge (shared cell
        # faces and corner pinches are interior to the union polygon's
        # point-set intersection with the line). TOL absorbs f64 rounding:
        # the reference's diagonal beam directions have |dx| != |dy| by one
        # ulp (5*cos vs 5*sin of the same angle), so an exact lattice-corner
        # graze computes an interval of width ~1e-16 rather than 0. Real
        # geometry can't produce widths/gaps below the free-cell crossing
        # length, so the threshold only ever soaks up rounding noise.
        TOL = 1e-9
        merged = [list(iv[0])]
        for a, bb in iv[1:]:
            if a <= merged[-1][1] + TOL:
                merged[-1][1] = max(merged[-1][1], bb)
            else:
                merged.append([a, bb])

        def part(a, bb):
            if bb - a <= TOL:
                return Point(p + a * d)
            return LineString([p + a * d, p + bb * d])

        parts = [part(a, bb) for a, bb in merged]
        if len(parts) == 1:
            return parts[0]
        kinds = {type(g) for g in parts}
        if kinds == {Point}:
            return MultiPoint(parts)
        if kinds == {LineString}:
            return MultiLineString(parts)
        return GeometryCollection(parts)


def union_all(geoms):
    boxes = []
    for g in geoms:
        if not isinstance(g, _Box):
            raise NotImplementedError("shim supports union_all of boxes only")
        boxes.append(g.bounds)
    return _BoxUnion(boxes)
