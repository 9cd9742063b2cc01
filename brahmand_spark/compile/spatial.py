"""openCypher spatial subset (r12, extension — the reference has no
spatial type, ref: ast.rs:197-204): ``point()`` values are plain
structs, distance/bbox are native JVM column math, so spatial
predicates stay inside WholeStageCodegen and never leave the scan
stage's pipeline.

Design (documented subset):

* ``point({x, y})`` -> ``struct(x double, y double, crs 'cartesian')``;
  ``point({longitude, latitude})`` -> the same struct with x=longitude,
  y=latitude and crs 'wgs-84'. 3D forms (r13, VERDICT r12 missing
  #6): ``point({x, y, z})`` -> 4-field struct with crs
  'cartesian-3d'; ``point({longitude, latitude, height})`` -> crs
  'wgs-84-3d'.
* ``point.distance(a, b)`` (and legacy ``distance(a, b)``): euclidean
  for cartesian pairs (3D included), haversine meters on the MEAN
  EARTH RADIUS 6371008.8 m for wgs-84 pairs — the standard spherical
  approximation (Neo4j uses an ellipsoidal radius interpolation;
  centimeter-level divergence documented). wgs-84-3d follows Neo4j:
  sqrt(surface_distance^2 + delta_height^2). CRS mismatch (including
  2D vs 3D) yields NULL (openCypher).
* ``point.withinBBox(p, lowerLeft, upperRight)``: inclusive bounds,
  plain comparisons; a wgs-84 box whose lowerLeft.x > upperRight.x
  CROSSES THE ANTIMERIDIAN (r13) and matches longitudes >= ll.x OR
  <= ur.x — the Neo4j rule; cartesian boxes keep plain ordering
  (an inverted cartesian box is empty). z is ignored (2D box, Neo4j
  semantics).
* Accessors ride the struct: ``p.x``/``p.y``/``p.z``/``p.crs``;
  ``p.longitude``/``p.latitude``/``p.height`` are aliases for x/y/z
  resolved by the chained-access compiler when the base is a point
  struct.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import PlanError

#: struct dtype strings of point values, used for accessor dispatch
POINT_DTYPE = "struct<x:double,y:double,crs:string>"
POINT3D_DTYPE = "struct<x:double,y:double,z:double,crs:string>"

MEAN_EARTH_RADIUS_M = 6371008.8


def is_point_dtype(dtype: Optional[str]) -> bool:
    return dtype in (POINT_DTYPE, POINT3D_DTYPE)


def point_column(keys: list, cols: list) -> Column:
    """``point({...})`` from (lower-cased key, compiled column)
    pairs."""
    m = dict(zip(keys, cols))
    unknown = set(m) - {"x", "y", "longitude", "latitude", "crs",
                        "srid", "z", "height"}
    if unknown:
        raise PlanError(
            f"unknown point() component(s) {sorted(unknown)} "
            f"(supported: {{x, y[, z]}} or "
            f"{{longitude, latitude[, height]}})")
    if "x" in m and "y" in m:
        x, y, z = m["x"], m["y"], m.get("z")
        crs = "cartesian-3d" if z is not None else "cartesian"
        if "height" in m:
            raise PlanError(
                "point({x, y, ...}) takes z, not height (height "
                "pairs with longitude/latitude)")
    elif "longitude" in m and "latitude" in m:
        x, y, z = m["longitude"], m["latitude"], m.get("height")
        crs = "wgs-84-3d" if z is not None else "wgs-84"
        if "z" in m:
            raise PlanError(
                "point({longitude, latitude, ...}) takes height, "
                "not z (z pairs with x/y)")
    else:
        raise PlanError(
            "point() needs {x, y[, z]} or "
            "{longitude, latitude[, height]}")
    fields = [x.cast("double").alias("x"), y.cast("double").alias("y")]
    if z is not None:
        fields.append(z.cast("double").alias("z"))
    fields.append(F.lit(crs).alias("crs"))
    return F.struct(*fields)


def _surface(a: Column, b: Column) -> tuple[Column, Column]:
    """(euclidean_xy, haversine) between two points' x/y fields."""
    euclid = F.sqrt(
        F.pow(a["x"] - b["x"], F.lit(2))
        + F.pow(a["y"] - b["y"], F.lit(2)))
    lat1, lat2 = F.radians(a["y"]), F.radians(b["y"])
    dlat = F.radians(b["y"] - a["y"])
    dlon = F.radians(b["x"] - a["x"])
    h = (F.pow(F.sin(dlat / 2), F.lit(2))
         + F.cos(lat1) * F.cos(lat2)
         * F.pow(F.sin(dlon / 2), F.lit(2)))
    haversine = (F.lit(2.0 * MEAN_EARTH_RADIUS_M)
                 * F.asin(F.least(F.sqrt(h), F.lit(1.0))))
    return euclid, haversine


def distance(a: Column, b: Column,
             dtype_a: Optional[str] = None,
             dtype_b: Optional[str] = None) -> Column:
    """point.distance(a, b): euclidean (cartesian / cartesian-3d) or
    haversine meters (wgs-84; wgs-84-3d adds the height delta
    pythagorean, the Neo4j rule); NULL on CRS mismatch. The optional
    static dtypes (r13) pick the 3D math — the z field only exists on
    3D structs, so it cannot be referenced speculatively."""
    euclid, haversine = _surface(a, b)
    three_d = (dtype_a == POINT3D_DTYPE and dtype_b == POINT3D_DTYPE)
    if three_d:
        dz2 = F.pow(a["z"] - b["z"], F.lit(2))
        euclid = F.sqrt(F.pow(euclid, F.lit(2)) + dz2)
        haversine = F.sqrt(F.pow(haversine, F.lit(2)) + dz2)
    return (F.when(a["crs"] != b["crs"], F.lit(None))
            .when(a["crs"].isin("wgs-84", "wgs-84-3d"), haversine)
            .otherwise(euclid))


def within_bbox(p: Column, ll: Column, ur: Column) -> Column:
    """point.withinBBox(p, lowerLeft, upperRight), inclusive. A
    wgs-84 box with lowerLeft.x > upperRight.x crosses the
    ANTIMERIDIAN (r13): longitude matches >= ll.x OR <= ur.x."""
    wraps = (ll["x"] > ur["x"]) & ll["crs"].isin("wgs-84", "wgs-84-3d")
    x_in = F.when(
        wraps, (p["x"] >= ll["x"]) | (p["x"] <= ur["x"])
    ).otherwise((p["x"] >= ll["x"]) & (p["x"] <= ur["x"]))
    return (x_in
            & (p["y"] >= ll["y"]) & (p["y"] <= ur["y"])
            & (p["crs"] == ll["crs"]) & (p["crs"] == ur["crs"]))
