"""openCypher spatial subset (r12, extension — the reference has no
spatial type, ref: ast.rs:197-204): ``point()`` values are plain
structs, distance/bbox are native JVM column math, so spatial
predicates stay inside WholeStageCodegen and never leave the scan
stage's pipeline.

Design (documented subset):

* ``point({x, y})`` -> ``struct(x double, y double, crs 'cartesian')``;
  ``point({longitude, latitude})`` -> the same struct with x=longitude,
  y=latitude and crs 'wgs-84'. 2D only (the z/height forms raise).
* ``point.distance(a, b)`` (and legacy ``distance(a, b)``): euclidean
  for cartesian pairs, haversine meters on the MEAN EARTH RADIUS
  6371008.8 m for wgs-84 pairs — the standard spherical approximation
  (Neo4j uses an ellipsoidal radius interpolation; centimeter-level
  divergence documented). CRS mismatch yields NULL (openCypher).
* ``point.withinBBox(p, lowerLeft, upperRight)``: inclusive bounds,
  plain comparisons (wgs-84 boxes crossing the antimeridian are not
  special-cased; split the box).
* Accessors ride the struct: ``p.x``/``p.y``/``p.crs`` directly;
  ``p.longitude``/``p.latitude`` are aliases for x/y resolved by the
  chained-access compiler when the base is a point struct.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import PlanError

#: struct dtype string of a point value, used for accessor dispatch
POINT_DTYPE = "struct<x:double,y:double,crs:string>"

MEAN_EARTH_RADIUS_M = 6371008.8


def point_column(keys: list, cols: list) -> Column:
    """``point({...})`` from (lower-cased key, compiled column)
    pairs."""
    m = dict(zip(keys, cols))
    unknown = set(m) - {"x", "y", "longitude", "latitude", "crs",
                        "srid", "z", "height"}
    if unknown:
        raise PlanError(
            f"unknown point() component(s) {sorted(unknown)} "
            f"(supported 2D forms: {{x, y}} or "
            f"{{longitude, latitude}})")
    if "z" in m or "height" in m:
        raise PlanError("3D points are not supported (2D subset)")
    if "x" in m and "y" in m:
        x, y, crs = m["x"], m["y"], "cartesian"
    elif "longitude" in m and "latitude" in m:
        x, y, crs = m["longitude"], m["latitude"], "wgs-84"
    else:
        raise PlanError(
            "point() needs {x, y} or {longitude, latitude}")
    return F.struct(
        x.cast("double").alias("x"), y.cast("double").alias("y"),
        F.lit(crs).alias("crs"))


def distance(a: Column, b: Column) -> Column:
    """point.distance(a, b): euclidean (cartesian) or haversine
    meters (wgs-84); NULL on CRS mismatch."""
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
    return (F.when(a["crs"] != b["crs"], F.lit(None))
            .when(a["crs"] == "wgs-84", haversine)
            .otherwise(euclid))


def within_bbox(p: Column, ll: Column, ur: Column) -> Column:
    """point.withinBBox(p, lowerLeft, upperRight), inclusive."""
    return ((p["x"] >= ll["x"]) & (p["x"] <= ur["x"])
            & (p["y"] >= ll["y"]) & (p["y"] <= ur["y"])
            & (p["crs"] == ll["crs"]) & (p["crs"] == ur["crs"]))
