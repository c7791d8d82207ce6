"""Spatial filtering + geodist — the ``geofilt`` / ``bbox`` /
``geodist()`` surface.

The analog of the reference's ``search/SpatialFilterQParserPlugin.java``
(geofilt + bbox over LatLonPointSpatialField) and the ``geodist()``
function source (``search/function/distance/GeoDistValueSource``-family;
Solr's sphere distance uses the haversine formula with the mean earth
radius 6371.0087714 km — ``DistanceUtils.EARTH_MEAN_RADIUS_KM``).

Spark-first: the distance is a pure JVM column expression (sin/cos/asin
inside whole-stage codegen), so ``geofilt`` is a pushable predicate and
``geodist`` sorting is TakeOrderedAndProject — no UDFs, no shuffle
before the top-k. ``bbox`` is the classic cheap pre-filter: the
lat/lon rectangle enclosing the circle (coarser than geofilt — it keeps
the rectangle's corners), exactly Solr's bbox semantics.

At 100 TB the bbox predicate is the one to push into the scan (min/max
pruning on lat/lon columns skips row groups); geofilt then refines the
survivors — compose as ``geofilt(bbox(df, ...), ...)``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Solr DistanceUtils.EARTH_MEAN_RADIUS_KM
EARTH_RADIUS_KM = 6371.0087714


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine, double precision)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geodist(df: DataFrame, lat_col: str, lon_col: str, pt: tuple[float, float]) -> DataFrame:
    """Attach ``dist_km`` = geodist(pt, row) (the ``geodist()`` function
    query / sort key)."""
    return df.withColumn(
        "dist_km",
        haversine_km(F.col(lat_col), F.col(lon_col), F.lit(float(pt[0])), F.lit(float(pt[1]))),
    )


def geofilt(
    df: DataFrame, lat_col: str, lon_col: str, pt: tuple[float, float], d_km: float
) -> DataFrame:
    """``{!geofilt pt=... d=...}``: exact great-circle radius filter."""
    return geodist(df, lat_col, lon_col, pt).where(F.col("dist_km") <= F.lit(float(d_km)))


def bbox(
    df: DataFrame, lat_col: str, lon_col: str, pt: tuple[float, float], d_km: float
) -> DataFrame:
    """``{!bbox}``: the lat/lon rectangle enclosing the d-km circle —
    cheaper and coarser than geofilt (keeps the corners), the standard
    scan-prunable pre-filter."""
    lat0, lon0 = float(pt[0]), float(pt[1])
    dlat = math.degrees(d_km / EARTH_RADIUS_KM)
    # longitude span widens with latitude; guard the poles
    cosl = math.cos(math.radians(lat0))
    dlon = 180.0 if cosl <= 1e-9 else math.degrees(d_km / (EARTH_RADIUS_KM * cosl))
    return df.where(
        (F.col(lat_col) >= lat0 - dlat) & (F.col(lat_col) <= lat0 + dlat)
        & (F.col(lon_col) >= lon0 - dlon) & (F.col(lon_col) <= lon0 + dlon)
    )


def synth_coords(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic (lat, lon) from an integer id — EXACT
    integer arithmetic then one double division, so Spark and the SQL
    oracle produce bit-identical coordinates (the testdata tables carry
    no geo columns; a real deployment reads its own lat/lon)."""
    i = F.col(id_col).cast("long")
    lat = (-90.0 + ((i * 7919) % 18000).cast("double") / 100.0).alias("lat")
    lon = (-180.0 + ((i * 104729) % 36000).cast("double") / 100.0).alias("lon")
    return df.withColumn("lat", lat).withColumn("lon", lon)
