"""CRS transforms (SURVEY.md §2.9 G6).

Reference parity: notebooks/index.Rmd:532-533 — Basque survey points in UTM
zone 30N (EPSG:32630) reprojected to WGS84 (EPSG:4326).

No pyproj in this environment, so the inverse Transverse Mercator conversion
is implemented directly from the public USGS/Snyder series expansion (Snyder,
"Map Projections — A Working Manual", USGS PP 1395, eqs. 8-17..8-25) as a
vectorized numpy pandas UDF — Arrow-batched, executor-side, linear in rows.
Accuracy ~1e-6 deg (centimeters), ample for survey-site coordinates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf

# WGS84 ellipsoid
_A = 6378137.0
_F_INV = 298.257223563
_E2 = (2 - 1 / _F_INV) / _F_INV  # first eccentricity squared
_K0 = 0.9996
_E1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))


def _utm_to_wgs84_np(easting: np.ndarray, northing: np.ndarray, zone: int, north: bool):
    x = easting - 500000.0
    y = northing if north else northing - 10000000.0
    m = y / _K0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    e1 = _E1
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    ep2 = _E2 / (1 - _E2)
    c1 = ep2 * cos1**2
    t1 = tan1**2
    n1 = _A / np.sqrt(1 - _E2 * sin1**2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
    d = x / (n1 * _K0)
    lat = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * ep2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * ep2 - 3 * c1**2) * d**6 / 720
    )
    lon0 = np.deg2rad((zone - 1) * 6 - 180 + 3)
    lon = lon0 + (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * ep2 + 24 * t1**2) * d**5 / 120
    ) / cos1
    return np.rad2deg(lon), np.rad2deg(lat)


def utm_to_wgs84(df: DataFrame, x_col: str, y_col: str, zone: int = 30, north: bool = True) -> DataFrame:
    """Add ``lon``/``lat`` WGS84 columns from UTM easting/northing columns."""

    @pandas_udf("struct<lon:double, lat:double>")
    def _conv(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        lon, lat = _utm_to_wgs84_np(
            x.astype(float).to_numpy(), y.astype(float).to_numpy(), zone, north
        )
        return pd.DataFrame({"lon": lon, "lat": lat})

    out = df.withColumn("__ll", _conv(F.col(x_col), F.col(y_col)))
    return out.withColumn("lon", F.col("__ll.lon")).withColumn("lat", F.col("__ll.lat")).drop("__ll")
