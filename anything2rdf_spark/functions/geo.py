"""Geo kernel (SURVEY F20): ETRS-TM35FIN → WGS84 inverse transverse-Mercator
reprojection as a vectorized numpy pandas UDF — pure math over Arrow
batches, the reference's per-row series evaluation (PNR2RDF.scala:65-110)
re-expressed batch-at-a-time.

Formulas are the public EUREF/JHS-154 inverse Gauss–Krüger series (the same
constants the reference hardcodes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# GRS80 ellipsoid / TM35FIN projection constants (public, JHS-154)
_A = 6378137.0
_F = 1.0 / 298.257222101
_K0 = 0.9996
_LON0 = np.radians(27.0)
_E0 = 500000.0

_N = _F / (2.0 - _F)
_A1 = (_A / (1.0 + _N)) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
_E2 = 2.0 * _F - _F**2
_E = np.sqrt(_E2)

_H1 = _N / 2.0 - 2.0 * _N**2 / 3.0 + 37.0 * _N**3 / 96.0 - _N**4 / 360.0
_H2 = _N**2 / 48.0 + _N**3 / 15.0 - 437.0 * _N**4 / 1440.0
_H3 = 17.0 * _N**3 / 480.0 - 37.0 * _N**4 / 840.0
_H4 = 4397.0 * _N**4 / 161280.0


def _inverse(east: np.ndarray, north: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    zeta = north / (_A1 * _K0)
    eta = (east - _E0) / (_A1 * _K0)
    zeta1 = (
        zeta
        - _H1 * np.sin(2 * zeta) * np.cosh(2 * eta)
        - _H2 * np.sin(4 * zeta) * np.cosh(4 * eta)
        - _H3 * np.sin(6 * zeta) * np.cosh(6 * eta)
        - _H4 * np.sin(8 * zeta) * np.cosh(8 * eta)
    )
    eta1 = (
        eta
        - _H1 * np.cos(2 * zeta) * np.sinh(2 * eta)
        - _H2 * np.cos(4 * zeta) * np.sinh(4 * eta)
        - _H3 * np.cos(6 * zeta) * np.sinh(6 * eta)
        - _H4 * np.cos(8 * zeta) * np.sinh(8 * eta)
    )
    beta = np.arcsin(np.sin(zeta1) / np.cosh(eta1))
    ell = np.arctanh(np.sin(beta))  # noqa: E741 — isometric latitude term
    # conformal → geodetic latitude (fixed-point, converges in ~4 rounds)
    phi = beta.copy()
    for _ in range(6):
        phi = np.arctan(np.sinh(ell + _E * np.arctanh(_E * np.tanh(ell + _E * np.arctanh(_E * np.sin(phi))))))
    lon = _LON0 + np.arctan(np.sinh(eta1) / np.cos(zeta1))
    return np.degrees(phi), np.degrees(lon)


@F.pandas_udf(
    T.StructType(
        [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]
    )
)
def tm35fin_to_wgs84(east: pd.Series, north: pd.Series) -> pd.DataFrame:
    lat, lon = _inverse(east.to_numpy(dtype=float), north.to_numpy(dtype=float))
    out = pd.DataFrame({"lat": lat, "lon": lon})
    # null inputs arrive as NaN and would propagate as non-null NaN
    # coordinates past downstream isNotNull guards — return null fields
    bad = east.isna().to_numpy() | north.isna().to_numpy()
    if bad.any():
        out.loc[bad, ["lat", "lon"]] = None
    return out
