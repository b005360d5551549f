"""Geodesic column expressions.

Re-expresses the reference's scalar helpers as pure Catalyst ``Column``
trees — no UDFs — so they stay inside whole-stage codegen and the optimizer
can fold constants through them:

* bearing:  reference ``calculateBearing`` (task.ts:14-27)
* distance: reference ``calculateDistance`` haversine (task.ts:37-50)

Semantics notes (SURVEY §7.4):
* the reference normalizes with ``(b + 360) % 360`` on an operand already in
  (-180, 180]; ``pmod(b + 360, 360)`` matches JS ``%`` there exactly.
* Earth radius 6371000 m, per task.ts:39.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0  # reference task.ts:39


def bearing_deg(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Initial great-circle bearing from (lat1,lon1) to (lat2,lon2), degrees [0,360).

    Column-expression form of reference task.ts:14-27.
    """
    phi1 = F.radians(lat1)
    phi2 = F.radians(lat2)
    dlon = F.radians(lon2 - lon1)
    y = F.sin(dlon) * F.cos(phi2)
    x = F.cos(phi1) * F.sin(phi2) - F.sin(phi1) * F.cos(phi2) * F.cos(dlon)
    b = F.degrees(F.atan2(y, x))
    return F.pmod(b + F.lit(360.0), F.lit(360.0))


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (haversine, R=6371000).

    Column-expression form of reference task.ts:37-50.
    """
    phi1 = F.radians(lat1)
    phi2 = F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.sin(dphi / 2) * F.sin(dphi / 2) + F.cos(phi1) * F.cos(phi2) * F.sin(
        dlon / 2
    ) * F.sin(dlon / 2)
    c = 2 * F.atan2(F.sqrt(a), F.sqrt(1 - a))
    return F.lit(EARTH_RADIUS_M) * c


# ANSI-SQL renderings of the same formulas, used to build DuckDB oracle
# queries (tests + driver correctness gate). Keep in exact sync with above.

def bearing_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"mod(degrees(atan2("
        f"sin(radians({lon2} - {lon1})) * cos(radians({lat2})), "
        f"cos(radians({lat1})) * sin(radians({lat2})) "
        f"- sin(radians({lat1})) * cos(radians({lat2})) * cos(radians({lon2} - {lon1}))"
        f")) + 360.0, 360.0)"
    )


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"6371000.0 * 2 * atan2(sqrt("
        f"sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2) "
        f"+ cos(radians({lat1})) * cos(radians({lat2})) "
        f"* sin(radians({lon2} - {lon1}) / 2) * sin(radians({lon2} - {lon1}) / 2)"
        f"), sqrt(1 - ("
        f"sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2) "
        f"+ cos(radians({lat1})) * cos(radians({lat2})) "
        f"* sin(radians({lon2} - {lon1}) / 2) * sin(radians({lon2} - {lon1}) / 2)"
        f")))"
    )
