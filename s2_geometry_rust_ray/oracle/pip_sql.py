"""DuckDB-SQL twin of the point-in-polygon join.

Reproduces the engine's crossing-parity PIP (geometry/loop.py) bit-exactly
on the fast path: vertex/edge-normal float literals are lifted verbatim from
the engine's own Loop objects, the point xyz comes from the shared bit-exact
encode CTE, and every determinant is the same left-associated
(a*b + c*d) + e*f expression the NumPy kernel evaluates.  (The engine's
exact-arithmetic fallback band is ~1.6e-15 wide; synthetic points never land
in it, so plain SQL sign() agrees.)
"""

from __future__ import annotations

from ..functions.predicates import ORIGIN
from ..geometry.loop import Polygon
from .sql import cte_encode, flit

OX, OY, OZ = (flit(v) for v in ORIGIN)


def _edges_values(polys: dict[str, Polygon]) -> str:
    rows = []
    for pid, poly in polys.items():
        origin_inside = False
        for lp in poly.loops:
            origin_inside ^= lp.origin_inside
        for lp in poly.loops:
            n = lp.num_vertices()
            for e in range(n):
                va = lp.v[e]
                vb = lp.vnext[e]
                nn = lp.edge_normals[e]
                dac = int(lp.dac[e])
                rows.append(
                    "('{pid}',{oi},{vax},{vay},{vaz},{vbx},{vby},{vbz},"
                    "{nx},{ny},{nz},{dac})".format(
                        pid=pid,
                        oi="TRUE" if origin_inside else "FALSE",
                        vax=flit(va[0]), vay=flit(va[1]), vaz=flit(va[2]),
                        vbx=flit(vb[0]), vby=flit(vb[1]), vbz=flit(vb[2]),
                        nx=flit(nn[0]), ny=flit(nn[1]), nz=flit(nn[2]),
                        dac=dac,
                    )
                )
    return ", ".join(rows)


def q_pip_join(src_sql: str, key_expr: str, polys: dict[str, Polygon], key_name: str) -> str:
    """(key, polygon_id) inner-join rows: polygons containing each point."""
    edges = _edges_values(polys)
    return (
        cte_encode(src_sql, key_expr)
        + f""",
  __edges(polygon_id, origin_inside, vax, vay, vaz, vbx, vby, vbz, nx, ny, nz, dac)
    AS (VALUES {edges}),
  __ov AS (
    SELECT key,
           {OY} * z - {OZ} * y AS ovx,
           {OZ} * x - {OX} * z AS ovy,
           {OX} * y - {OY} * x AS ovz,
           x, y, z
    FROM __xyz
  ),
  __cross AS (
    SELECT p.key, e.polygon_id, e.origin_inside,
      CASE WHEN -sign(p.ovx*e.vax + p.ovy*e.vay + p.ovz*e.vaz)
                 = sign(p.ovx*e.vbx + p.ovy*e.vby + p.ovz*e.vbz)
            AND -sign(p.ovx*e.vax + p.ovy*e.vay + p.ovz*e.vaz)
                 = -sign(p.x*e.nx + p.y*e.ny + p.z*e.nz)
            AND -sign(p.ovx*e.vax + p.ovy*e.vay + p.ovz*e.vaz) = e.dac
            AND sign(p.ovx*e.vax + p.ovy*e.vay + p.ovz*e.vaz) <> 0
      THEN 1 ELSE 0 END AS crossed
    FROM __ov p CROSS JOIN __edges e
  )
  SELECT key AS {key_name}, polygon_id
  FROM __cross
  GROUP BY key, polygon_id, origin_inside
  HAVING ((SUM(crossed) % 2) = 1) <> origin_inside"""
    )


def q_region_join_caps(src_sql: str, key_expr: str, caps: dict, key_name: str) -> str:
    """(key, region_id) rows for cap regions: chord^2 <= r2, bit-exact."""
    rows = []
    for rid, cap in caps.items():
        cx, cy, cz = (float(v) for v in cap.center)
        rows.append(f"('{rid}',{flit(cx)},{flit(cy)},{flit(cz)},{flit(cap.r2)})")
    return (
        cte_encode(src_sql, key_expr)
        + f""",
  __caps(region_id, cx, cy, cz, r2) AS (VALUES {', '.join(rows)})
  SELECT p.key AS {key_name}, c.region_id
  FROM __xyz p CROSS JOIN __caps c
  WHERE ((p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy))
        + (p.z - c.cz) * (p.z - c.cz) <= c.r2"""
    )


def q_region_join_rects(src_sql: str, key_expr: str, rects: dict, key_name: str) -> str:
    """(key, region_id) rows for lat/lng rectangles (degree comparisons)."""
    clauses = []
    for rid, rect in rects.items():
        clauses.append(
            f"SELECT key AS {key_name}, '{rid}' AS region_id FROM __geo WHERE "
            + rect.sql_predicate("lat", "lng")
        )
    return cte_encode(src_sql, key_expr) + "\n  " + "\n  UNION ALL ".join(clauses)
