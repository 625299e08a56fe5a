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


def _parity_ctes(polys: dict[str, Polygon]) -> str:
    """The __edges/__ov/__cross CTE fragment shared by the PIP and
    within-distance oracles."""
    edges = _edges_values(polys)
    return f""",
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
  )"""


_PARITY_SELECT = """SELECT key, polygon_id
  FROM __cross
  GROUP BY key, polygon_id, origin_inside
  HAVING ((SUM(crossed) % 2) = 1) <> origin_inside"""


def q_pip_join(src_sql: str, key_expr: str, polys: dict[str, Polygon], key_name: str) -> str:
    """(key, polygon_id) inner-join rows: polygons containing each point."""
    return (
        cte_encode(src_sql, key_expr)
        + _parity_ctes(polys)
        + f"\n  {_PARITY_SELECT.replace('SELECT key,', f'SELECT key AS {key_name},', 1)}"
    )


def _dist_edges_values(polys: dict[str, Polygon]) -> str:
    """Per-edge distance constants, lifted from the SAME arrays the engine
    stage uses (stages/distance.edge_constants)."""
    from ..stages.distance import edge_constants

    return _dist_edges_values_from_consts(
        {pid: edge_constants(poly) for pid, poly in polys.items()}
    )


def _dist_edges_values_from_consts(consts: dict) -> str:
    rows = []
    for pid, c in consts.items():
        a, b, n, na, bn, nn = c
        for e in range(len(a)):
            vals = [
                flit(v)
                for v in (
                    a[e, 0], a[e, 1], a[e, 2], b[e, 0], b[e, 1], b[e, 2],
                    n[e, 0], n[e, 1], n[e, 2], na[e, 0], na[e, 1], na[e, 2],
                    bn[e, 0], bn[e, 1], bn[e, 2], nn[e],
                )
            ]
            rows.append(f"('{pid}'," + ",".join(vals) + ")")
    return ", ".join(rows)


def q_within_distance_join(src_sql: str, key_expr: str, polys: dict[str, Polygon],
                           key_name: str, chord2: float) -> str:
    """(key, polygon_id) rows for distance(point, polygon region) <= r:
    crossing-parity containment UNION min-edge-chord^2 <= chord^2(r), both
    in the engine's exact float expressions (stages/distance.py)."""
    c2 = flit(chord2)
    w = "(p.x*e.nx + p.y*e.ny + p.z*e.nz) / sqrt(e.nn)"
    wclamp = f"GREATEST(-1.0, LEAST(1.0, {w}))"
    return (
        cte_encode(src_sql, key_expr)
        + _parity_ctes(polys)
        + f""",
  __dedges(polygon_id, ax, ay, az, bx, by, bz, nx, ny, nz,
           nax, nay, naz, bnx, bny, bnz, nn) AS (VALUES {_dist_edges_values(polys)}),
  __edist AS (
    SELECT p.key, e.polygon_id,
      min(CASE WHEN (p.x*e.nax + p.y*e.nay + p.z*e.naz) >= 0.0
                AND (p.x*e.bnx + p.y*e.bny + p.z*e.bnz) >= 0.0
          THEN 2.0 - 2.0*sqrt(GREATEST(0.0, 1.0 - {wclamp} * {wclamp}))
          ELSE LEAST(2.0 - 2.0*(p.x*e.ax + p.y*e.ay + p.z*e.az),
                     2.0 - 2.0*(p.x*e.bx + p.y*e.by + p.z*e.bz)) END) AS d2
    FROM __xyz p CROSS JOIN __dedges e
    GROUP BY 1, 2
  ),
  __inside AS ({_PARITY_SELECT})
  SELECT key AS {key_name}, polygon_id FROM __inside
  UNION
  SELECT key AS {key_name}, polygon_id FROM __edist WHERE d2 <= {c2}"""
    )


def q_boolean_pip(src_sql: str, key_expr: str, pa: Polygon, pb: Polygon,
                  key_name: str) -> str:
    """Set-algebra twin of the boolean-op PIP join: membership in the
    clipped union/intersection/difference polygons must equal OR/AND/EXCEPT
    of crossing-parity membership in the ORIGINAL squares."""
    return (
        cte_encode(src_sql, key_expr)
        + _parity_ctes({"a": pa, "b": pb})
        + f""",
  __inside AS ({_PARITY_SELECT}),
  __ia AS (SELECT key FROM __inside WHERE polygon_id = 'a'),
  __ib AS (SELECT key FROM __inside WHERE polygon_id = 'b')
  SELECT key AS {key_name}, 'union' AS polygon_id
    FROM (SELECT key FROM __ia UNION SELECT key FROM __ib)
  UNION ALL
  SELECT key AS {key_name}, 'intersection' AS polygon_id
    FROM (SELECT key FROM __ia INTERSECT SELECT key FROM __ib)
  UNION ALL
  SELECT key AS {key_name}, 'difference' AS polygon_id
    FROM (SELECT key FROM __ia EXCEPT SELECT key FROM __ib)"""
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


def q_route_buffer_join(src_sql: str, key_expr: str, routes: dict,
                        key_name: str, chord2: float) -> str:
    """(key, route_id) rows with min point-to-polyline-edge chord^2 <= r2
    — twin of pipelines/pip.route_buffer_join (edge distance only; a
    polyline has no interior/parity component)."""
    from ..geometry.polyline import Polyline
    from ..stages.distance import polyline_edge_constants

    import numpy as np

    consts = {}
    for rid, line in routes.items():
        if not isinstance(line, Polyline):
            line = Polyline.from_latlng_deg(np.asarray(line[0]), np.asarray(line[1]))
        consts[rid] = polyline_edge_constants(line)
    c2 = flit(chord2)
    w = "(p.x*e.nx + p.y*e.ny + p.z*e.nz) / sqrt(e.nn)"
    wclamp = f"GREATEST(-1.0, LEAST(1.0, {w}))"
    return (
        cte_encode(src_sql, key_expr)
        + f""",
  __dedges(polygon_id, ax, ay, az, bx, by, bz, nx, ny, nz,
           nax, nay, naz, bnx, bny, bnz, nn)
    AS (VALUES {_dist_edges_values_from_consts(consts)}),
  __edist AS (
    SELECT p.key, e.polygon_id,
      min(CASE WHEN (p.x*e.nax + p.y*e.nay + p.z*e.naz) >= 0.0
                AND (p.x*e.bnx + p.y*e.bny + p.z*e.bnz) >= 0.0
          THEN 2.0 - 2.0*sqrt(GREATEST(0.0, 1.0 - {wclamp} * {wclamp}))
          ELSE LEAST(2.0 - 2.0*(p.x*e.ax + p.y*e.ay + p.z*e.az),
                     2.0 - 2.0*(p.x*e.bx + p.y*e.by + p.z*e.bz)) END) AS d2
    FROM __xyz p CROSS JOIN __dedges e
    GROUP BY 1, 2
  )
  SELECT key AS {key_name}, polygon_id AS route_id
  FROM __edist WHERE d2 <= {c2}"""
    )
