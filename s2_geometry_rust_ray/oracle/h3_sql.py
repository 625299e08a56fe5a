"""DuckDB twin of the H3 aperture-7 encode (functions/h3.py).

Reproduces the engine's FULL canonical encode bit-exactly:
  * face selection: argmax of 20 face-center dots (row_number tie-break by
    face index = numpy argmax first-max);
  * gnomonic projection + lattice rotation: the engine's exact
    left-associated float expressions with all frame constants lifted via
    flit() (cos/sin of the lattice rotation are Python-computed literals —
    no SQL trig, which drifts 1 ulp);
  * cube rounding: DuckDB round_even == numpy half-to-even;
  * seam canonicalization: the engine iterates cell -> encode(center(cell))
    to its attractor cycle and takes min of the last 3 iterates; the SQL
    unrolls the same fixed 6-encode/5-decode chain for every row and
    selects CASE WHEN stable THEN e0 ELSE least(e3, e4, e5).

This is a genuine independent re-implementation of the evaluation order in
a different engine; agreement over 10^5 keys exercises face seams, the
rounding tie-break, and the packing layout.
"""

from __future__ import annotations

from ..functions.h3 import _OFF, _res_frame, FACE_CENTERS, FACE_U, FACE_V, _SQRT3
from .sql import cte_encode, flit

P23 = 1 << 23
P46 = 1 << 46
P51 = 1 << 51


def _face_values() -> str:
    rows = []
    for fi in range(20):
        c = FACE_CENTERS[fi]
        u = FACE_U[fi]
        v = FACE_V[fi]
        vals = ",".join(flit(t) for t in (c[0], c[1], c[2], u[0], u[1], u[2],
                                          v[0], v[1], v[2]))
        rows.append(f"({fi},{vals})")
    return ", ".join(rows)


def _encode_stage(src: str, out: str, res: int) -> str:
    """CTEs computing __{out} (key, cell) from {src} (key, x, y, z)."""
    s, ct, st = _res_frame(res)
    S, CT, ST = flit(s), flit(ct), flit(st)
    SQ3_3 = flit(_SQRT3 / 3.0)
    THIRD = flit(1.0 / 3.0)
    TWO3 = flit(2.0 / 3.0)
    return f""",
  {out}_best AS (
    SELECT p.key, p.x, p.y, p.z, f.fi,
           f.cx, f.cy, f.cz, f.ux, f.uy, f.uz, f.vx, f.vy, f.vz
    FROM {src} p CROSS JOIN __h3f f
    QUALIFY row_number() OVER (
      PARTITION BY p.key
      ORDER BY (p.x*f.cx + p.y*f.cy + p.z*f.cz) DESC, f.fi ASC) = 1
  ),
  {out} AS (
    SELECT key,
      x*cx + y*cy + z*cz AS sp,
      x/sp AS gx, y/sp AS gy, z/sp AS gz,
      (gx - cx)*ux + (gy - cy)*uy + (gz - cz)*uz AS a,
      (gx - cx)*vx + (gy - cy)*vy + (gz - cz)*vz AS b,
      (a*{CT} + b*{ST}) / {S} AS ar,
      ((-a)*{ST} + b*{CT}) / {S} AS br,
      {SQ3_3}*ar - {THIRD}*br AS qf,
      {TWO3}*br AS rf,
      -qf - rf AS yf,
      round_even(qf, 0) AS rx0,
      round_even(yf, 0) AS ry0,
      round_even(rf, 0) AS rz0,
      abs(rx0 - qf) AS ddx, abs(ry0 - yf) AS ddy, abs(rz0 - rf) AS ddz,
      CASE WHEN ddx > ddy AND ddx > ddz THEN -ry0 - rz0 ELSE rx0 END AS rxq,
      CASE WHEN NOT (ddx > ddy AND ddx > ddz) AND ddz > ddy
           THEN -rx0 - ry0 ELSE rz0 END AS rzr,
      CAST({res} AS UBIGINT)*{P51}::UBIGINT
        + CAST(fi AS UBIGINT)*{P46}::UBIGINT
        + CAST(CAST(rxq AS BIGINT) + {_OFF} AS UBIGINT)*{P23}::UBIGINT
        + CAST(CAST(rzr AS BIGINT) + {_OFF} AS UBIGINT) AS cell
    FROM {out}_best
  )"""


def _decode_stage(src: str, out: str, res: int) -> str:
    """CTE computing __{out} (key, x, y, z) = cell centers of {src}."""
    s, ct, st = _res_frame(res)
    S, CT, ST = flit(s), flit(ct), flit(st)
    SQ3 = flit(_SQRT3)
    SQ3_2 = flit(_SQRT3 / 2.0)
    return f""",
  {out} AS (
    -- NOTE the (key, cell) subselect: the upstream encode CTE carries
    -- intermediate columns (a, b, ...) and DuckDB resolves table columns
    -- BEFORE lateral aliases, which would silently bind the wrong values
    SELECT e.key,
      CAST((e.cell // {P23}::UBIGINT) % {P23}::UBIGINT AS BIGINT) - {_OFF} AS dq,
      CAST(e.cell % {P23}::UBIGINT AS BIGINT) - {_OFF} AS dr,
      {SQ3}*dq + {SQ3_2}*dr AS dxr,
      1.5*dr AS dyr,
      (dxr*{CT} - dyr*{ST})*{S} AS da,
      (dxr*{ST} + dyr*{CT})*{S} AS db,
      (f.cx + da*f.ux) + db*f.vx AS hx,
      (f.cy + da*f.uy) + db*f.vy AS hy,
      (f.cz + da*f.uz) + db*f.vz AS hz,
      sqrt((hx*hx + hy*hy) + hz*hz) AS nrm,
      hx/nrm AS x, hy/nrm AS y, hz/nrm AS z
    FROM (SELECT key, cell FROM {src}) e
    JOIN __h3f f ON f.fi = CAST((e.cell // {P46}::UBIGINT) % 32 AS BIGINT)
  )"""


def _h3_cell_ctes(res: int) -> str:
    """CTE chain from __xyz to __h3cell (key, cell): raw encode + unrolled
    seam-canonicalization cycle."""
    parts = [f",\n  __h3f(fi, cx, cy, cz, ux, uy, uz, vx, vy, vz) AS (VALUES {_face_values()})"]
    # the cell is a deterministic function of the key: encode each DISTINCT
    # key once (duplicate keys would collapse under the argmax window and
    # explode the USING(key) joins), multiply counts back at the end
    parts.append(",\n  __h3p0 AS (SELECT DISTINCT key, x, y, z FROM __xyz)")
    parts.append(_encode_stage("__h3p0", "__h3e0", res))
    for k in range(5):
        parts.append(_decode_stage(f"__h3e{k}", f"__h3p{k + 1}", res))
        parts.append(_encode_stage(f"__h3p{k + 1}", f"__h3e{k + 1}", res))
    parts.append(""",
  __h3cell AS (
    SELECT e0.key,
      CASE WHEN e1.cell = e0.cell THEN e0.cell
           ELSE least(e3.cell, e4.cell, e5.cell) END AS cell
    FROM __h3e0 e0
    JOIN __h3e1 e1 USING (key)
    JOIN __h3e3 e3 USING (key)
    JOIN __h3e4 e4 USING (key)
    JOIN __h3e5 e5 USING (key)
  )""")
    return "".join(parts)


def q_h3_tile_counts(src_sql: str, key_expr: str, res: int) -> str:
    """(h3_token, n) counts — twin of pipelines/tiling.h3_tile_counts."""
    return (
        cte_encode(src_sql, key_expr)
        + _h3_cell_ctes(res)
        + """
  SELECT lower(lpad(hex(c.cell), 16, '0')) AS h3_token, count(*) AS n
  FROM __xyz p JOIN __h3cell c USING (key) GROUP BY 1"""
    )
