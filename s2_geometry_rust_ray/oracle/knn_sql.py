"""DuckDB brute-force kNN oracle — bit-exact twin of pipelines/knn.py
(same chord^2 expression, same (d2, neighbor) tie order)."""

from __future__ import annotations

from ..pipelines.knn import make_queries
from .sql import cte_encode, flit


def q_knn(src_sql: str, key_expr: str, k: int, n_queries: int, key_name: str = "neighbor") -> str:
    q = make_queries(n_queries)
    rows = ", ".join(
        f"({int(q['query_id'][i])},{flit(q['x'][i])},{flit(q['y'][i])},{flit(q['z'][i])})"
        for i in range(n_queries)
    )
    return (
        cte_encode(src_sql, key_expr)
        + f""",
  __queries(query_id, qx, qy, qz) AS (VALUES {rows}),
  __d AS (
    SELECT q.query_id, p.key AS neighbor,
           ((p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy))
             + (p.z - q.qz) * (p.z - q.qz) AS d2
    FROM __xyz p CROSS JOIN __queries q
  ),
  __r AS (
    SELECT query_id, neighbor, d2,
           row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor) AS rnk
    FROM __d
  )
  SELECT query_id, neighbor, d2, rnk::BIGINT AS rank FROM __r WHERE rnk <= {k}"""
    )
