"""DuckDB oracle SQL for every oracle-checkable query in __spark_entry__.

Each SQL string runs on DuckDB 1.0 (no spatial extension — unavailable in
this environment) against the driver's parquet views, re-deriving the
spatial fixtures via the SAME dialect-shared SQL Spark uses
(fixtures.py), then expressing the operator's semantics in closed-form
coordinate arithmetic. Mirrors are written expression-by-expression
against the Spark implementations so results are bit-identical (see
fixtures.py for the integer-valued-double convention that makes sums
order-independent).
"""

from __future__ import annotations

from .fixtures import oracle_ctes

GRID_H = 8000.0

# 32x32 literal index table: the dialect-free substitute for range().
_N32 = "(SELECT " + " UNION ALL SELECT ".join(str(i) for i in range(32)) + ")"
_N32 = _N32.replace("SELECT 0", "SELECT 0 AS n", 1)

# Grid CTEs shared by make_grid / gridify oracles. Mirrors
# operators/grid.py: column-major cell ids from top-left, x0 = xmin +
# col*h, y1 = ymax - row*h, x1 = x0 + h, y0 = y1 - h, truncating int
# division for col (positive => floor).
_GRID_CTES = f"""
d AS (SELECT MIN(x) AS xmin, MIN(y) AS ymin, MAX(x) AS xmax,
             MAX(y) AS ymax,
             CAST(CEIL((MAX(y) - MIN(y)) / {GRID_H}) AS BIGINT) AS nrows,
             CAST(CEIL((MAX(x) - MIN(x)) / {GRID_H}) AS BIGINT) AS ncols
      FROM points),
n32 AS {_N32},
nums AS (SELECT CAST(a.n * 32 + b.n AS BIGINT) AS cell_id
         FROM n32 a CROSS JOIN n32 b),
grid AS (SELECT cell_id,
                cell_id % nrows AS row,
                CAST(FLOOR(CAST(cell_id AS DOUBLE) / CAST(nrows AS DOUBLE))
                     AS BIGINT) AS col,
                xmin + CAST(FLOOR(CAST(cell_id AS DOUBLE)
                                  / CAST(nrows AS DOUBLE)) AS BIGINT)
                     * {GRID_H} AS x0,
                (ymax - (cell_id % nrows) * {GRID_H}) - {GRID_H} AS y0,
                (xmin + CAST(FLOOR(CAST(cell_id AS DOUBLE)
                                   / CAST(nrows AS DOUBLE)) AS BIGINT)
                      * {GRID_H}) + {GRID_H} AS x1,
                ymax - (cell_id % nrows) * {GRID_H} AS y1
         FROM nums CROSS JOIN d
         WHERE cell_id < nrows * ncols)
"""

MAKE_GRID = f"""
WITH {oracle_ctes('points')}, {_GRID_CTES}
SELECT cell_id, row, col, x0, y0, x1, y1 FROM grid
"""

GRIDIFY_STATS = f"""
WITH {oracle_ctes('points')}, {_GRID_CTES},
pts AS (
  SELECT CAST(LEAST(FLOOR((x - xmin) / {GRID_H}),
                    CAST(ncols - 1 AS DOUBLE)) * nrows
            + LEAST(FLOOR((ymax - y) / {GRID_H}),
                    CAST(nrows - 1 AS DOUBLE)) AS BIGINT) AS cell_id,
         t_obs
  FROM points CROSS JOIN d),
agg AS (
  SELECT cell_id,
         CAST(MIN(t_obs) AS DOUBLE) AS v_min,
         CAST(SUM(t_obs) AS DOUBLE) / COUNT(t_obs) AS v_mean,
         CAST(MAX(t_obs) AS DOUBLE) AS v_max,
         CAST(SUM(t_obs) AS DOUBLE) AS v_sum,
         SQRT(CAST(SUM(t_obs * t_obs) AS DOUBLE) / COUNT(t_obs)
              - (CAST(SUM(t_obs) AS DOUBLE) / COUNT(t_obs))
              * (CAST(SUM(t_obs) AS DOUBLE) / COUNT(t_obs))) AS v_std
  FROM pts GROUP BY cell_id)
SELECT g.cell_id, g.row, g.col, g.x0, g.y0, g.x1, g.y1,
       COALESCE(ROUND(a.v_min, 6), -1.0) AS t_obs_min,
       COALESCE(ROUND(a.v_mean, 6), -1.0) AS t_obs_mean,
       COALESCE(ROUND(a.v_max, 6), -1.0) AS t_obs_max,
       COALESCE(ROUND(a.v_sum, 6), -1.0) AS t_obs_sum,
       COALESCE(ROUND(a.v_std, 6), -1.0) AS t_obs_std
FROM grid g LEFT JOIN agg a ON g.cell_id = a.cell_id
"""

MEAN_COORDS_GLOBAL = f"""
WITH {oracle_ctes('points')}
SELECT ROUND(SUM(x * weight) / SUM(weight), 6) AS x,
       ROUND(SUM(y * weight) / SUM(weight), 6) AS y,
       ROUND(CAST(SUM(weight) AS DOUBLE), 6) AS weight
FROM points
"""

MEAN_COORDS_BY_CAT = f"""
WITH {oracle_ctes('points')}
SELECT cat,
       ROUND(SUM(x * weight) / SUM(weight), 6) AS x,
       ROUND(SUM(y * weight) / SUM(weight), 6) AS y,
       ROUND(CAST(SUM(weight) AS DOUBLE), 6) AS weight
FROM points GROUP BY cat
"""
