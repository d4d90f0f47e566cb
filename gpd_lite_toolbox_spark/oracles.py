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

# ---------------------------------------------------------------- joins
# Rectangle layers make every spatial predicate closed-form interval
# arithmetic — exactly what the engine's pair-stats kernel computes.

INTERSECTS_PAIRS = f"""
WITH {oracle_ctes('polys')}
SELECT a.id AS left_id, b.id AS right_id
FROM polys a, polys b
WHERE a.x0 <= b.x1 AND b.x0 <= a.x1 AND a.y0 <= b.y1 AND b.y0 <= a.y1
"""

FTOUCHES_PAIRS = f"""
WITH {oracle_ctes('polys')}
SELECT a.id AS left_id, b.id AS right_id
FROM polys a, polys b
WHERE a.x0 <= b.x1 + 10.0 AND b.x0 - 10.0 <= a.x1
  AND a.y0 <= b.y1 + 10.0 AND b.y0 - 10.0 <= a.y1
"""

BORDERS = f"""
WITH {oracle_ctes('polys')},
pair AS (
  SELECT a.id AS left_id, b.id AS right_id,
         a.code || '-' || b.code AS code,
         LEAST(a.x1 + 1.0, b.x1 + 1.0)
             - GREATEST(a.x0 - 1.0, b.x0 - 1.0) AS w,
         LEAST(a.y1 + 1.0, b.y1 + 1.0)
             - GREATEST(a.y0 - 1.0, b.y0 - 1.0) AS h
  FROM polys a, polys b WHERE a.id <> b.id)
SELECT code, left_id, right_id,
       ROUND(CASE WHEN w = 0 OR h = 0 THEN w + h
                  ELSE 2.0 * (w + h) END, 6) AS length
FROM pair WHERE w >= 0 AND h >= 0
"""

SHARED_BORDER = f"""
WITH {oracle_ctes('polys')},
touch AS (
  SELECT a.id AS left_id, b.id AS right_id,
         LEAST(a.x1 + 0.01, b.x1) - GREATEST(a.x0 - 0.01, b.x0) AS w,
         LEAST(a.y1 + 0.01, b.y1) - GREATEST(a.y0 - 0.01, b.y0) AS h
  FROM polys a, polys b
  WHERE a.id <> b.id
    AND a.x0 <= b.x1 AND b.x0 <= a.x1
    AND a.y0 <= b.y1 AND b.y0 <= a.y1)
SELECT left_id, right_id,
       ROUND(CASE WHEN w = 0 OR h = 0 THEN w + h
                  ELSE 2.0 * (w + h) END, 6) AS shared_border_len
FROM touch
"""

INTERSECTION_PART = f"""
WITH {oracle_ctes('polys', 'polys_b')},
pair AS (
  SELECT a.id AS left_id, b.id AS right_id,
         LEAST(a.x1, b.x1) - GREATEST(a.x0, b.x0) AS w,
         LEAST(a.y1, b.y1) - GREATEST(a.y0, b.y0) AS h,
         (a.x1 - a.x0) * (a.y1 - a.y0) AS a_area
  FROM polys a, polys_b b)
SELECT left_id, right_id, ROUND(w * h / a_area, 6) AS part
FROM pair WHERE w > 0 AND h > 0
"""

# ------------------------------------------------------- explode/dissolve
MULTI_TO_SINGLE = f"""
WITH {oracle_ctes('mpoly_parts')}
SELECT id, code, part_idx,
       (x1 - x0) * (y1 - y0) AS area,
       (x0 + x1) / 2.0 AS cx,
       (y0 + y1) / 2.0 AS cy
FROM mpoly_parts
"""

DUMB_MULTI_TO_SINGLE = f"""
WITH {oracle_ctes('mpoly_parts')}
SELECT id, code,
       (x1 - x0) * (y1 - y0) AS area,
       (x0 + x1) / 2.0 AS cx,
       (y0 + y1) / 2.0 AS cy
FROM mpoly_parts WHERE part_idx = 0
"""

DISSOLVE_COUNTRY = f"""
WITH {oracle_ctes('polys')}
SELECT country,
       CAST(COUNT(*) AS INT) AS n_parts,
       ROUND(SUM((x1 - x0) * (y1 - y0)), 6) AS area,
       'U' || CAST(MIN(id) AS STRING) AS code
FROM polys GROUP BY country
"""

RANDOM_PTS = f"""
WITH {oracle_ctes('polys')},
j4 AS (SELECT 0 AS j UNION ALL SELECT 1 UNION ALL SELECT 2)
SELECT id, CAST(j AS BIGINT) AS k,
       ROUND(x0 + (CAST((id * 2654435761 + j * 97561) % 1000003 AS DOUBLE)
                   / 1000003.0) * (x1 - x0), 6) AS px,
       ROUND(y0 + (CAST((id * 2246822519 + j * 40503) % 1000003 AS DOUBLE)
                   / 1000003.0) * (y1 - y0), 6) AS py
FROM polys CROSS JOIN j4
"""

# ------------------------------------------------------------------ snap
SNAP_POINTS = f"""
WITH {oracle_ctes('points', 'road_verts')},
cand AS (
  SELECT p.id, p.x, p.y,
         v.id AS snapped_id, v.vidx AS snapped_vidx,
         v.vx AS snap_x, v.vy AS snap_y,
         SQRT((p.x - v.vx) * (p.x - v.vx)
              + (p.y - v.vy) * (p.y - v.vy)) AS d
  FROM points p, road_verts v
  WHERE v.vx BETWEEN p.x - 500.0 AND p.x + 500.0
    AND v.vy BETWEEN p.y - 500.0 AND p.y + 500.0),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY id ORDER BY d, snapped_id, snapped_vidx) AS rn
  FROM cand WHERE d <= 500.0)
SELECT id, x, y, snapped_id, snapped_vidx, snap_x, snap_y,
       ROUND(d, 6) AS snap_dist
FROM ranked WHERE rn = 1
"""

# --------------------------------------------------------- native kernels
HAV_DIST = f"""
WITH {oracle_ctes('points')},
ll AS (SELECT id, x / 1000.0 - 50.0 AS lon, y / 1000.0 - 40.0 AS lat
       FROM points WHERE id % 37 = 0),
pr AS (SELECT a.id AS id, a.lon AS lon1, a.lat AS lat1,
              b.lon AS lon2, b.lat AS lat2
       FROM ll a JOIN ll b ON b.id = a.id + 37),
t AS (SELECT id,
             SIN((RADIANS(lat2) - RADIANS(lat1)) / 2) AS sdlat,
             SIN((RADIANS(lon2) - RADIANS(lon1)) / 2) AS sdlon,
             COS(RADIANS(lat1)) AS c1, COS(RADIANS(lat2)) AS c2
      FROM pr)
SELECT id,
       ROUND(2.0 * 6367.0 * ASIN(SQRT(
           sdlat * sdlat + c1 * c2 * sdlon * sdlon)), 3) AS dist_km
FROM t
"""

BEARING = f"""
WITH {oracle_ctes('road_verts')},
ends AS (
  SELECT a.id, a.vx AS x0, a.vy AS y0, b.vx AS x1, b.vy AS y1
  FROM road_verts a JOIN road_verts b ON a.id = b.id
  WHERE a.vidx = 0 AND b.vidx = 3 AND a.id % 13 = 0),
raw AS (SELECT id, DEGREES(ATAN2(x1 - x0, y1 - y0)) AS b FROM ends)
SELECT id,
       ROUND(CASE WHEN b < 0 THEN b + 360.0 ELSE b END, 3) AS bearing,
       ROUND(CASE WHEN (CASE WHEN b < 0 THEN b + 360.0 ELSE b END) > 180.0
                  THEN (CASE WHEN b < 0 THEN b + 360.0 ELSE b END) - 360.0
                  ELSE (CASE WHEN b < 0 THEN b + 360.0 ELSE b END)
             END, 3) AS bearing_180
FROM raw
"""
