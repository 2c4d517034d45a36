-- Cohort retention matrix (model-SQL twin of
-- queries/aggregates.py::orders_retention_cohort): customers grouped
-- by the month of their first order, counted at every month offset
-- where they ordered again. The offset is exact integer calendar
-- arithmetic ((dYear)*12 + dMonth) — never a float day difference —
-- so both engines bucket identically; output is O(months^2).
WITH firsts AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_dt
  FROM source_orders GROUP BY o_custkey
)
SELECT
  CAST(date_trunc('month', f.first_dt) AS TIMESTAMP) AS cohort_month,
  CAST((year(o.o_orderdate) - year(f.first_dt)) * 12
       + (month(o.o_orderdate) - month(f.first_dt)) AS BIGINT) AS month_offset,
  COUNT(DISTINCT o.o_custkey) AS n_customers
FROM source_orders o JOIN firsts f ON o.o_custkey = f.o_custkey
GROUP BY CAST(date_trunc('month', f.first_dt) AS TIMESTAMP),
         CAST((year(o.o_orderdate) - year(f.first_dt)) * 12
              + (month(o.o_orderdate) - month(f.first_dt)) AS BIGINT)
