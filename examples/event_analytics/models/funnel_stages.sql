-- Ordered funnel view -> click -> purchase (model-SQL twin of
-- queries/timeseries.py::events_funnel): per user, the first view,
-- the first click strictly AFTER it, the first purchase strictly
-- after that. Each stage is a hash equi-join on user_id with the time
-- predicate as a residual filter + a partial-aggregated MIN; state is
-- O(surviving users) per stage.
WITH first_view AS (
  SELECT user_id, MIN(ts) AS view_ts
  FROM source_events WHERE event_type = 'view' GROUP BY user_id
),
first_click AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM source_events e JOIN first_view v
    ON e.user_id = v.user_id AND e.ts > v.view_ts
  WHERE e.event_type = 'click'
  GROUP BY e.user_id
),
first_purchase AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM source_events e JOIN first_click c
    ON e.user_id = c.user_id AND e.ts > c.click_ts
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
)
SELECT stage, n_users FROM (
  SELECT CAST(1 AS BIGINT) AS stage_ord, 'view' AS stage,
         COUNT(*) AS n_users FROM first_view
  UNION ALL
  SELECT CAST(2 AS BIGINT), 'click', COUNT(*) FROM first_click
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'purchase', COUNT(*) FROM first_purchase
) t
