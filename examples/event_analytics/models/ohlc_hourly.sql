-- Hourly OHLC resample (model-SQL twin of
-- queries/timeseries.py::time_resample_ohlc): per (event_type, hour),
-- open/high/low/close with (ts, event_id) tie-breaks so equal
-- timestamps stay deterministic. The bucket is computed BEFORE the
-- windows so both row_numbers and the final groupBy share one
-- Exchange; no float SUM anywhere.
WITH base AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         value, ts, event_id
  FROM source_events
),
ranked AS (
  SELECT event_type, bucket, value,
    row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts, event_id) AS rn_first,
    row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM base
)
SELECT event_type, bucket,
  MAX(CASE WHEN rn_first = 1 THEN value END) AS open,
  MAX(value) AS high,
  MIN(value) AS low,
  MAX(CASE WHEN rn_last = 1 THEN value END) AS close,
  COUNT(*) AS n_events
FROM ranked
GROUP BY event_type, bucket
