-- round-11 mutable-table surface, straight DuckDB idiom: a scratch
-- temp table built with schema-only CREATE, bulk INSERT … SELECT,
-- an UPDATE over old-row values, an ALTER TABLE ADD COLUMN, and a
-- DELETE — the script the reference would hand verbatim to DuckDB
-- (node.rs:176); the final SELECT is the model's one record statement.
CREATE TEMP TABLE adj (month VARCHAR, revenue DOUBLE);
INSERT INTO adj SELECT month, taxed_revenue FROM daily_revenue;
ALTER TABLE adj ADD COLUMN band VARCHAR;
UPDATE adj SET band = CASE WHEN revenue >= 200000 THEN 'high' ELSE 'low' END;
DELETE FROM adj WHERE revenue IS NULL;
SELECT band,
       count() AS n_months,
       CAST(SUM(CAST(revenue AS DECIMAL(18,6))) AS DOUBLE) AS band_revenue
FROM adj
GROUP BY ALL
