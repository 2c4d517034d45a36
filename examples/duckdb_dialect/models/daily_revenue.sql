-- FROM-first + macro call + strftime, straight DuckDB dialect
FROM orders_src
SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS month,
       count() AS n_orders,
       CAST(SUM(CAST(add_tax(o_totalprice) AS DECIMAL(18,6))) AS DOUBLE) AS taxed_revenue
GROUP BY ALL
