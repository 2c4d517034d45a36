SELECT month, n_orders, taxed_revenue,
       row_number() OVER (ORDER BY taxed_revenue DESC, month) AS rnk
FROM daily_revenue
QUALIFY rnk <= 3
