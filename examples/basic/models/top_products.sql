SELECT product_key, item_count,
       {{ price_rank('item_count') }} AS popularity
FROM orders_per_product
