-- macros persist in the warehouse (like the reference's DuckDB file)
CREATE MACRO add_tax(p) AS p * 1.1;
SELECT * FROM read_parquet('/root/testdata/sf0.001/orders.parquet')
