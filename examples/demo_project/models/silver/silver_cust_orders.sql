-- config: materialized=table, partition_by=o_year
-- tags: silver, orders
-- test: relationships(o_orderkey, bronze_orders, o_orderkey)
SELECT o.o_orderkey, o.o_totalprice, YEAR(o.o_orderdate) AS o_year, c.c_mktsegment
FROM {{ ref('bronze_orders') }} o
JOIN {{ source('raw', 'customer') }} c ON o.o_custkey = c.c_custkey
