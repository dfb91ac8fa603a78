-- config: materialized=view
-- tags: bronze, orders
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM {{ source('raw', 'orders') }}
WHERE o_totalprice > $min_price
