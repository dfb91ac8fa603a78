-- config: materialized=table, sort_by=c_mktsegment
-- tags: gold, orders
-- contract: c_mktsegment:string, n_orders:bigint, revenue:double
-- test: not_null(c_mktsegment)
SELECT c_mktsegment, COUNT(*) AS n_orders, SUM(o_totalprice) AS revenue
FROM {{ ref('silver_cust_orders') }}
GROUP BY c_mktsegment
