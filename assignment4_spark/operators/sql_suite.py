"""SQL-surface suite: multi-join analytical queries through spark.sql().

Everything else in the engine uses the DataFrame API; these operators
pin the other public face — ANSI SQL over registered views — with
TPC-H-shaped workloads (Q3/Q5/Q10 pricing-summary family, adapted to
the fixture star schema). The same text (modulo dialect) runs on the
DuckDB side, so the oracle also proves dialect compatibility of the
engine's SQL entry point.

Scale notes: these are the canonical multi-join + agg shapes Catalyst
exists for — dims broadcast under the 32 MB threshold, fact joins
shuffle on keys, AQE reorders/coalesces at runtime. No hints needed;
the plans are asserted healthy in tests/test_plans.py for the DataFrame
twins and spot-checked here via the shared optimizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io_util import register_views
from ..registry import register

_Q3 = """
SELECT o_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate  > DATE '1995-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, o_orderkey
LIMIT 10
"""

_Q5 = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1994-01-01'
  AND o_orderdate <  DATE '1995-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

_Q10 = """
SELECT c_custkey,
       c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       ROUND(c_acctbal, 2) AS c_acctbal,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '1993-10-01'
  AND o_orderdate <  DATE '1994-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def _sql_op(name: str, sql: str):
    @register(name, oracle=sql)
    def run(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    run.__name__ = name
    run.__doc__ = f"TPC-H-shaped SQL through spark.sql(); oracle is the identical text.\n\n{sql}"
    return run


sql_q3_shipping_priority = _sql_op("sql_q3_shipping_priority", _Q3)
sql_q5_local_supplier = _sql_op("sql_q5_local_supplier", _Q5)
sql_q10_returned_items = _sql_op("sql_q10_returned_items", _Q10)
