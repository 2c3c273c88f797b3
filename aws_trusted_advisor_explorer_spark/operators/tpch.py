"""Classic TPC-H analytics over the lineitem/orders/customer/
supplier/nation/region tables — the general OLAP surface (multi-way
equi-joins, filtered aggregates, ranked reports) demonstrated on the
standard queries Q1/Q3/Q5, adapted to the driver fixture schema (no
o_shippriority column; money columns land as DOUBLE).

Cross-engine exactness: the fixture money columns are arbitrary
doubles, so a plain SUM's partial-aggregation order would make the
two engines (and two Spark runs) disagree in the last bits. Per-row
products are IEEE-deterministic (fixed op order), so every money term
is computed per row as a double, scaled to integer micros with
``round`` (half-away-from-zero in both engines), and summed as exact
bigints; ratios/averages divide the exact sums once at the end — the
same scaled-integer discipline as the KMeans trainer and the events
money sums. int64 headroom: ~1e12 micros/row x 6e5 rows at sf0.1 =
6e17 << 9.2e18; at TPC-H sf100+ swap the micros to decimal(38,6).

Scale posture (100 TB): pure declarative joins + aggregates — Catalyst
picks broadcast for the dimension sides (region/nation/customer at
these shapes), AQE handles skew; no windows except Q3's top-k, which
is an ORDER BY + LIMIT = distributed TakeOrdered.
"""

from __future__ import annotations

from aws_trusted_advisor_explorer_spark.functions.dual import Dialect

_US = 1_000_000  # money scale: micros


def _micros(expr: str) -> str:
    return f"cast(round(({expr}) * {_US}) as bigint)"


Q1_CUTOFF = "1998-09-02 00:00:00"


def tpch_q1(d: Dialect) -> str:
    """Q1 pricing summary report: per (returnflag, linestatus) sums,
    averages, and row counts over shipped-before-cutoff lineitems —
    one map-side-combining aggregate over a pushed-down scan filter."""
    return f"""WITH l AS (
  SELECT l_returnflag, l_linestatus,
    {_micros('l_quantity')} AS qty_us,
    {_micros('l_extendedprice')} AS price_us,
    {_micros('l_extendedprice * (1 - l_discount)')} AS disc_price_us,
    {_micros('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS charge_us,
    {_micros('l_discount')} AS disc_us
  FROM lineitem
  WHERE l_shipdate <= timestamp '{Q1_CUTOFF}'
)
SELECT l_returnflag, l_linestatus,
  cast(sum(qty_us) as double) / {_US} AS sum_qty,
  cast(sum(price_us) as double) / {_US} AS sum_base_price,
  cast(sum(disc_price_us) as double) / {_US} AS sum_disc_price,
  cast(sum(charge_us) as double) / {_US} AS sum_charge,
  cast(sum(qty_us) as double) / (count(*) * {_US}) AS avg_qty,
  cast(sum(price_us) as double) / (count(*) * {_US}) AS avg_price,
  cast(sum(disc_us) as double) / (count(*) * {_US}) AS avg_disc,
  cast(count(*) as bigint) AS count_order
FROM l
GROUP BY l_returnflag, l_linestatus"""


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1996-06-01 00:00:00"
Q3_TOP = 10


def tpch_q3(d: Dialect) -> str:
    """Q3 shipping-priority report (adapted: fixture orders carry
    o_orderpriority, not o_shippriority): top-{Q3_TOP} unshipped
    orders of one segment by revenue. Join chain customer→orders→
    lineitem on keys; revenue is the exact scaled-integer sum, so the
    ranking (revenue DESC, orderkey) is deterministic; top-k is
    ORDER BY + LIMIT (TakeOrdered, no global sort)."""
    return f"""WITH r AS (
  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
    {_micros('l.l_extendedprice * (1 - l.l_discount)')} AS rev_us
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = '{Q3_SEGMENT}'
    AND o.o_orderdate < timestamp '{Q3_DATE}'
    AND l.l_shipdate > timestamp '{Q3_DATE}'
)
SELECT l_orderkey,
  cast(sum(rev_us) as double) / {_US} AS revenue,
  o_orderdate, o_orderpriority
FROM r
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY sum(rev_us) DESC, l_orderkey
LIMIT {Q3_TOP}"""


Q5_REGION = "ASIA"
Q5_FROM = "1996-01-01 00:00:00"
Q5_TO = "1997-01-01 00:00:00"


def tpch_q5(d: Dialect) -> str:
    """Q5 local-supplier volume: revenue per nation where customer and
    supplier share the nation, one region, one order-year. Six-way
    equi-join; region/nation broadcast, the lineitem↔orders join rides
    the orderkey rail; output is nation-cardinality rows from one
    map-side-combining aggregate."""
    return f"""WITH r AS (
  SELECT n.n_name,
    {_micros('l.l_extendedprice * (1 - l.l_discount)')} AS rev_us
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
    AND s.s_nationkey = c.c_nationkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region rg ON rg.r_regionkey = n.n_regionkey
  WHERE rg.r_name = '{Q5_REGION}'
    AND o.o_orderdate >= timestamp '{Q5_FROM}'
    AND o.o_orderdate < timestamp '{Q5_TO}'
)
SELECT n_name, cast(sum(rev_us) as double) / {_US} AS revenue,
  cast(count(*) as bigint) AS n_lineitems
FROM r
GROUP BY n_name"""


Q6_FROM = "1996-01-01 00:00:00"
Q6_TO = "1997-01-01 00:00:00"
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07
Q6_QTY_MAX = 24


def tpch_q6(d: Dialect) -> str:
    """Q6 forecasting revenue change: one-row sum over a multi-predicate
    range filter — the canonical predicate-pushdown demonstration (every
    predicate reaches the parquet scan; the aggregate sees only
    qualifying rows). Exact micro sum as everywhere in this module."""
    return f"""SELECT
  cast(sum({_micros('l_extendedprice * l_discount')}) as bigint)
    AS revenue_us,
  cast(count(*) as bigint) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= timestamp '{Q6_FROM}'
  AND l_shipdate < timestamp '{Q6_TO}'
  AND l_discount >= {Q6_DISC_LO} AND l_discount <= {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY_MAX}"""


Q14_FROM = "1996-03-01 00:00:00"
Q14_TO = "1996-04-01 00:00:00"


def tpch_q14(d: Dialect) -> str:
    """Q14 promotion effect: share of one month's revenue from PROMO
    parts — a conditional aggregate over the lineitem↔part equi-join
    (part is the broadcast dim). Numerator and denominator are both
    exact micro sums; the percentage is one division at the end."""
    rev = _micros("l.l_extendedprice * (1 - l.l_discount)")
    return f"""WITH r AS (
  SELECT CASE WHEN p.p_type = 'PROMO' THEN {rev} ELSE cast(0 as bigint) END
      AS promo_us,
    {rev} AS rev_us
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= timestamp '{Q14_FROM}'
    AND l.l_shipdate < timestamp '{Q14_TO}'
)
SELECT
  cast(sum(promo_us) as bigint) AS promo_revenue_us,
  cast(sum(rev_us) as bigint) AS total_revenue_us,
  CASE WHEN sum(rev_us) = 0 THEN cast(NULL as double)
       ELSE cast(100 as double) * sum(promo_us) / sum(rev_us)
  END AS promo_revenue_pct
FROM r"""


Q18_QTY_MIN = 250   # large-volume threshold (fixture max order qty 458)
Q18_TOP = 20


def tpch_q18(d: Dialect) -> str:
    """Q18 large-volume customers: orders whose total quantity clears
    the threshold, with the customer attached — the aggregate-then-
    HAVING-then-join shape. The heavy groupBy runs on (l_orderkey)
    BEFORE joining customers/orders, so only qualifying orders (tiny
    by construction) reach the join; top-k by quantity is
    TakeOrdered."""
    return f"""WITH big AS (
  SELECT l_orderkey, {_micros('l_quantity')} AS q_us
  FROM lineitem
),
agg AS (
  SELECT l_orderkey, sum(q_us) AS sum_qty_us
  FROM big GROUP BY l_orderkey
  HAVING sum(q_us) > cast({Q18_QTY_MIN} as bigint) * {_US}
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
  cast(a.sum_qty_us as double) / {_US} AS total_qty
FROM agg a
JOIN orders o ON o.o_orderkey = a.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY a.sum_qty_us DESC, o.o_orderkey
LIMIT {Q18_TOP}"""


Q4_FROM = "1996-01-01 00:00:00"
Q4_TO = "1996-04-01 00:00:00"


def tpch_q4(d: Dialect) -> str:
    """Q4 order-priority checking: orders of one quarter with at least
    one late lineitem (commitdate proxy: shipdate after orderdate + 30
    days — the fixture carries no commit/receipt dates), counted per
    priority — the EXISTS/semi-join shape: the probe side reduces to
    DISTINCT orderkeys before the join, so each order joins once no
    matter how many late lines it has."""
    return f"""WITH late AS (
  SELECT DISTINCT l.l_orderkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    AND o.o_orderdate >= timestamp '{Q4_FROM}'
    AND o.o_orderdate < timestamp '{Q4_TO}'
)
SELECT o.o_orderpriority, cast(count(*) as bigint) AS order_count
FROM orders o JOIN late ON late.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= timestamp '{Q4_FROM}'
  AND o.o_orderdate < timestamp '{Q4_TO}'
GROUP BY o.o_orderpriority"""


Q10_FROM = "1996-01-01 00:00:00"
Q10_TO = "1996-04-01 00:00:00"
Q10_TOP = 20


def tpch_q10(d: Dialect) -> str:
    """Q10 returned-item reporting: the {Q10_TOP} customers who lost
    the most revenue to returns in one quarter, with their nation —
    the aggregate-heavy join+top-k report shape (customer×orders×
    lineitem filtered to returnflag='R', nation broadcast dim).
    Revenue is the exact micro sum, so the (revenue DESC, custkey)
    ranking is deterministic; top-k is TakeOrdered."""
    return f"""WITH r AS (
  SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
    {_micros('l.l_extendedprice * (1 - l.l_discount)')} AS rev_us
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE o.o_orderdate >= timestamp '{Q10_FROM}'
    AND o.o_orderdate < timestamp '{Q10_TO}'
    AND l.l_returnflag = 'R'
)
SELECT c_custkey, c_name, n_name, c_acctbal,
  cast(sum(rev_us) as double) / {_US} AS revenue
FROM r
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY sum(rev_us) DESC, c_custkey
LIMIT {Q10_TOP}"""


Q17_BRAND = "Brand#1"
Q17_FRACTION_NUM, Q17_FRACTION_DEN = 1, 5  # "below 20% of the part's avg"


def tpch_q17(d: Dialect) -> str:
    """Q17 small-quantity-order revenue: average yearly revenue lost if
    tiny orders (quantity below {Q17_FRACTION_NUM}/{Q17_FRACTION_DEN}
    of that part's average order quantity) were not filled — the
    CORRELATED-scalar-aggregate shape, written DECORRELATED: the
    per-part average is one groupBy over the SAME brand-filtered
    lineitem slice, broadcast back by partkey (exactly what Catalyst's
    decorrelation would produce, stated explicitly). The threshold
    compare is exact integer cross-multiplication (qty*den*cnt <
    num*sum) — no division, no doubles in the predicate."""
    return f"""WITH pl AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice,
    {_micros('l_quantity')} AS qty_us
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = '{Q17_BRAND}'
),
avgq AS (
  SELECT l_partkey, cast(sum(qty_us) as bigint) AS sum_qty_us,
    cast(count(*) as bigint) AS cnt
  FROM pl GROUP BY l_partkey
)
SELECT
  cast(count(*) as bigint) AS n_small_orders,
  cast(sum({_micros('pl.l_extendedprice')}) as bigint) AS revenue_us
FROM pl JOIN avgq a ON a.l_partkey = pl.l_partkey
WHERE pl.qty_us * {Q17_FRACTION_DEN} * a.cnt
      < cast({Q17_FRACTION_NUM} as bigint) * a.sum_qty_us"""


BUILDERS = {
    "tpch_q1": tpch_q1,
    "tpch_q3": tpch_q3,
    "tpch_q4": tpch_q4,
    "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6,
    "tpch_q10": tpch_q10,
    "tpch_q14": tpch_q14,
    "tpch_q17": tpch_q17,
    "tpch_q18": tpch_q18,
}
