"""Scale evidence for the second round-5 continuation operators:
measure the quantity each operator keeps bounded, against the naive
shape it replaces, at sf0.01 / sf0.1 (DuckDB ground truth).

Usage: python tools/scale_batch6.py
"""

import duckdb

for sf in ("sf0.01", "sf0.1"):
    con = duckdb.connect()
    d = f"/root/testdata/{sf}"
    # backlog sweep: boundary events (2/order) vs day-explode fanout
    ev, fan = con.execute(f"""
      WITH span AS (
        SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS od,
               MAX(CAST(l.l_shipdate AS DATE)) AS cd
        FROM '{d}/orders.parquet' o
        JOIN '{d}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2)
      SELECT 2 * COUNT(*), SUM(cd - od + 1) FROM span""").fetchone()
    # retention triangle: distinct user-week grid vs raw event rows
    grid, raw = con.execute(f"""
      SELECT (SELECT COUNT(*) FROM (
                SELECT DISTINCT user_id,
                       date_trunc('week', CAST(ts AS DATE)) FROM '{d}/events.parquet')),
             (SELECT COUNT(*) FROM '{d}/events.parquet')""").fetchone()
    # Q21 single pass: per-order agg rows vs classic self-join pairs
    orders, pairs = con.execute(f"""
      WITH ol AS (SELECT l_orderkey, COUNT(*) AS n
                  FROM '{d}/lineitem.parquet' GROUP BY 1)
      SELECT COUNT(*), SUM(n * n) FROM ol""").fetchone()
    print(f"{sf}: backlog boundary_events={ev} vs day_fanout={fan} "
          f"| retention grid={grid} vs raw={raw} "
          f"| q21 agg_rows={orders} vs selfjoin_pairs={pairs}")
