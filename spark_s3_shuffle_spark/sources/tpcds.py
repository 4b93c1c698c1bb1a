"""Derived TPC-DS snowflake over the base fixture tables (round-7 tier).

The reference's primary benchmark is the TPC-DS suite consumed as SQL
TEXT (`examples/sql/run_tpcds.sh`, `examples/run_benchmarks.sh:29-34` —
its headline queries are DS q5/q49/q67/q75). Rounds 5-6 verified 12 DS
*shapes* re-expressed over the TPC-H-ish schema; this module closes the
remaining gap by deriving the DS snowflake ITSELF — `store_sales` /
`catalog_sales` / `web_sales` (+ the three returns tables), `date_dim`,
`item`, `store` — so DS query texts run against real DS table and
column names.

Every DS table is defined ONCE as a portable ANSI SQL text over the ten
base views, written in the dialect subset both Spark and DuckDB parse
and evaluate IDENTICALLY (the repo's established oracle discipline:
exact DECIMAL money arithmetic, `EXTRACT` date fields verified
engine-equal, integer-only sequence math). The same text serves three
consumers:

1. `compose(body)` — prepend the (transitively needed) table
   definitions as CTEs to a DS query body, producing ONE self-contained
   SQL string. The registry's `*_sql_text_ds*` entries run that string
   verbatim through `spark.sql` AND hand it to DuckDB as the oracle —
   both engines literally execute the identical text, and the driver's
   DuckDB needs only the ten pre-registered base views.
2. `register_ds_views(spark, sf_dir)` — CREATE TEMP VIEW per DS table,
   for DataFrame-side callers and plan inspection.
3. `materialize(spark, sf_dir, out)` — write each DS table as parquet
   (the snowflake fixture set; `tools/make_fixtures.py --tpcds`). A test
   asserts the materialized parquet replays the view derivation
   row-for-row.

Deterministic mapping (documented fixture semantics, not TPC-DS dbgen):

- The three sales channels partition `lineitem` by `l_linenumber % 3`
  (0=store, 1=catalog, 2=web) joined to `orders` for customer/date
  context — disjoint channels with identical per-copy distributions,
  which is what the cross-channel DS queries exercise.
- Returns are the `l_returnflag = 'R'` subset of each channel (a sale
  that was later returned), so every return joins back to its sale on
  (item, ticket) by construction.
- `date_dim` enumerates the distinct order/ship dates. `d_date_sk` is
  the yyyymmdd integer; `d_dow` comes from Zeller's congruence in pure
  integer arithmetic because `EXTRACT(dow)` is NOT engine-portable
  (Spark 1..7 Sun-based vs DuckDB 0..6 — measured). `d_week_seq` is
  `year*100 + iso_week`; at ISO year boundaries (Dec 29-31 landing in
  week 1) the encoding is non-monotone but IDENTICAL in both engines —
  the ds59 text joins `prev.d_week_seq + 100`, i.e. same week, prior
  year, under this encoding.
- `item` maps part with hierarchy proxies (category=p_type,
  class/brand=p_brand) and arithmetic manager/manufact ids; `store`
  maps supplier with its nation as `s_state`. Round 9: `i_item_id`
  pools 200 part keys per id ('ITEM_' || key MOD 200) — real TPC-DS
  item_ids repeat across SCD versions of an item, and the pooling is
  what gives the cross-channel per-item_id joins (ds83's three-way
  returns overlap) a non-empty intersection; 40 | 200 keeps i_color
  functional per pooled id.
- Round 9: sales carry `{p}_sold_date_sk` from o_orderdate and
  `{p}_ship_date_sk` from l_shipdate (the fixture's real 1-121-day
  order→ship lag), plus logistics sks (warehouse/ship_mode/call_center/
  web_site/web_page/catalog_page — constant VALUES dims). `inventory`
  is one row per distinct (ship-date, part) with deterministic
  warehouse/quantity, the (date, item, warehouse) grain the DS
  inventory family (q21/q22/q37/q39/q72/q82) aggregates.

Money columns are DECIMAL(18,6) at the view boundary so every SUM stays
exact; chained products step-cast back to DECIMAL(18,6) between
multiplies (lossless - the money has <=4 real decimals) because a
triple product exceeds precision 38, where the engines' cap/rescale
behavior diverges (measured: 1-ulp avg_fee drift in ds85 at sf0.1); query texts follow the repo's rounding discipline (final
`CAST(ROUND(x, 2) AS DOUBLE)`, one IEEE division per ratio).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

#: Zeller's congruence on (yr, mo, dm) integer expressions -> 0=Sunday.
#: Pure CASE/FLOOR/MOD arithmetic: identical in Spark and DuckDB, unlike
#: EXTRACT(dow). h = (q + 13(m+1)/5 + K + K/4 + J/4 + 5J) mod 7 gives
#: 0=Saturday; the +6 rotation yields the DS convention 0=Sunday.
_ZELLER = (
    "CAST(MOD(dm + CAST(FLOOR(13 * (CASE WHEN mo <= 2 THEN mo + 13 ELSE mo + 1 END) / 5.0) AS INT)"
    " + MOD(CASE WHEN mo <= 2 THEN yr - 1 ELSE yr END, 100)"
    " + CAST(FLOOR(MOD(CASE WHEN mo <= 2 THEN yr - 1 ELSE yr END, 100) / 4.0) AS INT)"
    " + CAST(FLOOR(CAST(FLOOR((CASE WHEN mo <= 2 THEN yr - 1 ELSE yr END) / 100.0) AS INT) / 4.0) AS INT)"
    " + 5 * CAST(FLOOR((CASE WHEN mo <= 2 THEN yr - 1 ELSE yr END) / 100.0) AS INT)"
    " + 6, 7) AS INT)"
)

_DATE_DIM = f"""
  SELECT d_date,
         CAST(yr * 10000 + mo * 100 + dm AS INT) AS d_date_sk,
         CAST(yr AS INT) AS d_year,
         CAST(mo AS INT) AS d_moy,
         CAST(dm AS INT) AS d_dom,
         CAST(qt AS INT) AS d_qoy,
         yr || 'Q' || qt AS d_quarter_name,
         CAST((yr - 1990) * 12 + mo - 1 AS INT) AS d_month_seq,
         CAST(iso_yrwk AS INT) AS d_week_seq,
         {_ZELLER} AS d_dow,
         CASE {_ZELLER}
           WHEN 0 THEN 'Sunday' WHEN 1 THEN 'Monday' WHEN 2 THEN 'Tuesday'
           WHEN 3 THEN 'Wednesday' WHEN 4 THEN 'Thursday'
           WHEN 5 THEN 'Friday' ELSE 'Saturday' END AS d_day_name
  FROM (
    SELECT d_date,
           CAST(EXTRACT(year FROM d_date) AS INT) AS yr,
           CAST(EXTRACT(month FROM d_date) AS INT) AS mo,
           CAST(EXTRACT(day FROM d_date) AS INT) AS dm,
           CAST(EXTRACT(quarter FROM d_date) AS INT) AS qt,
           CAST(EXTRACT(year FROM d_date) AS INT) * 100
             + CAST(EXTRACT(week FROM d_date) AS INT) AS iso_yrwk
    FROM (
      SELECT CAST(o_orderdate AS DATE) AS d_date FROM orders
      UNION
      SELECT CAST(l_shipdate AS DATE) AS d_date FROM lineitem
    ) dts
  ) flds
"""

_ITEM = """
  SELECT p_partkey AS i_item_sk,
         'ITEM_' || MOD(p_partkey, 200) AS i_item_id,
         p_name AS i_item_desc,
         p_name AS i_product_name,
         p_brand AS i_brand,
         CAST(MOD(p_partkey, 50) AS INT) AS i_brand_id,
         p_brand AS i_class,
         CAST(MOD(p_partkey, 20) AS INT) AS i_class_id,
         p_type AS i_category,
         CAST(MOD(p_partkey, 6) AS INT) AS i_category_id,
         'MFR_' || MOD(p_partkey, 1000) AS i_manufact,
         CAST(MOD(p_partkey, 1000) AS INT) AS i_manufact_id,
         CAST(MOD(p_partkey, 100) AS INT) AS i_manager_id,
         'COLOR_' || MOD(p_partkey, 40) AS i_color,
         'UNIT_' || MOD(p_partkey, 7) AS i_units,
         CASE MOD(p_partkey, 5) WHEN 0 THEN 'small' WHEN 1 THEN 'medium'
              WHEN 2 THEN 'large' WHEN 3 THEN 'extra large'
              ELSE 'N/A' END AS i_size,
         CAST(p_retailprice AS DECIMAL(18,6)) AS i_current_price
  FROM part
"""

_STORE = """
  SELECT s_suppkey AS s_store_sk,
         s_name AS s_store_name,
         s_name AS s_store_id,
         n_name AS s_state,
         'COMPANY_' || MOD(s_suppkey, 5) AS s_company_name,
         CAST(1 + MOD(s_suppkey, 10) AS INT) AS s_market_id,
         'CITY_' || MOD(s_suppkey, 30) AS s_city,
         'COUNTY_' || MOD(s_suppkey, 15) AS s_county,
         (10000 + MOD(s_suppkey, 50)) || '' AS s_zip,
         CAST(-5 - MOD(s_suppkey, 3) AS INT) AS s_gmt_offset,
         CAST(MOD(s_suppkey, 300) + 1 AS INT) AS s_number_employees,
         CAST((MOD(s_suppkey, 90) + 1) * 1000 AS INT) AS s_floor_space
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
"""


def _digits(n: int) -> str:
    """VALUES list (0),(1),...,(n-1) — the engine-portable row generator
    (both engines parse ``(VALUES ...) AS t(i)``; sequence/range table
    functions are NOT shared syntax). Keeps demographic enumerations
    scale-INDEPENDENT: deriving them from a base table would shrink the
    domain at small fixtures."""
    return ",".join(f"({i})" for i in range(n))


#: customer_demographics: full cross product gender(2) x marital(5) x
#: education(7) x purchase_estimate(10) x credit_rating(4) = 2800 rows,
#: sk = 1 + g + 2*(m + 5*(e + 7*(pe + 10*cr))) — a bijection, so every
#: sales row's cd_demo_sk (MOD-derived in the fact templates) hits
#: exactly one demographics row. Dependent counts are MOD projections of
#: the sk (deterministic, both-engine-identical integer arithmetic).
_CUSTOMER_DEMOGRAPHICS = f"""
  SELECT CAST(1 + g.i + 2 * (m.i + 5 * (e.i + 7 * (pe.i + 10 * cr.i))) AS INT) AS cd_demo_sk,
         CASE g.i WHEN 0 THEN 'M' ELSE 'F' END AS cd_gender,
         CASE m.i WHEN 0 THEN 'M' WHEN 1 THEN 'S' WHEN 2 THEN 'D'
                  WHEN 3 THEN 'W' ELSE 'U' END AS cd_marital_status,
         CASE e.i WHEN 0 THEN 'Primary' WHEN 1 THEN 'Secondary'
                  WHEN 2 THEN 'College' WHEN 3 THEN '2 yr Degree'
                  WHEN 4 THEN '4 yr Degree' WHEN 5 THEN 'Advanced Degree'
                  ELSE 'Unknown' END AS cd_education_status,
         CAST(500 * (pe.i + 1) AS INT) AS cd_purchase_estimate,
         CASE cr.i WHEN 0 THEN 'Low Risk' WHEN 1 THEN 'Good'
                   WHEN 2 THEN 'High Risk' ELSE 'Unknown' END AS cd_credit_rating,
         CAST(MOD(g.i + 2 * (m.i + 5 * (e.i + 7 * (pe.i + 10 * cr.i))), 7) AS INT) AS cd_dep_count,
         CAST(MOD(g.i + 2 * (m.i + 5 * (e.i + 7 * (pe.i + 10 * cr.i))), 5) AS INT) AS cd_dep_employed_count,
         CAST(MOD(g.i + 2 * (m.i + 5 * (e.i + 7 * (pe.i + 10 * cr.i))), 3) AS INT) AS cd_dep_college_count
  FROM (VALUES {_digits(2)}) AS g(i)
  CROSS JOIN (VALUES {_digits(5)}) AS m(i)
  CROSS JOIN (VALUES {_digits(7)}) AS e(i)
  CROSS JOIN (VALUES {_digits(10)}) AS pe(i)
  CROSS JOIN (VALUES {_digits(4)}) AS cr(i)
"""

#: household_demographics: buy_potential(6) x dep_count(10) x
#: vehicle(12) = 720 rows, sk = 1 + b + 6*(d + 10*v).
_HOUSEHOLD_DEMOGRAPHICS = f"""
  SELECT CAST(1 + b.i + 6 * (d.i + 10 * v.i) AS INT) AS hd_demo_sk,
         CAST(1 + MOD(b.i + 6 * (d.i + 10 * v.i), 20) AS INT) AS hd_income_band_sk,
         CASE b.i WHEN 0 THEN '0-500' WHEN 1 THEN '501-1000'
                  WHEN 2 THEN '1001-5000' WHEN 3 THEN '5001-10000'
                  WHEN 4 THEN '>10000' ELSE 'Unknown' END AS hd_buy_potential,
         CAST(d.i AS INT) AS hd_dep_count,
         CAST(v.i - 1 AS INT) AS hd_vehicle_count
  FROM (VALUES {_digits(6)}) AS b(i)
  CROSS JOIN (VALUES {_digits(10)}) AS d(i)
  CROSS JOIN (VALUES {_digits(12)}) AS v(i)
"""

#: promotion: 100 rows, channel flags from the sk's bits.
_PROMOTION = f"""
  SELECT CAST(1 + lo.i + 10 * hi.i AS INT) AS p_promo_sk,
         'PROMO_' || (lo.i + 10 * hi.i) AS p_promo_id,
         'promo_name_' || MOD(lo.i + 10 * hi.i, 20) AS p_promo_name,
         CASE WHEN MOD(lo.i + 10 * hi.i, 2) = 0 THEN 'N' ELSE 'Y' END AS p_channel_dmail,
         CASE WHEN MOD(lo.i + 10 * hi.i, 3) = 0 THEN 'N' ELSE 'Y' END AS p_channel_email,
         CASE WHEN MOD(lo.i + 10 * hi.i, 5) = 0 THEN 'N' ELSE 'Y' END AS p_channel_tv,
         CASE WHEN MOD(lo.i + 10 * hi.i, 7) = 0 THEN 'N' ELSE 'Y' END AS p_channel_event,
         CAST(MOD(lo.i + 10 * hi.i, 1000) AS INT) AS p_response_target
  FROM (VALUES {_digits(10)}) AS lo(i)
  CROSS JOIN (VALUES {_digits(10)}) AS hi(i)
"""

#: income_band: 20 bands of 10000, sk-aligned with
#: household_demographics.hd_income_band_sk (1..20).
_INCOME_BAND = f"""
  SELECT CAST(1 + lo.i + 10 * hi.i AS INT) AS ib_income_band_sk,
         CAST((lo.i + 10 * hi.i) * 10000 AS INT) AS ib_lower_bound,
         CAST((lo.i + 10 * hi.i + 1) * 10000 - 1 AS INT) AS ib_upper_bound
  FROM (VALUES {_digits(10)}) AS lo(i)
  CROSS JOIN (VALUES {_digits(2)}) AS hi(i)
"""

#: time_dim: the distinct synthesized second-of-day sks the fact
#: templates emit (TPC-H carries no time of day; the sk expression here
#: and in _SALES_TMPL are IDENTICAL by construction, so every fact row
#: joins). Hour/minute/second decompose the sk in integer arithmetic.
_TIME_DIM = """
  SELECT t_time_sk,
         t_time_sk AS t_time,
         CAST(FLOOR(t_time_sk / 3600.0) AS INT) AS t_hour,
         CAST(FLOOR(MOD(t_time_sk, 3600) / 60.0) AS INT) AS t_minute,
         CAST(MOD(t_time_sk, 60) AS INT) AS t_second,
         CASE WHEN t_time_sk < 43200 THEN 'AM' ELSE 'PM' END AS t_am_pm,
         CASE WHEN t_time_sk >= 64800 AND t_time_sk < 72000
              THEN 'dinner' ELSE 'other' END AS t_meal_time
  FROM (
    SELECT DISTINCT CAST(MOD(l_orderkey * 3600 + l_linenumber * 731 + l_partkey, 86400) AS INT) AS t_time_sk
    FROM lineitem
  ) tsk
"""

#: DS customer + customer_address. Both key on o_custkey — NOT the base
#: ``customer`` table — because a CTE named ``customer`` cannot read a
#: base view of the same name portably (DuckDB binds the inner reference
#: to the CTE itself: "Circular reference", measured; Spark resolves it
#: to the base view). The population is therefore customers with >=1
#: order — exactly the rows any DS query can reach through a fact join
#: or channel-EXISTS — and every non-key attribute is synthesized
#: deterministically from the key in both-engine-identical integer
#: arithmetic. The demographic sks mix through a PRIME modulus first
#: (MOD(k*a + b, 7919) then the domain): a plain linear MOD correlates
#: with the address attributes (ca_city = key mod 60 fixes key mod 20,
#: making any linear sk CONSTANT mod 20 within a city — the ds84
#: city x income-band slice was structurally empty until this mix). The fact templates' {p}_customer_sk/{p}_addr_sk are
#: o_custkey, so joins hit by construction. c_current_addr_sk is a
#: PERMUTATION of the existing keys (round 9): each key maps to the
#: next key within its 512-way hash bucket (a partitioned, bounded
#: LEAD window — custkeys are sparse at large fixtures, so arithmetic
#: shifts would dangle), which keeps every current-address join valid
#: while making the customer's current city genuinely differ from the
#: purchase address — the ds46/ds68 bought-vs-current comparison.
#: c_first_sales_date_sk is the customer's REAL first order date and
#: c_first_shipto_date_sk the second-earliest (the first repeat
#: purchase; equal for single-order customers) — both actual calendar
#: rows, so ds64's d2/d3 date_dim joins are lossless by construction.
_CUSTOMER_DS = """
  SELECT o_custkey AS c_customer_sk,
         'CUST_' || o_custkey AS c_customer_id,
         'CFIRST_' || MOD(o_custkey, 97) AS c_first_name,
         'CLAST_' || MOD(o_custkey, 89) AS c_last_name,
         CASE WHEN MOD(o_custkey, 2) = 0 THEN 'M' ELSE 'F' END AS c_salutation,
         CASE WHEN MOD(o_custkey, 3) = 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag,
         CAST(1924 + MOD(o_custkey, 70) AS INT) AS c_birth_year,
         CAST(1 + MOD(o_custkey, 12) AS INT) AS c_birth_month,
         CASE WHEN MOD(o_custkey, 25) = 0 THEN 'united states'
              ELSE 'COUNTRY_' || MOD(o_custkey, 25) END AS c_birth_country,
         COALESCE(LEAD(o_custkey) OVER (PARTITION BY MOD(o_custkey, 512)
                                        ORDER BY o_custkey),
                  MIN(o_custkey) OVER (PARTITION BY MOD(o_custkey, 512)))
           AS c_current_addr_sk,
         CAST(1 + MOD(MOD(o_custkey * 6791 + 3, 7919), 2800) AS INT) AS c_current_cdemo_sk,
         CAST(1 + MOD(MOD(o_custkey * 4507 + 11, 7919), 720) AS INT) AS c_current_hdemo_sk,
         CAST(EXTRACT(year FROM first_d) * 10000
              + EXTRACT(month FROM first_d) * 100
              + EXTRACT(day FROM first_d) AS INT) AS c_first_sales_date_sk,
         CAST(EXTRACT(year FROM second_d) * 10000
              + EXTRACT(month FROM second_d) * 100
              + EXTRACT(day FROM second_d) AS INT) AS c_first_shipto_date_sk
  FROM (
    SELECT o_custkey,
           MIN(d) AS first_d,
           COALESCE(MIN(CASE WHEN d > mn THEN d END), MIN(d)) AS second_d
    FROM (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
                 MIN(CAST(o_orderdate AS DATE))
                   OVER (PARTITION BY o_custkey) AS mn
          FROM orders) od
    GROUP BY o_custkey
  ) ck
"""

_CUSTOMER_ADDRESS = """
  SELECT o_custkey AS ca_address_sk,
         'ADDR_' || o_custkey AS ca_address_id,
         (100 + MOD(o_custkey * 7, 900)) || '' AS ca_street_number,
         'STREET_' || MOD(o_custkey, 200) AS ca_street_name,
         'CITY_' || MOD(o_custkey, 60) AS ca_city,
         'COUNTY_' || MOD(o_custkey, 30) AS ca_county,
         'STATE_' || MOD(o_custkey, 10) AS ca_state,
         (10000 + MOD(o_custkey, 50)) || '' AS ca_zip,
         'UNITED STATES' AS ca_country,
         CAST(-5 - MOD(o_custkey, 3) AS INT) AS ca_gmt_offset,
         CASE MOD(o_custkey, 3) WHEN 0 THEN 'apartment'
              WHEN 1 THEN 'condo' ELSE 'single family' END AS ca_location_type
  FROM (SELECT DISTINCT o_custkey FROM orders) ak
"""

#: Round-9 logistics dims — all literal VALUES enumerations (constant
#: size, scale-independent, broadcast build sides like the demographic
#: dims). Fact sk formulas in the templates hit each domain exactly.

#: warehouse: 15 rows; sales/inventory warehouse sks are 1 + MOD(..,15).
_WAREHOUSE = f"""
  SELECT CAST(1 + w.i AS INT) AS w_warehouse_sk,
         'WH_' || w.i AS w_warehouse_id,
         'Warehouse ' || w.i AS w_warehouse_name,
         CAST((w.i + 1) * 50000 AS INT) AS w_warehouse_sq_ft,
         'CITY_' || MOD(w.i, 30) AS w_city,
         'COUNTY_' || MOD(w.i, 15) AS w_county,
         'NATION_' || MOD(w.i, 25) AS w_state,
         'UNITED STATES' AS w_country
  FROM (VALUES {_digits(15)}) AS w(i)
"""

#: ship_mode: 20 rows, 5 types x 4 carriers.
_SHIP_MODE = f"""
  SELECT CAST(1 + s.i AS INT) AS sm_ship_mode_sk,
         'SM_' || s.i AS sm_ship_mode_id,
         CASE MOD(s.i, 5) WHEN 0 THEN 'EXPRESS' WHEN 1 THEN 'OVERNIGHT'
              WHEN 2 THEN 'REGULAR' WHEN 3 THEN 'TWO DAY'
              ELSE 'LIBRARY' END AS sm_type,
         CASE MOD(s.i, 4) WHEN 0 THEN 'AIR' WHEN 1 THEN 'SURFACE'
              WHEN 2 THEN 'SEA' ELSE 'RAIL' END AS sm_code,
         'CARRIER_' || MOD(s.i, 4) AS sm_carrier
  FROM (VALUES {_digits(20)}) AS s(i)
"""

#: reason: 36 rows.
_REASON = f"""
  SELECT CAST(1 + r.i AS INT) AS r_reason_sk,
         'RSN_' || r.i AS r_reason_id,
         'reason ' || r.i AS r_reason_desc
  FROM (VALUES {_digits(36)}) AS r(i)
"""

#: call_center: 6 rows; fact cc sks are 1 + MOD(o_custkey, 6).
_CALL_CENTER = f"""
  SELECT CAST(1 + c.i AS INT) AS cc_call_center_sk,
         'CC_' || c.i AS cc_call_center_id,
         'call center ' || c.i AS cc_name,
         'COUNTY_' || MOD(c.i, 15) AS cc_county,
         'MGR_' || MOD(c.i, 4) AS cc_manager,
         CAST((c.i + 1) * 100 AS INT) AS cc_employees
  FROM (VALUES {_digits(6)}) AS c(i)
"""

#: web_site: 12 rows.
_WEB_SITE = f"""
  SELECT CAST(1 + w.i AS INT) AS web_site_sk,
         'WEB_' || w.i AS web_site_id,
         'site ' || w.i AS web_name,
         'company ' || MOD(w.i, 4) AS web_company_name
  FROM (VALUES {_digits(12)}) AS w(i)
"""

#: web_page: 60 rows; wp_char_count spans 5000..5400 so the ds90
#: 5000-5200 slice selects about half the pages.
_WEB_PAGE = f"""
  SELECT CAST(1 + p.i AS INT) AS wp_web_page_sk,
         'WP_' || p.i AS wp_web_page_id,
         CAST(5000 + MOD(p.i * 37, 400) AS INT) AS wp_char_count,
         CAST(MOD(p.i, 7) AS INT) AS wp_link_count,
         CASE WHEN MOD(p.i, 2) = 0 THEN 'Y' ELSE 'N' END AS wp_autogen_flag
  FROM (VALUES {_digits(60)}) AS p(i)
"""

#: catalog_page: 100 rows.
_CATALOG_PAGE = f"""
  SELECT CAST(1 + p.i AS INT) AS cp_catalog_page_sk,
         'CP_' || p.i AS cp_catalog_page_id,
         CAST(1 + MOD(p.i, 20) AS INT) AS cp_catalog_number,
         CAST(1 + MOD(p.i, 50) AS INT) AS cp_catalog_page_number
  FROM (VALUES {_digits(100)}) AS p(i)
"""

#: inventory fact: one row per DISTINCT (ship-date, part) observed in
#: lineitem — the (week, item) grain DS inventory queries aggregate —
#: with quantity synthesized deterministically from the pair in
#: both-engine-identical integer arithmetic. The warehouse is a
#: function of the PART alone (each part is stocked in one warehouse),
#: so a (warehouse, item) group accumulates a date SERIES — the shape
#: ds21's before/after level-shift ratio needs; a per-date warehouse
#: scattered each group to single dates and emptied the ratio band.
#: Quantity spans 0..199 so the ds72 stockout predicate
#: (inv_quantity_on_hand < cs_quantity, quantities 1..50) selects a
#: real ~12% of matches rather than the 2.5% a 0..999 domain left. Scales with the
#: fact (bounded by |dates| x |parts|), aggregates FIRST in every text
#: that reads it, and joins the constant warehouse dim broadcast.
_INVENTORY = """
  SELECT CAST(yr * 10000 + mo * 100 + dm AS INT) AS inv_date_sk,
         pk AS inv_item_sk,
         CAST(1 + MOD(pk * 13, 15) AS INT) AS inv_warehouse_sk,
         CAST(MOD(pk * 31 + (yr * 10000 + mo * 100 + dm) * 7, 200) AS INT) AS inv_quantity_on_hand
  FROM (
    SELECT DISTINCT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT) AS yr,
           CAST(EXTRACT(month FROM CAST(l_shipdate AS DATE)) AS INT) AS mo,
           CAST(EXTRACT(day FROM CAST(l_shipdate AS DATE)) AS INT) AS dm,
           l_partkey AS pk
    FROM lineitem
  ) dp
"""


#: One sales-channel body; {mod} selects the channel partition and {p}
#: prefixes the DS column names (ss_/cs_/ws_). Round 9: sold_date comes
#: from o_orderdate and the NEW {p}_ship_date_sk from l_shipdate — the
#: fixture's real 1-121-day order->ship lag — so the ship-window texts
#: (ds16/62/72/94/95/99) exercise genuine date arithmetic instead of a
#: degenerate zero lag. Returns keep l_shipdate as the RETURNED date
#: (sold at order time, returned at ship time under the same lag).
_SALES_TMPL = """
  SELECT CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) * 10000
              + EXTRACT(month FROM CAST(o_orderdate AS DATE)) * 100
              + EXTRACT(day FROM CAST(o_orderdate AS DATE)) AS INT) AS {p}_sold_date_sk,
         CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) * 10000
              + EXTRACT(month FROM CAST(l_shipdate AS DATE)) * 100
              + EXTRACT(day FROM CAST(l_shipdate AS DATE)) AS INT) AS {p}_ship_date_sk,
         l_partkey AS {p}_item_sk,
         CASE WHEN MOD(l_orderkey + l_suppkey, 47) = 0 THEN NULL
              ELSE l_suppkey END AS {p}_store_sk,
         o_custkey AS {p}_customer_sk,
         l_orderkey AS {p}_ticket_number,
         CAST(l_quantity AS INT) AS {p}_quantity,
         CAST(l_extendedprice AS DECIMAL(18,6)) AS {p}_ext_sales_price,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * CAST(l_discount AS DECIMAL(18,6)) AS {p}_ext_discount_amt,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * (1 - CAST(l_discount AS DECIMAL(18,6))) AS {p}_net_paid,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * CAST(0.9 AS DECIMAL(18,6)) AS {p}_ext_wholesale_cost,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * CAST(0.75 AS DECIMAL(18,6)) AS {p}_wholesale_cost,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * (CAST(0.1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS {p}_net_profit,
         CAST(1 + MOD(o_custkey * 7 + l_partkey, 2800) AS INT) AS {p}_cdemo_sk,
         CAST(1 + MOD(o_custkey * 11 + l_suppkey, 720) AS INT) AS {p}_hdemo_sk,
         o_custkey AS {p}_addr_sk,
         CAST(1 + MOD(l_orderkey + l_partkey, 100) AS INT) AS {p}_promo_sk,
         l_orderkey AS {p}_order_number,
         CASE WHEN MOD(l_orderkey + o_custkey, 41) = 0 THEN NULL
              ELSE o_custkey END AS {p}_ship_addr_sk,
         CASE WHEN MOD(l_orderkey + l_partkey, 43) = 0 THEN NULL
              ELSE o_custkey END AS {p}_ship_customer_sk,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * CAST(0.08 AS DECIMAL(18,6)) AS {p}_ext_ship_cost,
         CAST(1 + MOD(l_suppkey + l_partkey, 15) AS INT) AS {p}_warehouse_sk,
         CAST(1 + MOD(l_orderkey + l_linenumber, 20) AS INT) AS {p}_ship_mode_sk,
         CAST(1 + MOD(o_custkey, 6) AS INT) AS {p}_call_center_sk,
         CAST(1 + MOD(l_orderkey, 12) AS INT) AS {p}_web_site_sk,
         CAST(1 + MOD(l_orderkey * 3 + l_partkey, 60) AS INT) AS {p}_web_page_sk,
         CAST(1 + MOD(l_orderkey + l_partkey * 7, 100) AS INT) AS {p}_catalog_page_sk,
         CAST(MOD(l_orderkey * 3600 + l_linenumber * 731 + l_partkey, 86400) AS INT) AS {p}_sold_time_sk,
         CAST(l_extendedprice AS DECIMAL(18,6)) AS {p}_list_price,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * (1 - CAST(l_discount AS DECIMAL(18,6))) AS {p}_sales_price,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * CAST(l_discount AS DECIMAL(18,6)) AS {p}_coupon_amt,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * CAST(1.2 AS DECIMAL(18,6)) AS {p}_ext_list_price,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * CAST(l_tax AS DECIMAL(18,6)) AS {p}_ext_tax
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE MOD(l_linenumber, 3) = {mod}
"""

#: One returns-channel body: the returned subset of the channel's sales.
#: {p}_reversed_charge is BIMODAL by item (2/7 of parts refund at a
#: 0.45 rate, the rest at 0.02): because fixture returns are full-row
#: subsets of sales, refund totals would otherwise track sale totals at
#: a near-constant ratio and ds64's sale-vs-refund HAVING could never
#: split items; the item-keyed rate gives that predicate its intended
#: two-population selectivity.
_RETURNS_TMPL = """
  SELECT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) * 10000
              + EXTRACT(month FROM CAST(l_shipdate AS DATE)) * 100
              + EXTRACT(day FROM CAST(l_shipdate AS DATE)) AS INT) AS {p}_returned_date_sk,
         l_partkey AS {p}_item_sk,
         l_suppkey AS {p}_store_sk,
         o_custkey AS {p}_customer_sk,
         l_orderkey AS {p}_ticket_number,
         CAST(l_quantity AS INT) AS {p}_return_quantity,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * (1 - CAST(l_discount AS DECIMAL(18,6))) AS {p}_return_amt,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * CAST(l_tax AS DECIMAL(18,6)) AS {p}_net_loss,
         CAST(1 + MOD(o_custkey * 7 + l_partkey, 2800) AS INT) AS {p}_cdemo_sk,
         CAST(1 + MOD(o_custkey * 11 + l_suppkey, 720) AS INT) AS {p}_hdemo_sk,
         o_custkey AS {p}_addr_sk,
         o_custkey AS {p}_returning_customer_sk,
         l_orderkey AS {p}_order_number,
         CAST(1 + MOD(l_orderkey + l_linenumber * 5, 36) AS INT) AS {p}_reason_sk,
         CAST(1 + MOD(l_orderkey * 3 + l_partkey, 60) AS INT) AS {p}_web_page_sk,
         CAST(1 + MOD(o_custkey, 6) AS INT) AS {p}_call_center_sk,
         CAST(1 + MOD(o_custkey * 7 + l_partkey, 2800) AS INT) AS {p}_refunded_cdemo_sk,
         CAST(1 + MOD(o_custkey * 7 + l_partkey, 2800) AS INT) AS {p}_returning_cdemo_sk,
         o_custkey AS {p}_refunded_addr_sk,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * (1 - CAST(l_discount AS DECIMAL(18,6))) AS {p}_return_amount,
         CAST(CAST(l_extendedprice AS DECIMAL(18,6))
              * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))
           * (1 - CAST(l_tax AS DECIMAL(18,6))) AS {p}_refunded_cash,
         CAST(CAST(l_extendedprice AS DECIMAL(18,6))
              * CAST(l_tax AS DECIMAL(18,6)) AS DECIMAL(18,6))
           * CAST(0.5 AS DECIMAL(18,6)) AS {p}_fee,
         CAST(CAST(l_extendedprice AS DECIMAL(18,6))
              * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))
           * (CASE WHEN MOD(l_partkey, 7) < 2 THEN CAST(0.45 AS DECIMAL(18,6))
                   ELSE CAST(0.02 AS DECIMAL(18,6)) END) AS {p}_reversed_charge,
         CAST(CAST(l_extendedprice AS DECIMAL(18,6))
              * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))
           * CAST(0.03 AS DECIMAL(18,6)) AS {p}_store_credit
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE MOD(l_linenumber, 3) = {mod} AND l_returnflag = 'R'
"""

#: DS table -> (portable defining SQL over the base views).
DS_VIEWS: dict[str, str] = {
    "date_dim": _DATE_DIM,
    "time_dim": _TIME_DIM,
    "item": _ITEM,
    "store": _STORE,
    "customer": _CUSTOMER_DS,
    "customer_address": _CUSTOMER_ADDRESS,
    "customer_demographics": _CUSTOMER_DEMOGRAPHICS,
    "household_demographics": _HOUSEHOLD_DEMOGRAPHICS,
    "promotion": _PROMOTION,
    "income_band": _INCOME_BAND,
    "warehouse": _WAREHOUSE,
    "ship_mode": _SHIP_MODE,
    "reason": _REASON,
    "call_center": _CALL_CENTER,
    "web_site": _WEB_SITE,
    "web_page": _WEB_PAGE,
    "catalog_page": _CATALOG_PAGE,
    "inventory": _INVENTORY,
    "store_sales": _SALES_TMPL.format(p="ss", mod=0),
    "catalog_sales": _SALES_TMPL.format(p="cs", mod=1),
    "web_sales": _SALES_TMPL.format(p="ws", mod=2),
    "store_returns": _RETURNS_TMPL.format(p="sr", mod=0),
    "catalog_returns": _RETURNS_TMPL.format(p="cr", mod=1),
    "web_returns": _RETURNS_TMPL.format(p="wr", mod=2),
}

#: Base views the DS derivations read.
BASE_TABLES = ["nation", "supplier", "part", "orders", "lineitem"]

_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def needed_views(body: str) -> list[str]:
    """DS views referenced by ``body`` (word match), in DS_VIEWS order —
    definitions have no inter-view dependencies, so any order parses."""
    words = set(_WORD.findall(body))
    return [v for v in DS_VIEWS if v in words]


def compose(body: str) -> str:
    """Prepend the needed DS table definitions as CTEs to a DS query
    body, yielding ONE self-contained string both engines execute
    verbatim against the ten base views. A body that itself starts with
    WITH is merged (its leading ``WITH`` folds into the prologue's)."""
    views = needed_views(body)
    if not views:
        return body
    ctes = ",\n".join(f"{v} AS ({DS_VIEWS[v]})" for v in views)
    stripped = body.lstrip()
    if stripped.upper().startswith("WITH"):
        rest = stripped[4:].lstrip()
        return f"WITH {ctes},\n{rest}"
    return f"WITH {ctes}\n{stripped}"


def register_ds_views(spark: SparkSession, sf_dir: str) -> None:
    """CREATE TEMP VIEW per DS table over the registered base views
    (registers those first)."""
    from spark_s3_shuffle_spark.sources.catalog import register_temp_views

    register_temp_views(spark, sf_dir, BASE_TABLES)
    for name, sql in DS_VIEWS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")


def materialize(spark: SparkSession, sf_dir: str, out: str) -> dict[str, int]:
    """Write every DS table as a single parquet file under ``out`` (the
    snowflake fixture layout, same single-file convention the base
    fixtures use). Returns per-table row counts."""
    import glob
    import os
    import shutil

    register_ds_views(spark, sf_dir)
    os.makedirs(out, exist_ok=True)
    counts: dict[str, int] = {}
    for name in DS_VIEWS:
        df = spark.table(name)
        tmp = f"{out}/.tmp-{name}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{out}/{name}.parquet"
        if os.path.exists(dest):
            os.remove(dest)
        shutil.move(part, dest)
        shutil.rmtree(tmp)
        counts[name] = spark.read.parquet(dest).count()
    return counts
