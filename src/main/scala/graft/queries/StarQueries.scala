package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.IntegerType
import graft.Tables
import graft.ops.{BoundedDim, SafeCast}

/** Star-schema load family — SURVEY.md §2.3 J6/J7/J8, §2.5 W3, §2.4 A4.
  *
  * Reference flagship: the gold fact load
  * (reference: dags/SQL/Gold/create_load_data_gold.sql:122-145) — an
  * inner dim join plus LEFT joins with expression keys (REPLACE /
  * TRIM+UPPER), one null-safe composite join, safe casts and CASE
  * flags, then an anti-join for idempotent append. Realized on the
  * testdata star per FIXTURES.md §B.
  *
  * Scale notes: nation/region/derived dims are tiny at every SF →
  * broadcast-hash joins (explicit `broadcast` hint on the derived dim,
  * which has no stats). lineitem⋈orders is the only real shuffle; at
  * 100 TB both sides shuffle-hash/SMJ on the order key, which is also
  * the natural bucketing key. Surrogate keys use a single-partition
  * row_number ONLY over the tiny distinct dim (bounded by segment
  * cardinality, not data size) — never over fact rows.
  */
object StarQueries extends QueryPack {

  /** Distinct-dim extraction + dense surrogate keys (A4 + W3). */
  private def dimSegment(c: org.apache.spark.sql.DataFrame) =
    c.select(col("c_mktsegment").as("seg_value")).distinct()
      .withColumn("segment_key",
        BoundedDim.cappedKey(
          row_number().over(Window.orderBy("seg_value")), "dimSegment"))

  val starFactLoad = GQuery(
    "q_star_fact_load",
    (s, d) => {
      // one heavy pass over the fact: hash-spread the single-row-group
      // scan so the join-side map work uses the machine (Tables.spread
      // scaladoc; measured 4.6→1.6 s) — the spread's hashpartitioning
      // on the join key doubles as the join's own distribution
      val li = Tables.spread(s, Tables.lineitem(s, d), "l_orderkey")
      val o  = Tables.orders(s, d)
      val c  = Tables.customer(s, d)
      val n  = Tables.nation(s, d)
      val r  = Tables.region(s, d)
      val ds = dimSegment(c)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") <=> col("n_nationkey"), "left")
        .join(r, col("n_regionkey") === col("r_regionkey"), "left")
        .join(broadcast(ds),
          upper(trim(col("c_mktsegment"))) === upper(trim(col("seg_value"))),
          "left")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("c_custkey").as("cust_key"),
          col("n_name").as("nation_name"),
          col("r_name").as("region_name"),
          col("segment_key"),
          when(col("o_orderstatus").isin("F", "P"), 1).otherwise(0)
            .as("done_flag"),
          SafeCast.safeNumeric(col("o_orderpriority"), IntegerType)
            .as("priority_num"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("net_price"))
        // net_price tie-break: (orderkey, linenumber) is NOT unique in
        // the generated data (planted dup lines), and every other
        // output column is order/customer-derived — identical across
        // the tie — so adding the one lineitem-derived column makes
        // the oracle-surface ordering total up to full-row duplicates.
        // Without it the gate was passing on both engines' stable
        // sorts happening to read the same file order (exposed by the
        // sf1 spot-check, where multi-file scan order diverged).
        .orderBy("l_orderkey", "l_linenumber", "net_price")
    },
    Some("""
      WITH dim_segment AS (
        SELECT seg_value, ROW_NUMBER() OVER (ORDER BY seg_value) AS segment_key
        FROM (SELECT DISTINCT c_mktsegment AS seg_value FROM customer)
      )
      SELECT l.l_orderkey, l.l_linenumber, c.c_custkey AS cust_key,
             n.n_name AS nation_name, r.r_name AS region_name,
             ds.segment_key,
             CASE WHEN o.o_orderstatus IN ('F','P') THEN 1 ELSE 0 END AS done_flag,
             CAST(NULLIF(REGEXP_REPLACE(o.o_orderpriority, '[^0-9.]', '', 'g'), '') AS INTEGER) AS priority_num,
             l.l_extendedprice * (1 - l.l_discount) AS net_price
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      LEFT JOIN nation n ON c.c_nationkey IS NOT DISTINCT FROM n.n_nationkey
      LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      LEFT JOIN dim_segment ds
        ON UPPER(TRIM(c.c_mktsegment)) = UPPER(TRIM(ds.seg_value))
      ORDER BY l.l_orderkey, l.l_linenumber, net_price
    """))

  /** Service-combo columns with planted NULLs — the shape of the
    * reference's dim_services: nullable attribute columns whose
    * distinct combinations form the dimension
    * (reference: dags/SQL/Gold/create_load_data_gold.sql:75-86). */
  private val svcNames = Seq(
    "svc_flag", "svc_status", "svc_qty_band", "svc_disc_band",
    "svc_price_band")

  private def withSvc(li: org.apache.spark.sql.DataFrame) = {
    val nullStr = lit(null).cast("string")
    li.select(
      when(col("l_returnflag") === "N", nullStr)
        .otherwise(col("l_returnflag")).as("svc_flag"),
      col("l_linestatus").as("svc_status"),
      when(col("l_quantity") < 10, "LOW")
        .when(col("l_quantity") < 30, nullStr)
        .otherwise("HIGH").as("svc_qty_band"),
      when(col("l_discount") < 0.03, "LO")
        .when(col("l_discount") < 0.07, nullStr)
        .otherwise("HI").as("svc_disc_band"),
      when(col("l_extendedprice") < 20000, "S")
        .when(col("l_extendedprice") < 50000, "M")
        .otherwise(nullStr).as("svc_price_band"))
  }

  /** The reference's most distinctive join (J6 faithful): the fact
    * attaches dim_services via a multi-column NULL-SAFE composite key —
    * `IS NOT DISTINCT FROM` over every service column
    * (reference: dags/SQL/Gold/create_load_data_gold.sql:133-141),
    * because service columns are legitimately NULL and plain `=` would
    * orphan every NULL-bearing combination. Spark's `<=>` conjunction
    * IS a hash-joinable equi-condition (EqualNullSafe keys), so the
    * plan stays a single broadcast-hash join on the 5-part key — no
    * nested-loop fallback (asserted in StarSpec). The dim is distinct
    * combos + a dense surrogate from a single-partition window,
    * bounded by combo cardinality (≤ 162), never by data size. */
  val nullsafeDimJoin = GQuery(
    "q_nullsafe_dim_join",
    (s, d) => {
      val svc = withSvc(Tables.lineitem(s, d))
      val orderCols = svcNames.map(n => col(n).asc_nulls_first)
      val dim = svc.distinct()
        .withColumn("service_key",
          BoundedDim.cappedKey(
            row_number().over(Window.orderBy(orderCols: _*)),
            "q_nullsafe_dim_join"))
        .select(col("service_key") +: svcNames.map(n => col(n).as(s"d_$n")): _*)
      svc.join(broadcast(dim),
          svcNames.map(n => col(n) <=> col(s"d_$n")).reduce(_ && _),
          "left")
        .groupBy(col("service_key") +: svcNames.map(n => col(s"d_$n").as(n)): _*)
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("service_key")
    },
    Some {
      val nf = svcNames.map(n => s"$n NULLS FIRST").mkString(", ")
      val nsEq = svcNames.map(n => s"s.$n IS NOT DISTINCT FROM d.$n")
        .mkString("\n         AND ")
      s"""
      WITH svc AS (
        SELECT NULLIF(l_returnflag, 'N') AS svc_flag,
               l_linestatus AS svc_status,
               CASE WHEN l_quantity < 10 THEN 'LOW'
                    WHEN l_quantity < 30 THEN NULL ELSE 'HIGH' END AS svc_qty_band,
               CASE WHEN l_discount < 0.03 THEN 'LO'
                    WHEN l_discount < 0.07 THEN NULL ELSE 'HI' END AS svc_disc_band,
               CASE WHEN l_extendedprice < 20000 THEN 'S'
                    WHEN l_extendedprice < 50000 THEN 'M' ELSE NULL END AS svc_price_band
        FROM lineitem),
      dim AS (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY $nf) AS INT) AS service_key
        FROM (SELECT DISTINCT * FROM svc))
      SELECT d.service_key, d.svc_flag, d.svc_status, d.svc_qty_band,
             d.svc_disc_band, d.svc_price_band, COUNT(*) AS n_rows
      FROM svc s
      LEFT JOIN dim d
        ON $nsEq
      GROUP BY 1, 2, 3, 4, 5, 6
      ORDER BY service_key
    """})

  def all: Seq[GQuery] = Seq(starFactLoad, nullsafeDimJoin)
}
