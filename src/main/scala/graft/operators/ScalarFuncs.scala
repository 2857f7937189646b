package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** §2.8 Scalar function surface — string cleanup, the reference's
  * time-anonymization pipeline (15-minute binning, calendar derivations),
  * math, arrays, maps, JSON payload parsing. All pure column expressions
  * (whole-stage-codegen'd, no UDFs): at 100 TB these run fused inside the
  * scan stage with zero extra shuffles.
  *
  * Transcendental results (ln, trig) are rounded to 6 dp in both engines —
  * JVM Math and libm may legitimately differ in the last ulp.
  */
object ScalarFuncs {

  /** #44 string functions over part names. */
  def strFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 10).as("name_prefix"),
        size(split(col("p_name"), " ")).as("n_words"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        col("p_name").like("%green%").as("is_greenish"),
        trim(lit("  padded  ")).as("trimmed"))
      .orderBy("p_partkey")

  /** #45a the reference's time-anonymization: 15-minute binning + hourly
    * truncation + calendar columns over the event stream.
    */
  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        date_trunc("hour", col("ts")).as("hour_start"),
        timestamp_seconds(floor(unix_timestamp(col("ts")) / 900) * 900).as("bin_15m"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        dayofweek(col("ts")).as("dow"),
        hour(col("ts")).as("hr"),
        minute(col("ts")).as("mins"))
      .orderBy("event_id")

  /** #45c UTC ↔ US/Central conversion — the reference's published
    * datasets carry local times (SURVEY §0.1). The fixture events are
    * January-only, so a +2-month shifted twin column crosses the
    * 2024-03-10 CST→CDT spring-forward: ct is uniformly UTC-6 while
    * ct_spring mixes UTC-6 and UTC-5, and the round-trip equality proves
    * to_utc_timestamp inverts from_utc_timestamp across the boundary.
    */
  def tzConvert(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("ts2", expr("timestampadd(MONTH, 2, ts)"))
      .select(
        col("event_id"),
        from_utc_timestamp(col("ts"), "America/Chicago").as("ct"),
        from_utc_timestamp(col("ts2"), "America/Chicago").as("ct_spring"),
        (to_utc_timestamp(from_utc_timestamp(col("ts2"), "America/Chicago"),
          "America/Chicago") === col("ts2")).as("roundtrip_ok"))
      .orderBy("event_id")

  /** #45b date arithmetic over order dates. */
  def dateArith(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("d"),
        date_add(col("o_orderdate").cast("date"), 30).as("d_plus30"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        quarter(col("o_orderdate")).as("qtr"))
      .orderBy("o_orderkey")

  /** #46 math + decimal-safe money arithmetic. */
  def mathFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        ceil(col("l_discount") * 100).as("disc_pct_ceil"),
        floor(col("l_tax") * 100).as("tax_pct_floor"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        sqrt(col("l_extendedprice")).as("price_sqrt"),
        round(log(col("l_extendedprice")), 6).as("price_ln6"),
        (Det.money(col("l_extendedprice")) * 2).cast("double").as("price_x2"))
      .orderBy("l_orderkey", "l_linenumber")

  /** #47 haversine great-circle distance — the reference's trip-distance
    * check — as a reusable pure-column function (no UDF; codegen-friendly).
    */
  def haversineKm(latA: org.apache.spark.sql.Column, lonA: org.apache.spark.sql.Column,
                  latB: org.apache.spark.sql.Column, lonB: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dLat = radians(latB - latA)
    val dLon = radians(lonB - lonA)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(latA)) * cos(radians(latB)) * pow(sin(dLon / 2), 2)
    lit(2 * 6371.0) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  def haversine(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.customer(s, dir).select(
      col("c_custkey"),
      (((col("c_custkey") * 7919) % 12000).cast("double") / 100 - 60).as("lat"),
      (((col("c_custkey") * 104729) % 36000).cast("double") / 100 - 180).as("lon"))
    pts.select(col("c_custkey"), col("lat"), col("lon"),
        round(haversineKm(col("lat"), col("lon"), lit(30.2672), lit(-97.7431)), 4).as("km_to_austin"))
      .orderBy("c_custkey")
  }

  /** #48 array + higher-order functions over embedding vectors. */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_elem"),
        size(filter(col("embedding"), x => x > 0)).as("n_positive"),
        round(aggregate(transform(col("embedding"), x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x), 4).as("sum_elems"),
        round(aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x), 4).as("sum_sq"))
      .orderBy("vec_id")

  /** #49 map surface: parse the JSON props payload into a map and explode
    * it to deterministic (key, value) rows.
    */
  def mapFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        explode(from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))).as(Seq("mkey", "mval")))
      .orderBy("event_id", "mkey")

  /** #50 JSON functions over the props payload. */
  def jsonFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k_value"),
        from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("struct<k:bigint>")).getField("k").as("k_struct"),
        concat(lit("{\"event_type\":\""), col("event_type"), lit("\",\"k\":"),
          get_json_object(col("props"), "$.k"), lit("}")).as("rebuilt_json"))
      .orderBy("event_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_funcs" -> (strFuncs _),
    "q_date_funcs" -> (dateFuncs _),
    "q_tz_convert" -> (tzConvert _),
    "q_date_arith" -> (dateArith _),
    "q_math_funcs" -> (mathFuncs _),
    "q_haversine" -> (haversine _),
    "q_array_funcs" -> (arrayFuncs _),
    "q_map_funcs" -> (mapFuncs _),
    "q_json_funcs" -> (jsonFuncs _))

  val oracles: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  lower(p_brand) AS brand_lower,
        |  p_brand || '|' || p_type AS brand_type,
        |  substring(p_name, 1, 10) AS name_prefix,
        |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  replace(p_name, ' ', '_') AS name_snake,
        |  p_name LIKE '%green%' AS is_greenish,
        |  trim('  padded  ') AS trimmed
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT event_id,
        |  date_trunc('hour', ts) AS hour_start,
        |  make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900) * 1000000) AS bin_15m,
        |  CAST(year(ts) AS INTEGER) AS y,
        |  CAST(month(ts) AS INTEGER) AS m,
        |  CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
        |  CAST(hour(ts) AS INTEGER) AS hr,
        |  CAST(minute(ts) AS INTEGER) AS mins
        |FROM events ORDER BY event_id""".stripMargin,
    // timezone(tz, TIMESTAMP) interprets a naive ts in tz → TIMESTAMPTZ;
    // timezone(tz, TIMESTAMPTZ) renders naive wall time in tz. Chaining
    // through an explicit 'UTC' step keeps the oracle independent of the
    // DuckDB session timezone.
    "q_tz_convert" ->
      """SELECT event_id,
        |  timezone('America/Chicago', timezone('UTC', ts)) AS ct,
        |  timezone('America/Chicago', timezone('UTC', ts + INTERVAL 2 MONTH)) AS ct_spring,
        |  timezone('UTC', timezone('America/Chicago',
        |    timezone('America/Chicago', timezone('UTC', ts + INTERVAL 2 MONTH))))
        |    = ts + INTERVAL 2 MONTH AS roundtrip_ok
        |FROM events ORDER BY event_id""".stripMargin,
    "q_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(o_orderdate AS DATE) + 30 AS d_plus30,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS qty_dev,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
        |  pow(l_quantity, 2) AS qty_sq,
        |  sqrt(l_extendedprice) AS price_sqrt,
        |  round(ln(l_extendedprice), 6) AS price_ln6,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 2 AS DOUBLE) AS price_x2
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_haversine" ->
      """WITH p AS (
        |  SELECT c_custkey,
        |    CAST((c_custkey * 7919) % 12000 AS DOUBLE) / 100 - 60 AS lat,
        |    CAST((c_custkey * 104729) % 36000 AS DOUBLE) / 100 - 180 AS lon
        |  FROM customer),
        |h AS (
        |  SELECT c_custkey, lat, lon,
        |    pow(sin(radians(30.2672 - lat) / 2), 2)
        |      + cos(radians(lat)) * cos(radians(30.2672)) * pow(sin(radians(-97.7431 - lon) / 2), 2) AS a
        |  FROM p)
        |SELECT c_custkey, lat, lon,
        |  round(12742.0 * atan2(sqrt(a), sqrt(1.0 - a)), 4) AS km_to_austin
        |FROM h ORDER BY c_custkey""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_elem,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
        |  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) AS sum_elems,
        |  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS sum_sq
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_map_funcs" ->
      """SELECT event_id, 'k' AS mkey, CAST(json_extract(props, '$.k') AS BIGINT) AS mval
        |FROM events ORDER BY event_id, mkey""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_struct,
        |  '{"event_type":"' || event_type || '","k":' || CAST(json_extract(props, '$.k') AS BIGINT) || '}' AS rebuilt_json
        |FROM events ORDER BY event_id""".stripMargin)
}
