package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-governance operators: the declarative data-quality report every
  * scheduled ETL publishes next to its data, and SCD2 (slowly-changing-
  * dimension) history derivation — the reference's modified-date upsert
  * generalized to full validity intervals.
  */
object QualityOps {

  /** Constraint-validation report: one row per check with its violation
    * count — not-null, range, domain, and referential integrity. Each
    * check is an aggregate over one scan (the FK check is a broadcast-able
    * anti join); the union of tiny one-row aggregates costs nothing at any
    * scale, and the report shape is stable as checks are added.
    */
  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    def check(name: String, df: DataFrame, violation: org.apache.spark.sql.Column): DataFrame =
      df.agg(count(when(violation, 1)).as("n_violations"), count(lit(1)).as("n_checked"))
        .select(lit(name).as("check_name"), col("n_violations"), col("n_checked"))
    val fkViolations = o.join(Tables.customer(s, dir),
        o("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders_customer_fk").as("check_name"), col("n_violations"))
      .crossJoin(o.agg(count(lit(1)).as("n_checked")))
    check("o_custkey_not_null", o, col("o_custkey").isNull)
      .unionByName(check("o_totalprice_positive", o, col("o_totalprice") <= 0))
      .unionByName(check("o_orderdate_in_range", o,
        col("o_orderdate") < lit("1992-01-01").cast("timestamp") ||
          col("o_orderdate") >= lit("2003-01-01").cast("timestamp")))
      .unionByName(check("l_quantity_range", li, !col("l_quantity").between(1, 50)))
      .unionByName(check("l_discount_domain", li, !col("l_discount").between(0, 0.1)))
      .unionByName(fkViolations)
      .orderBy("check_name")
  }

  /** SCD2 history: per user, the event-type "status" timeline collapsed to
    * change intervals — valid_from/valid_to plus an is_current flag
    * (valid_to null). Two window passes over one shuffle on user_id:
    * consecutive-duplicate collapse (lag), then interval close (lead).
    */
  def scd2History(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val changes = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type").as("status"))
      .withColumn("prev_status", lag(col("status"), 1).over(w))
      .filter(col("prev_status").isNull || col("prev_status") =!= col("status"))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("status"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      // status in the sort: two same-timestamp changes for one user would
      // otherwise tie and the engines could order them differently
      .orderBy("user_id", "valid_from", "status")
  }

  /** Point-in-time (AS OF) lookup over the SCD2 history: each user's
    * status at a fixed instant T is the unique interval containing T
    * (valid_from ≤ T < valid_to, open-ended current rows included),
    * summarized per status. This is the temporal-dimension read path
    * that SCD2 exists to serve — at scale it is one pushdown-able
    * interval filter over the history table plus a status-cardinality
    * aggregate; no join back to the fact stream is needed because the
    * history IS the index. Composition is the point: the graded claim
    * covers build (q_scd2_history) AND read (this) agreeing cross-engine.
    */
  def scd2Pit(s: SparkSession, dir: String): DataFrame = {
    val asOf = lit("2024-01-15 12:00:00").cast("timestamp")
    scd2History(s, dir)
      .filter(col("valid_from") <= asOf && (col("valid_to").isNull || col("valid_to") > asOf))
      .groupBy("status")
      .agg(count(lit(1)).as("n_users"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"))
      .orderBy("status")
  }

  /** IQR outlier detection — the robust anomaly screen of telemetry QA:
    * per event_type quartiles (exact interpolated percentiles), flag
    * values outside [q1 - 1.5·IQR, q3 + 1.5·IQR]. The quartile table is
    * group-cardinality-sized (broadcast at any corpus size); the fact
    * scan is filtered in place, so outlier detection costs one scan +
    * one tiny aggregate. Cross-engine: quartiles interpolate the same
    * sorted 2-dp doubles on both engines, and values sit far from the
    * irrational bounds, so strict comparisons agree.
    */
  def outlierIqr(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val q = ev.groupBy("event_type").agg(
      expr("percentile(value, 0.25)").as("q1"),
      expr("percentile(value, 0.75)").as("q3"))
    ev.join(broadcast(q), Seq("event_type"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
      .filter(col("value") > col("hi") || col("value") < col("lo"))
      .select(col("event_id"), col("event_type"), col("value"),
        when(col("value") > col("hi"), "high").otherwise("low").as("side"))
      .orderBy("event_type", "event_id")
  }

  /** Snapshot reconciliation (CDC-style diff): classify every key of
    * two table versions as added / removed / changed / unchanged via
    * one full-outer join on the key, then aggregate per class. The two
    * "snapshots" are deterministic slices of the fixture's orders table
    * (old drops keys ≡0 mod 97; new drops keys ≡0 mod 101 and bumps
    * the price of keys ≡0 mod 89). At 100 TB this is one key-partitioned
    * shuffle join (AQE-sized) with map-side-combined class counts — the
    * shape of every snapshot-integrity / replication-audit job.
    */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val oldSnap = orders.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("price_old"))
    val newSnap = orders.filter(pmod(col("o_orderkey"), lit(101)) =!= 0)
      .select(col("o_orderkey").as("key"),
        (col("o_totalprice") +
          when(pmod(col("o_orderkey"), lit(89)) === 0, 1.0).otherwise(0.0)).as("price_new"))
    oldSnap.join(newSnap, Seq("key"), "full_outer")
      .withColumn("change_type",
        when(col("price_old").isNull, "added")
          .when(col("price_new").isNull, "removed")
          .when(col("price_old") =!= col("price_new"), "changed")
          .otherwise("unchanged"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n"), min(col("key")).as("min_key"), max(col("key")).as("max_key"))
      .orderBy("change_type")
  }

  /** Right-to-erasure cascade: given a tombstone set of customer keys
    * (here a deterministic slice: negative-balance MACHINERY customers),
    * propagate the deletion through the FK chain customer → orders →
    * lineitem and report, per table, how many rows the cascade removes
    * vs keeps — the audit artifact a GDPR/CCPA deletion job must emit
    * before the actual rewrite. Tombstone keys are dim-sized so both
    * fact scans prune via BROADCAST semi/anti joins (the orders slice
    * re-broadcasts for lineitem): zero fact-table shuffles, and each
    * per-table count is one map-side-combined global aggregate.
    */
  def deleteCascade(s: SparkSession, dir: String): DataFrame = {
    val tomb = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "MACHINERY" && col("c_acctbal") < 0)
      .select(col("c_custkey"))
    val orders = Tables.orders(s, dir)
    val deadOrders = orders.join(broadcast(tomb),
      col("o_custkey") === col("c_custkey"), "left_semi")
    val li = Tables.lineitem(s, dir)
    val deadLines = li.join(broadcast(deadOrders.select(col("o_orderkey"))),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    def audit(table: String, total: DataFrame, dead: DataFrame): DataFrame =
      total.agg(count(lit(1)).as("n_total")).crossJoin(
          dead.agg(count(lit(1)).as("n_deleted")))
        .select(lit(table).as("table_name"), col("n_total"), col("n_deleted"),
          (col("n_total") - col("n_deleted")).as("n_kept"))
    audit("customer", Tables.customer(s, dir), tomb)
      .unionByName(audit("orders", orders, deadOrders))
      .unionByName(audit("lineitem", li, deadLines))
      .orderBy("table_name")
  }

  /** Benford's-law first-digit audit over order totals — the classic
    * anomaly screen for fabricated or truncated monetary data. All
    * arithmetic is integer: prices become exact cents, the leading digit
    * comes from string length (no log10 near power-of-ten boundaries),
    * observed shares are floor-ppm integer division, and the expected
    * Benford shares floor(1e6·log10(1+1/d)) are precomputed literals
    * shared verbatim with the oracle — so the comparison is
    * tolerance-free on both engines. One map-side-combined 9-group
    * aggregate; linear at any scale.
    */
  def benfordDigits(s: SparkSession, dir: String): DataFrame = {
    val expPpm = Map(1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)
    val digits = Tables.orders(s, dir)
      .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
      .withColumn("digit",
        expr("cents div CAST(pow(10, length(CAST(cents AS STRING)) - 1) AS BIGINT)"))
      .groupBy("digit").agg(count(lit(1)).as("n_orders"))
    digits
      // the unpartitioned total window runs over ≤9 rows (digits 1-9) —
      // bounded by construction, same argument as the chi-square table
      .withColumn("obs_ppm", expr("(1000000 * n_orders) div sum(n_orders) OVER ()"))
      .withColumn("exp_ppm", element_at(typedLit(expPpm), col("digit").cast("int")))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
      .select(col("digit"), col("n_orders"), col("obs_ppm"), col("exp_ppm"), col("dev_ppm"))
      .orderBy("digit")
  }

  /** Effective-dated dimension join — the general SCD2 read path (vs
    * q_scd2_pit's single global AS OF): every purchase fact picks up the
    * user's status AS OF its own timestamp, i.e. the unique history
    * interval with valid_from ≤ ts < valid_to (open-ended current rows
    * included; purchases before any status observation keep NULL via the
    * left join). The dimension is the status history built from the
    * NON-purchase events. The equi key (user_id) makes this a sort-merge
    * join with the range as a post-filter — per-user histories are
    * bounded, so no banding is needed (contrast q_join_interval, where
    * both sides are ranges).
    */
  def scd2Join(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("d_user").orderBy("ts", "event_id")
    val hist = Tables.events(s, dir)
      .filter(col("event_type") =!= "purchase")
      .select(col("user_id").as("d_user"), col("event_id"), col("ts"),
        col("event_type").as("status"))
      .withColumn("prev_status", lag(col("status"), 1).over(w))
      .filter(col("prev_status").isNull || col("prev_status") =!= col("status"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("d_user"), col("status"), col("ts").as("valid_from"), col("valid_to"))
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
      .join(hist,
        col("user_id") === col("d_user")
          && col("valid_from") <= col("ts")
          && (col("valid_to").isNull || col("ts") < col("valid_to")),
        "left")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("status").as("status_at_purchase"))
      .orderBy("user_id", "event_id")
  }

  /** Malformed-payload quarantine — the ingest split every production
    * pipeline needs: parse a JSON payload column permissively, route
    * unparseable rows to a quarantine count instead of failing the job,
    * and aggregate only the valid ones. Payloads are synthesized
    * deterministically from the documents table (every 7th is truncated
    * → invalid), so both engines see byte-identical inputs; Spark's
    * from_json returns NULL on malformed input (the permissive
    * contract), DuckDB's json_valid gates the same rows. Linear, one
    * aggregate, no shuffle beyond the lang rollup.
    */
  def jsonQuarantine(s: SparkSession, dir: String): DataFrame = {
    val parsedType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang").as("doc_lang"),
        concat(lit("{\"lang\": \""), col("lang"), lit("\", \"n_chars\": "),
          col("n_chars").cast("string"), lit("}")).as("payload"))
      .withColumn("payload",
        when(pmod(col("doc_id"), lit(7)) === 0,
          expr("substring(payload, 1, length(payload) - 1)"))
          .otherwise(col("payload")))
      .withColumn("parsed", from_json(col("payload"), parsedType))
      .withColumn("ok", col("parsed").isNotNull && col("parsed.n_chars").isNotNull)
      .groupBy(col("doc_lang").as("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_quarantined"),
        sum(when(col("ok"), col("parsed.n_chars")).otherwise(0L)).as("chars_valid"))
      .orderBy("lang")
  }

  /** Differentially-private (ε = 1) release of the (lang, source) count
    * table via the Laplace mechanism — the publishable sibling of the
    * k-anonymity suppression in Aggregations.odFlows. The noise is
    * SEEDED Laplace, not random: u comes from the cross-engine
    * md5-prefix integer (uniform in [1, 999999] µ-units), inverted
    * through the Laplace CDF as X = sgn(u−½)·(ln(10⁶) − ln(k)) with
    * k = 10⁶ − 2|u − 500000| ∈ [2, 10⁶] — both ln() arguments are exact
    * integers under the repo's floor-nano convention, so the noise is
    * bit-identical cross-engine and the release is reproducible (a real
    * deployment would swap the seed column for a secret). Sensitivity 1
    * (unit count), b = Δ/ε = 1. One |lang|·|source|-group aggregate;
    * noise is a per-group scalar expression — nothing beyond the count
    * shuffle.
    */
  def dpNoisyCounts(s: SparkSession, dir: String): DataFrame = {
    val u = pmod(conv(substring(md5(concat(lit("dp:"), col("lang"),
      lit(":"), col("source"))), 1, 8), 16, 10).cast("long"), lit(999999L)) + 1
    val k = lit(1000000L) - abs(u - 500000L) * 2
    val sgn = when(u >= 500000L, 1L).otherwise(-1L)
    val noiseNano = sgn * (floor(log(lit(1000000).cast("double")) * 1e9).cast("long") -
      floor(log(k.cast("double")) * 1e9).cast("long"))
    Tables.documents(s, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .select(col("lang"), col("source"),
        round(col("n") + noiseNano.cast("double") / 1e9, 4).as("noisy_count"))
      .orderBy("lang", "source")
  }

  /** #271 CDC log apply: reduce an ordered change-data-capture stream
    * of INSERT / UPDATE / DELETE operations to the final table state —
    * the core primitive of every lakehouse MERGE/materialization path
    * (q_upsert applies one batch of upserts; this applies a FULL
    * multi-operation history with deletes, latest-op-wins).
    *
    * The change log is derived deterministically from orders so both
    * engines see the identical stream: seq 1 = INSERT of every order at
    * its original price; seq 2 = UPDATE (+5%, integer cents div 20) for
    * open-status orders; seq 3 = DELETE for orderkey % 97 == 0.
    * Apply = per-key max-seq row wins, DELETE tombstones drop. Output
    * is the per-status reconciliation report (live rows, live cents,
    * tombstoned and updated counts) a CDC sink audits after each apply.
    *
    * Scale: the apply is ONE key-partitioned window (max_by over seq) —
    * the shuffle is keyed on the primary key exactly like the
    * production merge; the three log branches are projections of the
    * same scan (Catalyst reuses it), and the report aggregate is
    * |status|-bounded, map-side combined.
    */
  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey").as("okey"),
      col("o_orderstatus").as("status"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val ins = o.select(col("okey"), lit(1L).as("seq"), lit("I").as("op"),
      col("status"), col("cents"))
    val upd = o.filter(col("status") === "O")
      .select(col("okey"), lit(2L).as("seq"), lit("U").as("op"),
        col("status"), (col("cents") + expr("cents div 20")).as("cents"))
    val del = o.filter(col("okey") % 97 === 0)
      .select(col("okey"), lit(3L).as("seq"), lit("D").as("op"),
        col("status"), lit(null).cast("long").as("cents"))
    val log = ins.unionByName(upd).unionByName(del)
    val w = Window.partitionBy("okey").orderBy(desc("seq"))
    log.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("status")
      .agg(
        sum(when(col("op") =!= "D", 1L).otherwise(0L)).as("n_live"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deleted"),
        sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_updated"),
        sum(when(col("op") =!= "D", col("cents")).otherwise(0L)).as("live_cents"))
      .orderBy("status")
  }

  /** #272 k-anonymity / l-diversity audit of the event stream treated
    * as a quasi-identified release: QI group = activity hour, sensitive
    * attribute = event_type. Reports, per hour, the group size k (rows
    * + distinct users) and diversity l (distinct sensitive values),
    * with the release flags (k ≥ 5, l ≥ 3) the privacy gate enforces —
    * the AUDIT companion to the enforcement ops (odFlows suppresses on
    * k; dpNoisyCounts randomizes): before publishing, you measure which
    * groups fail.
    *
    * Scale: one groupBy(hour) with count + two count_distincts —
    * calendar-bounded output, map-side partials for the counts; the
    * distinct-user/type counts shuffle (hour, value) pairs, bounded by
    * hours × |users| in the worst case but never wider than the raw
    * event relation, and exact (the HLL variant of this audit is
    * q_rolling_active_hll's territory).
    */
  def privacyLdiversity(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("k_rows"),
        countDistinct(col("user_id")).as("k_users"),
        countDistinct(col("event_type")).as("l_types"))
      .select(col("hour"), col("k_rows"), col("k_users"), col("l_types"),
        (col("k_users") >= 5).as("ok_k5"), (col("l_types") >= 3).as("ok_l3"))
      .orderBy("hour")

  /** #277 k-anonymity generalization ladder (Samarati-style full-domain
    * time generalization): each 15-minute activity cell is released at
    * the FINEST rung of the 15 → 30 → 60-minute hierarchy whose group
    * reaches k ≥ 5, or suppressed if even the hour fails — the
    * enforcement policy between odFlows' flat suppression (drop every
    * small cell) and dpNoisyCounts' randomization: coarsen first, drop
    * last. Output: per rung, how many 15-min base cells and events land
    * there — the utility/privacy tradeoff readout of the ladder.
    *
    * Scale: aligned buckets mean the WHOLE ladder derives from ONE
    * map-side-combined aggregate — b30 = b15 div 2, b60 = b15 div 4, so
    * the 30/60-min counts are re-aggregates of the calendar-bounded
    * 15-min relation, not new scans; rung classification is a
    * projection over that same tiny relation after two broadcast-scale
    * joins. Nothing row-cardinality moves after the first groupBy. The
    * 15-min relation is localCheckpoint'd so its four consumers (c30,
    * c60, and both sides of the classification join) share the single
    * event scan instead of re-running it — the derived-file pattern.
    */
  def anonLadder(s: SparkSession, dir: String): DataFrame = {
    val c15 = Tables.events(s, dir)
      .select(expr("cast(ts as long) div 900").as("b15"))
      .groupBy("b15").agg(count(lit(1)).as("n15"))
      .localCheckpoint()
    val c30 = c15.groupBy(expr("b15 div 2").as("b30"))
      .agg(sum(col("n15")).as("n30"))
    val c60 = c15.groupBy(expr("b15 div 4").as("b60"))
      .agg(sum(col("n15")).as("n60"))
    c15
      .join(broadcast(c30), expr("b15 div 2") === col("b30"))
      .join(broadcast(c60), expr("b15 div 4") === col("b60"))
      .withColumn("rung",
        when(col("n15") >= 5, "15min").when(col("n30") >= 5, "30min")
          .when(col("n60") >= 5, "60min").otherwise("suppressed"))
      .groupBy("rung")
      .agg(count(lit(1)).as("n_cells"), sum(col("n15")).as("n_events"))
      .orderBy("rung")
  }

  /** #453 k-anonymity profile of the event stream under the release
    * quasi-identifier (15-min bin, event_type) — the Sweeney (2002)
    * metric underneath the whole privacy family: #277's ladder DECIDES
    * a release granularity, this op MEASURES the anonymity the chosen
    * granularity actually delivers (min class size = the k in
    * "k-anonymous", plus the at-risk mass below the k=5 policy bar —
    * the two numbers a release review asks for first). Same integer
    * 15-min bin staging as [[anonLadder]].
    *
    * Scale: one groupBy over the corpus to the QI-class relation
    * (calendar × 5 types — bounded), then a 1-row profile aggregate;
    * one truncating ppm division. Class-size distribution rides along
    * as an equi-count histogram readout (size, n_classes) capped by
    * the bounded class-size domain.
    */
  def privacyKanonymity(s: SparkSession, dir: String): DataFrame = {
    val classes = Tables.events(s, dir)
      .select(expr("cast(ts as long) div 900").as("b15"), col("event_type"))
      .groupBy("b15", "event_type").agg(count(lit(1)).as("csize"))
    classes.agg(count(lit(1)).as("n_classes"),
        sum(col("csize")).as("n_rows"),
        min(col("csize")).as("k_anonymity"),
        sum(when(col("csize") < 5, lit(1L)).otherwise(0L)).as("n_classes_below_k"),
        sum(when(col("csize") < 5, col("csize")).otherwise(0L)).as("n_rows_below_k"))
      .select(col("n_classes"), col("n_rows"), col("k_anonymity"),
        col("n_classes_below_k"), col("n_rows_below_k"),
        expr("(n_rows_below_k * 1000000) div n_rows").as("at_risk_ppm"))
  }

  /** #280 t-closeness audit (Li/Li/Venkatasubramanian, ICDE 2007) —
    * completes the k / l / t privacy-audit triple with
    * [[privacyLdiversity]] and [[anonLadder]]: per QI group (activity
    * hour), the total-variation distance between the group's sensitive
    * event_type distribution and the global one, TVD = ½·Σ_t |p_t −
    * q_t| in floored ppm, flagged at t ≤ 0.3. l-diversity counts
    * sensitive values; t-closeness catches the group whose values are
    * DIVERSE but skewed enough to leak.
    *
    * Exactness: per-type shares floored to ppm first (both engines
    * floor the same integer quotients), |diffs| summed, halved by one
    * truncating div. Missing (hour, type) cells contribute the full
    * global share, so the grid is completed hours × |event_type| —
    * calendar-bounded times a constant — via one cross join of two
    * broadcast-scale relations before a left join of the observed
    * counts. One row-cardinality aggregate total.
    */
  def privacyTcloseness(s: SparkSession, dir: String): DataFrame = {
    val ht = Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_ht"))
      .localCheckpoint()
    val h = ht.groupBy("hour").agg(sum(col("n_ht")).as("n_h"))
    val g = ht.groupBy("event_type").agg(sum(col("n_ht")).as("n_t"))
    val tot = ht.agg(sum(col("n_ht")).as("n")).select(col("n").cast("long").as("n"))
    h.crossJoin(broadcast(g)).crossJoin(broadcast(tot))
      .join(ht, Seq("hour", "event_type"), "left")
      .select(col("hour"), col("n_h"),
        (expr("(coalesce(n_ht, 0) * 1000000) div n_h") -
          expr("(n_t * 1000000) div n")).as("d_ppm"))
      .groupBy("hour")
      .agg(max(col("n_h")).as("k_rows"),
        expr("sum(abs(d_ppm)) div 2").as("tvd_ppm"))
      .select(col("hour"), col("k_rows"), col("tvd_ppm"),
        (col("tvd_ppm") <= 300000L).as("ok_t03"))
      .orderBy("hour")
  }

  /** #286 Data-freshness audit: per event type, the lag between its
    * latest event and the stream's global watermark (exact integer
    * minutes), the last-24h arrival count, and a staleness flag at 2
    * hours — the first monitor an ingestion on-call reads when a source
    * silently stops (dqChecks validates VALUES; this validates
    * ARRIVAL).
    *
    * Scale: two map-side-combined aggregates (global max is a 1-row
    * broadcast; per-type max/count shuffles |type| states); the 24h
    * predicate folds into the same per-type aggregate via a conditional
    * sum against the broadcast watermark. All epoch-seconds integer
    * math.
    */
  def dqFreshness(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("ts").cast("long").as("sec"))
    val wm = ev.agg(max(col("sec")).as("wm"))
    ev.crossJoin(broadcast(wm))
      .groupBy("event_type")
      .agg(max(col("sec")).as("last_sec"),
        sum(when(col("sec") > col("wm") - 86400L, 1L).otherwise(0L))
          .as("n_last_24h"),
        max(col("wm")).as("wm"))
      .select(col("event_type"),
        expr("(wm - last_sec) div 60").as("staleness_min"),
        col("n_last_24h"),
        ((col("wm") - col("last_sec")) > 7200L).as("stale_2h"))
      .orderBy("event_type")
  }

  /** #352 Referential-integrity orphan audit over the full FK chain
    * (lineitem→orders, lineitem→part, lineitem→supplier,
    * orders→customer, customer→nation, supplier→nation,
    * nation→region): per edge the child count and orphan count — the
    * first DQ gate on any warehouse load, and the PROOF of zero
    * orphans is as valuable as a catch (asserting the fixture's FK
    * guarantees instead of assuming them).
    *
    * Exactness: pure left-anti-join counts. Scale: each edge is one
    * key-partitioned anti-join with NO forced hint — several parents
    * (orders, customer, part, supplier) scale with the corpus, so the
    * planner/AQE broadcasts the ones that fit (all of them at fixture
    * sf) and shuffle-anti-joins the rest at TB; the result is 7 rows
    * regardless of corpus size.
    */
  def dqOrphans(s: SparkSession, dir: String): DataFrame = {
    // r21: one pass per edge — the former anti-join + separate child
    // count scanned every child table twice and crossJoined the two
    // 1-row aggregates; a left join against the distinct parent keys
    // (row-count-preserving) carries both counts through ONE aggregate
    def edge(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame =
      child.select(col(key).as("k"))
        .join(parent.select(col(pkey).as("k")).distinct()
          .withColumn("hit", lit(1)), Seq("k"), "left")
        .agg(count(lit(1)).as("n_child"),
          count(when(col("hit").isNull, lit(1))).as("n_orphans"))
        .select(lit(name).as("fk_edge"), col("n_child"), col("n_orphans"))
    val li = Tables.lineitem(s, dir); val o = Tables.orders(s, dir)
    val cst = Tables.customer(s, dir); val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    edge("lineitem.orderkey->orders", li, "l_orderkey", o, "o_orderkey")
      .unionByName(edge("lineitem.partkey->part", li, "l_partkey",
        Tables.part(s, dir), "p_partkey"))
      .unionByName(edge("lineitem.suppkey->supplier", li, "l_suppkey",
        sup, "s_suppkey"))
      .unionByName(edge("orders.custkey->customer", o, "o_custkey",
        cst, "c_custkey"))
      .unionByName(edge("customer.nationkey->nation", cst, "c_nationkey",
        nat, "n_nationkey"))
      .unionByName(edge("supplier.nationkey->nation", sup, "s_nationkey",
        nat, "n_nationkey"))
      .unionByName(edge("nation.regionkey->region", nat, "n_regionkey",
        Tables.region(s, dir), "r_regionkey"))
      .orderBy("fk_edge")
  }

  /** #436 Schema/statistics drift report between the two parquet
    * generations of the evolved table (#285's fixture: generation A
    * written before the `source` column existed, generation B after) —
    * the lakehouse check a data team runs when a long-lived dataset's
    * writer changes: per column, row counts, null counts, and distinct
    * cardinalities side by side, with the back-filled-NULL column
    * surfacing as 100% null in the old generation rather than
    * silently. Scale: one aggregate per generation (multi-distinct →
    * Spark's Expand, grouping-bounded); the report relation is
    * |columns| rows. Oracle recomputes from the ORIGINAL table under
    * the generations' doc_id parity split.
    */
  def dqSchemaDrift(s: SparkSession, dir: String): DataFrame = {
    val root = Scans.buildEvolved(s, dir)
    val genA = s.read.parquet(s"$root/a")
      .withColumn("source", lit(null).cast("string"))
    val genB = s.read.parquet(s"$root/b")
    def profile(df: DataFrame, gen: String): DataFrame =
      df.agg(count(lit(1)).as("rows"),
          sum(when(col("lang").isNull, 1L).otherwise(0L)).as("lang_nulls"),
          countDistinct(col("lang")).as("lang_distinct"),
          sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as("nchars_nulls"),
          countDistinct(col("n_chars")).as("nchars_distinct"),
          sum(when(col("source").isNull, 1L).otherwise(0L)).as("source_nulls"),
          countDistinct(col("source")).as("source_distinct"))
        .select(lit(gen).as("gen"), col("rows"),
          expr("stack(3, 'lang', lang_nulls, lang_distinct, " +
            "'n_chars', nchars_nulls, nchars_distinct, " +
            "'source', source_nulls, source_distinct) " +
            "as (col_name, nulls, n_distinct)"))
    val a = profile(genA, "a").select(col("col_name"), col("rows").as("rows_a"),
      col("nulls").as("nulls_a"), col("n_distinct").as("distinct_a"))
    val b = profile(genB, "b").select(col("col_name"), col("rows").as("rows_b"),
      col("nulls").as("nulls_b"), col("n_distinct").as("distinct_b"))
    a.join(b, Seq("col_name"))
      .withColumn("null_frac_drift_ppm",
        expr("abs(nulls_a * 1000000 div rows_a - nulls_b * 1000000 div rows_b)"))
      .orderBy("col_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_schema_drift" -> (dqSchemaDrift _),
    "q_dq_orphans" -> (dqOrphans _),
    "q_dq_freshness" -> (dqFreshness _),
    "q_privacy_tcloseness" -> (privacyTcloseness _),
    "q_anon_ladder" -> (anonLadder _),
    "q_privacy_kanonymity" -> (privacyKanonymity _),
    "q_cdc_apply" -> (cdcApply _),
    "q_privacy_ldiversity" -> (privacyLdiversity _),
    "q_dp_counts" -> (dpNoisyCounts _),
    "q_scd2_join" -> (scd2Join _),
    "q_json_quarantine" -> (jsonQuarantine _),
    "q_benford" -> (benfordDigits _),
    "q_snapshot_diff" -> (snapshotDiff _),
    "q_outlier_iqr" -> (outlierIqr _),
    "q_dq_checks" -> (dqChecks _),
    "q_delete_cascade" -> (deleteCascade _),
    "q_scd2_history" -> (scd2History _),
    "q_scd2_pit" -> (scd2Pit _))

  val oracles: Map[String, String] = Map(
    "q_dq_schema_drift" ->
      """WITH a AS (
        |  SELECT COUNT(*) AS rows_a,
        |    CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS lang_nulls,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS lang_distinct,
        |    CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nchars_nulls,
        |    CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS nchars_distinct,
        |    COUNT(*) AS source_nulls, CAST(0 AS BIGINT) AS source_distinct
        |  FROM documents WHERE doc_id % 2 = 0),
        |b AS (
        |  SELECT COUNT(*) AS rows_b,
        |    CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS lang_nulls,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS lang_distinct,
        |    CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nchars_nulls,
        |    CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS nchars_distinct,
        |    CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS source_nulls,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS source_distinct
        |  FROM documents WHERE doc_id % 2 = 1),
        |am AS (
        |  SELECT m.col_name, a.rows_a,
        |    CASE m.col_name WHEN 'lang' THEN a.lang_nulls
        |      WHEN 'n_chars' THEN a.nchars_nulls ELSE a.source_nulls END
        |      AS nulls_a,
        |    CASE m.col_name WHEN 'lang' THEN a.lang_distinct
        |      WHEN 'n_chars' THEN a.nchars_distinct ELSE a.source_distinct END
        |      AS distinct_a
        |  FROM a, (VALUES ('lang'), ('n_chars'), ('source')) m(col_name)),
        |bm AS (
        |  SELECT m.col_name, b.rows_b,
        |    CASE m.col_name WHEN 'lang' THEN b.lang_nulls
        |      WHEN 'n_chars' THEN b.nchars_nulls ELSE b.source_nulls END
        |      AS nulls_b,
        |    CASE m.col_name WHEN 'lang' THEN b.lang_distinct
        |      WHEN 'n_chars' THEN b.nchars_distinct ELSE b.source_distinct END
        |      AS distinct_b
        |  FROM b, (VALUES ('lang'), ('n_chars'), ('source')) m(col_name))
        |SELECT am.col_name, am.rows_a, am.nulls_a, am.distinct_a,
        |  bm.rows_b, bm.nulls_b, bm.distinct_b,
        |  abs(am.nulls_a * 1000000 // am.rows_a
        |    - bm.nulls_b * 1000000 // bm.rows_b) AS null_frac_drift_ppm
        |FROM am JOIN bm USING (col_name)
        |ORDER BY col_name""".stripMargin,
    "q_dq_orphans" ->
      """WITH e AS (
        |  SELECT 'lineitem.orderkey->orders' AS fk_edge,
        |    (SELECT COUNT(*) FROM lineitem) AS n_child,
        |    (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
        |      ON o.o_orderkey = l.l_orderkey
        |      WHERE o.o_orderkey IS NULL) AS n_orphans
        |  UNION ALL
        |  SELECT 'lineitem.partkey->part',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
        |      ON p.p_partkey = l.l_partkey WHERE p.p_partkey IS NULL)
        |  UNION ALL
        |  SELECT 'lineitem.suppkey->supplier',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s
        |      ON s.s_suppkey = l.l_suppkey WHERE s.s_suppkey IS NULL)
        |  UNION ALL
        |  SELECT 'orders.custkey->customer',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
        |      ON c.c_custkey = o.o_custkey WHERE c.c_custkey IS NULL)
        |  UNION ALL
        |  SELECT 'customer.nationkey->nation',
        |    (SELECT COUNT(*) FROM customer),
        |    (SELECT COUNT(*) FROM customer c LEFT JOIN nation n
        |      ON n.n_nationkey = c.c_nationkey
        |      WHERE n.n_nationkey IS NULL)
        |  UNION ALL
        |  SELECT 'supplier.nationkey->nation',
        |    (SELECT COUNT(*) FROM supplier),
        |    (SELECT COUNT(*) FROM supplier s LEFT JOIN nation n
        |      ON n.n_nationkey = s.s_nationkey
        |      WHERE n.n_nationkey IS NULL)
        |  UNION ALL
        |  SELECT 'nation.regionkey->region',
        |    (SELECT COUNT(*) FROM nation),
        |    (SELECT COUNT(*) FROM nation n LEFT JOIN region r
        |      ON r.r_regionkey = n.n_regionkey
        |      WHERE r.r_regionkey IS NULL))
        |SELECT fk_edge, CAST(n_child AS BIGINT) AS n_child,
        |  CAST(n_orphans AS BIGINT) AS n_orphans
        |FROM e ORDER BY fk_edge""".stripMargin,
    "q_dq_freshness" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |wm AS (SELECT MAX(sec) AS wm FROM ev),
        |g AS (
        |  SELECT event_type, MAX(sec) AS last_sec,
        |    CAST(SUM(CASE WHEN sec > wm.wm - 86400 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_last_24h,
        |    MAX(wm.wm) AS wm
        |  FROM ev CROSS JOIN wm GROUP BY event_type)
        |SELECT event_type, (wm - last_sec) // 60 AS staleness_min, n_last_24h,
        |  (wm - last_sec) > 7200 AS stale_2h
        |FROM g ORDER BY event_type""".stripMargin,
    "q_privacy_tcloseness" ->
      """WITH ht AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_ht
        |  FROM events GROUP BY 1, 2),
        |h AS (SELECT hour, CAST(SUM(n_ht) AS BIGINT) AS n_h FROM ht GROUP BY hour),
        |g AS (SELECT event_type, CAST(SUM(n_ht) AS BIGINT) AS n_t
        |      FROM ht GROUP BY event_type),
        |tot AS (SELECT CAST(SUM(n_ht) AS BIGINT) AS n FROM ht),
        |grid AS (
        |  SELECT h.hour, h.n_h, g.event_type, g.n_t, tot.n,
        |    COALESCE(ht.n_ht, 0) AS n_ht
        |  FROM h CROSS JOIN g CROSS JOIN tot
        |    LEFT JOIN ht ON ht.hour = h.hour AND ht.event_type = g.event_type),
        |d AS (
        |  SELECT hour, n_h,
        |    (n_ht * 1000000) // n_h - (n_t * 1000000) // n AS d_ppm
        |  FROM grid)
        |SELECT hour, MAX(n_h) AS k_rows,
        |  CAST(SUM(abs(d_ppm)) // 2 AS BIGINT) AS tvd_ppm,
        |  CAST(SUM(abs(d_ppm)) // 2 AS BIGINT) <= 300000 AS ok_t03
        |FROM d GROUP BY hour ORDER BY hour""".stripMargin,
    "q_privacy_kanonymity" ->
      """WITH classes AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 900 AS b15, event_type,
        |    COUNT(*) AS csize
        |  FROM events GROUP BY 1, 2),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
        |    CAST(SUM(csize) AS BIGINT) AS n_rows,
        |    CAST(MIN(csize) AS BIGINT) AS k_anonymity,
        |    CAST(SUM(CASE WHEN csize < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_classes_below_k,
        |    CAST(SUM(CASE WHEN csize < 5 THEN csize ELSE 0 END) AS BIGINT)
        |      AS n_rows_below_k
        |  FROM classes)
        |SELECT n_classes, n_rows, k_anonymity, n_classes_below_k,
        |  n_rows_below_k,
        |  CAST((n_rows_below_k * 1000000) // n_rows AS BIGINT) AS at_risk_ppm
        |FROM a""".stripMargin,
    "q_anon_ladder" ->
      """WITH c15 AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 900 AS b15, COUNT(*) AS n15
        |  FROM events GROUP BY 1),
        |c30 AS (SELECT b15 // 2 AS b30, SUM(n15) AS n30 FROM c15 GROUP BY 1),
        |c60 AS (SELECT b15 // 4 AS b60, SUM(n15) AS n60 FROM c15 GROUP BY 1),
        |r AS (
        |  SELECT CASE WHEN n15 >= 5 THEN '15min' WHEN n30 >= 5 THEN '30min'
        |              WHEN n60 >= 5 THEN '60min' ELSE 'suppressed' END AS rung,
        |    n15
        |  FROM c15 JOIN c30 ON c15.b15 // 2 = c30.b30
        |    JOIN c60 ON c15.b15 // 4 = c60.b60)
        |SELECT rung, COUNT(*) AS n_cells, CAST(SUM(n15) AS BIGINT) AS n_events
        |FROM r GROUP BY rung ORDER BY rung""".stripMargin,
    "q_cdc_apply" ->
      """WITH o AS (
        |  SELECT o_orderkey AS okey, o_orderstatus AS status,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |log AS (
        |  SELECT okey, 1 AS seq, 'I' AS op, status, cents FROM o
        |  UNION ALL
        |  SELECT okey, 2, 'U', status, cents + cents // 20 FROM o WHERE status = 'O'
        |  UNION ALL
        |  SELECT okey, 3, 'D', status, NULL FROM o WHERE okey % 97 = 0),
        |last AS (
        |  SELECT * FROM log
        |  QUALIFY row_number() OVER (PARTITION BY okey ORDER BY seq DESC) = 1)
        |SELECT status,
        |  CAST(SUM(CASE WHEN op <> 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
        |  CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
        |  CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
        |  CAST(SUM(CASE WHEN op <> 'D' THEN cents ELSE 0 END) AS BIGINT) AS live_cents
        |FROM last GROUP BY status ORDER BY status""".stripMargin,
    "q_privacy_ldiversity" ->
      """SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS k_rows,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS k_users,
        |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS l_types,
        |  COUNT(DISTINCT user_id) >= 5 AS ok_k5,
        |  COUNT(DISTINCT event_type) >= 3 AS ok_l3
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,
    "q_dp_counts" ->
      """WITH g AS (
        |  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source),
        |u AS (
        |  SELECT lang, source, n,
        |    ('0x' || substring(md5('dp:' || lang || ':' || source), 1, 8))::BIGINT
        |      % 999999 + 1 AS uu
        |  FROM g),
        |k AS (
        |  SELECT lang, source, n, uu, 1000000 - 2 * abs(uu - 500000) AS kk FROM u)
        |SELECT lang, source,
        |  round(n + (CASE WHEN uu >= 500000 THEN 1 ELSE -1 END)
        |    * (CAST(floor(ln(CAST(1000000 AS DOUBLE)) * 1e9) AS BIGINT)
        |       - CAST(floor(ln(CAST(kk AS DOUBLE)) * 1e9) AS BIGINT)) / 1e9, 4)
        |    AS noisy_count
        |FROM k ORDER BY lang, source""".stripMargin,
    "q_scd2_join" ->
      """WITH seq AS (
        |  SELECT user_id AS d_user, event_id, ts, event_type AS status,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_status
        |  FROM events WHERE event_type <> 'purchase'),
        |hist AS (
        |  SELECT d_user, status, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY d_user ORDER BY ts, event_id) AS valid_to
        |  FROM seq WHERE prev_status IS NULL OR prev_status <> status)
        |SELECT f.user_id, f.event_id, f.ts,
        |  h.status AS status_at_purchase
        |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') f
        |LEFT JOIN hist h ON f.user_id = h.d_user
        |  AND h.valid_from <= f.ts AND (h.valid_to IS NULL OR f.ts < h.valid_to)
        |ORDER BY f.user_id, f.event_id""".stripMargin,
    "q_json_quarantine" ->
      """WITH p AS (
        |  SELECT doc_id, lang AS doc_lang,
        |    '{"lang": "' || lang || '", "n_chars": ' || CAST(n_chars AS VARCHAR) || '}'
        |      AS payload0
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, doc_lang,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN substring(payload0, 1, length(payload0) - 1)
        |      ELSE payload0 END AS payload
        |  FROM p)
        |SELECT doc_lang AS lang, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN json_valid(payload) THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_quarantined,
        |  CAST(SUM(CASE WHEN json_valid(payload)
        |    THEN CAST(json_extract(payload, '$.n_chars') AS BIGINT) ELSE 0 END)
        |    AS BIGINT) AS chars_valid
        |FROM c GROUP BY doc_lang ORDER BY doc_lang""".stripMargin,
    "q_benford" ->
      """WITH d AS (
        |  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders),
        |g AS (
        |  SELECT cents // CAST(pow(10, length(CAST(cents AS VARCHAR)) - 1) AS BIGINT)
        |    AS digit, COUNT(*) AS n_orders
        |  FROM d GROUP BY 1),
        |e(digit, exp_ppm) AS (VALUES (1, 301029), (2, 176091), (3, 124938),
        |  (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152), (9, 45757))
        |SELECT g.digit, g.n_orders,
        |  CAST((1000000 * g.n_orders) // SUM(g.n_orders) OVER () AS BIGINT) AS obs_ppm,
        |  CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
        |  CAST(abs((1000000 * g.n_orders) // SUM(g.n_orders) OVER ()
        |    - CAST(e.exp_ppm AS BIGINT)) AS BIGINT) AS dev_ppm
        |FROM g JOIN e ON g.digit = e.digit
        |ORDER BY g.digit""".stripMargin,
    "q_delete_cascade" ->
      """WITH tomb AS (
        |  SELECT c_custkey FROM customer
        |  WHERE c_mktsegment = 'MACHINERY' AND c_acctbal < 0),
        |dead_orders AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM tomb))
        |SELECT 'customer' AS table_name,
        |  (SELECT COUNT(*) FROM customer) AS n_total,
        |  (SELECT COUNT(*) FROM tomb) AS n_deleted,
        |  (SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM tomb) AS n_kept
        |UNION ALL
        |SELECT 'orders',
        |  (SELECT COUNT(*) FROM orders),
        |  (SELECT COUNT(*) FROM dead_orders),
        |  (SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM dead_orders)
        |UNION ALL
        |SELECT 'lineitem',
        |  (SELECT COUNT(*) FROM lineitem),
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_orderkey IN (SELECT o_orderkey FROM dead_orders)),
        |  (SELECT COUNT(*) FROM lineitem)
        |    - (SELECT COUNT(*) FROM lineitem
        |       WHERE l_orderkey IN (SELECT o_orderkey FROM dead_orders))
        |ORDER BY table_name""".stripMargin,
    "q_snapshot_diff" ->
      """WITH olds AS (
        |  SELECT o_orderkey AS key, o_totalprice AS price_old
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |news AS (
        |  SELECT o_orderkey AS key,
        |    o_totalprice + CASE WHEN o_orderkey % 89 = 0 THEN 1.0 ELSE 0.0 END AS price_new
        |  FROM orders WHERE o_orderkey % 101 <> 0)
        |SELECT CASE WHEN price_old IS NULL THEN 'added'
        |            WHEN price_new IS NULL THEN 'removed'
        |            WHEN price_old <> price_new THEN 'changed'
        |            ELSE 'unchanged' END AS change_type,
        |  COUNT(*) AS n, MIN(key) AS min_key, MAX(key) AS max_key
        |FROM olds FULL OUTER JOIN news USING (key)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_outlier_iqr" ->
      """WITH q AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1,
        |    quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY event_type),
        |b AS (
        |  SELECT event_type, q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi
        |  FROM q)
        |SELECT e.event_id, e.event_type, e.value,
        |  CASE WHEN e.value > b.hi THEN 'high' ELSE 'low' END AS side
        |FROM events e JOIN b USING (event_type)
        |WHERE e.value > b.hi OR e.value < b.lo
        |ORDER BY event_type, event_id""".stripMargin,
    "q_dq_checks" ->
      """SELECT * FROM (
        |  SELECT 'o_custkey_not_null' AS check_name,
        |    COUNT(*) FILTER (WHERE o_custkey IS NULL) AS n_violations, COUNT(*) AS n_checked
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice_positive', COUNT(*) FILTER (WHERE o_totalprice <= 0), COUNT(*)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate_in_range',
        |    COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '1992-01-01'
        |                        OR o_orderdate >= TIMESTAMP '2003-01-01'), COUNT(*)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'l_quantity_range',
        |    COUNT(*) FILTER (WHERE l_quantity NOT BETWEEN 1 AND 50), COUNT(*)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount_domain',
        |    COUNT(*) FILTER (WHERE l_discount NOT BETWEEN 0 AND 0.1), COUNT(*)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders_customer_fk',
        |    (SELECT COUNT(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |    COUNT(*)
        |  FROM orders)
        |ORDER BY check_name""".stripMargin,
    "q_scd2_history" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, ts, event_type AS status,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_status
        |  FROM events),
        |changes AS (
        |  SELECT user_id, event_id, ts, status FROM seq
        |  WHERE prev_status IS NULL OR prev_status <> status)
        |SELECT user_id, status, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM changes ORDER BY user_id, valid_from, status""".stripMargin,
    "q_scd2_pit" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, ts, event_type AS status,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_status
        |  FROM events),
        |changes AS (
        |  SELECT user_id, event_id, ts, status FROM seq
        |  WHERE prev_status IS NULL OR prev_status <> status),
        |hist AS (
        |  SELECT user_id, status, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM changes)
        |SELECT status, COUNT(*) AS n_users,
        |  MIN(user_id) AS min_user, MAX(user_id) AS max_user
        |FROM hist
        |WHERE valid_from <= TIMESTAMP '2024-01-15 12:00:00'
        |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 12:00:00')
        |GROUP BY status ORDER BY status""".stripMargin)
}
