package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Reference-based text-similarity metrics + the Gopher quality-rule
  * battery (round 13, SURVEY §2 #363–#366). BLEU / ROUGE-n / chrF are
  * evaluated over the corpus's NEAR-DUPLICATE pairs (the confirmed
  * shingle-Jaccard ≥ τ relation shared with the dedup/graph families via
  * [[DedupOps.materializedJaccard]]) — the QA readout that tells you HOW
  * textually close the flagged near-dups are, per language, before
  * deciding a dedup threshold; on pairs of unrelated documents every
  * metric would be a degenerate near-zero.
  *
  * Exactness: all three metrics reduce to clipped n-gram match counts
  * and n-gram totals — exact integers on both engines (identical
  * tokenization; identical gram windows) — and ROUGE/chrF emit as pure
  * integer-ppm divisions. BLEU's geometric mean + brevity penalty is
  * the one transcendental composite: it is computed from the exact
  * integer sums with ln/exp on both engines and floored to ppm (same
  * stance as the repo's other libm surfaces, e.g. q_haversine's
  * sin/cos/asin twin and the floor-nano lns of q_text_heaps).
  *
  * Scale: the pair relation is the LSH-confirmed near-dup set (bounded
  * by the dedup output, orders of magnitude below all-pairs); each clip
  * kernel is explode → map-side-combined (pair, gram) counts → one
  * equi-join per side on the same key — embarrassingly parallel in the
  * pair dimension, no broadcast of anything corpus-sized. Gram arrays
  * build via linear zip_with chains (never outer-array indexing inside
  * lambdas — the ~9µs/element HOF trap, see [[PipelineOps.triGrams]]).
  */
object TextEvalOps {

  /** 4-gram extension of the [[PipelineOps.biGrams]]/triGrams zip_with
    * chain: shifted-slice zips stay linear and codegen-friendly. */
  private def quadGrams(toks: Column, n: Column): Column = {
    val z12 = zip_with(toks, slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val z123 = zip_with(z12, slice(toks, lit(3), greatest(n - 2, lit(0))),
      (p, c) => concat_ws(" ", p, c))
    when(n >= 4,
      slice(zip_with(z123, slice(toks, lit(4), greatest(n - 3, lit(0))),
        (p, c) => concat_ws(" ", p, c)), lit(1), n - 3))
      .otherwise(array().cast("array<string>"))
  }

  private def gramsCol(toks: Column, n: Column, k: Int): Column = k match {
    case 1 => toks
    case 2 => PipelineOps.biGrams(toks, n)
    case 3 => PipelineOps.triGrams(toks, n)
    case 4 => quadGrams(toks, n)
  }

  /** Near-dup pairs with both sides' token arrays: ref = the smaller
    * doc_id (doc_a), hypothesis = the larger (doc_b) — an arbitrary but
    * deterministic orientation shared with the twin. */
  private def pairToks(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    DedupOps.materializedJaccard(s, dir)
      .select(col("lang"), col("doc_a"), col("doc_b"))
      .join(docs.select(col("doc_id").as("doc_a"), col("toks").as("rtoks")),
        Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("toks").as("htoks")),
        Seq("doc_b"))
      .withColumn("rn", size(col("rtoks")))
      .withColumn("hn", size(col("htoks")))
  }

  /** Per-pair clipped k-gram matches: Σ_g min(count_hyp(g), count_ref(g))
    * — the modified-precision numerator of BLEU and the overlap count of
    * ROUGE. Inner join keeps only shared grams (absent grams clip to 0);
    * the caller left-joins and coalesces. */
  private def clipK(pt: DataFrame, k: Int): DataFrame = {
    val h = pt.select(col("doc_a"), col("doc_b"),
      explode(gramsCol(col("htoks"), col("hn"), k)).as("g"))
      .groupBy("doc_a", "doc_b", "g").agg(count(lit(1)).as("hc"))
    val r = pt.select(col("doc_a"), col("doc_b"),
      explode(gramsCol(col("rtoks"), col("rn"), k)).as("g"))
      .groupBy("doc_a", "doc_b", "g").agg(count(lit(1)).as("rc"))
    h.join(r, Seq("doc_a", "doc_b", "g"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(least(col("hc"), col("rc"))).as(s"m$k"))
  }

  /** #363 Corpus BLEU-4 per language over the near-dup pairs: clipped
    * modified precisions p₁..p₄ from corpus-level sums, geometric mean,
    * and the brevity penalty exp(1 − r/c) when the hypothesis side runs
    * short — the canonical MT/compression-similarity score. All eight
    * precision ingredients (m₁..m₄, t₁..t₄) emit as exact integers; the
    * composite floors to ppm, with the standard zero when any order has
    * no match. */
  def evalBleu(s: SparkSession, dir: String): DataFrame = {
    val pt = pairToks(s, dir)
    val base = (1 to 4).foldLeft(pt.select(col("lang"), col("doc_a"),
      col("doc_b"), col("hn"), col("rn"))) { (df, k) =>
      df.join(clipK(pt, k), Seq("doc_a", "doc_b"), "left_outer")
        .withColumn(s"m$k", coalesce(col(s"m$k"), lit(0L)))
        .withColumn(s"t$k", greatest(col("hn") - (k - 1), lit(0)).cast("long"))
    }
    base.groupBy("lang")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("hn")).as("c_len"), sum(col("rn")).as("r_len"),
        sum(col("m1")).as("m1"), sum(col("t1")).as("t1"),
        sum(col("m2")).as("m2"), sum(col("t2")).as("t2"),
        sum(col("m3")).as("m3"), sum(col("t3")).as("t3"),
        sum(col("m4")).as("m4"), sum(col("t4")).as("t4"))
      .withColumn("bleu_ppm",
        when(col("m1") > 0 && col("m2") > 0 && col("m3") > 0 && col("m4") > 0,
          floor(lit(1e6) *
            when(col("c_len") >= col("r_len"), lit(1.0))
              .otherwise(exp(lit(1.0) -
                col("r_len").cast("double") / col("c_len"))) *
            exp((log(col("m1").cast("double") / col("t1")) +
              log(col("m2").cast("double") / col("t2")) +
              log(col("m3").cast("double") / col("t3")) +
              log(col("m4").cast("double") / col("t4"))) / 4))
            .cast("long"))
          .otherwise(lit(0L)))
      .orderBy("lang")
  }

  /** #364 Corpus ROUGE-1 / ROUGE-2 per language over the near-dup
    * pairs: overlap recall against the reference side, precision
    * against the hypothesis side, F1 — all pure integer-ppm from the
    * same clipped-count kernel as BLEU (F1 = 2m/(t_hyp+t_ref) needs no
    * floating point at all). Two rows per language (n = 1, 2). */
  def evalRougeN(s: SparkSession, dir: String): DataFrame = {
    val pt = pairToks(s, dir)
    val rows = (1 to 2).map { k =>
      pt.select(col("lang"), col("doc_a"), col("doc_b"), col("hn"), col("rn"))
        .join(clipK(pt, k), Seq("doc_a", "doc_b"), "left_outer")
        .withColumn("m", coalesce(col(s"m$k"), lit(0L)))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_pairs"), sum(col("m")).as("m"),
          sum(greatest(col("hn") - (k - 1), lit(0)).cast("long")).as("th"),
          sum(greatest(col("rn") - (k - 1), lit(0)).cast("long")).as("tr"))
        .select(lit(k).as("n"), col("lang"), col("n_pairs"), col("m"),
          col("th"), col("tr"),
          expr("(m * 1000000) div th").as("p_ppm"),
          expr("(m * 1000000) div tr").as("r_ppm"),
          expr("(m * 2000000) div (th + tr)").as("f1_ppm"))
    }
    rows.reduce(_ unionByName _).orderBy("n", "lang")
  }

  /** Character trigrams of the space-stripped text via the same linear
    * zip_with chain (split-then-slice keeps Spark's trailing-empty
    * split artifact out of the array). */
  private def charTriGrams(t: Column): Column = {
    val cs = slice(split(t, ""), lit(1), length(t))
    val n = length(t)
    val z12 = zip_with(cs, slice(cs, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, b))
    when(n >= 3,
      slice(zip_with(z12, slice(cs, lit(3), greatest(n - 2, lit(0))),
        (p, c) => concat(p, c)), lit(1), n - 2))
      .otherwise(array().cast("array<string>"))
  }

  /** #365 Corpus chrF (β=2) per language over the near-dup pairs:
    * clipped character-trigram overlap on space-stripped text — the
    * tokenization-free similarity score that survives morphology and
    * spacing differences word metrics miss. With corpus sums the
    * F_β=2 composite collapses to the EXACT integer form
    * 5m/(4·t_ref + t_hyp) (in ppm) — no floating point anywhere. */
  def evalChrf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        charTriGrams(regexp_replace(col("text"), " ", "")).as("cgrams"))
    val pt = DedupOps.materializedJaccard(s, dir)
      .select(col("lang"), col("doc_a"), col("doc_b"))
      .join(docs.select(col("doc_id").as("doc_a"), col("cgrams").as("rg")),
        Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("cgrams").as("hg")),
        Seq("doc_b"))
    val h = pt.select(col("doc_a"), col("doc_b"), explode(col("hg")).as("g"))
      .groupBy("doc_a", "doc_b", "g").agg(count(lit(1)).as("hc"))
    val r = pt.select(col("doc_a"), col("doc_b"), explode(col("rg")).as("g"))
      .groupBy("doc_a", "doc_b", "g").agg(count(lit(1)).as("rc"))
    val m = h.join(r, Seq("doc_a", "doc_b", "g"))
      .groupBy("doc_a", "doc_b").agg(sum(least(col("hc"), col("rc"))).as("m"))
    pt.select(col("lang"), col("doc_a"), col("doc_b"),
      size(col("hg")).cast("long").as("th"), size(col("rg")).cast("long").as("tr"))
      .join(m, Seq("doc_a", "doc_b"), "left_outer")
      .withColumn("m", coalesce(col("m"), lit(0L)))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_pairs"), sum(col("m")).as("m"),
        sum(col("th")).as("th"), sum(col("tr")).as("tr"))
      .select(col("lang"), col("n_pairs"), col("m"), col("th"), col("tr"),
        expr("(m * 1000000) div th").as("p_ppm"),
        expr("(m * 1000000) div tr").as("r_ppm"),
        expr("(m * 5000000) div (4 * tr + th)").as("chrf2_ppm"))
      .orderBy("lang")
  }

  /** #366 Gopher quality-rule battery (Rae et al. 2021, adapted to the
    * fixture's text): per (lang, source) pass counts for the four
    * classic document filters — word-count bounds [50, 100k], mean word
    * length in [3, 10], ≥2 distinct stopwords, ≥80% purely alphabetic
    * tokens — plus the all-rules pass rate in ppm. Unlike the
    * doc-grain heuristics of q_text_quality, this is the RULE-SET
    * aggregate a pipeline uses to pick which sources to keep.
    *
    * Every rule is an exact integer comparison (mean word length via
    * cross-multiplication — no division); one map-side-combined
    * aggregate over a pure per-row projection. The stopword list is the
    * repo-wide [[TextOps.StopWords]] single source. */
  def qualityGopher(s: SparkSession, dir: String): DataFrame =
    gopherFlags(s, dir).groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("r_wc"), 1L).otherwise(0L)).as("n_wc"),
        sum(when(col("r_mwl"), 1L).otherwise(0L)).as("n_mwl"),
        sum(when(col("r_stop"), 1L).otherwise(0L)).as("n_stop"),
        sum(when(col("r_alpha"), 1L).otherwise(0L)).as("n_alpha"),
        sum(when(col("r_wc") && col("r_mwl") && col("r_stop") && col("r_alpha"),
          1L).otherwise(0L)).as("n_pass"))
      .withColumn("pass_ppm", expr("(n_pass * 1000000) div n_docs"))
      .orderBy("lang", "source")

  /** Doc-grain Gopher rule flags — ONE definition shared by
    * [[qualityGopher]] and the per-rule ablation report
    * ([[ImpactOps.qualityAblation]]), with [[GopherFlagsSql]] as its
    * twin-side single source. */
  private[graft] def gopherFlags(s: SparkSession, dir: String): DataFrame = {
    val stopArr = array(TextOps.StopWords.map(lit): _*)
    Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("nt", size(col("toks")).cast("long"))
      .withColumn("wl_num", col("n_chars") - col("nt") + 1)
      .withColumn("r_wc", col("nt").between(50L, 100000L))
      .withColumn("r_mwl",
        col("wl_num") >= col("nt") * 3 && col("wl_num") <= col("nt") * 10)
      .withColumn("r_stop",
        size(array_intersect(array_distinct(col("toks")), stopArr)) >= 2)
      .withColumn("r_alpha",
        size(filter(col("toks"), t => t.rlike("^[a-z]+$"))) * 10 >= col("nt") * 8)
  }

  /** The flags CTE (named `flags`) interpolated into both the
    * q_quality_gopher twin and the ablation twin. */
  private[graft] val GopherFlagsSql: String =
    s"""flags AS (
       |  SELECT lang, source, n_chars,
       |    len(string_split(text, ' ')) AS nt,
       |    (len(string_split(text, ' ')) BETWEEN 50 AND 100000) AS r_wc,
       |    (n_chars - len(string_split(text, ' ')) + 1
       |       >= len(string_split(text, ' ')) * 3
       |     AND n_chars - len(string_split(text, ' ')) + 1
       |       <= len(string_split(text, ' ')) * 10) AS r_mwl,
       |    (len(list_intersect(list_distinct(string_split(text, ' ')),
       |       [${TextOps.StopWordsSql}])) >= 2) AS r_stop,
       |    (len(list_filter(string_split(text, ' '),
       |       x -> regexp_full_match(x, '[a-z]+'))) * 10
       |       >= len(string_split(text, ' ')) * 8) AS r_alpha
       |  FROM documents)""".stripMargin

  /** #398 pass@k (k = 1, 5, 10) per user over the purchase-vs-click
    * attempt stream: the unbiased estimator 1 − C(n−c,k)/C(n,k)
    * (Chen et al. 2021, "Evaluating LLMs Trained on Code") with
    * purchases as successes among n = clicks+purchases attempts — the
    * standard eval readout for any sampled-generation benchmark. The
    * falling-factorial quotient Π(n−c−i)/Π(n−i) is computed EXACTLY:
    * every factor is an integer (greatest(·,0) zeroes the product when
    * n−c < k, giving pass@k = 1, the correct boundary), products stage
    * to DECIMAL(38,0)/HUGEINT (n ≤ ~1e3 per user ⇒ den ≤ 1e3¹⁰ = 1e30;
    * int64 would die at n≈90), and each readout is ONE truncating ppm
    * division. n is per-user (attempt cap, not corpus-sized), so the
    * envelope holds at any corpus scale; users with n < 10 are
    * excluded (largest k undefined). Scale: one map-side-combined
    * user aggregate; the k-expansion is arithmetic on the user-grain
    * result — no explode, no join.
    */
  def evalPassAtK(s: SparkSession, dir: String): DataFrame = {
    def prod(terms: Seq[String]): String =
      terms.zipWithIndex.map { case (t, i) =>
        if (i == 0) s"cast($t as decimal(38,0))" else t
      }.mkString(" * ")
    def passK(k: Int): String = {
      val num = prod((0 until k).map(i => s"greatest(n - c - $i, 0L)"))
      val den = prod((0 until k).map(i => s"(n - $i)"))
      s"cast(1000000 - (($num) * 1000000) div ($den) as long)"
    }
    Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c"))
      .filter(col("n") >= 10L)
      .select(col("user_id"), col("n"), col("c"),
        expr(passK(1)).as("pass1_ppm"),
        expr(passK(5)).as("pass5_ppm"),
        expr(passK(10)).as("pass10_ppm"))
      .orderBy("user_id")
  }

  /** #421 Multi-class evaluation of the #q_text_lang_id classifier
    * against the fixture's true language labels: per-class support,
    * true positives, predicted count, precision/recall/F1 in exact
    * ppm, plus the macro-F1 repeated on every row — the readout #211's
    * binary-threshold confusion cannot express (5 classes, per-class
    * errors). Composes the lang-id relation verbatim (the twin embeds
    * the #q_text_lang_id twin as a subquery — ONE definition of the
    * classifier rides both engines). Scale: the composed classifier's
    * own shape (vocabulary-bounded lexicon broadcast + doc-keyed
    * argmax), then |langs|²-bounded aggregates.
    */
  def evalMulticlass(s: SparkSession, dir: String): DataFrame = {
    val pred = TextOps.textLangId(s, dir)
      .select(col("actual_lang"), col("predicted_lang"))
    val support = pred.groupBy(col("actual_lang").as("lang"))
      .agg(count(lit(1)).as("support"))
    val predicted = pred.groupBy(col("predicted_lang").as("lang"))
      .agg(count(lit(1)).as("n_predicted"))
    val tp = pred.filter(col("actual_lang") === col("predicted_lang"))
      .groupBy(col("actual_lang").as("lang"))
      .agg(count(lit(1)).as("tp"))
    val perClass = support
      .join(predicted, Seq("lang"), "left_outer")
      .join(tp, Seq("lang"), "left_outer")
      .select(col("lang"), col("support"),
        coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision_ppm",
        when(col("n_predicted") > 0, expr("(tp * 1000000) div n_predicted")))
      .withColumn("recall_ppm", expr("(tp * 1000000) div support"))
      .withColumn("f1_ppm",
        when(coalesce(col("precision_ppm"), lit(0L)) + col("recall_ppm") > 0,
          expr("(2 * coalesce(precision_ppm, 0L) * recall_ppm) div " +
            "(coalesce(precision_ppm, 0L) + recall_ppm)")).otherwise(lit(0L)))
    val macroF1 = perClass.agg(count(lit(1)).as("k"),
      sum(col("f1_ppm")).as("f1_sum"))
      .select(expr("f1_sum div k").as("macro_f1_ppm"))
    perClass.crossJoin(broadcast(macroF1))
      .select(col("lang"), col("support"), col("n_predicted"), col("tp"),
        col("precision_ppm"), col("recall_ppm"), col("f1_ppm"),
        col("macro_f1_ppm"))
      .orderBy("lang")
  }

  /** #422 Krippendorff's alpha (nominal, three raters, complete data)
    * over three deterministic binary quality judges (length ≥ 300
    * chars, ≥ 55 tokens, type-token ratio ≥ 60%): the
    * reliability standard that generalizes #257 kappa (2 raters) and
    * #288 Fleiss (fixed marginals) with a chance model pooled over ALL
    * votes — alpha = 1 − Do/De with BOTH disagreement terms exact
    * integer rationals here (Do from per-item vote splits, De from the
    * pooled vote totals with the small-sample T−1 correction), so the
    * readout is one DECIMAL-staged truncating ppm division. With
    * do_num = Σ_u v(3−v) (ordered disagreeing pairs per unit over
    * m−1 = 2) and de_num = 2·p1·p0, Do/De = do_num·(t−1)/de_num; the
    * staged form divides by 3·n·de_num = t·de_num (sanity pin: a
    * single unit voted (1,0,0) gives Do/De = 2·2/4 = 1, alpha = 0 —
    * see TextEvalSpec's hand-computed cases). Scale: one
    * stateless projection + one map-side-combined aggregate (votes per
    * item are a 0..3 integer, the per-item relation never leaves its
    * scan task).
    */
  def evalKrippendorff(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val votes = Tables.documents(s, dir)
      .select(
        (when(col("n_chars") >= 300, 1L).otherwise(0L) +
          when(size(toks) >= 55, 1L).otherwise(0L) +
          when(size(array_distinct(toks)) * 10 >= size(toks) * 6, 1L)
            .otherwise(0L)).as("v"))
    krippendorffFromVotes(votes)
  }

  /** Alpha kernel over a `v: long` column (per-unit pass-vote count in
    * 0..3) — split out so specs can pin hand-computed alphas on tiny
    * vote tables in addition to the fixture run. */
  def krippendorffFromVotes(votes: DataFrame): DataFrame = {
    votes.agg(count(lit(1)).as("n"), sum(col("v")).as("p1"),
        sum(col("v") * (lit(3L) - col("v"))).as("do_num"))
      .withColumn("t", col("n") * 3L)
      .withColumn("p0", col("t") - col("p1"))
      .withColumn("de_num",
        (col("p1").cast(DecimalType(38, 0)) * (col("t") - col("p1")) +
          col("p0").cast(DecimalType(38, 0)) * (col("t") - col("p0"))))
      .select(col("n").as("n_items"), col("t").as("n_votes"),
        col("p1").as("votes_pass"), col("do_num"),
        expr("cast((cast(do_num as decimal(38,0)) * t * (t - 1) * 1000000) " +
          "div (cast(3 as decimal(38,0)) * n * de_num) as long)")
          .as("do_over_de_ppm"),
        (lit(1000000L) -
          expr("cast((cast(do_num as decimal(38,0)) * t * (t - 1) * 1000000) " +
            "div (cast(3 as decimal(38,0)) * n * de_num) as long)"))
          .as("alpha_ppm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_eval_bleu" -> (evalBleu _),
    "q_eval_rouge_n" -> (evalRougeN _),
    "q_eval_chrf" -> (evalChrf _),
    "q_quality_gopher" -> (qualityGopher _),
    "q_eval_pass_at_k" -> (evalPassAtK _),
    "q_eval_multiclass" -> (evalMulticlass _),
    "q_eval_krippendorff" -> (evalKrippendorff _))

  /** Shared twin prelude: the SAME near-dup pair CTE the dedup/graph
    * twins use (all-pairs shingle-set Jaccard within (lang, source) ≥
    * 0.2 — string shingles ≡ the Spark side's hashed pipeline, see
    * q_dedup_jaccard_blocked), joined to both sides' token arrays. */
  private val PairSql: String =
    """WITH base AS (
      |  SELECT doc_id, lang, source,
      |    list_distinct(string_split(text, ' ')) AS tokset
      |  FROM documents),
      |pairs AS (
      |  SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM base a JOIN base b
      |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      |  WHERE round(CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
      |          / len(list_distinct(a.tokset || b.tokset)), 6) >= 0.2),
      |tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |pt AS (
      |  SELECT p.lang, p.doc_a, p.doc_b, ra.toks AS rtoks, hb.toks AS htoks,
      |    len(ra.toks) AS rn, len(hb.toks) AS hn
      |  FROM pairs p JOIN tk ra ON ra.doc_id = p.doc_a
      |               JOIN tk hb ON hb.doc_id = p.doc_b)""".stripMargin

  /** k-gram unnest of one side of pt (DuckDB list slices are 1-based
    * inclusive, so toks[i:i+k-1] is the k-wide window at i). */
  private def gramSql(side: String, k: Int): String =
    s"""SELECT doc_a, doc_b,
       |    unnest(list_transform(range(1, greatest(len(${side}toks) - ${k - 2}, 1)),
       |      i -> array_to_string((${side}toks)[i:i+${k - 1}], ' '))) AS g
       |  FROM pt""".stripMargin

  private def clipSql(k: Int): String =
    s"""m$k AS (
       |  SELECT h.doc_a, h.doc_b, CAST(SUM(LEAST(h.hc, r.rc)) AS BIGINT) AS m
       |  FROM (SELECT doc_a, doc_b, g, COUNT(*) AS hc FROM (${gramSql("h", k)})
       |        GROUP BY doc_a, doc_b, g) h
       |  JOIN (SELECT doc_a, doc_b, g, COUNT(*) AS rc FROM (${gramSql("r", k)})
       |        GROUP BY doc_a, doc_b, g) r
       |    ON r.doc_a = h.doc_a AND r.doc_b = h.doc_b AND r.g = h.g
       |  GROUP BY h.doc_a, h.doc_b)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_eval_bleu" ->
      s"""$PairSql,
         |${(1 to 4).map(clipSql).mkString(",\n")},
         |pairstats AS (
         |  SELECT pt.lang, pt.hn, pt.rn,
         |    ${(1 to 4).map(k =>
             s"COALESCE(m$k.m, 0) AS m$k, GREATEST(pt.hn - ${k - 1}, 0) AS t$k")
             .mkString(",\n    ")}
         |  FROM pt
         |  ${(1 to 4).map(k =>
             s"LEFT JOIN m$k ON m$k.doc_a = pt.doc_a AND m$k.doc_b = pt.doc_b")
             .mkString("\n  ")}),
         |agg AS (
         |  SELECT lang, COUNT(*) AS n_pairs,
         |    CAST(SUM(hn) AS BIGINT) AS c_len, CAST(SUM(rn) AS BIGINT) AS r_len,
         |    ${(1 to 4).map(k =>
             s"CAST(SUM(m$k) AS BIGINT) AS m$k, CAST(SUM(t$k) AS BIGINT) AS t$k")
             .mkString(",\n    ")}
         |  FROM pairstats GROUP BY lang)
         |SELECT lang, n_pairs, c_len, r_len,
         |  m1, t1, m2, t2, m3, t3, m4, t4,
         |  CASE WHEN m1 > 0 AND m2 > 0 AND m3 > 0 AND m4 > 0 THEN
         |    CAST(FLOOR(1e6 *
         |      (CASE WHEN c_len >= r_len THEN 1.0
         |            ELSE EXP(1.0 - CAST(r_len AS DOUBLE) / c_len) END) *
         |      EXP((LN(CAST(m1 AS DOUBLE) / t1) + LN(CAST(m2 AS DOUBLE) / t2) +
         |           LN(CAST(m3 AS DOUBLE) / t3) + LN(CAST(m4 AS DOUBLE) / t4))
         |          / 4)) AS BIGINT)
         |  ELSE 0 END AS bleu_ppm
         |FROM agg ORDER BY lang""".stripMargin,
    "q_eval_rouge_n" ->
      s"""$PairSql,
         |${(1 to 2).map(clipSql).mkString(",\n")},
         |${(1 to 2).map(k =>
           s"""agg$k AS (
              |  SELECT $k AS n, pt.lang, COUNT(*) AS n_pairs,
              |    CAST(SUM(COALESCE(m$k.m, 0)) AS BIGINT) AS m,
              |    CAST(SUM(GREATEST(pt.hn - ${k - 1}, 0)) AS BIGINT) AS th,
              |    CAST(SUM(GREATEST(pt.rn - ${k - 1}, 0)) AS BIGINT) AS tr
              |  FROM pt LEFT JOIN m$k
              |    ON m$k.doc_a = pt.doc_a AND m$k.doc_b = pt.doc_b
              |  GROUP BY pt.lang)""".stripMargin).mkString(",\n")}
         |SELECT n, lang, n_pairs, m, th, tr,
         |  CAST((m * 1000000) // th AS BIGINT) AS p_ppm,
         |  CAST((m * 1000000) // tr AS BIGINT) AS r_ppm,
         |  CAST((m * 2000000) // (th + tr) AS BIGINT) AS f1_ppm
         |FROM (SELECT * FROM agg1 UNION ALL SELECT * FROM agg2)
         |ORDER BY n, lang""".stripMargin,
    "q_eval_chrf" ->
      """WITH base AS (
        |  SELECT doc_id, lang, source,
        |    list_distinct(string_split(text, ' ')) AS tokset
        |  FROM documents),
        |pairs AS (
        |  SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM base a JOIN base b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
        |          / len(list_distinct(a.tokset || b.tokset)), 6) >= 0.2),
        |cg AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(length(t) - 1, 1)),
        |      i -> substr(t, CAST(i AS INT), 3)) AS cgrams
        |  FROM (SELECT doc_id, replace(text, ' ', '') AS t FROM documents)),
        |pt AS (
        |  SELECT p.lang, p.doc_a, p.doc_b,
        |    ra.cgrams AS rg, hb.cgrams AS hg,
        |    len(ra.cgrams) AS tr1, len(hb.cgrams) AS th1
        |  FROM pairs p JOIN cg ra ON ra.doc_id = p.doc_a
        |               JOIN cg hb ON hb.doc_id = p.doc_b),
        |mm AS (
        |  SELECT h.doc_a, h.doc_b, CAST(SUM(LEAST(h.hc, r.rc)) AS BIGINT) AS m
        |  FROM (SELECT doc_a, doc_b, g, COUNT(*) AS hc FROM
        |          (SELECT doc_a, doc_b, unnest(hg) AS g FROM pt)
        |        GROUP BY doc_a, doc_b, g) h
        |  JOIN (SELECT doc_a, doc_b, g, COUNT(*) AS rc FROM
        |          (SELECT doc_a, doc_b, unnest(rg) AS g FROM pt)
        |        GROUP BY doc_a, doc_b, g) r
        |    ON r.doc_a = h.doc_a AND r.doc_b = h.doc_b AND r.g = h.g
        |  GROUP BY h.doc_a, h.doc_b)
        |SELECT lang, COUNT(*) AS n_pairs,
        |  CAST(SUM(COALESCE(mm.m, 0)) AS BIGINT) AS m,
        |  CAST(SUM(th1) AS BIGINT) AS th, CAST(SUM(tr1) AS BIGINT) AS tr,
        |  CAST((SUM(COALESCE(mm.m, 0)) * 1000000) // SUM(th1) AS BIGINT)
        |    AS p_ppm,
        |  CAST((SUM(COALESCE(mm.m, 0)) * 1000000) // SUM(tr1) AS BIGINT)
        |    AS r_ppm,
        |  CAST((SUM(COALESCE(mm.m, 0)) * 5000000)
        |    // (4 * SUM(tr1) + SUM(th1)) AS BIGINT) AS chrf2_ppm
        |FROM pt LEFT JOIN mm ON mm.doc_a = pt.doc_a AND mm.doc_b = pt.doc_b
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_quality_gopher" ->
      s"""WITH $GopherFlagsSql
         |SELECT lang, source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN r_wc THEN 1 ELSE 0 END) AS BIGINT) AS n_wc,
         |  CAST(SUM(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS n_mwl,
         |  CAST(SUM(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         |  CAST(SUM(CASE WHEN r_alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
         |  CAST(SUM(CASE WHEN r_wc AND r_mwl AND r_stop AND r_alpha
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |  CAST((SUM(CASE WHEN r_wc AND r_mwl AND r_stop AND r_alpha
         |    THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS pass_ppm
         |FROM flags GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q_eval_pass_at_k" -> {
      def prod(terms: Seq[String]): String =
        terms.zipWithIndex.map { case (t, i) =>
          if (i == 0) s"CAST($t AS HUGEINT)" else t
        }.mkString(" * ")
      def passK(k: Int): String = {
        val num = prod((0 until k).map(i => s"GREATEST(n - c - $i, 0)"))
        val den = prod((0 until k).map(i => s"(n - $i)"))
        s"CAST(1000000 - (($num) * 1000000) // ($den) AS BIGINT)"
      }
      s"""WITH g AS (
         |  SELECT user_id, COUNT(*) AS n,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |  GROUP BY user_id)
         |SELECT user_id, n, c,
         |  ${passK(1)} AS pass1_ppm,
         |  ${passK(5)} AS pass5_ppm,
         |  ${passK(10)} AS pass10_ppm
         |FROM g WHERE n >= 10 ORDER BY user_id""".stripMargin
    },
    "q_eval_multiclass" -> {
      val langId = TextOps.oracles("q_text_lang_id")
      s"""WITH pred AS (
         |  SELECT actual_lang, predicted_lang FROM ($langId)),
         |support AS (
         |  SELECT actual_lang AS lang, COUNT(*) AS support
         |  FROM pred GROUP BY actual_lang),
         |predicted AS (
         |  SELECT predicted_lang AS lang, COUNT(*) AS n_predicted
         |  FROM pred GROUP BY predicted_lang),
         |tp AS (
         |  SELECT actual_lang AS lang, COUNT(*) AS tp
         |  FROM pred WHERE actual_lang = predicted_lang GROUP BY actual_lang),
         |pc AS (
         |  SELECT s.lang, s.support,
         |    COALESCE(p.n_predicted, 0) AS n_predicted,
         |    COALESCE(t.tp, 0) AS tp
         |  FROM support s
         |  LEFT JOIN predicted p ON p.lang = s.lang
         |  LEFT JOIN tp t ON t.lang = s.lang),
         |pr AS (
         |  SELECT lang, support, n_predicted, tp,
         |    CASE WHEN n_predicted > 0
         |      THEN (tp * 1000000) // n_predicted END AS precision_ppm,
         |    (tp * 1000000) // support AS recall_ppm
         |  FROM pc),
         |f AS (
         |  SELECT *, CASE WHEN COALESCE(precision_ppm, 0)
         |      + recall_ppm > 0
         |    THEN (2 * COALESCE(precision_ppm, 0) * recall_ppm)
         |      // (COALESCE(precision_ppm, 0) + recall_ppm)
         |    ELSE 0 END AS f1_ppm
         |  FROM pr),
         |macro AS (
         |  SELECT CAST(SUM(f1_ppm) // COUNT(*) AS BIGINT) AS macro_f1_ppm
         |  FROM f)
         |SELECT f.lang, f.support, CAST(f.n_predicted AS BIGINT) AS n_predicted,
         |  CAST(f.tp AS BIGINT) AS tp,
         |  CAST(f.precision_ppm AS BIGINT) AS precision_ppm,
         |  CAST(f.recall_ppm AS BIGINT) AS recall_ppm,
         |  CAST(f.f1_ppm AS BIGINT) AS f1_ppm, macro.macro_f1_ppm
         |FROM f, macro ORDER BY f.lang""".stripMargin
    },
    "q_eval_krippendorff" ->
      """WITH v AS (
        |  SELECT
        |    (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
        |    + (CASE WHEN len(string_split(text, ' ')) >= 55 THEN 1 ELSE 0 END)
        |    + (CASE WHEN len(list_distinct(string_split(text, ' '))) * 10
        |        >= len(string_split(text, ' ')) * 6 THEN 1 ELSE 0 END) AS v
        |  FROM documents),
        |a AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS p1,
        |    CAST(SUM(v * (3 - v)) AS BIGINT) AS do_num
        |  FROM v),
        |b AS (
        |  SELECT n, p1, do_num, n * 3 AS t, n * 3 - p1 AS p0 FROM a),
        |c AS (
        |  SELECT n, t, p1, do_num,
        |    CAST(p1 AS HUGEINT) * (t - p1) + CAST(p0 AS HUGEINT) * (t - p0)
        |      AS de_num
        |  FROM b)
        |SELECT n AS n_items, CAST(t AS BIGINT) AS n_votes,
        |  p1 AS votes_pass, do_num,
        |  CAST((CAST(do_num AS HUGEINT) * t * (t - 1) * 1000000)
        |    // (CAST(3 AS HUGEINT) * n * de_num) AS BIGINT) AS do_over_de_ppm,
        |  1000000 - CAST((CAST(do_num AS HUGEINT) * t * (t - 1) * 1000000)
        |    // (CAST(3 AS HUGEINT) * n * de_num) AS BIGINT) AS alpha_ppm
        |FROM c""".stripMargin)
}
