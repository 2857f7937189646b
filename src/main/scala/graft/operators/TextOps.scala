package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** North-star text analysis over the documents corpus: tokenization
  * (generator), corpus statistics, term frequencies, a data-driven
  * language-ID heuristic, quality scoring and content fingerprinting.
  *
  * Scale design: everything is explode → hash-aggregate — the shapes that
  * distribute linearly. The lang-ID lexicon is a top-K-per-lang aggregate
  * (tiny) that would be broadcast at 100 TB; per-doc scoring is a broadcast
  * join, not a shuffle of the corpus.
  */
object TextOps {

  private def tokens(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("lang"), col("source"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "token")))

  /** #60 generator/UDTF surface: tokenizer exploding documents into
    * (doc_id, pos, token) via the built-in posexplode Generator.
    */
  def tokenize(s: SparkSession, dir: String): DataFrame =
    tokens(Tables.documents(s, dir))
      .select("doc_id", "pos", "token")
      .orderBy("doc_id", "pos")

  /** #62a corpus statistics per language. */
  def textStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang")

  /** #62b top-20 terms corpus-wide, tie-broken by token. */
  def textTopTerms(s: SparkSession, dir: String): DataFrame =
    tokens(Tables.documents(s, dir))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("token"))
      .limit(20)

  /** Language-ID: build a top-20-tokens-per-lang lexicon from the corpus
    * (the "training" aggregate — broadcast-sized), score each document by
    * lexicon hits per language, predict the argmax language. A real
    * n-gram-lexicon classifier, fully relational.
    */
  def textLangId(s: SparkSession, dir: String): DataFrame = {
    val tok = tokens(Tables.documents(s, dir))
    val lexW = Window.partitionBy("lex_lang").orderBy(desc("freq"), asc("token"))
    val lexicon = tok.groupBy(col("lang").as("lex_lang"), col("token"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("rn", row_number().over(lexW))
      .filter(col("rn") <= 20)
      .select("lex_lang", "token")
    val hits = tok.join(broadcast(lexicon), Seq("token"))
      .groupBy(col("doc_id"), col("lang"), col("lex_lang"))
      .agg(count(lit(1)).as("hits"))
    val bestW = Window.partitionBy("doc_id").orderBy(desc("hits"), asc("lex_lang"))
    hits.withColumn("rn", row_number().over(bestW))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("actual_lang"),
        col("lex_lang").as("predicted_lang"), col("hits"))
      .orderBy("doc_id")
  }

  /** Quality scoring: token count, average token length, type-token ratio,
    * hapax share — the length/diversity heuristics of corpus filtering.
    */
  def textQuality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        col("n_chars"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_unique"),
        round(col("n_chars").cast("double") / size(col("toks")), 4).as("avg_token_len"),
        round(size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 4).as("type_token_ratio"))
      .orderBy("doc_id")

  /** Content fingerprinting: md5 + xxhash64 (Spark-native 64-bit hash for
    * shuffle-free dedup keys; no DuckDB twin, so the oracle covers md5 and
    * structural fields only via a projection both engines share).
    */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        md5(col("text")).as("md5_hex"),
        length(col("text")).as("text_len"),
        substring_index(col("text"), " ", 1).as("first_token"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_udtf_tokenize" -> (tokenize _),
    "q_text_stats" -> (textStats _),
    "q_text_topterms" -> (textTopTerms _),
    "q_text_lang_id" -> (textLangId _),
    "q_text_quality" -> (textQuality _),
    "q_text_fingerprint" -> (textFingerprint _))

  val oracles: Map[String, String] = Map(
    "q_udtf_tokenize" ->
      """SELECT doc_id, CAST(pos - 1 AS INTEGER) AS pos, token
        |FROM (SELECT doc_id,
        |        unnest(string_split(text, ' ')) AS token,
        |        generate_subscripts(string_split(text, ' '), 1) AS pos
        |      FROM documents)
        |ORDER BY doc_id, pos""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT source) AS n_sources,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_topterms" ->
      """SELECT token, COUNT(*) AS freq
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY freq DESC, token ASC LIMIT 20""".stripMargin,
    "q_text_lang_id" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |lexicon AS (
        |  SELECT lex_lang, token FROM (
        |    SELECT lang AS lex_lang, token, COUNT(*) AS freq,
        |      row_number() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, token ASC) AS rn
        |    FROM tok GROUP BY lang, token)
        |  WHERE rn <= 20),
        |hits AS (
        |  SELECT t.doc_id, t.lang, l.lex_lang, COUNT(*) AS hits
        |  FROM tok t JOIN lexicon l ON t.token = l.token
        |  GROUP BY t.doc_id, t.lang, l.lex_lang)
        |SELECT doc_id, lang AS actual_lang, lex_lang AS predicted_lang, hits
        |FROM hits
        |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lex_lang ASC) = 1
        |ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id, n_chars,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_unique,
        |  round(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 4) AS avg_token_len,
        |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |        / len(string_split(text, ' ')), 4) AS type_token_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id, md5(text) AS md5_hex,
        |  CAST(length(text) AS INTEGER) AS text_len,
        |  string_split(text, ' ')[1] AS first_token
        |FROM documents ORDER BY doc_id""".stripMargin)
}
