package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for CorpusOps against naive driver-side
  * recomputations over the collected sf0.001 fixture.
  */
class CorpusSpec extends AnyFunSuite with SparkFixture {

  private def docTokens: Array[(Long, Array[String])] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))

  test("dedupSpanExact matches brute-force 8-gram registry") {
    val rows = operators.CorpusOps.dedupSpanExact(spark, sfDir).collect()
    val grams: Array[(String, Long)] = docTokens.flatMap { case (id, w) =>
      if (w.length < 8) Seq.empty[(String, Long)]
      else (0 to w.length - 8).map(i => (w.slice(i, i + 8).mkString(" "), id))
    }
    val byGram = grams.groupBy(_._1)
    val expected = byGram.view
      .mapValues(occ => (occ.map(_._2).distinct.length.toLong, occ.length.toLong,
        occ.map(_._2).min))
      .filter(_._2._1 >= 2).toMap
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val (nd, no, fd) = expected(r.getString(0))
      assert(r.getLong(1) === nd, s"n_docs for '${r.getString(0)}'")
      assert(r.getLong(2) === no, "n_occur")
      assert(r.getLong(3) === fd, "first_doc")
    }
    // ordering: n_docs desc is the primary key of the report
    val nds = rows.map(_.getLong(1))
    assert(nds.zip(nds.tail).forall { case (a, b) => a >= b })
  }

  test("textDupNgrams matches brute-force global 5-gram counting") {
    val rows = operators.CorpusOps.textDupNgrams(spark, sfDir).collect()
    val perDoc: Array[(Long, Array[String])] = docTokens
      .filter(_._2.length >= 5)
      .map { case (id, w) =>
        (id, (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" ")).toArray)
      }
    val global = perDoc.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.length === perDoc.length, "one row per eligible doc")
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    perDoc.foreach { case (id, grams) =>
      val r = byId(id)
      val nDup = grams.count(g => global(g) >= 2).toLong
      assert(r.getLong(1) === grams.length.toLong, s"n_grams doc $id")
      assert(r.getLong(2) === nDup, s"n_dup doc $id")
      val frac = r.getDouble(3)
      assert(frac >= 0.0 && frac <= 1.0)
      assert(math.abs(frac - nDup.toDouble / grams.length) < 1e-6, s"dup_frac doc $id")
    }
  }

  test("textFeatureHash conserves token mass and bounds buckets") {
    val rows = operators.CorpusOps.textFeatureHash(spark, sfDir).collect()
    val totalTokens = docTokens.map(_._2.length.toLong).sum
    assert(rows.map(_.getLong(1)).sum === totalTokens, "occurrence conservation")
    val distinctTokens = docTokens.flatMap(_._2).distinct.length.toLong
    assert(rows.map(_.getLong(2)).sum === distinctTokens,
      "each distinct token lands in exactly one bucket")
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 64)
      assert(r.getLong(2) >= 1 && r.getLong(1) >= r.getLong(2))
    }
  }

  test("textBigramLm matches a naive recomputation and p_ppm is a true conditional") {
    val rows = operators.CorpusOps.textBigramLm(spark, sfDir).collect()
    val bigrams = docTokens.flatMap { case (_, w) =>
      if (w.length < 2) Seq.empty[(String, String)]
      else (0 until w.length - 1).map(i => (w(i), w(i + 1)))
    }
    val c12 = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val top = c12.toSeq.sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(20)
    assert(rows.length === top.length)
    rows.zip(top).foreach { case (r, ((w1, w2), c)) =>
      assert((r.getString(0), r.getString(1)) === ((w1, w2)))
      assert(r.getLong(2) === c)
      assert(r.getLong(3) === c1(w1))
      assert(r.getLong(4) === c * 1000000L / c1(w1))
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L)
    }
  }

  test("scanBinary md5 equals a driver-side recompute from the parquet texts") {
    val rows = operators.Scans.scanBinary(spark, sfDir).collect()
    val byLang = Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).mkString("\n")).toMap
    assert(rows.length === byLang.size)
    rows.foreach { r =>
      val blob = byLang(r.getString(0)).getBytes("UTF-8")
      assert(r.getLong(1) === blob.length.toLong, s"bytes for ${r.getString(0)}")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(blob).map("%02x".format(_)).mkString
      assert(r.getString(2) === hex, s"md5 for ${r.getString(0)}")
    }
  }

  test("tsTheilSen equals the exact median of all pairwise daily slopes") {
    val row = operators.TimeWindows.tsTheilSen(spark, sfDir).collect()(0)
    val daily = Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("m"))
      .orderBy("day").collect()
      .map(r => ((r.getTimestamp(0).getTime / 86400000L), r.getLong(1)))
    val slopes = (for {
      i <- daily.indices; j <- daily.indices if daily(i)._1 < daily(j)._1
    } yield (daily(j)._2 - daily(i)._2).toDouble / (daily(j)._1 - daily(i)._1)).sorted
    assert(row.getLong(0) === slopes.length.toLong)
    val n = slopes.length
    val med = if (n % 2 == 1) slopes(n / 2) else {
      val (a, b) = (slopes(n / 2 - 1), slopes(n / 2)); a + 0.5 * (b - a)
    }
    assert(math.abs(row.getDouble(1) -
      BigDecimal(med).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("textZipf slope is negative and matches a naive ln-regression") {
    val row = operators.CorpusOps.textZipf(spark, sfDir).collect()(0)
    val freq = docTokens.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toSeq
      .sortBy { case (tok, f) => (-f, tok) }.take(100)
    val pts = freq.zipWithIndex.map { case ((_, f), i) =>
      (math.floor(math.log(i + 1.0) * 1e9), math.floor(math.log(f.toDouble) * 1e9))
    }
    val n = pts.length
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(row.getLong(0) === n.toLong)
    assert(row.getDouble(1) < 0, "Zipf slope must be negative")
    assert(math.abs(row.getDouble(1) - slope) < 1e-5, "slope vs naive fit")
  }

  test("BPE train step matches a driver-side brute-force pair count") {
    val texts = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val freq = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (t <- texts; w <- t.split(" ") if w.nonEmpty && w.length >= 2;
         i <- 0 until w.length - 1)
      freq(w.substring(i, i + 2)) += 1L
    val expected = freq.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = operators.TextOps.bpeTrainStep(spark, sfDir).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("n_occurrences")))
    assert(got.toSeq === expected, "top-20 merge candidates diverge")
  }

  test("winnowFingerprint equals the textbook per-window rightmost-min replay") {
    val w = 4
    val rows = operators.CorpusOps.winnowFingerprint(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.size === docs.length)
    def md5_32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val grams = (0 to toks.length - 3).map(i =>
        s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
      val hs = grams.map(md5_32)
      // textbook robust winnowing: per window, min hash, rightmost on tie
      val sel = scala.collection.mutable.Set[(Long, Int)]()
      for (end <- (w - 1) until hs.length) {
        val win = (end - w + 1) to end
        val mn = win.map(hs).min
        val pos = win.filter(p => hs(p) == mn).max
        sel += ((hs(pos), pos))
      }
      val (nGrams, nSel, density) = rows(id)
      assert(nGrams === grams.length.toLong, s"doc $id gram count")
      assert(nSel === sel.size.toLong, s"doc $id fingerprint count")
      if (grams.length >= w)
        assert(density === nSel * 1000000L / (grams.length - w + 1))
      else assert(density === -1L)
    }
  }

  test("textJsd is bounded by ln2 and matches an exact driver replay") {
    val rows = operators.CorpusOps.textJsd(spark, sfDir).collect()
    val ln2Nano = 693147180L
    assert(rows.nonEmpty)
    val words = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val global = words.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTot = words.length.toLong
    def lnN(x: BigInt): Long = math.floor(math.log(x.toDouble) * 1e9).toLong
    def f(x: BigInt): BigInt = x * lnN(x)
    val sq = global.values.map(g => f(BigInt(g))).sum
    rows.foreach { r =>
      val lang = r.getString(0)
      val wc = words.filter(_._1 == lang).groupBy(_._2)
        .view.mapValues(_.length.toLong).toMap
      val nl = wc.values.sum
      assert(r.getAs[Long]("n_tokens") === nl)
      assert(r.getAs[Long]("n_words") === wc.size.toLong)
      val smA = global.values.map(g => f(BigInt(g) * nl)).sum
      val smB = wc.map { case (wd, c) =>
        val g = global(wd)
        f(BigInt(c) * nTot + BigInt(g) * nl) - f(BigInt(g) * nl)
      }.sum
      val sp = wc.values.map(c => f(BigInt(c))).sum
      val hm = lnN(BigInt(nl) * nTot * 2) - ((smA + smB) / (BigInt(nl) * nTot * 2)).toLong
      val hp = lnN(BigInt(nl)) - (sp / BigInt(nl)).toLong
      val hq = lnN(BigInt(nTot)) - (sq / BigInt(nTot)).toLong
      val jsd = hm - (hp + hq) / 2
      assert(r.getAs[Long]("jsd_nano") === jsd, s"jsd for $lang")
      assert(jsd >= 0L && jsd <= ln2Nano + 2L, s"jsd bound for $lang: $jsd")
    }
  }

  test("readability matches a driver syllable/word replay per language") {
    val rows = operators.TextOps.readability(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byLang = docs.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSeq === byLang.keys.toSeq.sorted)
    val vowelRun = "[aeiouy]+".r
    rows.foreach { r =>
      val lang = r.getString(0)
      val ds = byLang(lang)
      val per = ds.map { case (_, text, nChars) =>
        val w = text.split(" ", -1).length.toLong
        val syl = vowelRun.findAllIn(text).size.toLong
        val sents = math.max(1L, w / 15)
        val wps = w * 1000 / sents
        val spw = syl * 1000 / w
        (w, syl, nChars, 206835L - 1015 * wps / 1000 - 84600 * spw / 1000)
      }
      assert(r.getAs[Long]("n_docs") === ds.length.toLong)
      val sw = per.map(_._1).sum; val ssyl = per.map(_._2).sum
      assert(r.getAs[Long]("spw_milli") === ssyl * 1000 / sw, s"spw for $lang")
      assert(r.getAs[Long]("cpw_milli") === per.map(_._3).sum * 1000 / sw)
      assert(r.getAs[Long]("avg_fre_milli") === per.map(_._4).sum / per.length)
      // vowel-group syllables land in a plausible band for ASCII tokens
      assert(r.getAs[Long]("spw_milli") > 500L && r.getAs[Long]("spw_milli") < 4000L)
    }
  }

  test("textYuleK matches a driver spectrum replay and is size-sane") {
    val rows = operators.TextOps.textYuleK(spark, sfDir).collect()
    val byLang = Tables.documents(spark, sfDir).select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(_.flatMap(_._2.split(" ")).filter(_.nonEmpty)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val toks = byLang(r.getString(0))
      val freq = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val n = BigInt(toks.length)
      val m2vm = freq.values.map(m => BigInt(m) * m).sum
      assert(r.getAs[Long]("n_tokens") === toks.length.toLong)
      assert(r.getAs[Long]("vocab") === freq.size.toLong)
      assert(r.getAs[Long]("yule_k_milli") ===
        ((10000000 * (m2vm - n)) / (n * n)).toLong)
      assert(r.getAs[Long]("yule_k_milli") >= 0)
    }
  }

  test("textHeaps matches a driver decile replay with beta in (0, 1e6)") {
    val rows = operators.TextOps.textHeaps(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty).toSeq))
      .groupBy(_._2)
    def lnN(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9).toLong
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lang = r.getString(0)
      val ds = docs(lang).sortBy(_._1)
      val n = ds.length
      val base = n / 10; val extra = n % 10
      val decOf = (0 until 10).flatMap(b =>
        Seq.fill(base + (if (b < extra) 1 else 0))(b + 1))
      val byDec = ds.zipWithIndex.groupBy { case (_, i) => decOf(i) }
      val seen = collection.mutable.Set.empty[String]
      var cumN = 0L
      val pts = (1 to 10).flatMap { d =>
        byDec.get(d).map { dds =>
          val toks = dds.flatMap(_._1._3)
          cumN += toks.length
          toks.foreach(seen += _)
          (lnN(cumN), lnN(seen.size.toLong))
        }
      }
      val np = BigInt(pts.length)
      val sx = pts.map(p => BigInt(p._1)).sum
      val sy = pts.map(p => BigInt(p._2)).sum
      val sxy = pts.map(p => BigInt(p._1) * p._2).sum
      val sxx = pts.map(p => BigInt(p._1) * p._1).sum
      val beta = ((np * sxy - sx * sy) * 1000000) / (np * sxx - sx * sx)
      assert(r.getAs[Long]("n_pts") === pts.length.toLong)
      assert(r.getAs[Long]("beta_micro") === beta.toLong, s"beta for $lang")
      // the fixture's CLOSED synthetic vocabulary saturates within the
      // first deciles, so beta legitimately hits 0 at tiny sf; a real
      // open-vocabulary corpus sits strictly inside (0, 1)
      assert(beta >= 0 && beta < 1000000,
        s"Heaps beta must sit in [0,1): $beta for $lang")
    }
  }

  test("textTextrank matches a driver weighted-PageRank replay") {
    val got = operators.TextOps.textTextrank(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("rank_micro")))
    val docs = Tables.documents(spark, sfDir).select("text").collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty).toSeq)
    val bigrams = docs.flatMap(ts => ts.zip(ts.drop(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sym = bigrams.toSeq.flatMap { case ((a, b), w) =>
      Seq((a, b, w), (b, a, w)) }
    val wu = sym.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var ranks = wu.keys.map(_ -> 1000000L).toMap
    (1 to 3).foreach { _ =>
      ranks = sym.groupBy(_._2).view.mapValues { es =>
        val inMass = es.map(e => ranks(e._1) * e._3 / wu(e._1)).sum
        150000L + 85 * inMass / 100
      }.toMap
    }
    val expected = ranks.toSeq.sortBy { case (t, r) => (-r, t) }.take(20)
    assert(got.toSeq === expected)
  }

  test("mlNaiveBayes matches an exact driver NB replay and beats the prior") {
    val got = operators.TextOps.mlNaiveBayes(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Long]("n"))).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty).toSeq))
    def lnN(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9).toLong
    val counts = docs.flatMap(d => d._3.map(t => (d._2, t)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nl = counts.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val v = docs.flatMap(_._3).distinct.size.toLong
    val nDocs = docs.length.toLong
    val priors = docs.groupBy(_._2).view
      .mapValues(ds => lnN(ds.size.toLong) - lnN(nDocs)).toMap
    val langs = priors.keys.toSeq.sorted
    val confusion = collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { case (_, trueLang, toks) =>
      val pred = langs.map { l =>
        val s = priors(l) + toks.map(t =>
          lnN(counts.getOrElse((l, t), 0L) + 1) - lnN(nl(l) + v)).sum
        (l, s)
      }.minBy { case (l, s) => (-s, l) }._1
      confusion((trueLang, pred)) =
        confusion.getOrElse((trueLang, pred), 0L) + 1
    }
    assert(got === confusion.toMap)
    val correct = confusion.collect { case ((t, p), n) if t == p => n }.sum
    val majority = docs.groupBy(_._2).values.map(_.size).max.toLong
    assert(correct > majority,
      "trained NB must beat the majority-class baseline on its own corpus")
  }

  test("textStyleDelta matches a driver function-word rate replay") {
    val fws = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")
    val got = operators.TextOps.textStyleDelta(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("n_words"), r.getAs[Long]("delta_ppm")))).toMap
    val bySrc = Tables.documents(spark, sfDir).select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(_.flatMap(_._2.split(" ")).filter(_.nonEmpty)).toMap
    val rates = bySrc.view.mapValues { toks =>
      val n = toks.length.toLong
      fws.map(w => toks.count(_ == w).toLong * 1000000 / n)
    }.toMap
    val srcs = rates.keys.toSeq.sorted
    val pairs = for { x <- srcs; y <- srcs if x < y } yield (x, y)
    assert(got.keySet === pairs.toSet)
    pairs.foreach { case (x, y) =>
      val delta = rates(x).zip(rates(y)).map { case (p, q) => (p - q).abs }.sum
      assert(got((x, y)) === ((10L, delta)), s"pair $x/$y")
    }
  }

  test("textVocabOverlap matches driver set arithmetic and bounds") {
    val got = operators.TextOps.textVocabOverlap(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("na"), r.getAs[Long]("nb"),
          r.getAs[Long]("n_inter"), r.getAs[Long]("jaccard_ppm")))).toMap
    val vocab = Tables.documents(spark, sfDir).select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(_.flatMap(_._2.split(" ")).filter(_.nonEmpty).toSet).toMap
    val langs = vocab.keys.toSeq.sorted
    val pairs = for { a <- langs; b <- langs if a < b } yield (a, b)
    assert(got.keySet === pairs.toSet)
    pairs.foreach { case (a, b) =>
      val inter = (vocab(a) & vocab(b)).size.toLong
      val union = (vocab(a) | vocab(b)).size.toLong
      val expected = (vocab(a).size.toLong, vocab(b).size.toLong, inter,
        inter * 1000000 / union)
      assert(got((a, b)) === expected, s"pair $a/$b")
    }
  }

  test("textRake matches a driver-side phrase split and degree/freq count") {
    val got = operators.TextOps.textRake(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("freq"), r.getAs[Long]("degree"),
        r.getAs[Long]("score_milli")))
    val stops = Set("the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "")
    val freq = collection.mutable.Map.empty[String, Long]
    val degree = collection.mutable.Map.empty[String, Long]
    Tables.documents(spark, sfDir).select("text").collect().foreach { r =>
      val toks = r.getString(0).split(" ", -1)
      var phrase = collection.mutable.Buffer.empty[String]
      def flush(): Unit = {
        val len = phrase.length.toLong
        phrase.foreach { w =>
          freq(w) = freq.getOrElse(w, 0L) + 1
          degree(w) = degree.getOrElse(w, 0L) + len
        }
        phrase.clear()
      }
      toks.foreach { t => if (stops(t)) flush() else phrase += t }
      flush()
    }
    val expected = freq.keys.toSeq
      .map(w => (w, freq(w), degree(w), degree(w) * 1000 / freq(w)))
      .sortBy { case (w, _, d, s) => (-s, -d, w) }
      .take(20)
    assert(got.toSeq === expected)
  }
}
