package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def encodeOne(word: String): String =
    Seq(word).toDF("text").select(Bpe.encode(col("text")).as("e"))
      .as[String].head()

  test("merge chain reproduces classic BPE on known words") {
    // "vector": (o,r) -> (c,t) -> (ct,or) -> (e,ctor) -> (v,ector)
    assert(encodeOne("vector") == "⟨vector⟩")
    // "slow": (o,w) -> (l,ow) -> (s,low)
    assert(encodeOne("slow") == "⟨slow⟩")
    // a word no merge touches stays fully character-split
    assert(encodeOne("zq") == "⟨z⟩⟨q⟩")
    // merges never cross word boundaries
    assert(encodeOne("s low") == "⟨s⟩ ⟨low⟩")
    // the bracket codepoints are reserved delimiters: stripped from
    // input (identically in the DuckDB twin), never unit content
    assert(encodeOne("a⟨b⟩c") == "⟨a⟩⟨b⟩⟨c⟩")
  }

  test("r16 kernel == replace-chain spelling on the corpus and adversarial inputs") {
    // the corpus at sf0.001: every document byte-identical under the
    // single-pass kernel vs the pre-r16 regexp+47-replace chain
    val docs = graft.Tables.documents(spark, sf)
    val mismatch = docs.select(
        Bpe.encode(col("text")).as("k"),
        Bpe.encodeReplaceChain(col("text")).as("c"))
      .filter(!(col("k") <=> col("c"))).count()
    assert(mismatch == 0L, "kernel diverged from the replace chain on the corpus")
    // adversarial shapes: null, empty, whitespace classes (Java \s =
    // [ \t\n\x0B\f\r] — U+00A0 NBSP is NOT \s, so it brackets as a unit),
    // reserved brackets, supplementary-plane codepoints, merge-chain
    // edge "aaa" under (a, ...) orderings, leading/trailing runs
    val hard = Seq(null, "", "   ", " \t\r\n\u000B\f ", "a\u00A0b",
      "⟨⟩⟨⟩", "a⟨b⟩c", "er er erer", "vector vectors", "aaa", "owow",
      "😀 er 😀", "join JOIN jOiN", "x", "cust omer",
      "  padded   runs  ")
    val got = hard.toDF("text").select(
        Bpe.encode(col("text")).as("k"),
        Bpe.encodeReplaceChain(col("text")).as("c"))
      .collect()
    got.zip(hard).foreach { case (r, in) =>
      val (k, c) = (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1))
      assert(k == c, s"input=${Option(in).map(_.take(30))}: kernel=$k chain=$c")
    }
  }

  test("encoding is lossless: stripping brackets recovers the normalized text") {
    val bad = graft.Tables.documents(spark, sf)
      .select(Bpe.encode(col("text")).as("enc"), lower(trim(col("text"))).as("norm"))
      .filter(replace(replace(col("enc"), lit("⟨"), lit("")),
        lit("⟩"), lit("")) =!= col("norm"))
      .count()
    assert(bad == 0, s"$bad documents mutated by the merge chain")
  }

  test("subword counts sit between word count and character count") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), Bpe.encode(col("text")).as("enc"),
        size(TextAnalysis.tokens(col("text"))).as("n_words"),
        length(regexp_replace(lower(trim(col("text"))), "\\s+", "")).as("n_chars"))
      .select(col("doc_id"), Bpe.tokenCountOf(col("enc")).as("n_bpe"),
        col("n_words"), col("n_chars"))
    assert(docs.filter(col("n_bpe") > col("n_chars") ||
      col("n_bpe") < col("n_words")).count() == 0)
    // and the merges actually compress (strictly fewer units than chars)
    val agg = docs.agg(sum("n_bpe").as("u"), sum("n_chars").as("c")).head()
    assert(agg.getLong(0) < agg.getLong(1))
  }

  test("vocab top-k surfaces merged multi-character units") {
    val units = Bpe.vocabTopK(spark, sf).select("unit").as[String].collect()
    assert(units.length == 40)
    assert(units.exists(_.length > 1), "no merged unit reached the top-k — merges dead?")
  }

  test("vocab top-k plans as TakeOrderedAndProject, not a global sort") {
    val df = Bpe.vocabTopK(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected orderBy+limit to plan as top-k, got:\n$plan")
  }

  test("fertility is bounded by subword-count invariants and groups cover the corpus") {
    val rows = Bpe.tokenizerFertility(spark, sf).collect()
    assert(rows.nonEmpty)
    // every word is at least one subword unit and at most its characters,
    // so group fertility lives in [1, mean word length]
    rows.foreach { r =>
      val f = r.getAs[Double]("fertility")
      assert(f >= 1.0, s"fertility $f < 1 for ${r.getAs[String]("source")}/${r.getAs[String]("lang")}")
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("ws_tokens"))
    }
    // groups partition the corpus: doc counts add back up
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.Tables.documents(spark, sf).count())
  }

  /** Serial reference BPE (Sennrich alg. 1 on a word-freq dict) with
    * the same total tie-break — the ground truth q95 must reproduce
    * merge-for-merge. */
  private def serialBpe(corpus: Seq[String], n: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        // codepoint units (not Chars): the trainer splits codepoints
        w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp))).toVector -> ws.size.toLong
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var done = false
    while (i < n && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (u, f) =>
        u.sliding(2).filter(_.size == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((a, b), w) = pairs.toSeq.minBy { case ((a, b), w) => (-w, a, b) }
        out += ((a, b, w))
        words = words.toSeq.map { case (u, f) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < u.length) {
            if (j + 1 < u.length && u(j) == a && u(j + 1) == b) {
              merged += (a + b); j += 2
            } else { merged += u(j); j += 1 }
          }
          merged.toVector -> f
        }.groupBy(_._1).map { case (u, fs) => u -> fs.map(_._2).sum }
        i += 1
      }
    }
    out.toSeq
  }

  test("distributed trainer reproduces the serial reference merge-for-merge") {
    val corpus = Seq(
      "low lower lowest low low",
      "new newer newest new new new",
      "wider wide widest wider",
      "the the the then there then")
    val docs = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val expected = serialBpe(corpus, 12)
    // driver path (the default at this vocab size)
    val got = Bpe.trainMerges(docs, 12).map { case (_, a, b, w) => (a, b, w) }
    assert(got == expected,
      s"merge sequences diverge:\n got      $got\n expected $expected")
    // distributed path, forced (driverLimit = 0): identical output
    val dist = Bpe.trainMerges(docs, 12, driverLimit = 0L)
      .map { case (_, a, b, w) => (a, b, w) }
    assert(dist == expected,
      s"distributed path diverges:\n got      $dist\n expected $expected")
  }

  test("incremental distributed trainer matches the serial reference at 256 merges") {
    // VERDICT r6 #3: the distributed path now maintains the pair table
    // incrementally (only pairs adjacent to the last merge change), so
    // parity must hold deep into a training run, where one drifted
    // count would reorder every later merge. 16 syllables x 16
    // syllables = 256 four-char words — enough live pairs to sustain
    // 256 merges (syllable merges, then word merges, tie-broken
    // lexically all the way down).
    val syll = Seq("ba", "ce", "di", "fo", "gu", "ka", "le", "mi",
      "no", "pu", "ra", "se", "ti", "vo", "wu", "za")
    val corpus = (for { x <- syll; y <- syll } yield x + y)
      .grouped(16).map(_.mkString(" ")).toSeq
    val docs = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val expected = serialBpe(corpus, 256)
    assert(expected.length == 256, s"fixture exhausted at ${expected.length} merges")
    val dist = Bpe.trainMerges(docs, 256, driverLimit = 0L)
      .map { case (_, a, b, w) => (a, b, w) }
    if (dist != expected) {
      val i = dist.zip(expected).indexWhere { case (g, e) => g != e }
      fail(s"diverged at merge ${if (i < 0) math.min(dist.length, expected.length) else i}: " +
        s"got ${dist.lift(i)}, expected ${expected.lift(i)} " +
        s"(lengths ${dist.length} vs ${expected.length})")
    }
  }

  test("driver and distributed trainers tie-break in the same UTF-8 byte order") {
    // One doc, two words, frequency-tied first merge: ("x", U+1F600)
    // vs ("x", U+FFFD). Java UTF-16 code-unit order picks the emoji
    // (surrogate D83D < FFFD); UTF8String byte order picks U+FFFD
    // (EF BF BD < F0 9F 98 80). Spark's orderBy is byte order, so
    // BOTH paths must learn U+FFFD first — the pre-utf8Lt driver loop
    // picked the emoji and the paths diverged exactly here.
    val docs = Seq((1L, "x😀 x�", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val drv = Bpe.trainMerges(docs, 1).map(t => (t._2, t._3))
    val dist = Bpe.trainMerges(docs, 1, driverLimit = 0L).map(t => (t._2, t._3))
    assert(drv == Seq(("x", "�")), s"driver learned $drv")
    assert(dist == drv, s"paths diverge: driver $drv distributed $dist")
  }

  test("supplementary-plane characters train as whole codepoints, not surrogate halves") {
    // 😀 is U+1F600 (two UTF-16 code units). A code-unit split would
    // present (x, \uD83D) and (\uD83D, \uDE00) as candidate pairs and
    // learn a lone surrogate; the codepoint split must learn the whole
    // emoji pair — and both paths must agree with the serial reference
    // on a corpus where non-BMP merges win.
    val corpus = Seq("x😀 x😀 x😀 y😀 z𝕊 z𝕊")
    val docs = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val expected = serialBpe(corpus, 3)
    val drv = Bpe.trainMerges(docs, 3).map { case (_, a, b, w) => (a, b, w) }
    val dist = Bpe.trainMerges(docs, 3, driverLimit = 0L)
      .map { case (_, a, b, w) => (a, b, w) }
    assert(drv == expected, s"driver diverges:\n got $drv\n expected $expected")
    assert(dist == expected, s"distributed diverges:\n got $dist\n expected $expected")
    assert(drv.head._2 == "😀", s"first merge right side is not the whole emoji: $drv")
    // no learned unit may contain a lone surrogate (codePoints() of a
    // well-formed string never yields a value in the surrogate range)
    drv.foreach { case (a, b, _) =>
      assert((a + b).codePoints().toArray
        .forall(cp => cp < 0xD800 || cp > 0xDFFF),
        s"unit '$a$b' contains a lone surrogate")
    }
  }

  test("trainer stops early when the vocabulary is fully merged") {
    val docs = Seq((0L, "ab ab ab", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Bpe.trainMerges(docs, 50)
    // one word of two chars: exactly one merge is learnable
    assert(got == Seq((1, "a", "b", 3L)))
  }

  test("q95 on the sf corpus: ranked, deterministic, and compressive") {
    val rows = Bpe.bpeTrain(spark, sf).collect()
    assert(rows.length == Bpe.trainMergeCount)
    assert(rows.map(_.getAs[Int]("merge_rank")).toSeq == (1 to rows.length))
    // weights are non-increasing only within equal segmentations, but
    // every learned weight must be >= 2 to mean anything
    rows.foreach(r => assert(r.getAs[Long]("weight") >= 2L))
    assert(rows.map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
      .distinct.length == rows.length, "a pair may only be learned once")
    // determinism: second run identical
    val again = Bpe.bpeTrain(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("packing starts each (lang, source) stream at tokens_before 0") {
    val firsts = Bpe.bpePacking(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lang", "source").orderBy("doc_id")))
      .filter(col("rn") === 1)
    assert(firsts.filter(col("tokens_before") =!= 0L).count() == 0)
    assert(firsts.filter(col("pack_id") =!= 0L).count() == 0)
  }
}
