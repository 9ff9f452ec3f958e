package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("rarity score is the exact mean corpus frequency") {
    import spark.implicits._
    // corpus: a x5, b/c/d x1 each, N=8.
    // doc 1 = "a a a a": (5+5+5+5)/(4*8) = 0.625
    // doc 2 = "a b c d": (5+1+1+1)/(4*8) = 0.25
    val docs = Seq((1L, "a a a a"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.rarityOf(docs)
      .select("doc_id", "n_tokens", "mean_corpus_freq")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((4L, 0.625)))
    assert(got(2L) == ((4L, 0.25)))
  }

  test("vocab top-k ranks by frequency with deterministic ties and true doc freq") {
    val rows = TextAnalysis.vocabTopK(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // ordering contract: count desc, token asc on ties
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (ca, cb) = (a.getLong(1), b.getLong(1))
        assert(ca > cb || (ca == cb && a.getString(0) < b.getString(0)))
      case _ =>
    }
    // doc frequency can never exceed occurrences
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    // spot-check the head against a direct recount
    val top = rows.head
    val recount = graft.Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .filter(col("t") === top.getString(0)).count()
    assert(recount == top.getLong(1))
  }

  test("repetition score flags a planted repetitive doc and passes varied text") {
    val docs = Seq(
      (1L, "buy now " * 50),                             // one bigram dominates
      (2L, (1 to 100).map(i => s"word$i").mkString(" ")), // all bigrams unique
      (3L, "short text only"),                           // < 8 bigrams: exempt
    ).toDF("doc_id", "text")
    val orig = graft.Tables.documents(spark, sf)
    // run the same plan over literal docs by substituting the source
    val toks = TextAnalysis.tokens(col("text"))
    val idx = sequence(lit(1), greatest(size(toks) - 1, lit(1)))
    val bigrams = transform(idx, i => xxhash64(array_join(slice(toks, i, lit(2)), " ")))
    val got = docs.select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"), max(col("n")).as("top_n"))
      .withColumn("frac", col("top_n").cast("double") / col("n_bigrams"))
      .withColumn("keep", col("n_bigrams") < 8 || col("frac") < 0.2)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(!got(1L), "repetitive doc must be dropped")
    assert(got(2L), "varied doc must pass")
    assert(got(3L), "short doc must be exempt")
    // and the registered query stays consistent on the real corpus
    val real = TextAnalysis.repetitionScores(spark, sf).collect()
    assert(real.length == orig.count())
    real.foreach { r =>
      val frac = r.getAs[Double]("top_bigram_frac")
      assert(frac > 0.0 && frac <= 1.0)
    }
  }

  test("dupgram fraction separates phrase loops from varied text") {
    import spark.implicits._
    val looped = (Seq.fill(6)("one two three four").mkString(" "))
    val varied = (1 to 24).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, looped), (2L, varied), (3L, "too short")).toDF("doc_id", "text")
    // replay the registered expression chain on the synthetic frame
    val out = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        transform(sequence(lit(1), greatest(size(col("toks")) - 3, lit(1))),
          i => xxhash64((0 until 4).map(o =>
            coalesce(element_at(col("toks"), i + o), lit(""))): _*)).as("g4"))
      .select(col("doc_id"), size(col("g4")).as("n"),
        size(array_distinct(col("g4"))).as("d"))
      .withColumn("frac", (col("n") - col("d")).cast("double") / col("n"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2),
        r.getAs[Double]("frac"))).toMap
    // 24 tokens looping a 4-token phrase: 21 grams, only 4 distinct
    assert(out(1L) == ((21, 4, 17.0 / 21)))
    // varied text repeats nothing
    assert(out(2L)._3 == 0.0)
    // degenerate short doc: single padded gram, trivially unique
    assert(out(3L) == ((1, 1, 0.0)))
    // and the registered query gates on the same arithmetic
    val real = TextAnalysis.dupgramFraction(spark, sf).collect()
    assert(real.length == graft.Tables.documents(spark, sf).count())
    real.foreach { r =>
      val frac = r.getAs[Double]("dup_frac")
      assert(frac >= 0.0 && frac < 1.0)
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Int]("n_grams") < 8 || frac < 0.3))
    }
  }

  test("CMS heavy hitters: one-sided error bounds hold against exact counts") {
    val rows = TextAnalysis.cmsHeavyHitters(spark, sf).collect()
    assert(rows.length == 20)
    val nTotal = rows.head.getAs[Long]("n_total")
    // CMS contract: never undercounts; overcount bounded by eps*N with
    // eps = e/width (the depth-4 failure probability e^-4 ~ 2% per
    // token is generous against 20 probes: allow the bound at 3x)
    val eps = math.E / TextAnalysis.cmsWidth
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("cms_estimate")
      assert(r.getAs[Boolean]("lower_bound_holds") && est >= exact,
        s"CMS undercounted ${r.getAs[String]("token")}: $est < $exact")
      assert(est <= exact + 3 * eps * nTotal,
        s"CMS overcount out of bound for ${r.getAs[String]("token")}: $est vs $exact (N=$nTotal)")
    }
    // ranking sanity: the top exact token's estimate dominates the
    // 20th's exact count (a sketch that lost the heavy hitters would not)
    assert(rows.head.getAs[Long]("cms_estimate") >= rows.last.getAs[Long]("exact_n"))
  }

  test("duplicated passages: planted cross-doc 8-gram found, unique text absent") {
    val passage = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"intro words here $passage and a unique tail one"),
      (2L, s"different opening text $passage with another ending two"),
      (3L, s"prefix $passage $passage suffix"), // repeats it twice in one doc
      (4L, "entirely unrelated content with no shared passages at all " +
        "written once and never again anywhere else in this corpus"),
      (5L, "short doc")).toDF("doc_id", "text")
    val rows = TextAnalysis.duplicatedPassagesOf(docs).collect()
    // every reported gram spans >= 2 docs, ranked by spread then count
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_docs") >= 2L))
    val spreads = rows.map(r =>
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occurrences")))
    assert(spreads.sliding(2).forall {
      case Array((d1, o1), (d2, o2)) => d1 > d2 || (d1 == d2 && o1 >= o2)
      case _ => true
    })
    // the planted 10-token passage yields full-width 8-gram windows
    // present in docs 1/2/3; doc 3 contributes 2 occurrences of the
    // core window so the top rows carry (n_docs=3, n_occurrences>=4)
    val top = rows.head
    assert(top.getAs[Long]("n_docs") == 3L)
    assert(top.getAs[String]("gram").split(" ").length == 8)
    assert(rows.exists(_.getAs[String]("gram") ==
      "the quick brown fox jumps over the lazy"))
    // nothing from the unique doc 4 is reported
    assert(!rows.exists(_.getAs[String]("gram").contains("unrelated")))
  }

  test("duplicated passages: the string join-back broadcasts only the gated winners") {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    val docs = graft.Tables.documents(spark, sf)
    val qe = TextAnalysis.duplicatedPassagesOf(docs).queryExecution
    val bhjs = qe.sparkPlan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhjs.nonEmpty, "string join-back did not plan as a broadcast hash join")
    // every broadcast build side must sit ON TOP of the boundary-
    // threshold gate (the non-equi BroadcastNestedLoopJoin against the
    // 1-row thr agg) — broadcasting the raw duplicated-gram table, the
    // round-6 scale-killer, would show a bare aggregate here instead.
    // The gate may sit inside the vocab-join cache, whose cachedPlan
    // is an AQE wrapper (a leaf to collect) — check its rendered plan.
    def hasGate(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectFirst { case n: BroadcastNestedLoopJoinExec => n }.isDefined ||
        p.collect { case m: InMemoryTableScanExec => m }
          .exists(m => m.relation.cachedPlan.toString.contains("BroadcastNestedLoopJoin"))
    bhjs.foreach { j =>
      val build = j.buildSide match {
        case BuildRight => j.right
        case BuildLeft  => j.left
      }
      assert(hasGate(build),
        s"broadcast build side is not the threshold-gated winners table:\n$build")
    }
    graft.ops.Dedup.releaseSketchCaches()
  }

  test("duplicated passages: winners past the row ceiling take the salted join, same rows") {
    val docs = graft.Tables.documents(spark, sf)
    val viaBroadcast = TextAnalysis.duplicatedPassagesOf(docs).collect()
    graft.ops.Dedup.releaseSketchCaches()
    // force the boundary-tie blowup arm: a zero ceiling routes the
    // string pass through the salted shuffle join (the `_salt` join
    // key in the optimized plan — the house salted-path witness; at
    // this SF AQE may still shrink the tiny exchange at runtime, at
    // crawl scale it cannot, which is the point), output identical
    val salted = TextAnalysis.duplicatedPassagesOf(docs, maxBroadcastWinners = 0L)
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"),
      s"zero ceiling did not route the winners join through the salted path:\n$plan")
    val saltedRows = salted.collect()
    graft.ops.Dedup.releaseSketchCaches()
    assert(viaBroadcast.map(_.toString).toSeq == saltedRows.map(_.toString).toSeq,
      "salted winners join changed the q82 result")
  }

  test("sentence dedup fraction: shared sentences counted, short ones ignored") {
    val shared = "this exact sentence appears in multiple documents verbatim"
    val docs = Seq(
      (1L, s"$shared. a unique closing thought long enough to qualify here."),
      (2L, s"different intro for the second doc. $shared. ok."),
      (3L, "a document with entirely original sentences throughout. " +
        "nothing here appears anywhere else in the corpus at all."),
      (4L, "tiny. bits. only.")).toDF("doc_id", "text")
    val out = TextAnalysis.sentenceDupFractionOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sentences"), r.getAs[Long]("n_dup_sentences"),
          r.getAs[Boolean]("keep"))).toMap
    // doc 1: 2 qualifying sentences, 1 shared => dup_frac 0.5 => drop
    assert(out(1L) == (2L, 1L, false))
    // doc 2: "ok." trims under 20 chars and is ignored
    assert(out(2L) == (2L, 1L, false))
    assert(out(3L) == (2L, 0L, true))
    // doc 4 has no qualifying sentences and emits no row
    assert(!out.contains(4L))
  }

  test("inverted index: postings exact, sorted, and capped to the top-k winners") {
    val rows = TextAnalysis.invertedIndex(spark, sf).collect()
    graft.ops.Dedup.releaseSketchCaches()
    assert(rows.length <= TextAnalysis.invIndexTopK)
    assert(rows.nonEmpty)
    // df ranking is non-increasing with the deterministic tie-break
    val dfs = rows.map(_.getAs[Long]("df"))
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b })
    // spot-check every row against a direct per-token recount
    val docs = graft.Tables.documents(spark, sf).filter(col("text").isNotNull)
    rows.take(3).foreach { r =>
      val tok = r.getAs[String]("token")
      val expected = docs
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("t"))
        .filter(col("t") === tok)
        .select(col("doc_id")).distinct()
        .collect().map(_.getLong(0)).sorted
      assert(r.getAs[Long]("df") == expected.length)
      assert(r.getAs[String]("postings") == expected.mkString(","),
        s"postings for '$tok' wrong")
    }
    // posting lists are ascending (string round-trips through longs)
    rows.foreach { r =>
      val ids = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(ids.toSeq == ids.sorted.toSeq && ids.distinct.length == ids.length)
    }
  }

  test("tfidf terms: planted ranking exact, and the top-k rewrite fires") {
    // 4 docs; "rare" appears only in doc 1 (df=1), "mid" in docs 1+2
    // (df=2), "the" everywhere (df=4). N=4, idf_micro = 4e6 div df.
    // doc 1 = "the the rare mid": rare 1*4e6, mid 1*2e6, the 2*1e6
    //   -> rank: rare > mid > the (weights 4e6 > 2e6 > 2e6? no:
    //   mid = 1 * (4e6 div 2) = 2e6; the = 2 * (4e6 div 4) = 2e6 —
    //   TIE broken on token string: "mid" < "the".
    val docs = Seq(
      (1L, "the the rare mid"), (2L, "the mid"),
      (3L, "the"), (4L, "the")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfOf(docs)
    graft.ops.Dedup.releaseSketchCaches()
    val d1 = out.filter(col("doc_id") === 1L)
      .select("rank", "token", "weight_micro")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(d1.toSeq == Seq((1, "rare", 4000000L), (2, "mid", 2000000L),
      (3, "the", 2000000L)))
    // docs with fewer distinct tokens than k emit what they have
    assert(out.filter(col("doc_id") === 3L).count() == 1)
    // the rank-limit shape must lower to the bounded heap, not Window
    val plan = TextAnalysis.tfidfOf(docs).queryExecution.executedPlan.toString
    graft.ops.Dedup.releaseSketchCaches()
    assert(plan.contains("TopKPerGroup"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("!TopKPerGroup"), s"invalid plan:\n$plan")
  }

  test("salted vocab join: identical output to the broadcast path, no broadcast in plan") {
    val docs = graft.Tables.documents(spark, sf)
    def key(r: org.apache.spark.sql.Row) = r.mkString("|")
    // rarity: every (doc, n_tokens, mean_freq) row identical
    val b1 = TextAnalysis.rarityOf(docs, Skew.VocabJoin.Broadcast)
      .collect().map(key).sorted
    val s1 = TextAnalysis.rarityOf(docs, Skew.VocabJoin.Salted)
      .collect().map(key).sorted
    assert(b1.sameElements(s1), "rarity paths diverge")
    // tfidf: ranks and weights identical
    val b2 = TextAnalysis.tfidfOf(docs, Skew.VocabJoin.Broadcast)
      .collect().map(key).sorted
    graft.ops.Dedup.releaseSketchCaches()
    val s2 = TextAnalysis.tfidfOf(docs, Skew.VocabJoin.Salted)
      .collect().map(key).sorted
    graft.ops.Dedup.releaseSketchCaches()
    assert(b2.sameElements(s2), "tfidf paths diverge")
    // the salted path's vocab lookup joins on (token, _salt) — the
    // hot-token spread — and is NOT a planned broadcast (at this SF
    // AQE may still convert the tiny shuffle join at runtime; at an
    // open-vocab scale it cannot, which is the point of the path)
    val optimized = TextAnalysis.rarityOf(docs, Skew.VocabJoin.Salted)
      .queryExecution.optimizedPlan.toString
    assert(optimized.contains("_salt"), s"salt not in join keys:\n$optimized")
  }

  test("adaptive vocab join routes itself: broadcast under the ceiling, salted over it") {
    def key(r: org.apache.spark.sql.Row) = r.mkString("|")
    val docs = graft.Tables.documents(spark, sf)
    // under the default ceiling the fixture vocab broadcasts: the
    // optimized plan carries no salt key and the catalog default
    // (no flag anywhere) produces the oracle-checked output
    val adDefault = TextAnalysis.rarityOf(docs)
    assert(!adDefault.queryExecution.optimizedPlan.toString.contains("_salt"))
    // over-threshold vocab (ceiling planted below the fixture's
    // vocabulary size): Adaptive must route to the salted join with
    // NO caller-side mode flag — the round-6 manual scale switch
    val adSalted = TextAnalysis.rarityOf(docs, vocabBroadcastMaxRows = 10L)
    val plan = adSalted.queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"), s"adaptive did not route to salted:\n$plan")
    // and the routed plan's output is identical to the broadcast path
    val want = TextAnalysis.rarityOf(docs, Skew.VocabJoin.Broadcast)
      .collect().map(key).sorted
    val got = adSalted.collect().map(key).sorted
    graft.ops.Dedup.releaseSketchCaches()
    assert(got.sameElements(want), "adaptive salted output diverges")
    // same routing contract on the tf-idf consumer
    val tfSalted = TextAnalysis.tfidfOf(docs, vocabBroadcastMaxRows = 10L)
    val tfPlan = tfSalted.queryExecution.optimizedPlan.toString
    assert(tfPlan.contains("_salt"), s"tfidf adaptive did not route:\n$tfPlan")
    val tfWant = TextAnalysis.tfidfOf(docs, Skew.VocabJoin.Broadcast)
      .collect().map(key).sorted
    graft.ops.Dedup.releaseSketchCaches()
    val tfGot = tfSalted.collect().map(key).sorted
    graft.ops.Dedup.releaseSketchCaches()
    assert(tfGot.sameElements(tfWant), "tfidf adaptive output diverges")
  }

  test("lexical diversity: TTR and hapax fractions are exact on the sf corpus") {
    val rows = TextAnalysis.lexicalDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, typ, hap) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_types"), r.getAs[Long]("n_hapax"))
      assert(typ >= 1 && typ <= tok && hap <= typ)
      assert(r.getAs[Long]("ttr_micro") == typ * 1000000L / tok)
      assert(r.getAs[Long]("hapax_micro") == hap * 1000000L / typ)
    }
    // direct recount for the first source
    val src = rows.head.getAs[String]("source")
    val counts = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull && col("source") === src)
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect()
    assert(rows.head.getAs[Long]("n_types") == counts.length)
    assert(rows.head.getAs[Long]("n_tokens") == counts.map(_.getLong(1)).sum)
    assert(rows.head.getAs[Long]("n_hapax") == counts.count(_.getLong(1) == 1L))
  }

  test("length histogram partitions the corpus with valid bands") {
    val rows = TextAnalysis.lengthHistogram(spark, sf).collect()
    val bands = Set("000-015", "016-031", "032-063", "064-127", "128-255", "256+")
    assert(rows.forall(r => bands(r.getAs[String]("len_bucket"))))
    val docs = graft.Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // token totals reconcile with the q20-style direct sum
    val direct = docs.select(sum(size(TextAnalysis.tokens(col("text"))))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("sum_tokens")).sum == direct)
  }

  test("q141 drift equals a driver-side exact TV recompute; bounds hold") {
    val rows = graft.SparkEntry.queries("q141_source_token_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent recompute from raw (source, token) counts
    val raw = graft.Tables.documents(spark, sf)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("source", "token").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val tokTot = raw.groupBy(_._1._2).map { case (t, m) => t -> m.values.sum }
    val srcTot = raw.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val totC = BigInt(tokTot.values.sum)
    val top = tokTot.toSeq.sortBy { case (t, n) => (-n, t) }.take(100)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val totS = BigInt(srcTot(src))
      assert(r.getAs[Long]("n_tokens") == srcTot(src))
      val terms = top.map { case (t, nTok) =>
        (BigInt(raw.getOrElse((src, t), 0L)) * totC - BigInt(nTok) * totS).abs
      }
      val tv = (BigInt(1000000) * terms.sum) / (totS * totC)
      val mx = terms.map(term => BigInt(1000000) * term / (totS * totC)).max
      assert(r.getAs[Long]("tv_ppm") == tv.toLong, s"tv($src)")
      assert(r.getAs[Long]("max_term_ppm") == mx.toLong, s"max_term($src)")
      // TV over a token subset is within [0, 2]
      assert(tv >= 0 && tv <= 2000000)
      assert(mx <= tv)
    }
  }

  test("q150 Gini equals a driver-side rank-formula recompute; bounds hold") {
    val rows = graft.SparkEntry.queries("q150_token_gini")(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = graft.Tables.documents(spark, sf)
      .select(col("source"),
        greatest(size(TextAnalysis.tokens(col("text"))), lit(0)).cast("long").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    assert(rows.map(_.getAs[String]("source")).toSet == raw.keySet)
    rows.foreach { r =>
      val xs = raw(r.getAs[String]("source"))
      val n = xs.length.toLong
      val s1 = xs.sum
      val s2 = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val gini = (BigInt(1000000) * (2 * s2 - BigInt(n + 1) * s1)) / (BigInt(n) * s1)
      assert(r.getAs[Long]("n_docs") == n && r.getAs[Long]("total_tokens") == s1)
      assert(r.getAs[Long]("gini_ppm") == gini.toLong,
        s"gini(${r.getAs[String]("source")}): ${r.getAs[Long]("gini_ppm")} vs $gini")
      // a Gini lives in [0, 1); these sources are length-varied but
      // not degenerate, so the value is strictly interior
      assert(gini >= 0 && gini < 1000000)
    }
  }

  test("q142 coverage curve is monotone and equals a driver-side recompute") {
    val rows = graft.SparkEntry.queries("q142_vocab_coverage")(spark, sf)
      .orderBy(col("vocab_k")).collect()
    assert(rows.map(_.getAs[Int]("vocab_k")).toSeq == Seq(5, 10, 20))
    val counts = graft.Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val ranked = counts.sortBy { case (t, n) => (-n, t) }
    val total = counts.map(_._2).sum
    rows.foreach { r =>
      val k = r.getAs[Int]("vocab_k")
      val cov = ranked.take(k).map(_._2).sum
      assert(r.getAs[Long]("occ_covered") == cov, s"cov($k)")
      assert(r.getAs[Long]("total_occ") == total)
      assert(r.getAs[Long]("n_types_covered") == math.min(k.toLong, counts.size.toLong))
      assert(r.getAs[Long]("coverage_ppm") == 1000000L * cov / total)
    }
    val ppms = rows.map(_.getAs[Long]("coverage_ppm"))
    assert(ppms.zip(ppms.tail).forall { case (a, b) => a <= b },
      "coverage must be monotone in k")
  }

  test("q210 BM25 equals a driver-side exact-integer recompute; shape is scan-only") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q210_bm25_search")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_terms"),
        r.getAs[Long]("score_micro")))

    // independent recompute with BigInt arithmetic (no widening caps)
    val terms = TextAnalysis.bm25Terms
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val n = BigInt(toks.length)
    val total = BigInt(toks.map(_._2.length.toLong).sum)
    val dfs = terms.map(t => BigInt(toks.count(_._2.contains(t))))
    val want = toks.map { case (id, ts) =>
      val dl = BigInt(ts.length)
      var score = BigInt(0); var nt = 0
      terms.indices.foreach { i =>
        val tf = BigInt(ts.count(_ == terms(i)))
        if (tf > 0) {
          nt += 1
          val idf = ((n * 1000000L) / dfs(i)).min(BigInt(1000000000000L))
          score += idf * 22 * tf * total /
            (BigInt(10) * total * tf + 3 * total + 9 * dl * n)
        }
      }
      (id, nt, score.toLong)
    }.filter(_._2 > 0).sortBy { case (id, _, s) => (-s, id) }
      .take(TextAnalysis.bm25TopK)
    assert(got.toSeq == want.toSeq, s"got ${got.toSeq}\nwant ${want.toSeq}")
    assert(got.nonEmpty && got.exists(_._2 >= 2),
      "fixture should produce multi-term matches")
    // scale shape (index-served since r13): PostingsIndexSpec pins that
    // every documents scan in the steady-state plan is delta-pruned
    // (no full-corpus tokenization) and the postings scan partition-
    // prunes to the query terms' buckets
  }

  test("q213 batch BM25: each query's rows equal the single-query scorer; the top-k rewrite fires") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val got = graft.SparkEntry.queries("q213_bm25_batch")(spark, sf)
      .collect().map(r => (r.getAs[String]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("n_terms"), r.getAs[Long]("score_micro")))
    graft.ops.Dedup.releaseSketchCaches()
    TextAnalysis.bm25Queries.foreach { case (qid, terms) =>
      // the single-query scorer over the SAME term list, truncated to
      // the batch k, must agree row for row (df/N/T are term-local, so
      // the shared distinct-term frame cannot change any score)
      val want = TextAnalysis.bm25ScanOf(docs, terms)
        .collect().take(TextAnalysis.bm25BatchK).zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getAs[Long]("doc_id"),
          r.getAs[Int]("n_terms"), r.getAs[Long]("score_micro")) }
      graft.ops.Dedup.releaseSketchCaches()
      assert(got.filter(_._1 == qid).toSeq == want.toSeq,
        s"batch rows for $qid diverged from the single-query scorer")
    }
    // every query produced a full k (the fixture matches all probes)
    assert(got.length == TextAnalysis.bm25Queries.size * TextAnalysis.bm25BatchK)
    // the per-query rank-limit lowers to the bounded heap, not Window
    val plan = graft.SparkEntry.queries("q213_bm25_batch")(spark, sf)
      .queryExecution.executedPlan.toString
    graft.ops.Dedup.releaseSketchCaches()
    assert(plan.contains("TopKPerGroup"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("!TopKPerGroup"), s"invalid plan:\n$plan")
  }
}
