package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CurationSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("corpus filter: verdict precedence and keeper consistency") {
    val rows = Curation.corpusFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, exact, near, keep, verdict) =
        (r.getAs[Long]("doc_id"), r.getAs[Long]("exact_keeper"),
          r.getAs[Long]("near_keeper"), r.getAs[Boolean]("keep"),
          r.getAs[String]("verdict"))
      if (id != exact) assert(verdict == "exact_dup")
      else if (id != near) assert(verdict == "near_dup")
      if (keep) {
        assert(verdict == "kept")
        assert(id == exact && id == near, "a kept doc must be its own keeper")
      }
    }
    // no two kept docs share identical text
    val keptIds = rows.filter(_.getAs[Boolean]("keep"))
      .map(_.getAs[Long]("doc_id")).toSet
    val keptHashes = graft.Tables.documents(spark, sf)
      .filter(col("doc_id").isin(keptIds.toSeq: _*))
      .select(md5(col("text"))).collect().map(_.getString(0))
    assert(keptHashes.length == keptHashes.distinct.length,
      "kept set still contains exact duplicates")
  }

  test("pii scrub redacts exactly the planted contacts") {
    val rows = Curation.piiScrub(spark, sf).collect()
    rows.foreach { r =>
      val planted = r.getLong(0) % 10 == 0
      assert(r.getAs[Int]("n_emails") == (if (planted) 1 else 0))
      assert(r.getAs[Int]("n_phones") == (if (planted) 1 else 0))
      assert(r.getAs[Boolean]("was_redacted") == planted,
        s"doc ${r.getLong(0)}: redaction fired=${r.getAs[Boolean]("was_redacted")}")
    }
  }

  test("pii scrub tolerates null-text docs (plants onto empty string, both engines)") {
    // ADVICE r3: Spark concat is NULL-propagating, DuckDB concat is
    // NULL-skipping — a null-text doc at a planted id would diverge
    // without the coalesce. The sf fixtures carry no null text, so
    // build a corpus that does (ids 0 and 10 planted, 10 null-text).
    import spark.implicits._
    val dir = tmpDir("pii-null")
    Seq[(Long, Option[String], String, String, Long)](
      (0L, Some("plain text here"), "en", "web", 15L),
      (10L, None, "en", "web", 0L),
      (11L, None, "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Curation.piiScrub(spark, dir).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // planted null-text doc: the contact line IS the text -> redacted
    assert(byId(10L).getAs[Int]("n_emails") == 1)
    assert(byId(10L).getAs[Int]("n_phones") == 1)
    assert(byId(10L).getAs[Boolean]("was_redacted"))
    // non-planted null-text doc stays NULL end-to-end on BOTH engines
    // (size(NULL)/len(NULL), md5(NULL), NULL<>NULL are all NULL):
    // no crash, no row loss, no cross-engine divergence
    assert(byId(11L).isNullAt(1) && byId(11L).isNullAt(3) && byId(11L).isNullAt(4))
    assert(rows.length == 3)
  }

  test("quality model: linear score with multiplicity, null-safe, sign gate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat is on the mat and it is warm"), // fluent: stopword-heavy
      (2L, "click here buy free winner cheap offer"), // spam markers
      (3L, "the the the"),   // multiplicity: 3 x w(the)
      (4L, null.asInstanceOf[String]),
      (5L, "")               // tokenizes to [""]: no hits, score = bias
    ).toDF("doc_id", "text")
    val rows = Curation.qualityModelOf(docs).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // doc 1: the(40)x2 + is(25)x2 + on(10) + and(35) + it(15) - 50 = 140
    assert(byId(1L).getAs[Long]("score_milli") == 140L)
    assert(byId(1L).getAs[Boolean]("model_keep"))
    assert(byId(1L).getAs[Int]("n_hits") == 7)
    // doc 2: click+buy+free+winner+cheap+offer = -500 - 50 = -550
    assert(byId(2L).getAs[Long]("score_milli") == -550L)
    assert(!byId(2L).getAs[Boolean]("model_keep"))
    // doc 3: each occurrence counts
    assert(byId(3L).getAs[Long]("score_milli") == 3 * 40L - 50L)
    assert(byId(3L).getAs[Int]("n_hits") == 3)
    // null text: NULL all the way out (matches the DuckDB twin's CASE)
    assert(byId(4L).isNullAt(1) && byId(4L).isNullAt(2) && byId(4L).isNullAt(4))
    // empty text: bias only, gate drops it
    assert(byId(5L).getAs[Long]("score_milli") == Curation.modelBias)
    assert(!byId(5L).getAs[Boolean]("model_keep"))
    // the per-row fold never shuffles: the only Exchange in the plan
    // is the query's final orderBy — scoring itself adds none
    val scoring = Curation.qualityModelOf(docs).queryExecution.executedPlan
    val exchanges = scoring.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1, s"unexpected shuffles:\n$scoring")
  }

  test("score quantiles: ordered quartiles, exact interpolation, null-skip") {
    val rows = Curation.scoreQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    var totalScored = 0L
    rows.foreach { r =>
      val (mn, p25, p50, p75, mx) = (r.getAs[Long]("min_score").toDouble,
        r.getAs[Double]("p25"), r.getAs[Double]("p50"),
        r.getAs[Double]("p75"), r.getAs[Long]("max_score").toDouble)
      assert(mn <= p25 && p25 <= p50 && p50 <= p75 && p75 <= mx)
      // interpolated quartiles of integer scores are exact quarter units
      Seq(p25, p50, p75).foreach(p => assert(p * 4 == math.rint(p * 4)))
      totalScored += r.getAs[Long]("n_scored")
    }
    // every non-null-text doc is scored exactly once across sources
    val expected = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).count()
    assert(totalScored == expected)
  }

  test("quality top-k: k best per source by exact milli-score, deterministic ties") {
    val rows = Curation.qualityTopK(spark, sf).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    val srcCounts = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet == srcCounts.keySet)
    bySrc.foreach { case (src, rs) =>
      assert(rs.length == math.min(Curation.qualityTopN.toLong, srcCounts(src)))
      val byRank = rs.sortBy(_.getAs[Int]("qrank"))
      assert(byRank.map(_.getAs[Int]("qrank")).toSeq == (1 to rs.length))
      val scores = byRank.map(_.getAs[Long]("score_milli"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"$src not score-ranked")
    }
    // rank 1 really is the per-source max of the q66 score
    val top1 = rows.filter(_.getAs[Int]("qrank") == 1)
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("score_milli")).toMap
    val trueMax = Curation.qualityModelOf(graft.Tables.documents(spark, sf))
      .join(graft.Tables.documents(spark, sf).select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source")).agg(max(col("score_milli")).as("m")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("m")).toMap
    assert(top1 == trueMax)
  }

  test("corpus diff: statuses partition exactly along the watermarks and planted edits") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("text"))).toMap
    val maxId = docs.keys.max
    val (wm80, wm20) = (maxId * 4 / 5, maxId / 5)
    val rows = Curation.corpusDiff(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.keys.foreach { id =>
      val expected =
        if (id <= wm20) Some("removed")
        else if (id > wm80) Some("added")
        else if (id % Curation.snapshotEditMod == 0 &&
          docs(id).exists(t => t.toUpperCase != t)) Some("changed")
        else None // unchanged rows never leave the join
      assert(rows.get(id) == expected, s"doc $id: ${rows.get(id)} vs $expected")
    }
    assert(rows.keySet.subsetOf(docs.keySet))
  }

  test("corpus filter stats roll up to the corpus size") {
    val total = graft.Tables.documents(spark, sf).count()
    val stats = Curation.corpusFilterStats(spark, sf).collect()
    assert(stats.map(_.getAs[Long]("n_docs")).sum == total)
    // the fixture corpus has no exact-duplicate texts (q32: all
    // n_copies = 1), but near-dups and quality drops must both fire
    val verdicts = stats.map(_.getAs[String]("verdict")).toSet
    assert(verdicts.contains("kept") && verdicts.contains("near_dup") &&
      verdicts.contains("low_quality"))
  }
}
