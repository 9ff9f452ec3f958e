package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained BM25 index (VERDICT r12 #1): store algebra
  * (append/retract/replay/compaction with the bucket layout), the
  * driver/column bucket-hash parity the partition pruning rests on,
  * index-vs-scan serving parity, and the steady-state plan shape —
  * no full-corpus tokenization, pruned postings partitions. */
class PostingsIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def postingsSet(df: DataFrame): Set[(String, Long, Long, Long)] =
    df.select(col("term"), col("doc_id"), col("tf"), col("dl"))
      .as[(String, Long, Long, Long)].collect().toSet

  test("driver-side bucketOf matches the column expression for every corpus term") {
    val buckets = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("term"))
      .distinct()
      .select(col("term"), PostingsIndex.bucketCol(col("term")).as("b"))
      .as[(String, Long)].collect()
    assert(buckets.nonEmpty)
    buckets.foreach { case (t, b) =>
      assert(PostingsIndex.bucketOf(t) == b,
        s"bucket drift for term '$t': driver ${PostingsIndex.bucketOf(t)} vs column $b")
    }
  }

  test("store built by waves equals the one-shot postings; replay is idempotent; retraction annihilates") {
    val docs = graft.Tables.documents(spark, sf)
    val full = postingsSet(PostingsIndex.postingsOf(docs))
    val path = tmpDir("pidx") + "/postings"
    val st = new PostingsStore(spark, path)
    st.appendRound(docs.filter(col("doc_id") % 3 === 0), round = 0L)
    st.appendRound(docs.filter(col("doc_id") % 3 === 1), round = 1L)
    st.appendRound(docs.filter(col("doc_id") % 3 === 2), round = 2L)
    assert(postingsSet(st.state()) == full,
      "wave-built postings diverged from the one-shot build")
    // replay: a re-delivered round replaces itself byte-for-byte
    st.appendRound(docs.filter(col("doc_id") % 3 === 1), round = 1L)
    assert(postingsSet(st.state()) == full, "round replay changed the postings")
    // retraction: removing wave 2 restores the two-wave state exactly,
    // INCLUDING stored row counts (zeros annihilate, no tombstones)
    val twoWaves = postingsSet(PostingsIndex.postingsOf(
      docs.filter(col("doc_id") % 3 < 2)))
    st.appendRound(docs.filter(col("doc_id") % 3 === 2), round = 3L, negate = true)
    assert(postingsSet(st.state()) == twoWaves,
      "retraction did not restore the pre-wave postings")
    assert(st.state().count() == twoWaves.size,
      "retraction left tombstone rows in the merged state")
    // stats store: same lifecycle, O(1) rows
    val sp = tmpDir("pidx") + "/stats"
    val ss = new CorpusStatsStore(spark, sp)
    ss.appendRound(docs.filter(col("doc_id") % 3 < 2), round = 0L)
    ss.appendRound(docs.filter(col("doc_id") % 3 === 2), round = 1L)
    ss.appendRound(docs.filter(col("doc_id") % 3 === 2), round = 2L, negate = true)
    val got = ss.state().as[(Long, Long)].head()
    val want = PostingsIndex.statsOf(docs.filter(col("doc_id") % 3 < 2))
      .as[(Long, Long)].head()
    assert(got == want, "signed stats fold diverged from the recompute")
  }

  test("a mixed delete+re-add batch commits the net change and serves the new text") {
    val v1 = Seq((1L, "alpha beta beta"), (2L, "gamma alpha")).toDF("doc_id", "text")
    val path = tmpDir("pidx-upd") + "/postings"
    val st = new PostingsStore(spark, path)
    st.appendRound(v1, round = 0L)
    // doc 1 is updated: retract old text, add new, ONE batch
    val inst = Seq((1L, -1L, "alpha beta beta"), (1L, 1L, "alpha delta"))
      .toDF("doc_id", "sign", "text")
    st.appendSignedRound(inst, round = 1L)
    val want = postingsSet(PostingsIndex.postingsOf(
      Seq((1L, "alpha delta"), (2L, "gamma alpha")).toDF("doc_id", "text")))
    assert(postingsSet(st.state()) == want,
      "mixed-batch net fold diverged from the post-update recompute")
    // and the net round is delta-sized: only doc 1's changed terms
    val round1 = spark.read.parquet(path).filter(col("ingest_round") === 1L)
    assert(round1.select("doc_id").distinct().as[Long].collect().toSet == Set(1L),
      "the net round leaked rows for untouched documents")
  }

  test("auto-compaction folds rounds read-equivalently and PRESERVES the bucket layout") {
    val docs = graft.Tables.documents(spark, sf)
    val path = tmpDir("pidx-compact") + "/postings"
    val st = new PostingsStore(spark, path) {
      override protected def autoCompactThreshold: Int = 2
    }
    (0L to 5L).foreach(r => st.appendRound(docs.filter(col("doc_id") % 6 === r), r))
    assert(postingsSet(st.state()) == postingsSet(PostingsIndex.postingsOf(docs)),
      "compacted postings diverged from the recompute")
    // the folded partition keeps term_bucket subdirs (the pruning layout)
    val fs = new java.io.File(path)
    val rounds = fs.listFiles().filter(_.getName.startsWith("ingest_round="))
    assert(rounds.nonEmpty)
    rounds.foreach { r =>
      val buckets = r.listFiles().filter(_.getName.startsWith("term_bucket="))
      assert(buckets.nonEmpty, s"round ${r.getName} lost its bucket layout")
    }
  }

  test("stateForTerms equals the term-filtered full state and PRUNES to the terms' buckets") {
    val docs = graft.Tables.documents(spark, sf)
    val path = tmpDir("pidx-prune") + "/postings"
    val st = new PostingsStore(spark, path)
    st.appendRound(docs, round = 0L)
    val terms = graft.ops.TextAnalysis.bm25Terms
    val got = st.stateForTerms(terms)
    assert(postingsSet(got) ==
      postingsSet(st.state().filter(col("term").isin(terms: _*))),
      "pruned read diverged from the filtered full state")
    // plan shape: the postings scan carries PARTITION filters on
    // term_bucket (literal buckets — pruning, not a data filter)
    val scans = collectScans(got)
    val postScans = scans.filter(_._1.contains("pidx-prune"))
    assert(postScans.nonEmpty, s"no postings scan in: ${scans.map(_._1)}")
    postScans.foreach { case (_, part, _) =>
      assert(part.contains("term_bucket"),
        s"postings scan not partition-pruned on term_bucket: $part")
    }
  }

  test("q210/q213 index serving equals the scan spelling bit for bit") {
    val docs = graft.Tables.documents(spark, sf)
    val terms = graft.ops.TextAnalysis.bm25Terms
    val idx = graft.ops.TextAnalysis.bm25Of(spark, sf, terms).collect().toSeq
    val scan = graft.ops.TextAnalysis.bm25ScanOf(docs, terms).collect().toSeq
    Dedup.releaseSketchCaches()
    assert(idx == scan, s"index-served BM25 diverged:\nidx  $idx\nscan $scan")
    val qs = graft.ops.TextAnalysis.bm25Queries
    val idxB = graft.ops.TextAnalysis.bm25BatchOf(spark, sf, qs).collect().toSeq
    val scanB = graft.ops.TextAnalysis.bm25BatchScanOf(docs, qs).collect().toSeq
    Dedup.releaseSketchCaches()
    assert(idxB == scanB, "index-served batch BM25 diverged from the scan spelling")
  }

  test("steady-state q210 plan: NO full-corpus tokenization — every documents scan is delta-pruned") {
    graft.ops.TextAnalysis.bm25Of(spark, sf, graft.ops.TextAnalysis.bm25Terms)
      .collect() // warm: index committed
    Dedup.releaseSketchCaches()
    val q = graft.ops.TextAnalysis.bm25Of(spark, sf, graft.ops.TextAnalysis.bm25Terms)
    q.collect() // materialize (AQE final plan + cached qp populated)
    val scans = collectScans(q)
    Dedup.releaseSketchCaches()
    val docScans = scans.filter(_._1.contains("documents.parquet"))
    assert(docScans.nonEmpty, "expected delta scans of documents")
    docScans.foreach { case (p, _, pushed) =>
      assert(pushed.contains("GreaterThan(doc_id"),
        s"a documents scan is NOT delta-bounded (full-corpus tokenization): $p -> $pushed")
    }
    // and the index is actually in the plan, partition-pruned
    val postScans = scans.filter(t => t._1.contains("graft-bm25-index"))
    assert(postScans.nonEmpty, s"postings store missing from the plan: ${scans.map(_._1)}")
    postScans.filter(_._1.contains("/postings")).foreach { case (_, part, _) =>
      assert(part.contains("term_bucket"),
        s"postings scan not partition-pruned: $part")
    }
  }

  test("q217/q218 index-as-data audits equal direct postings recomputes") {
    val docs = graft.Tables.documents(spark, sf)
    // q217: df/total_tf per term off the index == one-shot postings
    val got = PostingsIndex.indexDfTopK(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    val want = PostingsIndex.postingsOf(docs)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
      .orderBy(col("df").desc, col("term")).limit(20)
      .as[(String, Long, Long)].collect().toSeq
    Dedup.releaseSketchCaches()
    assert(got == want, "index-served df top-k diverged from the one-shot build")
    // q218: growth columns are internally consistent and base <= live
    val growth = PostingsIndex.indexVocabGrowth(spark, sf).collect()
    Dedup.releaseSketchCaches()
    assert(growth.nonEmpty)
    growth.foreach { r =>
      assert(r.getAs[Long]("df_growth") ==
        r.getAs[Long]("df_live") - r.getAs[Long]("df_base"))
      assert(r.getAs[Long]("df_base") <= r.getAs[Long]("df_live"),
        "append-only lifecycle cannot shrink df")
    }
  }

  test("q221 erasure: negate-round index serving equals the redacted full rebuild bit for bit; erased docs leave the state") {
    val sf = "/root/testdata/sf0.001"
    val erased = Privacy.erasedDocs(spark, sf)
    val surviving = Privacy.survivingDocs(spark, sf)
    assert(erased.count() > 0L, "fixture should erase someone's documents")

    // the PrivacySpec negate-parity discipline on the retrieval state:
    // index-served post-erasure BM25 == the scan spelling over the
    // redacted corpus (an independent rebuild, same algebra)
    val got = PostingsIndex.indexErasure(spark, sf).collect().toSeq
    Dedup.releaseSketchCaches()
    val want = graft.ops.TextAnalysis
      .bm25ScanOf(surviving, graft.ops.TextAnalysis.bm25Terms).collect().toSeq
    Dedup.releaseSketchCaches()
    assert(got == want,
      s"post-erasure index serving diverged from the redacted rebuild:\nidx  $got\nwant $want")

    // and the retraction is PHYSICAL at the merged-state surface: no
    // erased doc survives in the postings fold (df shrank with it)
    val docs = graft.Tables.documents(spark, sf)
    val path = tmpDir("pidx-erase") + "/postings"
    val st = new PostingsStore(spark, path)
    st.appendRound(docs, round = 0L)
    st.appendRound(erased, round = 1L, negate = true)
    val erasedIds = erased.select("doc_id").as[Long].collect().toSet
    val survivors = st.state().select("doc_id").distinct().as[Long].collect().toSet
    assert(erasedIds.intersect(survivors).isEmpty,
      "an erased document still has postings after the negate round")
    assert(postingsSet(st.state()) ==
      postingsSet(PostingsIndex.postingsOf(
        docs.join(erased.select("doc_id"), Seq("doc_id"), "left_anti"))),
      "negate-round postings diverged from a from-scratch redacted build")
  }

  /** (rootPaths, partitionFilters, pushedFilters) of every file scan,
    * including those inside cached (InMemoryRelation) subplans. */
  private def collectScans(df: DataFrame): Seq[(String, String, String)] = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    var out = List.empty[(String, String, String)]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case r: ReusedExchangeExec    => walk(r.child)
      case m: InMemoryTableScanExec => walk(m.relation.cachedPlan)
      case sc: FileSourceScanExec =>
        out ::= ((sc.relation.location.rootPaths.map(_.toString).mkString(","),
          sc.partitionFilters.mkString(","),
          sc.metadata.getOrElse("PushedFilters", "")))
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    out
  }
}
