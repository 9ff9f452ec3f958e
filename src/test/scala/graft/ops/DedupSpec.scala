package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("minhash LSH surfaces the planted near-duplicates") {
    val pairs = Dedup.minhashLsh(spark, sf).collect()
    assert(pairs.nonEmpty, "corpus plants ' dup'-suffixed near-copies; LSH must find some")
    // verified pairs really are near-duplicates
    pairs.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.5))
    // and they should essentially all involve a planted ' dup' document
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("text").endsWith(" dup")).select("doc_id").as[Long].collect().toSet
    val hits = pairs.count(r => docs.contains(r.getAs[Long]("doc_a")) ||
      docs.contains(r.getAs[Long]("doc_b")))
    assert(hits >= pairs.length / 2)
  }

  test("minhash candidates do not explode (bucket-bounded pair count)") {
    val n = Dedup.minhashCandidates(graft.Tables.documents(spark, sf)).count()
    // 500 docs -> full cross join would be ~125k pairs; LSH must stay tiny
    assert(n < 2000, s"candidate pairs $n — LSH banding is not pruning")
  }

  test("simhash near-dups are hamming-bounded and overlap minhash findings") {
    val sim = Dedup.simhashDups(spark, sf).collect()
    sim.foreach(r => assert(r.getAs[Int]("hamming") <= 3))
    val simPairs = sim.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val mhPairs = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert((simPairs intersect mhPairs).nonEmpty)
  }

  test("simhash agg formulation is bit-identical to the HOF reference definition") {
    // The corpus-wide simhash (explode + 64 conditional sums in one
    // hash agg) must equal simhashFromHashes (64 aggregate() passes),
    // which remains the reference definition used on per-pair rows.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val th = docs.select(xxhash64(col("text")).as("thash"), col("doc_id"),
      transform(split(lower(trim(col("text"))), "\\s+"), t => xxhash64(t)).as("th"))
    val hof = th.select(col("doc_id"), Dedup.simhashFromHashes(col("th")).as("a"))
    val agg = Dedup.simhashAgg(th).select(col("doc_id"), col("sh").as("b"))
    assert(hof.join(agg, Seq("doc_id")).filter(col("a") =!= col("b")).count() == 0)
    assert(agg.count() == docs.count())
  }

  test("embedding near-dup report ranks closest pairs, flags at threshold") {
    val pairs = Dedup.embeddingDups(spark, sf).collect()
    assert(pairs.nonEmpty && pairs.length <= 100)
    val cosines = pairs.map(_.getAs[Double]("cosine"))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    pairs.foreach(r =>
      assert(r.getAs[Boolean]("is_dup") == (r.getAs[Double]("cosine") >= 0.9)))
  }

  test("hot-bucket guard: 1k identical docs collapse to one representative") {
    val docs = spark.range(1000).select(col("id").as("doc_id"),
      lit("the same boilerplate paragraph repeated across every single document").as("text"))
    // One distinct text => zero representative-level LSH candidates:
    // nothing quadratic ever reaches a bucket.
    assert(Dedup.minhashCandidates(docs).count() == 0)
    assert(Dedup.overflowingBuckets(docs).count() == 0)
    // ...but the reported pair set is still the full true answer.
    val pairs = Dedup.minhashNearDups(docs)
    assert(pairs.count() == 1000L * 999 / 2)
    assert(pairs.filter(col("jaccard") =!= 1.0).count() == 0)
    val sim = Dedup.simhashNearDups(docs)
    assert(sim.count() == 1000L * 999 / 2)
    assert(sim.filter(col("hamming") =!= 0).count() == 0)
  }

  test("hot-bucket guard: exact-dup groups still pair with outside near-dups") {
    // two identical docs + one near-copy + one unrelated
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "completely different words with nothing shared here at all"),
    ).toDF("doc_id", "text")
    val got = Dedup.minhashNearDups(docs, threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // (1,2) within-group; (1,3)/(2,3) via rep-pair expansion
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("containment flags a contained quote that jaccard misses") {
    // doc 1 (4 distinct shingles) is wholly contained in doc 2 (10):
    // containment 1.0 while jaccard is only 4/10 — below the 0.5
    // near-dup bar. The reverse orientation (10 shingles, 4 shared)
    // is 0.4 and must NOT flag.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (3L, "unrelated words occupy this entirely different document here")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentNearDups(docs)
      .select("contained_doc", "container_doc", "containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0)), s"got $got")
    // and the jaccard tier indeed does not reach 0.5 on this pair
    assert(Dedup.minhashNearDups(docs, threshold = 0.5)
      .filter(col("doc_a") === 1L && col("doc_b") === 2L).count() == 0)
  }

  test("q34c recall-vs-truth: per-tier bars hold on the planted corpus") {
    val rows = Dedup.nearDupRecall(spark, sf).collect()
    info(rows.map(r => s"${r.getAs[String]("tier")}: truth=${r.getAs[Long]("n_truth")} " +
      s"found=${r.getAs[Long]("n_found")} reported=${r.getAs[Long]("n_reported")} " +
      s"recall=${r.getAs[Double]("recall")}").mkString("; "))
    val byTier = rows.map(r => r.getAs[String]("tier") -> r).toMap
    assert(byTier.keySet == Set("minhash_lsh", "simhash_hamming", "ngram_blocked"))
    // every tier has located, non-trivial truth to measure against
    rows.foreach(r => assert(r.getAs[Long]("n_truth") > 0,
      s"${r.getAs[String]("tier")}: no truth pairs located — planting convention changed?"))
    // simhash within radius 3 is STRUCTURALLY total: <= 3 differing
    // bits cannot miss all four 16-bit chunks (pigeonhole)
    assert(byTier("simhash_hamming").getAs[Double]("recall") == 1.0)
    // appending " dup" preserves the 4-token block prefix, so the
    // blocked tier's only loss mode (prefix break) never fires here
    assert(byTier("ngram_blocked").getAs[Double]("recall") == 1.0)
    // banded minhash is probabilistic; at the planted similarity the
    // 12x4 banding collides with near-certainty
    assert(byTier("minhash_lsh").getAs[Double]("recall") >= 0.9)
  }

  test("q34b bucket stats run exactly one documents scan (shared sketch input)") {
    // VERDICT r3 #2: the union's two tier branches must both read the
    // one persisted token-hash frame — a second FileScan of documents
    // would mean a full redundant corpus scan at 100 TB.
    Dedup.releaseSketchCaches()
    val df = Dedup.lshBucketStats(spark, sf)
    df.collect()
    val scans = deepDocumentScans(df.queryExecution.executedPlan)
    assert(scans == 1, s"expected exactly 1 documents FileScan, found $scans")
    Dedup.releaseSketchCaches()
  }

  /** Count FileScans of documents.parquet reachable from `root`,
    * descending through AQE stages and into each DISTINCT cached
    * relation's plan once (a relation materializes once, so its inner
    * scan runs once no matter how many branches read the cache). */
  private def deepDocumentScans(root: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    var n = 0
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case r: ReusedExchangeExec    => walk(r.child)
      case m: InMemoryTableScanExec =>
        // key on the shared cacheBuilder: InMemoryRelation is
        // re-instanced (fresh output attrs) per plan occurrence, but
        // all occurrences of one cache share the builder and its
        // materialized buffers — the inner scan runs once per BUILDER
        if (seen.add(m.relation.cacheBuilder)) walk(m.relation.cachedPlan)
      case s: FileSourceScanExec =>
        if (s.relation.location.rootPaths.exists(_.toString.contains("documents"))) n += 1
      case other => other.children.foreach(walk)
    }
    walk(root)
    n
  }

  test("dupKeepers: transitive closure assigns the min id across chains") {
    val docs = (1L to 6L).toDF("doc_id")
    // chain 1-2-3 (no direct 1-3 edge), pair 4-5, singleton 6
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = Dedup.dupKeepers(docs, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("dupKeepers property: matches union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n), rnd.nextInt(n)))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b).toLong, math.max(a, b).toLong) }
        .distinct
      // reference union-find; attaching the larger root under the
      // smaller keeps every root the component minimum
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val got = Dedup.dupKeepers(
          (0L until n).toDF("doc_id"), edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial: distributed CC != union-find")
    }
  }

  test("dupKeepers under a reliable checkpoint dir: path graph (diameter 50) " +
       "converges in ~diameter rounds with identical labels") {
    val sc = spark.sparkContext
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck").toString
    val prevDir = sc.getCheckpointDir
    sc.setCheckpointDir(ckDir)
    try {
      val n = 51 // path 0-1-2-...-50: worst-case diameter for min-label spread
      val docs = (0L until n).toDF("doc_id")
      val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val got = Dedup.dupKeepers(docs, pairs, maxIter = 60)
        .as[(Long, Long)].collect().toMap
      assert(got == (0L until n).map(_ -> 0L).toMap,
        "reliable-checkpoint path must produce the same closure")
      // label 0 travels one hop per round: rounds tracks diameter
      // (+1 fixpoint-detection round), not some quadratic blow-up
      val rounds = Dedup.lastPropagationRounds
      assert(rounds >= 50 && rounds <= 52, s"rounds=$rounds should track diameter 50")
      // reliable snapshots actually landed in the checkpoint dir
      val ckFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(ckFiles > 0, "expected reliable checkpoint files on disk")
      // ADVICE r3 retention: superseded round snapshots are deleted as
      // the loop advances — after 51 rounds the run dir holds exactly
      // {edges, labels-<final>}, not 52 accumulated label snapshots.
      // setCheckpointDir nests a session UUID dir; walk to the run dir
      val runRoot = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        try s.filter(p => java.nio.file.Files.isDirectory(p) &&
            p.getFileName.toString.startsWith("dupkeepers-"))
          .map[java.io.File](_.toFile).toArray(new Array[java.io.File](_))
        finally s.close()
      }
      assert(runRoot.length == 1, s"expected one dupkeepers run dir, got ${runRoot.length}")
      val snaps = runRoot.head.listFiles().filter(_.isDirectory).map(_.getName).sorted
      assert(snaps.count(_.startsWith("labels-")) == 1,
        s"superseded label snapshots were retained: ${snaps.mkString(",")}")
      assert(snaps.contains("edges"), s"edges snapshot missing: ${snaps.mkString(",")}")
      // the returned frame stays readable off the retained snapshot
      assert(got.size == n)
    } finally {
      prevDir match {
        case Some(d) => sc.setCheckpointDir(d)
        case None => sc.setCheckpointDir(null)
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckDir))
    }
  }

  test("dupKeepers propagation uses one action per round (observe-folded convergence)") {
    // Count Dataset ACTIONS (QueryExecutionListener fires once per
    // withAction), which is AQE-job-count-proof: the old shape ran 2
    // actions per round (checkpoint + convergence count), the folded
    // shape runs exactly 1 (the checkpoint, with observe riding it).
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        actions.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val docs = (1L to 6L).toDF("doc_id")
      val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
      Dedup.dupKeepers(docs, pairs)
      Thread.sleep(1000) // listener delivery is async
      val rounds = Dedup.lastPropagationRounds
      assert(rounds > 0)
      assert(actions.get == 2 + rounds,
        s"actions=${actions.get} for rounds=$rounds: expected 2 setup checkpoints + 1/round")
    } finally spark.listenerManager.unregister(listener)
  }

  test("incremental near-dups pair the delta against the corpus only") {
    val rows = Dedup.ngramJaccardIncremental(spark, sf).collect()
    val maxId = graft.Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.max("doc_id")).head().getLong(0)
    val wm = maxId * 4 / 5
    rows.foreach { r =>
      assert(r.getLong(0) > wm, "new_doc must be in the delta")
      assert(r.getLong(1) <= wm, "old_doc must be in the standing corpus")
      assert(r.getDouble(2) >= 0.5)
    }
    // the incremental answer is exactly the full answer restricted to
    // delta-corpus pairs (no pair lost by the split)
    val full = Dedup.ngramJaccardBlocked(spark, sf)
      .filter(col("jaccard") >= 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a > wm) != (b > wm) }
      .map { case (a, b) => (math.max(a, b), math.min(a, b)) }.toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == full)
  }

  test("q36b keepers agree with q36 pairs at >= 0.5") {
    val keepers = Dedup.ngramDupKeepers(spark, sf)
    val merged = keepers.filter(col("doc_id") =!= col("keeper")).count()
    val strongPairs = Dedup.ngramJaccardBlocked(spark, sf)
      .filter(col("jaccard") >= 0.5).count()
    // every strong pair merges at least its larger member into a keeper
    assert(merged > 0 && merged <= strongPairs)
  }

  test("bucket stats report per-tier health; healthy corpus has zero overflow") {
    val rows = Dedup.lshBucketStats(spark, sf).collect()
    assert(rows.map(_.getAs[String]("tier")).toSeq ==
      Seq("minhash_bands", "simhash_chunks"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_buckets") > 0)
      assert(r.getAs[Long]("n_overflow_dropped") == 0)
      assert(r.getAs[Long]("max_bucket") <= Dedup.bucketCap)
    }
  }

  test("bucket cap keeps the lowest ids and drops overflow deterministically") {
    val df = spark.range(30).select(lit(0).as("k"), col("id").as("doc_id"))
    val kept = Dedup.capBuckets(df, Seq("k"), "doc_id", cap = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (0L until 10L).toSet)
  }

  test("shingles: distinct 3-gram windows, short docs degrade gracefully") {
    val df = Seq("a b c d", "a b", "x").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh"))
    val got = df.as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b"))
    assert(got(2) == Seq("x"))
  }

  test("edit-distance tier: exact distances within blocks, 0.8-similarity gate") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      1L -> base,
      2L -> base.replace("epsilon", "epsilom"),        // 1 substitution
      3L -> base.replace(" zeta", ""),                 // 5 deletions
      4L -> ("omega " + base),                          // different 4-token prefix
      5L -> base.replaceAll("[aeiou]", "x")            // same prefix? no — first token changes
    ).toDF("doc_id", "text")
    val pairs = Dedup.editDistanceNearDups(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("edit_distance"), r.getAs[Double]("edit_similarity"))).toMap
    // in-block near-identical pairs found with exact Levenshtein counts
    assert(pairs((1L, 2L))._1 == 1L)
    assert(pairs((1L, 3L))._1 == 5L)
    assert(pairs((2L, 3L))._1 == 6L)
    // a prefix-shifted copy never pairs: the block key is the first
    // four tokens (the documented tier contract — mid-document edits
    // pair, head edits belong to the sketch tiers)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // the vowel-mangled doc shares no block either (first token changed)
    assert(!pairs.keySet.exists { case (a, b) => a == 5L || b == 5L })
    // similarity is 1 - dist/max(len)
    val (d12, s12) = pairs((1L, 2L))
    assert(math.abs(s12 - (1.0 - d12.toDouble / base.length)) < 1e-12)
  }

  test("edit-distance tier: the 20% gate drops dissimilar same-block pairs " +
    "and the length band is lossless") {
    val prefix = "common head tokens here "
    val docs = Seq(
      1L -> (prefix + ("x" * 100)),
      2L -> (prefix + ("y" * 100)),   // same block, distance 100 > 20% of 124
      3L -> (prefix + ("x" * 99) + "z") // 1 edit from doc 1
    ).toDF("doc_id", "text")
    val pairs = Dedup.editDistanceNearDups(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs == Set((1L, 3L)))
    // band losslessness: a pair dropped by the |len| band could never
    // pass the gate — max length gap that survives is cap/5
    val far = Seq(1L -> "a b c d", 2L -> ("a b c d " + ("w " * 300)))
      .toDF("doc_id", "text")
    assert(Dedup.editDistanceNearDups(far).count() == 0)
  }

  test("edit-distance tier caps the DP at the 512-char prefix") {
    // identical beyond the cap, different only after char 512: the
    // bounded-prefix semantics treat them as exact dups (distance 0)
    val head = "shared first four tokens " + ("p" * 600)
    val docs = Seq(1L -> (head + "AAAA"), 2L -> (head + "BBBB")).toDF("doc_id", "text")
    val rows = Dedup.editDistanceNearDups(docs).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("edit_distance") == 0L)
  }

  test("cluster split: zero cross-split near-dup pairs, naive split leaks") {
    val rows = graft.SparkEntry.queries("q133_cluster_split")(
      spark, "/root/testdata/sf0.001").collect()
    val nDocs = graft.Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs, "splits partition the corpus")
    rows.foreach { r =>
      // the defining property: no near-dup pair crosses a split
      assert(r.getAs[Long]("cross_pairs_cluster") == 0L)
      assert(r.getAs[Long]("n_clusters") <= r.getAs[Long]("n_docs"))
    }
    // the audit is only meaningful if the naive split WOULD have
    // leaked on this corpus (planted dups exist at every SF)
    assert(rows.head.getAs[Long]("cross_pairs_naive") > 0L,
      "corpus has no cross-split near-dups under the id split — audit is vacuous")
  }

  test("q145 band histogram reconciles with q36's per-pair jaccards") {
    val sfd = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q145_jaccard_band_histogram")(spark, sfd)
      .collect().map(r => r.getAs[Int]("jaccard_band") -> r.getAs[Long]("n_pairs")).toMap
    assert(rows.nonEmpty)
    // q36 emits every blocked candidate pair with its double jaccard;
    // its exact-integer band must reproduce the histogram
    val pairs = graft.SparkEntry.queries("q36_ngram_jaccard_blocked")(spark, sfd)
      .collect().map(_.getAs[Double]("jaccard"))
    assert(rows.values.sum == pairs.length.toLong)
    // the planted near-dup families concentrate in the top bands
    // (a " dup" suffix costs one trailing shingle, so band 9; an
    // exact-text pair, when one shares a block, lands in 10)
    assert(rows.keySet.max >= 9, s"no near-dup mass in the top bands: $rows")
    assert(rows.keySet.forall(b => b >= 0 && b <= 10))
    // double-side recompute: floor(10*j) only at representable
    // boundaries — use the exact fractions via q36's own arithmetic
    // is not available from the double alone, so check bands within
    // float tolerance: a pair's band is floor(10*j) except ties
    val approx = pairs.map(j => math.min(10, math.floor(10.0 * j + 1e-9).toInt))
      .groupBy(identity).map { case (b, v) => b -> v.length.toLong }
    assert(approx == rows, s"approx $approx vs exact $rows")
  }

  test("q149 pair matrix reconciles with q140's per-family source spans") {
    val sfd = "/root/testdata/sf0.001"
    val pairs = graft.SparkEntry.queries("q149_cross_source_dup_matrix")(spark, sfd)
      .collect()
    // families spanning k sources contribute C(k,2) pair memberships
    val spans = graft.SparkEntry.queries("q140_dedup_weights")(spark, sfd)
      .collect().map(_.getAs[Long]("n_sources"))
    val wantTotal = spans.map(k => k * (k - 1) / 2).sum
    assert(pairs.map(_.getAs[Long]("n_shared_families")).sum == wantTotal,
      "pair-membership mass must equal sum of C(n_sources, 2) over families")
    pairs.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      assert(r.getAs[Long]("n_docs_involved") >= 2 * r.getAs[Long]("n_shared_families"))
    }
    // the ranking is total: (count desc, src_a, src_b)
    val keys = pairs.map(r => (-r.getAs[Long]("n_shared_families"),
      r.getAs[String]("src_a"), r.getAs[String]("src_b"))).toSeq
    assert(keys == keys.sorted)
  }

  test("q140 weights reconcile with the keeper closure, q103 histogram, and corpus totals") {
    val sfd = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q140_dedup_weights")(spark, sfd).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sfd)
    val nDocs = docs.count()
    val nChars = docs.agg(sum(col("n_chars"))).head().getLong(0)
    // weights partition the corpus: every doc is in exactly one family
    assert(rows.map(_.getAs[Long]("weight")).sum == nDocs)
    assert(rows.map(_.getAs[Long]("family_chars")).sum == nChars)
    rows.foreach { r =>
      assert(r.getAs[Long]("weight") >= 1L)
      assert(r.getAs[Long]("n_sources") >= 1L &&
        r.getAs[Long]("n_sources") <= r.getAs[Long]("weight"))
      assert(r.getAs[Long]("chars_saved") <= r.getAs[Long]("family_chars"))
    }
    // the weight distribution IS q103's cluster-size histogram
    val hist = graft.SparkEntry.queries("q103_dup_cluster_histogram")(spark, sfd)
      .collect().map(r => r.getAs[Long]("cluster_size") -> r.getAs[Long]("n_clusters")).toMap
    val fromWeights = rows.groupBy(_.getAs[Long]("weight"))
      .map { case (w, rs) => w -> rs.length.toLong }
    assert(fromWeights == hist, s"weights $fromWeights vs q103 $hist")
  }

  test("allPairsJaccard is COMPLETE: equals the brute-force tau-Jaccard set") {
    val docs = graft.Tables.documents(spark, sf)
    val got = Dedup.allPairsJaccard(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"),
        r.getAs[Long]("jaccard_ppm"))).toSet
    // brute force: every unordered pair, exact shingle Jaccard >= 0.5
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val brute = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("n_inter"),
        size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("n_union"))
      .filter(col("n_inter") * 100 >= col("n_union") * 50)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"),
        expr("n_inter * 1000000 div n_union").as("jaccard_ppm"))
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"),
        r.getAs[Long]("jaccard_ppm"))).toSet
    assert(brute.nonEmpty, "the planted corpus must contain tau-similar pairs")
    assert(got == brute,
      s"missed=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
  }

  test("allPairsJaccard finds a pair the q36 first-4-token block cannot") {
    // identical 10-token docs except the FIRST word: shingle Jaccard
    // 7/9 >= 0.5, but the q36 block key (first 4 tokens) differs, so
    // the heuristic block never pairs them - the exact tier must
    val docs = Seq(
      (1L, "alpha b c d e f g h i j"),
      (2L, "zeta b c d e f g h i j")).toDF("doc_id", "text")
    val got = Dedup.allPairsJaccard(docs).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("doc_a") == 1L && got.head.getAs[Long]("doc_b") == 2L)
    assert(got.head.getAs[Long]("n_inter") == 7L && got.head.getAs[Long]("n_union") == 9L)
    assert(got.head.getAs[Long]("jaccard_ppm") == 777777L)
    // q36 on the same two docs: zero pairs (different first-4 blocks)
    val fp = docs.select(
      md5(array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 4), " ")).as("fp"))
      .distinct().count()
    assert(fp == 2L, "the two docs must land in different q36 blocks")
  }

  test("withSketchScope releases ONLY its own frames, never the global queue (ADVICE r12)") {
    Dedup.releaseSketchCaches() // clean slate
    // a concurrent query's cache, registered globally
    val global = Dedup.materializedSketch(spark.range(10).toDF("id"))
    var scoped: org.apache.spark.sql.DataFrame = null
    Dedup.withSketchScope {
      scoped = Dedup.materializedSketch(spark.range(5).toDF("id"))
      assert(scoped.storageLevel.useMemory, "scoped frame not persisted inside the scope")
    }
    assert(!scoped.storageLevel.useMemory,
      "scope exit did not release the frame it registered")
    assert(global.storageLevel.useMemory,
      "scope exit drained the GLOBAL queue — the two-consumer persistence " +
        "other in-flight queries rely on")
    Dedup.releaseSketchCaches()
    assert(!global.storageLevel.useMemory, "global release missed the frame")
  }
}
