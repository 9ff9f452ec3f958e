package graft.ops

import graft.SparkTestBase
import graft.streaming.StreamingCc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming incremental connected-components pipeline (17th):
  * streamed label deltas fold to the from-scratch census, deltas carry
  * only changed/new nodes, and redelivery is a no-op. */
class StreamingCcSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def censusOf(labels: DataFrame): Set[(Long, Long, Long)] =
    labels.groupBy(col("comp")).agg(count(lit(1)).as("comp_size"))
      .groupBy(col("comp_size"))
      .agg(count(lit(1)).as("n_components"), min(col("comp")).as("witness"))
      .as[(Long, Long, Long)].collect().toSet

  // from-scratch reference: support-2 edges of the full item set,
  // labeled by the same propagation operator (the DuckDB twin of q211
  // already cross-checks the operator against a recursive closure)
  private def recompute(items: DataFrame): Set[(Long, Long, Long)] = {
    val edges = Graphs.pairCounts(items).filter(col("n_ab") >= 2)
      .select(col("part_a").as("doc_a"), col("part_b").as("doc_b"))
    val nodes = edges.select(col("doc_a").as("doc_id"))
      .unionByName(edges.select(col("doc_b").as("doc_id"))).distinct()
    censusOf(Dedup.dupKeepers(nodes, edges)
      .select(col("doc_id"), col("keeper").as("comp")))
  }

  test("streamed label state equals the from-scratch census; deltas are delta-sized; replay is a no-op") {
    val items = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
    val root = tmpDir("scc")
    val itemsDir = s"$root/items"
    val pairPath = s"$root/pairs"
    val labelPath = s"$root/labels"

    // two order-disjoint waves (the pipeline's batch contract)
    val half1 = items.filter(col("l_orderkey") % 2 === 0)
    val half2 = items.filter(col("l_orderkey") % 2 === 1)
    half1.write.parquet(itemsDir)
    StreamingCc.start(spark, itemsDir, pairPath, labelPath, s"$root/ckpt")
      .awaitTermination()
    half2.write.mode("append").parquet(itemsDir)
    StreamingCc.start(spark, itemsDir, pairPath, labelPath, s"$root/ckpt")
      .awaitTermination()

    val live = StreamingCc.labels(spark, labelPath)
      .select(col("doc_id"), col("comp"))
    assert(censusOf(live) == recompute(items),
      "streamed census diverged from the from-scratch recompute")

    // the second round's delta holds only changed/new nodes — strictly
    // fewer rows than the full label set (an untouched component never
    // writes a byte)
    val round1 = spark.read.parquet(labelPath)
      .filter(col("ingest_round") === 1L).count()
    assert(round1 < live.count(),
      s"round 1 delta ($round1 rows) is not delta-sized vs ${live.count()} labels")

    // at-least-once: re-deliver batch 1 by hand — both rounds replaced
    StreamingCc.processBatch(half2, 1L, pairPath, labelPath)
    assert(censusOf(StreamingCc.labels(spark, labelPath)
      .select(col("doc_id"), col("comp"))) == recompute(items),
      "redelivery changed the census")
    // and the pair store still equals the full support table
    val support = new CoPairStore(spark, pairPath).state()
      .as[(Long, Long, Long)].collect().toSet
    val direct = Graphs.pairCounts(items)
      .as[(Long, Long, Long)].collect().toSet
    assert(support == direct, "pair-support state diverged after replay")
  }

  test("a batch re-carrying a prior round's order fails loudly BEFORE state advances (ADVICE r12)") {
    val items = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
    val root = tmpDir("scc-guard")
    val pairPath = s"$root/pairs"
    val labelPath = s"$root/labels"
    val half1 = items.filter(col("l_orderkey") % 2 === 0)
    StreamingCc.processBatch(half1, 0L, pairPath, labelPath)
    val before = new CoPairStore(spark, pairPath).state()
      .as[(Long, Long, Long)].collect().toSet
    // batch 1 re-carries part of an order batch 0 committed — the
    // reader-side file-split / source re-emission hazard
    val splitWave = items.filter(col("l_orderkey") % 4 === 0)
    val err = intercept[IllegalArgumentException] {
      StreamingCc.processBatch(splitWave, 1L, pairPath, labelPath)
    }
    assert(err.getMessage.contains("order-disjointness violated"),
      s"unexpected failure message: ${err.getMessage}")
    // the guard fired before any commit: pair state unchanged, and no
    // round-1 partition landed in either store
    assert(new CoPairStore(spark, pairPath).state()
      .as[(Long, Long, Long)].collect().toSet == before,
      "a rejected batch advanced the pair state")
    assert(spark.read.parquet(pairPath)
      .filter(col("ingest_round") === 1L).isEmpty,
      "a rejected batch committed a pair round")
    // replaying round 0 itself stays legal (beforeRound excludes it)
    StreamingCc.processBatch(half1, 0L, pairPath, labelPath)
    assert(new CoPairStore(spark, pairPath).state()
      .as[(Long, Long, Long)].collect().toSet == before,
      "round replay changed the pair state")
  }
}
