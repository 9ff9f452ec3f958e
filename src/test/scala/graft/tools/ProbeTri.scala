package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: debug the GraphsSpec triangle brute force. */
object ProbeTri {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val items = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"items=${items.length}")
    val pairInstances = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }
    println(s"pairInstances=${pairInstances.size}")
    val grouped = pairInstances.groupBy(identity)
    println(s"distinctPairs=${grouped.size}")
    val hist = grouped.values.map(_.size).groupBy(identity).view
      .mapValues(_.size).toMap
    println(s"multiplicityHist=${hist.toSeq.sortBy(_._1).take(10)}")
    val edges = grouped.collect { case (e, es) if es.size >= 2 => e }.toSet
    println(s"support2Edges=${edges.size}")
    spark.stop()
  }
}
