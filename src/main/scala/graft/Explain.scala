package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the headline queries — the review
  * loop for plan quality: PushedFilters reaching the parquet scan, broadcast
  * joins on the small sides, WholeStageCodegen spans covering the transform,
  * no accidental shuffles. Usage: runMain graft.Explain [sfDir] [names...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("full_pipeline", "w_tumbling", "w_tumbling_salted_hll",
        "cep_sequence", "j_interval", "dedup_minhash_lsh",
        "dedup_simhash_pairs", "sim_bruteforce_topk", "sim_ivf_multiprobe",
        "td_pack_sequences")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    // V2 graft-table capabilities (table machinery, not SparkEntry
    // queries): a throwaway partitioned table demonstrates the
    // storage-partitioned aggregation (no exchange), the metadata-only
    // aggregate, and file pruning — the plans a reviewer should audit.
    if (args.length <= 1) {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val t = new graft.table.GraftTable(
        java.nio.file.Files.createTempDirectory("graft_explain").toString)
      new graft.table.ExactlyOnceSink(t, partitionBy = Seq("codec")).write(
        (0 until 3000).map(i => (i.toLong, Seq("wav", "opus", "flac")(i % 3)))
          .toDF("id", "codec"), 0L)
      val read = spark.read
        .format(classOf[graft.table.GraftSourceProvider].getName).load(t.root)
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      println("\n========== table: storage-partitioned groupBy (expect NO exchange) ==========")
      read.groupBy("codec").count().explain("formatted")
      println("\n========== table: metadata-only global aggregate ==========")
      read.agg(count(lit(1)), min("id"), max("id")).explain("formatted")
      println("\n========== table: partition-pruned equality scan ==========")
      read.filter(col("codec") === "wav").explain("formatted")
    }
    spark.stop()
  }
}
