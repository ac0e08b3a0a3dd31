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
    spark.stop()
  }
}
