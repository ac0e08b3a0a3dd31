package graft.table

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.scalatest.funsuite.AnyFunSuite

/** Property harness for the delete-pruning SOUNDNESS contract: for any
  * predicate, a file containing a row where the predicate evaluates TRUE
  * must never be pruned from the rewrite candidates ([[DeletePruning]] +
  * [[FilePrune]]). Three review passes each found a silent-row-retention
  * hole in hand-written cases (attribute-side casts, literal-side casts,
  * float stats domain drift) — this net runs a few hundred randomized
  * predicates with deliberately mismatched literal types over data with
  * nulls, float-rounding canaries, >2^53 longs, and non-BMP strings.
  * Expected matches come from Catalyst itself (one job evaluates every
  * predicate as a boolean column next to input_file_name), so the test
  * can never drift from Spark's own cast/comparison semantics. */
class DeletePruningSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("pruning soundness: a file with a matching row is never pruned") {
    val s = spark
    import s.implicits._
    val t = new GraftTable(Files.createTempDirectory("graft_prune_prop").toString)
    // Awkward values on purpose: float/double rounding canaries
    // (16777217 = 2^24+1, 1.1f), longs beyond double precision (2^53+3),
    // negative extremes, nulls in every column, non-BMP strings.
    val rows: Seq[(java.lang.Integer, java.lang.Long, java.lang.Float, java.lang.Double, String)] = Seq(
      (1, 10L, 1.1f, 1.1d, "alpha"),
      (16777217, 16777217L, 16777216.0f, 16777216.0d, "beta"),
      (-5, 9007199254740995L, -1.1f, -1.1d, "😀 emoji"),
      (Int.MaxValue, Long.MaxValue, Float.MaxValue, Double.MaxValue, ""),
      (Int.MinValue, Long.MinValue, Float.MinValue, -0.0d, "zzé"),
      (null, null, null, null, null),
      (7, 2L, 2.5f, 2.5d, "alpha"),
      (0, 0L, 0.0f, 0.0d, "0"),
      // NaN row: parquet omits (or order-mangles) float stats around NaN —
      // pruning must fall back to a conservative keep for this file
      (3, 3L, Float.NaN, Double.NaN, "nan")
    )
    rows.zipWithIndex.foreach { case (r, i) =>
      t.commit(Seq(r).toDF("i", "l", "f", "d", "s").coalesce(1), i.toLong)
    }
    val df = t.read(s)
    val allFiles = t.manifestsUpTo(t.version).flatMap(t.manifestFiles)
    assert(allFiles.size == rows.size)

    val rnd = new scala.util.Random(42)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))
    // literal pools deliberately cross types vs the column
    val intishLits: Seq[Any] = Seq(1, 10L, 16777217, 16777217L, -5, 7, 0,
      16777216.0f, 16777216.0d, 1.1d, 9007199254740995L, 2147483648L, Int.MaxValue, Long.MinValue)
    val fracLits: Seq[Any] = Seq(1.1f, 1.1d, -1.1f, 2.5d, 16777216.0f, 16777217.0d, 0.0d, -0.0d, 0, 10L,
      Float.NaN, Double.NaN)
    val strLits: Seq[Any] = Seq("alpha", "beta", "😀 emoji", "", "zzé", "nope", "0")
    def litFor(c: String): Any = c match {
      case "i" | "l" => pick(intishLits)
      case "f" | "d" => pick(fracLits)
      case _ => pick(strLits)
    }
    def genConjunct(): Column = {
      val c = pick(Seq("i", "l", "f", "d", "s"))
      pick[Int](0 to 9) match {
        case 0 => col(c) === lit(litFor(c))
        case 1 => col(c) < lit(litFor(c))
        case 2 => col(c) <= lit(litFor(c))
        case 3 => col(c) > lit(litFor(c))
        case 4 => col(c) >= lit(litFor(c))
        case 5 => col(c).isin((1 to 1 + rnd.nextInt(3)).map(_ => litFor(c)): _*)
        case 6 => col(c).isNull
        case 7 => col(c).isNotNull
        case 8 => col(c) <=> lit(litFor(c))
        // `c <=> NULL` is IS NULL semantics — min/max stats say nothing
        // about nulls, so the translator must leave it untranslated (a
        // future edit dropping the null guard would prune files whose
        // only matching rows are NULLs; this case is its tripwire)
        case _ => col(c) <=> lit(null)
      }
    }
    // disjunctions and nested and-inside-or exercise the Or/And/
    // EqualNullSafe translation paths (round 5), not just leaf conjuncts
    def genTerm(): Column = pick[Int](0 to 3) match {
      case 0 | 1 => genConjunct()
      case 2 => genConjunct() || genConjunct()
      case _ => (genConjunct() && genConjunct()) || genConjunct()
    }
    def genPredicate(): Column =
      (1 to 1 + rnd.nextInt(2)).map(_ => genTerm()).reduce(_ && _)

    val preds = Seq.fill(300)(genPredicate())
    // Catalyst evaluates every predicate in ONE pass; TRUE per file is the
    // ground truth the pruning must respect
    val cols = col("_file") +: preds.zipWithIndex.map { case (p, i) =>
      when(p, true).otherwise(false).as(s"p$i")
    }
    val evaluated = df.withColumn("_file", input_file_name())
      .select(cols: _*).collect()
    def canon(path: String): String =
      java.nio.file.Paths.get(path.stripPrefix("file:")).toAbsolutePath.normalize.toString

    var translated = 0
    preds.zipWithIndex.foreach { case (p, i) =>
      val matchingFiles = evaluated.filter(_.getBoolean(i + 1)).map(r => canon(r.getString(0))).toSet
      val cond = DeletePruning.analyzedCondition(df, p)
      val filters = DeletePruning.filtersFor(cond)
      if (filters.nonEmpty) translated += 1
      val kept = allFiles.filter(fi => FilePrune.keep(fi, filters)).map(fi => canon(fi.path)).toSet
      val lost = matchingFiles -- kept
      assert(lost.isEmpty,
        s"predicate #$i [$p] -> filters $filters pruned file(s) with matching rows: $lost")
      // the never-match short-circuit must agree with ground truth too
      if (DeletePruning.neverMatches(cond))
        assert(matchingFiles.isEmpty, s"predicate #$i [$p] declared unsatisfiable but matched")
    }
    // the generator must actually exercise the translator, not just the
    // conservative no-filter path
    assert(translated > 200, s"only $translated/300 predicates translated — generator too weak")
  }
}
