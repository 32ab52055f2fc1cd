package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The session-extension surface: SQL functions + the HOF-to-native
  * optimizer rewrite, activated through the standard
  * `withExtensions` / `spark.sql.extensions` mechanism.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  /** A session WITH GraftExtensions installed. getOrCreate() returns
    * any existing default session (ignoring withExtensions), so the
    * default is cleared first and restored after; the underlying
    * SparkContext is shared — extensions are session-level state.
    */
  private def withExtendedSession[A](body: SparkSession => A): A = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      body(s)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("native expressions are callable from SQL") {
    withExtendedSession { s =>
      val r = s.sql(
        """SELECT
          |  dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS dp,
          |  sum_squares(array(3.0D, 4.0D)) AS ss,
          |  count_in(array('the', 'fox', 'the'), 'the', 'a') AS ci,
          |  iceberg_bucket_hash(34L) AS bh
          |""".stripMargin).head()
      assert(r.getDouble(0) == 32.0)
      assert(r.getDouble(1) == 25.0)
      assert(r.getInt(2) == 2)
      // Iceberg spec test vector: bucket hash of long 34 is 2017239379
      assert(r.getInt(3) == 2017239379)
    }
  }

  test("the optimizer rewrites the aggregate(zip_with(...)) idiom to the native DotProduct") {
    withExtendedSession { s =>
      // non-constant input (range-derived) so constant folding can't
      // collapse the plan to a LocalRelation before we inspect it
      val df = s.range(2)
        .select(array(col("id").cast("double") + 1.0, lit(2.0)).as("a"),
          array(lit(3.0), lit(4.0)).as("b"))
        .select(aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _).as("dp"))
      assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("dotproduct"),
        s"rule did not fire:\n${df.queryExecution.optimizedPlan}")
      assert(df.collect().map(_.getDouble(0)).sorted.toSeq == Seq(11.0, 14.0))
    }
  }

  test("the rewrite does not fire on shapes with different semantics") {
    withExtendedSession { s =>
      // non-zero init: NOT a plain dot product — must stay a HOF aggregate
      val df = s.range(1)
        .select(array(col("id").cast("double") + 1.0, lit(2.0)).as("a"),
          array(lit(3.0), lit(4.0)).as("b"))
        .select(aggregate(zip_with(col("a"), col("b"), _ * _), lit(1.0), _ + _).as("x"))
      assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("dotproduct"))
      assert(df.head().getDouble(0) == 12.0)
    }
  }
}
