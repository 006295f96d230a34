package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ops/AsOf backward as-of join: hand cases (match, no-match, inclusive
  * tie, key isolation) + a 500-row randomized equivalence check against a
  * brute-force range-join reference.
  */
class AsOfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("asofJoin: hand case — latest right <= left.ts, inclusive, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 100L, "l-a"),
      (2L, "u1", 205L, "l-b"),
      (3L, "u1", 50L, "l-c"),   // before any right row -> null
      (4L, "u2", 100L, "l-d"),  // u2 has no right rows at all
      (5L, "u3", 200L, "l-e")   // tie: right at exactly 200 matches (inclusive)
    ).toDF("event_id", "user_id", "ts", "tag")
    val right = Seq(
      ("u1", 100L, 1.5), // ties with left id=1 -> inclusive match
      ("u1", 200L, 2.5),
      ("u3", 200L, 9.0)
    ).toDF("user_id", "ts", "value")

    val got = ops.AsOf.asofJoin(left, right, "user_id", "ts", Seq("value"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got(1L) == ((Some(100L), Some(1.5)))) // inclusive at equal ts
    assert(got(2L) == ((Some(200L), Some(2.5)))) // latest of the two
    assert(got(3L) == ((None, None)))
    assert(got(4L) == ((None, None)))            // key isolation
    assert(got(5L) == ((Some(200L), Some(9.0))))
  }

  test("asofJoin: left columns pass through unchanged, row count preserved") {
    import spark.implicits._
    val left = Seq((1L, "u1", 10L, "x"), (2L, "u1", 20L, "y"))
      .toDF("event_id", "user_id", "ts", "tag")
    val right = Seq(("u1", 5L, 0.5)).toDF("user_id", "ts", "value")
    val out = ops.AsOf.asofJoin(left, right, "user_id", "ts", Seq("value"))
    assert(out.columns.toSeq ==
      Seq("event_id", "user_id", "ts", "tag", "matched_ts", "matched_value"))
    assert(out.count() == 2)
    assert(out.where(col("tag") === "y").select("matched_value")
      .head().getDouble(0) == 0.5)
  }

  test("asofJoin: 500-row randomized equivalence vs brute-force range join") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val leftRows = (0 until 500).map(i =>
      (i.toLong, s"k${rnd.nextInt(12)}", rnd.nextInt(1000).toLong))
    // unique (key, ts) on the right by construction
    val rightRows = new scala.util.Random(7)
      .shuffle((0 until 300).map(i =>
        (s"k${i % 15}", (i * 7 % 997).toLong, i * 0.25)).distinct.toList)
    val left = leftRows.toDF("id", "k", "ts")
    val right = rightRows.toDF("k", "ts", "v")

    val got = ops.AsOf.asofJoin(left, right, "k", "ts", Seq("v"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap

    val byKey = rightRows.groupBy(_._1)
    val expected = leftRows.map { case (id, k, ts) =>
      id -> byKey.getOrElse(k, Nil).filter(_._2 <= ts)
        .sortBy(_._2).lastOption.map(_._2)
    }.toMap
    assert(got == expected)
  }

  test("asofJoin: reserved internal names and dotted payloads are rejected") {
    import spark.implicits._
    val left = Seq((1L, "k", 1L)).toDF("id", "k", "ts")
    val right = Seq(("k", 1L, 0.5)).toDF("k", "ts", "v")
    val clash = Seq((1L, "k", 1L, 0)).toDF("id", "k", "ts", "__src")
    intercept[IllegalArgumentException] {
      ops.AsOf.asofJoin(clash, right, "k", "ts", Seq("v"))
    }
    val dotted = right.withColumnRenamed("v", "v.x")
    intercept[IllegalArgumentException] {
      ops.AsOf.asofJoin(left, dotted, "k", "ts", Seq("v.x"))
    }
  }
}
