package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ops/Sessions gaps-and-islands sessionization: hand-traced boundaries
  * (inclusive gap, key isolation, singleton sessions).
  */
class SessionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("sessionize: gap boundaries, inclusive threshold, per-key isolation") {
    import spark.implicits._
    // gap 60s; u1: 0, 30, 90 (chain: 30<=60, 60<=60 inclusive -> ONE session),
    //          then 200 (110 > 60 -> new); u2: 0 alone
    val ev = Seq(
      (1L, "u1", t(0), 1.0), (2L, "u1", t(30), 2.0), (3L, "u1", t(90), 4.0),
      (4L, "u1", t(200), 8.0),
      (5L, "u2", t(0), 16.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = ops.Sessions.sessionize(ev, "user_id", "ts", "event_id", "value", 60L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getTimestamp(2).getTime / 1000, r.getTimestamp(3).getTime / 1000,
          r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got == Map(
      ("u1", 1L) -> ((0L, 90L, 3L, 7.0)),
      ("u1", 2L) -> ((200L, 200L, 1L, 8.0)),
      ("u2", 1L) -> ((0L, 0L, 1L, 16.0))))
  }

  test("sessionize: equal timestamps group into one session, deterministic") {
    import spark.implicits._
    val ev = Seq(
      (2L, "u1", t(10), 1.0), (1L, "u1", t(10), 2.0), (3L, "u1", t(10), 4.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val rows = ops.Sessions.sessionize(ev, "user_id", "ts", "event_id", "value", 5L)
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(4) == 3L && rows.head.getDouble(5) == 7.0)
  }
}
