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

  test("funnel: strict order discriminates; out-of-order steps don't count") {
    import spark.implicits._
    val ev = Seq(
      // u1: full funnel in order
      (1L, t(10), "signup"), (1L, t(20), "view"),
      (1L, t(30), "click"), (1L, t(40), "purchase"),
      // u2: click but never view -> stops at signup
      (2L, t(10), "signup"), (2L, t(20), "click"),
      // u3: view BEFORE signup -> the view doesn't count
      (3L, t(20), "signup"), (3L, t(10), "view"),
      // u4: signup -> view -> purchase (no click) -> stops at view
      (4L, t(10), "signup"), (4L, t(20), "view"), (4L, t(30), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = ops.Sessions.funnel(ev, Seq("signup", "view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      1 -> (("signup", 4L)), 2 -> (("view", 2L)),
      3 -> (("click", 1L)), 4 -> (("purchase", 1L))))
    // equal timestamp is NOT strictly after: a view at the signup instant
    // does not advance the funnel
    val tie = Seq((9L, t(10), "signup"), (9L, t(10), "view"))
      .toDF("user_id", "ts", "event_type")
    val g2 = ops.Sessions.funnel(tie, Seq("signup", "view"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(g2 == Map(1 -> 1L, 2 -> 0L))
  }

  test("retention: cohort by first day, distinct users per offset") {
    import spark.implicits._
    val day = 86400L
    val ev = Seq(
      (1L, t(10)), (1L, t(day + 5)), (1L, t(day + 50)), // day0 + day1 (dup day1)
      (2L, t(2 * day + 10))                             // later cohort, day0 only
    ).toDF("user_id", "ts")
    val got = ops.Sessions.retention(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("1970-01-01", 0L) -> 1L, ("1970-01-01", 1L) -> 1L,
      ("1970-01-03", 0L) -> 1L))
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

  test("ingestCusum: window identity equals the direct max(0, s+d) folds; burst and stall flag their sides") {
    import spark.implicits._
    // 12 hourly buckets: flat 10, a 2-hour burst of 30, a 3-hour stall of 1
    val counts = Seq(10, 10, 10, 30, 30, 10, 10, 1, 1, 1, 10, 10)
    val ev = counts.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i =>
        (h * 100L + i, java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:01"),
          1L, "e", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val drift = 1L; val threshold = 10L
    val got = ops.Sessions.ingestCusum(ev, drift = drift,
        threshold = threshold).collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(got.size == 12)
    // direct fold twins, both sides
    val mean = counts.map(_.toLong).sum / counts.length
    var sh = 0L; var sl = 0L
    counts.zipWithIndex.foreach { case (n, h) =>
      sh = math.max(0L, sh + n - mean - drift)
      sl = math.max(0L, sl + mean - drift - n)
      val ts = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      val (gn, gh, gl, fh, fl) = got(ts)
      assert(gn == n.toLong && gh == sh && gl == sl &&
        fh == (sh > threshold) && fl == (sl > threshold), s"hour $h")
    }
    // burst flags the high side, stall flags the low side, quiet neither
    def at(h: Int) = got(java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"))
    assert(at(4)._4 && !at(4)._5)   // burst peak
    assert(at(9)._5 && !at(9)._4)   // stall trough
    assert(!at(1)._4 && !at(1)._5)  // quiet head
  }
}
