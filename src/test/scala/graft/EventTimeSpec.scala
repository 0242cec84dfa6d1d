package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.EventTime

/** The event-time helper must give identical epochs for every physical
  * type the testdata generator has shipped: timestamp[us] as TIMESTAMP
  * or TIMESTAMP_NTZ, and timestamp[ns] read back as LONG nanos under the
  * legacy conf (the round-3 shape — no longer in the testdata, so this
  * spec keeps the LONG path covered). */
class EventTimeSpec extends AnyFunSuite {
  import TestSpark._

  private val Epoch = 1704164645L // 2024-01-02T03:04:05Z

  private def secondsOf(df: org.apache.spark.sql.DataFrame): Long =
    df.select(EventTime.epochSeconds(df.schema, "ts").as("s"))
      .collect()(0).getLong(0)

  test("epochSeconds agrees across TIMESTAMP, TIMESTAMP_NTZ and long-nanos") {
    val tz = spark.sql("SELECT timestamp'2024-01-02 03:04:05.6' AS ts")
    val ntz = spark.sql("SELECT timestamp_ntz'2024-01-02 03:04:05.6' AS ts")
    val ns = spark.sql(s"SELECT ${Epoch}600000000L AS ts")
    assert(secondsOf(tz) == Epoch)
    assert(secondsOf(ntz) == Epoch)
    assert(secondsOf(ns) == Epoch)
  }

  test("asTimestamp normalizes every shape to the same instant") {
    import org.apache.spark.sql.functions.unix_seconds
    for (sql <- Seq(
        "SELECT timestamp'2024-01-02 03:04:05' AS ts",
        "SELECT timestamp_ntz'2024-01-02 03:04:05' AS ts",
        s"SELECT ${Epoch}000000000L AS ts")) {
      val df = spark.sql(sql)
      val got = df.select(unix_seconds(EventTime.asTimestamp(df.schema, "ts")).as("s"))
        .collect()(0).getLong(0)
      assert(got == Epoch, sql)
    }
  }
}
