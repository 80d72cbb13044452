package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CdcFunctions
import graft.functions.CdcFunctions.{AccountCols, TransferCols}
import graft.model.CdcModel.ChangeEvent

/** The distributed (Column-expression) encode path must produce the
  * exact same bytes as the pure-Scala encoder — i.e. the reference
  * goldens — for both golden fixtures and a mixed-magnitude event.
  */
class CdcColumnSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("timestamp", DecimalType(20, 0)),
    StructField("event_type_code", IntegerType),
    StructField("ledger", LongType),
    StructField("t_id", StringType), StructField("t_amount", StringType),
    StructField("t_pending_id", StringType), StructField("t_ud128", StringType),
    StructField("t_ud64", DecimalType(20, 0)), StructField("t_ud32", LongType),
    StructField("t_timeout", LongType), StructField("t_code", IntegerType),
    StructField("t_flags", IntegerType), StructField("t_ts", DecimalType(20, 0)),
    StructField("d_id", StringType), StructField("d_dp", StringType),
    StructField("d_dpo", StringType), StructField("d_cp", StringType),
    StructField("d_cpo", StringType), StructField("d_ud128", StringType),
    StructField("d_ud64", DecimalType(20, 0)), StructField("d_ud32", LongType),
    StructField("d_code", IntegerType), StructField("d_flags", IntegerType),
    StructField("d_ts", DecimalType(20, 0)),
    StructField("c_id", StringType), StructField("c_dp", StringType),
    StructField("c_dpo", StringType), StructField("c_cp", StringType),
    StructField("c_cpo", StringType), StructField("c_ud128", StringType),
    StructField("c_ud64", DecimalType(20, 0)), StructField("c_ud32", LongType),
    StructField("c_code", IntegerType), StructField("c_flags", IntegerType),
    StructField("c_ts", DecimalType(20, 0))
  ))

  private def toRow(e: ChangeEvent): Row = Row(
    e.timestamp.bigDecimal, e.eventTypeCode, e.ledger,
    e.transferId, e.transferAmount, e.transferPendingId,
    e.transferUserData128, e.transferUserData64.bigDecimal,
    e.transferUserData32, e.transferTimeout, e.transferCode,
    e.transferFlags, e.transferTimestamp.bigDecimal,
    e.debitAccountId, e.debitDebitsPending, e.debitDebitsPosted,
    e.debitCreditsPending, e.debitCreditsPosted, e.debitUserData128,
    e.debitUserData64.bigDecimal, e.debitUserData32, e.debitCode,
    e.debitFlags, e.debitTimestamp.bigDecimal,
    e.creditAccountId, e.creditDebitsPending, e.creditDebitsPosted,
    e.creditCreditsPending, e.creditCreditsPosted, e.creditUserData128,
    e.creditUserData64.bigDecimal, e.creditUserData32, e.creditCode,
    e.creditFlags, e.creditTimestamp.bigDecimal)

  private def df(events: ChangeEvent*): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(events.map(toRow): _*), schema)

  private def bodyCol = CdcFunctions.cdcJsonBody(
    col("timestamp"), col("event_type_code"), col("ledger"),
    TransferCols(col("t_id"), col("t_amount"), col("t_pending_id"),
      col("t_ud128"), col("t_ud64"), col("t_ud32"), col("t_timeout"),
      col("t_code"), col("t_flags"), col("t_ts")),
    AccountCols(col("d_id"), col("d_dp"), col("d_dpo"), col("d_cp"),
      col("d_cpo"), col("d_ud128"), col("d_ud64"), col("d_ud32"),
      col("d_code"), col("d_flags"), col("d_ts")),
    AccountCols(col("c_id"), col("c_dp"), col("c_dpo"), col("c_cp"),
      col("c_cpo"), col("c_ud128"), col("c_ud64"), col("c_ud32"),
      col("c_code"), col("c_flags"), col("c_ts")))

  /** A mixed event: some fields below 2^53, some above. */
  private val mixed = ChangeEvent.zero.copy(
    timestamp = BigDecimal("9007199254740992"),     // just above → quoted
    eventTypeCode = 3,
    ledger = 42L,
    transferAmount = "9007199254740991",            // boundary → bare
    transferUserData64 = BigDecimal("12345"),
    debitDebitsPosted = "340282366920938463463374607431768211455",
    creditTimestamp = BigDecimal("18446744073709551615"))

  test("column pipeline matches scala encoder on goldens and mixed") {
    val events = Seq(ChangeEvent.zero, ChangeEvent.allMax, mixed)
    val got = df(events: _*).select(bodyCol.as("body"))
      .collect().map(_.getString(0))
    val want = events.map(CdcFunctions.encodeEventJson)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"event $i")
    }
  }

  test("column event-type mapping yields null on unknown code") {
    val r = df(ChangeEvent.zero.copy(eventTypeCode = 99))
      .select(CdcFunctions.eventTypeName(col("event_type_code")))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("strict event-type mapping raises on unknown code like the reference") {
    val bad = df(ChangeEvent.zero.copy(eventTypeCode = 99))
      .select(CdcFunctions.eventTypeNameStrict(col("event_type_code")))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("unknown change event type"), e.getMessage)
    // and the happy path still resolves
    val ok = df(ChangeEvent.zero)
      .select(CdcFunctions.eventTypeNameStrict(col("event_type_code")))
      .collect().head.getString(0)
    assert(ok == "single_phase")
  }

  test("msg id and subject columns") {
    val r = df(mixed).select(
      CdcFunctions.msgId("cluster9", col("timestamp")),
      CdcFunctions.subjectFor("tb.cdc", col("ledger"),
        CdcFunctions.eventTypeName(col("event_type_code"))))
      .collect().head
    assert(r.getString(0) == "cluster9/9007199254740992")
    assert(r.getString(1) == "tb.cdc.42.two_phase_posted")
  }

  test("header map carries the 5 reference headers + content type") {
    val r = df(mixed).select(CdcFunctions.headerMap(
        CdcFunctions.eventTypeName(col("event_type_code")), col("ledger"),
        col("t_code"), col("d_code"), col("c_code")).as("h"))
      .collect().head
    val m = r.getMap[String, String](0)
    assert(m("Content-Type") == "application/json")
    assert(m("event_type") == "two_phase_posted")
    assert(m("ledger") == "42")
    assert(m.size == 6)
  }
}
