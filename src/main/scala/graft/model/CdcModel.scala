package graft.model

import org.apache.spark.sql.types._

/** Data model of the CDC engine (SURVEY.md §1).
  *
  * The reference's one first-class collection is a totally-ordered,
  * replayable change-event stream (reference runner.go:126-169) whose rows
  * are denormalized 3-level documents: a transfer plus point-in-time
  * snapshots of both accounts (reference message.go:70-77). This module
  * pins that schema as a Spark `StructType` plus the enum / constant
  * vocabulary used by the encode pipeline.
  *
  * Type discipline (SURVEY.md §1.2): all reference numerics are unsigned.
  *   u16 -> IntegerType, u32 -> LongType, u64 -> DecimalType(20,0),
  *   u128 -> StringType canonical (decimal string, the reference's own wire
  *   form for large values), since max u128 has 39 digits > Decimal(38).
  */
object CdcModel {

  /** Largest integer JSON can carry without JS precision loss, 2^53-1
    * (reference message.go:12). Values above this serialize as decimal
    * strings — the "portable number" rule (message.go:18-24, 34-41).
    */
  val MaxSafeJsonInt: Long = 9007199254740991L

  /** u64 max as BigDecimal, for range checks at the edges. */
  val MaxU64 = BigDecimal("18446744073709551615")

  /** u128 max as decimal string (39 digits — exceeds Decimal(38,0)). */
  val MaxU128String = "340282366920938463463374607431768211455"

  /** Change-event type enum: TigerBeetle wire code -> snake_case name
    * (reference message.go:79-94). Unknown codes are a hard error there;
    * we mirror that with a validating CASE chain (see CdcFunctions).
    */
  val EventTypeNames: Seq[(Int, String)] = Seq(
    1 -> "single_phase",
    2 -> "two_phase_pending",
    3 -> "two_phase_posted",
    4 -> "two_phase_voided",
    5 -> "two_phase_expired"
  )

  /** Account snapshot block: 11 fields (reference message.go:56-68). */
  val accountSchema: StructType = StructType(Seq(
    StructField("id", StringType),               // u128
    StructField("debits_pending", StringType),   // u128
    StructField("debits_posted", StringType),    // u128
    StructField("credits_pending", StringType),  // u128
    StructField("credits_posted", StringType),   // u128
    StructField("user_data_128", StringType),    // u128
    StructField("user_data_64", DecimalType(20, 0)),
    StructField("user_data_32", LongType),
    StructField("code", IntegerType),
    StructField("flags", IntegerType),
    StructField("timestamp", DecimalType(20, 0))
  ))

  /** Transfer block: 10 fields (reference message.go:43-54). */
  val transferSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("amount", StringType),
    StructField("pending_id", StringType),
    StructField("user_data_128", StringType),
    StructField("user_data_64", DecimalType(20, 0)),
    StructField("user_data_32", LongType),
    StructField("timeout", LongType),
    StructField("code", IntegerType),
    StructField("flags", IntegerType),
    StructField("timestamp", DecimalType(20, 0))
  ))

  /** Full 3-level cdcMessage document (reference message.go:70-77). */
  val cdcEventSchema: StructType = StructType(Seq(
    StructField("timestamp", DecimalType(20, 0)),
    StructField("type", StringType),
    StructField("ledger", LongType),
    StructField("transfer", transferSchema),
    StructField("debit_account", accountSchema),
    StructField("credit_account", accountSchema)
  ))

  /** Flat 36-field input record (reference types.ChangeEvent; FIXTURES.md
    * A1). Scala-side construction type for tests and the streaming relay.
    * u128 fields are decimal strings; u64 fields are BigDecimal.
    */
  final case class ChangeEvent(
      timestamp: BigDecimal,
      eventTypeCode: Int,
      ledger: Long,
      transferId: String,
      transferAmount: String,
      transferPendingId: String,
      transferUserData128: String,
      transferUserData64: BigDecimal,
      transferUserData32: Long,
      transferTimeout: Long,
      transferCode: Int,
      transferFlags: Int,
      transferTimestamp: BigDecimal,
      debitAccountId: String,
      debitDebitsPending: String,
      debitDebitsPosted: String,
      debitCreditsPending: String,
      debitCreditsPosted: String,
      debitUserData128: String,
      debitUserData64: BigDecimal,
      debitUserData32: Long,
      debitCode: Int,
      debitFlags: Int,
      debitTimestamp: BigDecimal,
      creditAccountId: String,
      creditDebitsPending: String,
      creditDebitsPosted: String,
      creditCreditsPending: String,
      creditCreditsPosted: String,
      creditUserData128: String,
      creditUserData64: BigDecimal,
      creditUserData32: Long,
      creditCode: Int,
      creditFlags: Int,
      creditTimestamp: BigDecimal
  )

  object ChangeEvent {
    /** All-zero event (golden fixture #1, reference message_test.go:10-31). */
    val zero: ChangeEvent = ChangeEvent(
      timestamp = BigDecimal(0), eventTypeCode = 1, ledger = 0L,
      transferId = "0", transferAmount = "0", transferPendingId = "0",
      transferUserData128 = "0", transferUserData64 = BigDecimal(0),
      transferUserData32 = 0L, transferTimeout = 0L, transferCode = 0,
      transferFlags = 0, transferTimestamp = BigDecimal(0),
      debitAccountId = "0", debitDebitsPending = "0", debitDebitsPosted = "0",
      debitCreditsPending = "0", debitCreditsPosted = "0",
      debitUserData128 = "0", debitUserData64 = BigDecimal(0),
      debitUserData32 = 0L, debitCode = 0, debitFlags = 0,
      debitTimestamp = BigDecimal(0),
      creditAccountId = "0", creditDebitsPending = "0",
      creditDebitsPosted = "0", creditCreditsPending = "0",
      creditCreditsPosted = "0", creditUserData128 = "0",
      creditUserData64 = BigDecimal(0), creditUserData32 = 0L,
      creditCode = 0, creditFlags = 0, creditTimestamp = BigDecimal(0)
    )

    /** All-max event (golden fixture #2, reference message_test.go:33-97). */
    val allMax: ChangeEvent = {
      val u128 = MaxU128String
      val u64 = MaxU64
      val u32 = 4294967295L
      val u16 = 65535
      ChangeEvent(
        timestamp = u64, eventTypeCode = 2, ledger = u32,
        transferId = u128, transferAmount = u128, transferPendingId = u128,
        transferUserData128 = u128, transferUserData64 = u64,
        transferUserData32 = u32, transferTimeout = u32, transferCode = u16,
        transferFlags = u16, transferTimestamp = u64,
        debitAccountId = u128, debitDebitsPending = u128,
        debitDebitsPosted = u128, debitCreditsPending = u128,
        debitCreditsPosted = u128, debitUserData128 = u128,
        debitUserData64 = u64, debitUserData32 = u32, debitCode = u16,
        debitFlags = u16, debitTimestamp = u64,
        creditAccountId = u128, creditDebitsPending = u128,
        creditDebitsPosted = u128, creditCreditsPending = u128,
        creditCreditsPosted = u128, creditUserData128 = u128,
        creditUserData64 = u64, creditUserData32 = u32, creditCode = u16,
        creditFlags = u16, creditTimestamp = u64
      )
    }
  }
}
