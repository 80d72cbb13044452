package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.CdcModel
import graft.model.CdcModel.ChangeEvent

/** Scalar operators of the CDC pipeline (SURVEY.md §2 A6-A12), in two
  * forms:
  *
  *   1. Column expressions built ONLY from `org.apache.spark.sql.functions`
  *      built-ins (`when`/`concat`/`length`/...) — these stay inside
  *      whole-stage codegen, cost no serialization, and are what the
  *      distributed query path uses. No UDFs on the hot path.
  *   2. Pure-Scala encoders used by unit tests to pin byte-exact parity
  *      with the reference goldens (reference message_test.go:22,88) and by
  *      driver-side construction code.
  *
  * The portable-number rule (reference message.go:12,18-24,34-41): an
  * unsigned value serializes as a bare JSON number iff <= 2^53-1, else as a
  * decimal string, so JavaScript consumers never lose precision.
  */
object CdcFunctions {

  private val MaxSafe = CdcModel.MaxSafeJsonInt
  private val MaxSafeStr = MaxSafe.toString // "9007199254740991", 16 digits

  // ---------------------------------------------------------------------
  // Column form (codegen-friendly; ANSI-safe: no overflow-able casts)
  // ---------------------------------------------------------------------

  /** Portable encode of a non-negative integral column (u64 carried as
    * Decimal(20,0) or Long): JSON fragment — bare digits or quoted digits.
    * Reference A6 (message.go:18-24).
    */
  def portableU64Json(c: Column): Column = {
    val digits = c.cast("string")
    when(c <= lit(MaxSafe), digits)
      .otherwise(concat(lit("\""), digits, lit("\"")))
  }

  /** Portable encode of a u128 carried as a canonical decimal string
    * (no leading zeros). Numeric magnitude is decided by string length —
    * lexicographic compare is correct for equal-length digit strings —
    * which avoids any cast that could overflow under ANSI mode.
    * Reference A7 (message.go:34-41).
    */
  def portableU128Json(c: Column): Column = {
    val safe = (length(c) < 16) || (length(c) === 16 && c <= lit(MaxSafeStr))
    when(safe, c).otherwise(concat(lit("\""), c, lit("\"")))
  }

  /** TigerBeetle event-type code -> snake_case name; unknown code yields
    * NULL (the batch-friendly analog of the reference's hard error,
    * message.go:91-93 — callers that want fail-fast pair this with an
    * assertion filter).  Reference A8.
    */
  def eventTypeName(code: Column): Column =
    CdcModel.EventTypeNames.foldLeft(lit(null).cast("string")) {
      case (acc, (k, name)) => when(code === lit(k), lit(name)).otherwise(acc)
    }

  /** Strict variant of [[eventTypeName]]: unknown codes raise a runtime
    * error, matching the reference's fail-fast contract exactly
    * (message.go:91-93). Use on pipelines where bad input must abort
    * the batch rather than propagate nulls.
    */
  def eventTypeNameStrict(code: Column): Column =
    CdcModel.EventTypeNames.foldLeft(
      raise_error(concat(lit("unknown change event type: "), code.cast("string")))
    ) { case (acc, (k, name)) =>
      when(code === lit(k), lit(name)).otherwise(acc)
    }

  /** Routing subject `<prefix>.<ledger>.<event_type>` (structured mode,
    * reference config.go:157-162). Reference A10.
    */
  def subjectFor(prefix: String, ledger: Column, eventType: Column): Column =
    concat_ws(".", lit(prefix), ledger.cast("string"), eventType)

  /** Mode-aware routing subject (reference subjectForEvent,
    * config.go:155-162): structured mode derives
    * `<prefix>.<ledger>.<event_type>` per event; single mode publishes
    * everything to one constant subject. The single-mode column is a
    * literal, so Catalyst constant-folds it out of the per-row path
    * entirely.
    */
  def subjectFor(mode: String, prefix: String, singleSubject: String,
                 ledger: Column, eventType: Column): Column =
    if (mode == "single") lit(singleSubject)
    else subjectFor(prefix, ledger, eventType)

  /** Deterministic dedup key `<cluster>/<timestamp>` (reference
    * runner.go:602). Reference A12.
    */
  def msgId(clusterId: String, timestamp: Column): Column =
    concat_ws("/", lit(clusterId), timestamp.cast("string"))

  /** The 5 projected metadata headers + content type (reference
    * runner.go:596-601). Reference A11.
    */
  def headerMap(eventType: Column, ledger: Column, transferCode: Column,
                debitCode: Column, creditCode: Column): Column =
    map(
      lit("Content-Type"), lit("application/json"),
      lit("event_type"), eventType,
      lit("ledger"), ledger.cast("string"),
      lit("transfer_code"), transferCode.cast("string"),
      lit("debit_account_code"), debitCode.cast("string"),
      lit("credit_account_code"), creditCode.cast("string")
    )

  /** Canonical JSON body of a full cdcMessage, built by string concat so
    * field order and the portable rule match the reference byte-for-byte
    * (reference message.go:96-152; Spark's `to_json` can't reproduce the
    * number-vs-string rule). Inputs are the 36 flat columns. Reference A9.
    */
  def cdcJsonBody(
      timestamp: Column, eventTypeCode: Column, ledger: Column,
      transfer: TransferCols, debit: AccountCols, credit: AccountCols
  ): Column = {
    def kvU64(k: String, v: Column) = concat(lit("\"" + k + "\":"), portableU64Json(v))
    def kvU128(k: String, v: Column) = concat(lit("\"" + k + "\":"), portableU128Json(v))
    def kvRaw(k: String, v: Column) = concat(lit("\"" + k + "\":"), v.cast("string"))
    def obj(parts: Column*): Column =
      concat(lit("{") +: parts.zipWithIndex.flatMap { case (p, i) =>
        if (i == 0) Seq(p) else Seq(lit(","), p)
      } :+ lit("}"): _*)

    def accountObj(a: AccountCols): Column = obj(
      kvU128("id", a.id),
      kvU128("debits_pending", a.debitsPending),
      kvU128("debits_posted", a.debitsPosted),
      kvU128("credits_pending", a.creditsPending),
      kvU128("credits_posted", a.creditsPosted),
      kvU128("user_data_128", a.userData128),
      kvU64("user_data_64", a.userData64),
      kvRaw("user_data_32", a.userData32),
      kvRaw("code", a.code),
      kvRaw("flags", a.flags),
      kvU64("timestamp", a.timestamp)
    )

    obj(
      kvU64("timestamp", timestamp),
      concat(lit("\"type\":\""), eventTypeName(eventTypeCode), lit("\"")),
      kvRaw("ledger", ledger),
      concat(lit("\"transfer\":"), obj(
        kvU128("id", transfer.id),
        kvU128("amount", transfer.amount),
        kvU128("pending_id", transfer.pendingId),
        kvU128("user_data_128", transfer.userData128),
        kvU64("user_data_64", transfer.userData64),
        kvRaw("user_data_32", transfer.userData32),
        kvRaw("timeout", transfer.timeout),
        kvRaw("code", transfer.code),
        kvRaw("flags", transfer.flags),
        kvU64("timestamp", transfer.timestamp))),
      concat(lit("\"debit_account\":"), accountObj(debit)),
      concat(lit("\"credit_account\":"), accountObj(credit))
    )
  }

  /** THE per-event publish envelope over the events-stream shape —
    * the single definition both the batch query (CdcQueries.envelope)
    * and the streaming relay (CdcRelay.transform) project, so the two
    * execution modes cannot drift.
    *
    * Carries the reference's FULL header set (runner.go:596-601):
    * Content-Type + event_type + ledger + transfer_code +
    * debit_account_code + credit_account_code, as flat `h_*` string
    * columns. The events-stream shape lacks the cdc transfer/account
    * code fields, so their analogs derive from the event's own fields
    * (props.k and the 16-bit folds of the ids) — deterministic and
    * oracle-mirrored; the cdc-shaped source exercises the real fields
    * via headerMap in CdcQueries.headers.
    * Output: (event_id, ts, msg_id, subject, h_content_type,
    * h_event_type, h_ledger, h_transfer_code, h_debit_account_code,
    * h_credit_account_code, body).
    */
  def envelopeProjection(df: org.apache.spark.sql.DataFrame,
                         subjectPrefix: String,
                         clusterId: String,
                         subjectMode: String = "structured",
                         singleSubject: String = ""): org.apache.spark.sql.DataFrame = {
    val tsMicros = unix_micros(col("ts"))
    val cents = round(col("value") * 100).cast("long")
    val k = coalesce(get_json_object(col("props"), "$.k"), lit("null"))
    val body = concat(
      lit("{\"ts\":"), portableU64Json(tsMicros),
      lit(",\"type\":\""), col("event_type"),
      lit("\",\"ledger\":"), col("user_id").cast("string"),
      lit(",\"value_cents\":"), cents.cast("string"),
      lit(",\"k\":"), k,
      lit("}"))
    df.select(
      col("event_id"), col("ts"),
      msgId(clusterId, tsMicros).as("msg_id"),
      subjectFor(subjectMode, subjectPrefix, singleSubject,
        col("user_id"), col("event_type")).as("subject"),
      lit("application/json").as("h_content_type"),
      col("event_type").as("h_event_type"),
      col("user_id").cast("string").as("h_ledger"),
      coalesce(get_json_object(col("props"), "$.k"), lit("0"))
        .as("h_transfer_code"),
      // oracle mirrors pmod exactly via ((x % m) + m) % m, so the pair
      // agrees for negative inputs too (not just the non-negative
      // synthetic ids)
      pmod(col("user_id"), lit(65536L)).cast("string")
        .as("h_debit_account_code"),
      pmod(col("event_id"), lit(65536L)).cast("string")
        .as("h_credit_account_code"),
      body.as("body"))
  }

  final case class TransferCols(
      id: Column, amount: Column, pendingId: Column, userData128: Column,
      userData64: Column, userData32: Column, timeout: Column,
      code: Column, flags: Column, timestamp: Column)

  final case class AccountCols(
      id: Column, debitsPending: Column, debitsPosted: Column,
      creditsPending: Column, creditsPosted: Column, userData128: Column,
      userData64: Column, userData32: Column, code: Column, flags: Column,
      timestamp: Column)

  // ---------------------------------------------------------------------
  // Pure-Scala form (golden-test parity; driver-side construction)
  // ---------------------------------------------------------------------

  /** Portable encode, scalar form for u64-as-BigDecimal. */
  def portableU64(v: BigDecimal): String = {
    val s = v.toBigInt.toString
    if (v <= BigDecimal(MaxSafe)) s else "\"" + s + "\""
  }

  /** Portable encode, scalar form for u128-as-decimal-string. */
  def portableU128(s: String): String = {
    val safe = s.length < 16 || (s.length == 16 && s <= MaxSafeStr)
    if (safe) s else "\"" + s + "\""
  }

  /** Event-type code -> name; mirrors the reference's hard error on
    * unknown codes (message.go:91-93).
    */
  def eventTypeNameScala(code: Int): String =
    CdcModel.EventTypeNames.toMap.getOrElse(code,
      throw new IllegalArgumentException(s"unknown change event type: $code"))

  /** Byte-exact cdcMessage JSON (reference message.go:96-152). Verified
    * against the two reference goldens (564-byte zero case, 1425-byte
    * all-max case) in CdcFunctionsSpec.
    */
  def encodeEventJson(e: ChangeEvent): String = {
    val sb = new StringBuilder(1536)
    sb.append("{\"timestamp\":").append(portableU64(e.timestamp))
    sb.append(",\"type\":\"").append(eventTypeNameScala(e.eventTypeCode)).append('"')
    sb.append(",\"ledger\":").append(e.ledger)
    sb.append(",\"transfer\":{")
    sb.append("\"id\":").append(portableU128(e.transferId))
    sb.append(",\"amount\":").append(portableU128(e.transferAmount))
    sb.append(",\"pending_id\":").append(portableU128(e.transferPendingId))
    sb.append(",\"user_data_128\":").append(portableU128(e.transferUserData128))
    sb.append(",\"user_data_64\":").append(portableU64(e.transferUserData64))
    sb.append(",\"user_data_32\":").append(e.transferUserData32)
    sb.append(",\"timeout\":").append(e.transferTimeout)
    sb.append(",\"code\":").append(e.transferCode)
    sb.append(",\"flags\":").append(e.transferFlags)
    sb.append(",\"timestamp\":").append(portableU64(e.transferTimestamp))
    sb.append('}')
    def account(key: String, id: String, dp: String, dpo: String, cp: String,
                cpo: String, ud128: String, ud64: BigDecimal, ud32: Long,
                code: Int, flags: Int, ts: BigDecimal): Unit = {
      sb.append(",\"").append(key).append("\":{")
      sb.append("\"id\":").append(portableU128(id))
      sb.append(",\"debits_pending\":").append(portableU128(dp))
      sb.append(",\"debits_posted\":").append(portableU128(dpo))
      sb.append(",\"credits_pending\":").append(portableU128(cp))
      sb.append(",\"credits_posted\":").append(portableU128(cpo))
      sb.append(",\"user_data_128\":").append(portableU128(ud128))
      sb.append(",\"user_data_64\":").append(portableU64(ud64))
      sb.append(",\"user_data_32\":").append(ud32)
      sb.append(",\"code\":").append(code)
      sb.append(",\"flags\":").append(flags)
      sb.append(",\"timestamp\":").append(portableU64(ts))
      sb.append('}')
    }
    account("debit_account", e.debitAccountId, e.debitDebitsPending,
      e.debitDebitsPosted, e.debitCreditsPending, e.debitCreditsPosted,
      e.debitUserData128, e.debitUserData64, e.debitUserData32,
      e.debitCode, e.debitFlags, e.debitTimestamp)
    account("credit_account", e.creditAccountId, e.creditDebitsPending,
      e.creditDebitsPosted, e.creditCreditsPending, e.creditCreditsPosted,
      e.creditUserData128, e.creditUserData64, e.creditUserData32,
      e.creditCode, e.creditFlags, e.creditTimestamp)
    sb.append('}')
    sb.toString
  }

  /** Subject for an event, scalar form (reference config.go:157-162). */
  def subjectForScala(prefix: String, ledger: Long, eventType: String): String =
    s"$prefix.$ledger.$eventType"

  /** Mode-aware scalar subject (reference subjectForEvent,
    * config.go:155-162).
    */
  def subjectForScala(mode: String, prefix: String, singleSubject: String,
                      ledger: Long, eventType: String): String =
    if (mode == "single") singleSubject
    else subjectForScala(prefix, ledger, eventType)
}
