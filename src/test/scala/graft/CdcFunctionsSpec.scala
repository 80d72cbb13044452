package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CdcFunctions
import graft.model.CdcModel
import graft.model.CdcModel.ChangeEvent

/** Golden parity with the reference encoder (FIXTURES.md §A2; goldens
  * reproduced verbatim from reference message_test.go:22 and
  * message_test.go:88) plus property tests for the portable-number rule
  * across the 2^53 boundary (reference message.go:12,18-24,34-41).
  */
class CdcFunctionsSpec extends AnyFunSuite {

  val goldenZero: String =
    """{"timestamp":0,"type":"single_phase","ledger":0,"transfer":{"id":0,"amount":0,"pending_id":0,"user_data_128":0,"user_data_64":0,"user_data_32":0,"timeout":0,"code":0,"flags":0,"timestamp":0},"debit_account":{"id":0,"debits_pending":0,"debits_posted":0,"credits_pending":0,"credits_posted":0,"user_data_128":0,"user_data_64":0,"user_data_32":0,"code":0,"flags":0,"timestamp":0},"credit_account":{"id":0,"debits_pending":0,"debits_posted":0,"credits_pending":0,"credits_posted":0,"user_data_128":0,"user_data_64":0,"user_data_32":0,"code":0,"flags":0,"timestamp":0}}"""

  val goldenMax: String =
    """{"timestamp":"18446744073709551615","type":"two_phase_pending","ledger":4294967295,"transfer":{"id":"340282366920938463463374607431768211455","amount":"340282366920938463463374607431768211455","pending_id":"340282366920938463463374607431768211455","user_data_128":"340282366920938463463374607431768211455","user_data_64":"18446744073709551615","user_data_32":4294967295,"timeout":4294967295,"code":65535,"flags":65535,"timestamp":"18446744073709551615"},"debit_account":{"id":"340282366920938463463374607431768211455","debits_pending":"340282366920938463463374607431768211455","debits_posted":"340282366920938463463374607431768211455","credits_pending":"340282366920938463463374607431768211455","credits_posted":"340282366920938463463374607431768211455","user_data_128":"340282366920938463463374607431768211455","user_data_64":"18446744073709551615","user_data_32":4294967295,"code":65535,"flags":65535,"timestamp":"18446744073709551615"},"credit_account":{"id":"340282366920938463463374607431768211455","debits_pending":"340282366920938463463374607431768211455","debits_posted":"340282366920938463463374607431768211455","credits_pending":"340282366920938463463374607431768211455","credits_posted":"340282366920938463463374607431768211455","user_data_128":"340282366920938463463374607431768211455","user_data_64":"18446744073709551615","user_data_32":4294967295,"code":65535,"flags":65535,"timestamp":"18446744073709551615"}}"""

  test("zero event encodes to the 564-byte reference golden") {
    val got = CdcFunctions.encodeEventJson(ChangeEvent.zero)
    assert(got == goldenZero)
    assert(got.getBytes("UTF-8").length == 564)
  }

  test("all-max event encodes to the 1425-byte reference golden") {
    val got = CdcFunctions.encodeEventJson(ChangeEvent.allMax)
    assert(got == goldenMax)
    assert(got.getBytes("UTF-8").length == 1425)
  }

  test("portable u64 boundary: 2^53-1 bare, 2^53 quoted") {
    assert(CdcFunctions.portableU64(BigDecimal(9007199254740991L)) == "9007199254740991")
    assert(CdcFunctions.portableU64(BigDecimal("9007199254740992")) == "\"9007199254740992\"")
    assert(CdcFunctions.portableU64(BigDecimal(0)) == "0")
    assert(CdcFunctions.portableU64(CdcModel.MaxU64) == "\"18446744073709551615\"")
  }

  test("portable u128 boundary and max") {
    assert(CdcFunctions.portableU128("9007199254740991") == "9007199254740991")
    assert(CdcFunctions.portableU128("9007199254740992") == "\"9007199254740992\"")
    assert(CdcFunctions.portableU128(CdcModel.MaxU128String) ==
      "\"" + CdcModel.MaxU128String + "\"")
  }

  /** Seeded pseudo-random sample across magnitudes (property-style). */
  private def samples: Seq[BigInt] = {
    val rnd = new scala.util.Random(42)
    val boundary = BigInt(CdcModel.MaxSafeJsonInt)
    Seq(BigInt(0), BigInt(1), boundary - 1, boundary, boundary + 1,
      BigInt(Long.MaxValue), BigInt(Long.MaxValue) * BigInt(Long.MaxValue)) ++
      (1 to 500).map(_ => BigInt(63, rnd)) ++
      (1 to 500).map(_ => BigInt(126, rnd))
  }

  test("portable u64 property: quoted iff above 2^53-1") {
    samples.filter(_ <= BigInt(Long.MaxValue)).foreach { v =>
      val enc = CdcFunctions.portableU64(BigDecimal(v))
      if (v <= BigInt(CdcModel.MaxSafeJsonInt)) assert(enc == v.toString)
      else assert(enc == "\"" + v + "\"")
    }
  }

  test("portable u128 property: round-trips digits, quoted iff big") {
    samples.foreach { v =>
      val s = v.toString
      val enc = CdcFunctions.portableU128(s)
      if (v <= BigInt(CdcModel.MaxSafeJsonInt)) assert(enc == s)
      else assert(enc == "\"" + s + "\"")
    }
  }

  test("event type mapping matches the reference enum") {
    assert(CdcFunctions.eventTypeNameScala(1) == "single_phase")
    assert(CdcFunctions.eventTypeNameScala(2) == "two_phase_pending")
    assert(CdcFunctions.eventTypeNameScala(3) == "two_phase_posted")
    assert(CdcFunctions.eventTypeNameScala(4) == "two_phase_voided")
    assert(CdcFunctions.eventTypeNameScala(5) == "two_phase_expired")
    intercept[IllegalArgumentException](CdcFunctions.eventTypeNameScala(6))
  }

  test("subject derivation matches structured-mode pattern") {
    assert(CdcFunctions.subjectForScala("tigerbeetle.cdc", 7, "single_phase") ==
      "tigerbeetle.cdc.7.single_phase")
  }
}
