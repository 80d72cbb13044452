package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CdcFunctions
import graft.streaming.CdcRelay.RelayConfig

/** A19 config validation + A10 subject modes, mirroring the reference's
  * config_test.go case families (defaults, explicit overrides/modes,
  * invalid-enum rejection; config_test.go:9-120) and the parseConfig
  * range checks (config.go:164-371). The Spark analog validates the
  * SAME way: every violated range/enum reported at once, with
  * actionable field-named messages.
  */
class RelayConfigSpec extends AnyFunSuite {

  private def base = RelayConfig("/in", "/out", "/chk")

  test("defaults validate clean and derive structured subjects") {
    val cfg = base.validated
    assert(cfg.validate.isEmpty)
    assert(cfg.subjectMode == "structured")
    // reference config_test.go:33-35: subjectForEvent(7, "single_phase")
    assert(CdcFunctions.subjectForScala(cfg.subjectMode, cfg.subjectPrefix,
      cfg.singleSubject, 7L, "single_phase") == "tigerbeetle.cdc.7.single_phase")
    // no rate ceiling -> the configured batch cap stands
    // unset default resolves to the drain profile
    assert(cfg.maxFilesPerTrigger.isEmpty &&
      cfg.effectiveMaxFilesPerTrigger == RelayConfig.DrainMaxFilesPerTrigger)
  }

  test("explicit single mode routes every event to the constant subject") {
    // reference config_test.go:51-99: explicit modes override defaults
    val cfg = base.copy(subjectMode = "single", singleSubject = "my.subject")
      .validated
    assert(CdcFunctions.subjectForScala(cfg.subjectMode, cfg.subjectPrefix,
      cfg.singleSubject, 7L, "single_phase") == "my.subject")
  }

  test("normalization trims subject fields like the reference parse") {
    // reference config.go:293-300: prefix trailing dot trimmed, subject
    // whitespace trimmed, mode case-folded
    val cfg = base.copy(subjectMode = " Structured ",
      subjectPrefix = "tb.cdc..").validated
    assert(cfg.subjectMode == "structured")
    assert(cfg.subjectPrefix == "tb.cdc")
    val single = base.copy(subjectMode = "single",
      singleSubject = "  my.subject  ").validated
    assert(single.singleSubject == "my.subject")
  }

  test("invalid subject mode is rejected with an actionable message") {
    // reference config_test.go:101-113 (invalid enum)
    val e = intercept[IllegalArgumentException](
      base.copy(subjectMode = "fast").validated)
    assert(e.getMessage.contains("subjectMode must be one of: structured, single"),
      e.getMessage)
  }

  test("empty prefix/subject are invalid in their respective modes") {
    // reference config.go:295-307; a prefix that is only dots
    // normalizes to empty and must be rejected too
    intercept[IllegalArgumentException](base.copy(subjectPrefix = "").validated)
    intercept[IllegalArgumentException](base.copy(subjectPrefix = "...").validated)
    intercept[IllegalArgumentException](
      base.copy(subjectMode = "single", singleSubject = "  ").validated)
  }

  test("validate returns the FULL mismatch list, not just the first") {
    // reference parseConfig aborts on first error; the Spark analog
    // strengthens this to the full list (same contract as the A17 sink
    // validator, runner.go:338-386)
    val bad = RelayConfig("", "", "/chk",
      subjectMode = "warp", dedupeWindow = "soon",
      maxFilesPerTrigger = Some(0), idleIntervalMs = 0,
      maxFilesPerSecond = Some(0.0))
    val errs = bad.validate
    assert(errs.size >= 6, errs.mkString("; "))
    Seq("inputDir", "outputDir", "dedupeWindow", "maxFilesPerTrigger",
      "idleIntervalMs", "maxFilesPerSecond", "subjectMode").foreach { f =>
      assert(errs.exists(_.contains(f)), s"no message names $f: $errs")
    }
  }

  test("dedupe window must be a positive parseable duration") {
    assert(base.copy(dedupeWindow = "2 minutes").validate.isEmpty)
    assert(base.copy(dedupeWindow = "90 seconds").validate.isEmpty)
    assert(base.copy(dedupeWindow = "1 hour").validate.isEmpty)
    // the full withWatermark grammar must be accepted, not a narrowed
    // regex: weeks and compound intervals are valid delay thresholds
    assert(base.copy(dedupeWindow = "1 week").validate.isEmpty)
    assert(base.copy(dedupeWindow = "2 minutes 30 seconds").validate.isEmpty)
    assert(base.copy(dedupeWindow = "interval 5 minutes").validate.isEmpty)
    assert(base.copy(dedupeWindow = "0 minutes").validate.nonEmpty)
    assert(base.copy(dedupeWindow = "-1 minute").validate.nonEmpty)
    assert(base.copy(dedupeWindow = "2 fortnights").validate.nonEmpty)
    assert(base.copy(dedupeWindow = "minutes").validate.nonEmpty)
  }

  test("rate ceiling shrinks the per-trigger cap, flooring at one file") {
    // 2.5 files/sec at a 1s trigger -> 2 files per trigger
    val capped = base.copy(maxFilesPerTrigger = Some(16),
      idleIntervalMs = 1000, maxFilesPerSecond = Some(2.5))
    assert(capped.effectiveMaxFilesPerTrigger == 2)
    // a cap larger than the configured batch max never raises it
    val loose = base.copy(maxFilesPerTrigger = Some(4),
      idleIntervalMs = 1000, maxFilesPerSecond = Some(100.0))
    assert(loose.effectiveMaxFilesPerTrigger == 4)
    // sub-one-file intervals floor at 1 (shorten the interval instead)
    val tight = base.copy(maxFilesPerTrigger = Some(16),
      idleIntervalMs = 200, maxFilesPerSecond = Some(1.0))
    assert(tight.effectiveMaxFilesPerTrigger == 1)
  }

  test("live profile swaps the drain trigger default for the latency cap") {
    // a live relay left at the drain-tuned default (256 files ≈ 1M
    // events/trigger) gets the reference's latency-oriented batching
    // analog (config.go:40 event-count-max = 4096 events)
    assert(RelayConfig.liveProfile(base).maxFilesPerTrigger
      .contains(RelayConfig.LiveMaxFilesPerTrigger))
    // an explicit cap is the operator's choice — kept
    val explicit = base.copy(maxFilesPerTrigger = Some(64))
    assert(RelayConfig.liveProfile(explicit).maxFilesPerTrigger.contains(64))
    // the Int-era footgun: an explicit 256 used to be indistinguishable
    // from the unset drain default and silently became 8 — now kept
    val explicit256 = base.copy(maxFilesPerTrigger = Some(256))
    assert(RelayConfig.liveProfile(explicit256).maxFilesPerTrigger.contains(256))
    // nothing else about the config changes
    assert(RelayConfig.liveProfile(base).copy(
      maxFilesPerTrigger = base.maxFilesPerTrigger) == base)
  }
}
