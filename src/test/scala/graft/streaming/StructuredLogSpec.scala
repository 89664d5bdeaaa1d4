package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The structured-log formatter vs the reference mapping
  * (gcpLogging.ts): severity table, error-reporting marker, JSON
  * shape. Pure — no Spark session needed. */
class StructuredLogSpec extends AnyFunSuite {

  test("level → severity matches changePinoLevelToGcpLogSeverity exactly") {
    val want = Map(
      "trace" -> "DEBUG", "debug" -> "DEBUG", "info" -> "INFO",
      "warn" -> "WARNING", "error" -> "ERROR", "fatal" -> "CRITICAL",
      "silent" -> "DEFAULT", "made-up" -> "DEFAULT")
    want.foreach { case (l, s) => assert(StructuredLog.severityOf(l) === s) }
    // log4j2-style upper-case levels fold to the same severities
    assert(StructuredLog.severityOf("WARN") === "WARNING")
    assert(StructuredLog.severityOf("ERROR") === "ERROR")
    want.values.foreach(s => assert(StructuredLog.Severities.contains(s)))
  }

  test("line is valid JSON with message key, service context, ISO time") {
    import org.json4s._
    val line = StructuredLog.line("graft-dedup", "info",
      "Published message to \"output\"\n", timeMillis = 1700000000123L)
    val j = jackson.JsonMethods.parse(line)
    assert((j \ "message") === JString("Published message to \"output\"\n"))
    assert((j \ "severity") === JString("INFO"))
    assert((j \ "level") === JString("info"))
    assert((j \ "serviceContext" \ "service") === JString("graft-dedup"))
    assert((j \ "time") === JString("2023-11-14T22:13:20.123Z"))
    assert((j \ "@type") === JNothing)       // only error/fatal carry it
    assert((j \ "stack_trace") === JNothing) // no throwable attached
    assert((j \ "pid") === JNothing)         // reference redacts pid
  }

  test("error/fatal entries carry the @type marker and the stack trace") {
    import org.json4s._
    val boom = new IllegalStateException("boom")
    for (lvl <- Seq("error", "fatal")) {
      val j = jackson.JsonMethods.parse(
        StructuredLog.line("svc", lvl, "failed", err = Some(boom)))
      assert((j \ "@type") === JString(StructuredLog.ErrorEventType))
      val JString(st) = (j \ "stack_trace"): @unchecked
      assert(st.contains("IllegalStateException") && st.contains("boom"))
    }
    // a warn with a throwable keeps the stack but NOT the marker
    val warn = jackson.JsonMethods.parse(
      StructuredLog.line("svc", "warn", "hmm", err = Some(boom)))
    assert((warn \ "@type") === JNothing)
    assert((warn \ "stack_trace") !== JNothing)
  }
}
