package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.answer.{EchoLlm, Format}

class FormatSpec extends AnyFunSuite {
  import SparkTestSession._

  test("currency formats match the reference's answer strings") {
    assert(Format.billions(198.4) == "$198.4 billion") // NOAA 1980 total
    assert(Format.billions(38.25) == "$38.2 billion")  // %.1f rounding
    assert(Format.dollars(26200000.0) == "$26,200,000.00")
  }

  test("withUnit annotates from the metric registry") {
    assert(Format.withUnit("wind_speed", 5.8) == "5.8 m/s")
    assert(Format.withUnit("ihp_total", 100.0) == "100.0 $")
    assert(Format.withUnit("no_such_metric", 1.5) == "1.5")
  }

  test("renderRows caps at the prompt-size guard and renders col=value lines") {
    import spark.implicits._
    val rows = (1 to 40).map(i => (i, s"e$i")).toDF("id", "name").collect().toIndexedSeq
    val out = Format.renderRows(rows)
    assert(out.linesIterator.size == 25) // reference guard: data[:25]
    assert(out.startsWith("id=1, name=e1"))
  }

  test("EchoLlm is a deterministic seam: question + context verbatim") {
    assert(EchoLlm.answer("q?", "ctx") == "Q: q?\nctx")
  }
}
