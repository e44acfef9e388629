package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's final stdout line IS the driver contract — r14's round
  * lost its round-over-round comparison because the official capture
  * couldn't parse the bench output (BENCH_r14 `parsed: null`). Pin,
  * against the REAL declared query set, that the renderer emits one
  * complete JSON object with every query accounted for, under
  * realistic and adversarial median values.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keySet.toSeq.sorted

  // structural JSON check (no JSON library on this classpath): one
  // line, balanced braces/brackets outside strings, closed object —
  // exactly the truncation/prefix failure modes that made earlier
  // rounds' captures unparseable
  private def parse(line: String): Unit = {
    assert(line.linesIterator.size == 1, "final line must be ONE line")
    assert(line.startsWith("{") && line.endsWith("}"))
    // count quotes and braces outside strings to catch truncation bugs
    var depth = 0
    var inStr = false
    var esc = false
    line.foreach { c =>
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case _ =>
      }
      assert(depth >= 0, s"unbalanced nesting in: $line")
    }
    assert(depth == 0 && !inStr, "final line is not a closed JSON object")
  }

  test("renderFinalLine at the full declared query set: one closed JSON line, all queries accounted for") {
    for (value <- Seq(0.01, 0.9, 9.99, 99.9)) {
      val medians = names.map(_ -> value)
      val line = Bench.renderFinalLine(medians, Bench.errsJson(Seq.empty), "/root/testdata/sf0.1")
      parse(line)
      // required spec fields
      for (f <- Seq("\"metric\":\"total\"", "\"unit\":\"sec\"", "\"queries\":{",
          "\"sf\":", s"""\"n_queries\":${names.size}"""))
        assert(line.contains(f), s"missing $f in: ${line.take(200)}")
      // every query is either individually present (qNN key) or folded
      // into the fast_omitted/fast_sum accounting — never silently lost
      val shortNames = names.map(_.takeWhile(_ != '_'))
      val present = shortNames.count(n => line.contains("\"" + n + "\":"))
      val omitted = "\"fast_omitted\":(\\d+)".r.findFirstMatchIn(line)
        .map(_.group(1).toInt).getOrElse(0)
      assert(present + omitted >= names.size,
        s"only $present of ${names.size} queries present, $omitted folded")
    }
  }

  test("renderFinalLine escapes error payloads (a tab or newline in a Spark error must not break parsing)") {
    val medians = names.take(3).map(_ -> 1.0)
    val errs = Bench.errsJson(Seq("q99_broken" -> "line1\nline2\ttabbed \"quoted\""))
    val line = Bench.renderFinalLine(medians, errs, "/x")
    parse(line)
    assert(!line.contains('\n') || line.linesIterator.size == 1)
  }
}
