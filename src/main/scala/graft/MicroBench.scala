package graft

import graft.core._
import graft.json._
import graft.spark.{Doc, ExpandStage, RemoteContextPool, SyntheticDocs}

/** Single-threaded stage breakdown of the per-document engine: where each
  * microsecond goes (parse / context+expand / toRdf / canon / full).
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 30000
    val docs: Vector[Doc] = (0L until n.toLong).map(SyntheticDocs.generateDoc).toVector
    val loader = RemoteContextPool.fullLoader
    val spans = docs.flatMap(d => d.spans.filter(_.kind == "jsonld").map(s => (d.doc_id, s)))
    println(s"docs=$n jsonldSpans=${spans.size}")

    def time(label: String)(body: => Long): Unit = {
      body // warmup
      val reps = 3
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val r = body; val t = System.nanoTime() - t0
        (t, r)
      }.minBy(_._1)
      println(f"$label%-22s ${best._1 / 1e9}%8.3fs  (${best._1 / 1000.0 / spans.size}%6.1f us/span, check=${best._2})")
    }

    time("parse") {
      var acc = 0L
      spans.foreach { case (_, s) => acc += JsonParser.parse(s.text).asObj.map(_.size).getOrElse(0) }
      acc
    }
    time("parse+expand") {
      var acc = 0L
      val st = new ApiState(JsonLdOptions(), loader)
      spans.foreach { case (d, s) =>
        val opts = JsonLdOptions(base = Some(s"http://graft.example/doc/$d/span/${s.offset}"))
        acc += JsonLdApi.expand(JsonLdInput.Doc(JsonParser.parse(s.text)), st.withOptions(opts)).size
      }
      acc
    }
    time("parse+expand (nocache)") {
      var acc = 0L
      spans.foreach { case (d, s) =>
        val opts = JsonLdOptions(base = Some(s"http://graft.example/doc/$d/span/${s.offset}"))
        acc += JsonLdApi.expand(JsonLdInput.Doc(JsonParser.parse(s.text)), opts, loader).size
      }
      acc
    }
    time("+toRdf") {
      var acc = 0L
      val st = new ApiState(JsonLdOptions(), loader)
      spans.foreach { case (d, s) =>
        val opts = JsonLdOptions(base = Some(s"http://graft.example/doc/$d/span/${s.offset}"))
        acc += ToRdf.toRdf(JsonLdApi.expand(JsonLdInput.Doc(JsonParser.parse(s.text)), st.withOptions(opts)), opts).size
      }
      acc
    }
    time("full expandDoc") {
      var acc = 0L
      val st = new ApiState(JsonLdOptions(), loader)
      docs.foreach { d => acc += ExpandStage.expandDoc(d, st, ExpandStage.aliasDictionary)._1.size }
      acc
    }
  }
}
