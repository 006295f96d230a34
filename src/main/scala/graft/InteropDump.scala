package graft

import java.io.File
import graft.nlp.{Pipeline, SentRow}
import graft.pack.{SlovnetPack, SynthPack}

/** Dev main for the reference-loader interop check: dumps the synthetic
  * pack in the reference tar layout and prints OUR engine's annotations for
  * the probe sentences in the same JSON shape as
  * tools/check_slovnet_interop.py (which loads the dumped tars with the
  * reference's own slovnet.api loaders). Equal JSON == byte-level pack
  * interop + numerical parity of the whole exec path.
  */
object InteropDump {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/slovnet_packs"
    val pack = SynthPack.build()
    SlovnetPack.dumpAll(pack, new File(out))

    val sents = Seq(
      "Иван Петров купил завод в Москве.",
      "«Газпром» открыл филиал.",
      "директор Газпрома возглавил проект.",
      "Анна Иванова — лидер.",
      "Олег Смирнов, банкир, создал сервис.")
    val parsed = sents.zipWithIndex.map { case (t, i) =>
      Pipeline.inferBatch(Seq(SentRow(s"d$i", 0, 0, 0, t.length, t)), pack).head
    }
    def js(s: String) = graft.text.Json.quote(s)
    val ner = parsed.map(p => p.nerSpans.map(sp =>
      s"[${sp.start}, ${sp.stop}, ${js(sp.tpe)}]").mkString("[", ", ", "]"))
    val morph = parsed.map(p => p.morph.map(m =>
      s"[${js(m.text)}, ${js(graft.text.Conll.formatTag(m.pos, m.feats))}]")
      .mkString("[", ", ", "]"))
    val syn = parsed.map(p => p.syn.map(t =>
      s"[${t.id}, ${js(t.text)}, ${t.headId}, ${js(t.rel)}]").mkString("[", ", ", "]"))
    val json = s"""{"ner": ${ner.mkString("[", ", ", "]")}, """ +
      s""""morph": ${morph.mkString("[", ", ", "]")}, """ +
      s""""syntax": ${syn.mkString("[", ", ", "]")}}"""
    // write UTF-8 to a file — sbt's console charset mangles Cyrillic
    java.nio.file.Files.write(java.nio.file.Paths.get(out, "ours.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $out/ours.json")
  }
}
