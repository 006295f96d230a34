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

    // Keep in lockstep with tools/check_slovnet_interop.py `sents`.
    val sents = Seq(
      "Иван Петров купил завод в Москве.",
      "«Газпром» открыл филиал.",
      "директор Газпрома возглавил проект.",
      "Анна Иванова — лидер.",
      "Олег Смирнов, банкир, создал сервис.",
      "А. С. Пушкин родился в Москве.",
      "Встреча прошла 8 марта 2020 г. в Казани.",
      "Выручка выросла на 5,3% до 1.5 млрд руб.",
      "Кружка-термос на 0.5л (50/64 см³, 516;...)",
      "Офис на ул. Тверской открыт с 9:00.",
      "Музей им. Пушкина закрыт на ремонт.",
      "COVID-19 изменил планы «Аэрофлота».",
      "Самолёт Ту-154 совершил посадку.",
      "Он сказал: «Всё хорошо». Потом ушёл.",
      "Что это?! Не знаю...",
      "Ростов-на-Дону принял форум IT-специалистов.",
      "Температура достигла 25°C днём.",
      "См. табл. 2 на стр. 10.",
      "Цена — 100$ за м².",
      "Пётр Волков и т. д. посетили музей.",
      "1. Первый пункт повестки.",
      "Яндекс запустил сервис e-mail рассылок.",
      "Выручка достигла 5\u00a0млрд руб. за год.",
      // round-3b probes: ranges, roman numerals, phones, refs, URLs,
      // currency, ordinals, date-dots, sokr-before-capital boundaries
      "В 1941—1945 гг. шла война.",
      "Фильм снят в XIX в. по роману.",
      "Звоните: +7 (495) 123-45-67.",
      "Скорость — 60 км/ч на трассе.",
      "Т.е. проект закрыт, т.к. нет денег.",
      "Приказ № 7 подписан 1-го мая.",
      "Подробнее на сайте example.com или по e-mail info@example.com.",
      "Курс достиг 90,5₽ (или $1.02).",
      "Рост составил 3—5% за квартал.",
      "iPhone 15 Pro поступил в продажу.",
      "Д. И. Менделеев открыл закон в 1869 г. Затем наука шагнула вперёд.",
      "«Северный поток — 2» остановлен.",
      "Гл. 3, разд. 2.1 — см. с. 45.",
      "Он родился 31.12.1999 в 23:59.",
      "Опрос: 2/3 жителей согласны (67%).",
      // round-4 probes (ADVICE): single-letter sokr joins are now
      // digit-only — "с. 45" joins, "... с. Новый абзац" splits
      "Подробнее см. с. 45. Новый абзац начинается здесь.",
      "Это указано в п. 3. Следующее предложение отдельно.",
      "Смотри п. 7 и с. 12 приложения.")
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
