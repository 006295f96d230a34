# Interop check: load a pack DUMPED BY OUR ENGINE with the REFERENCE's own
# loader (slovnet.api.NER/Morph/Syntax.load) and compare its annotations to
# our engine's output for the same sentences.
#
# razdel is not installed in this sandbox; the reference only uses it for
# tokenize/sentenize, so we inject a razdel module backed by
# tools/razdel_rules.py — a full port of the engine's razdel-equivalent
# rule pipeline (atoms RU/LAT/INT/PUNCT/OTHER; dash/underscore/float/
# fraction/punct-pair/other join rules; sokr-aware sentence boundaries).
# The probe sentences below exercise real news shapes: initials, «quotes»,
# dates, abbreviations, hyphen compounds, floats, fractions, units.
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import razdel_rules  # noqa: E402

ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
packs = sys.argv[2] if len(sys.argv) > 2 else "/tmp/slovnet_packs"

razdel = types.ModuleType("razdel")
razdel.tokenize = razdel_rules.tokenize
razdel.sentenize = razdel_rules.sentenize
sys.modules["razdel"] = razdel
sys.path.insert(0, ref)

from slovnet import NER, Morph, Syntax  # noqa: E402

sents = [
    # corpus-charset probes (round 1-2)
    "Иван Петров купил завод в Москве.",
    "«Газпром» открыл филиал.",
    "директор Газпрома возглавил проект.",
    "Анна Иванова — лидер.",
    "Олег Смирнов, банкир, создал сервис.",
    # real-shaped news probes (round 3): initials, dates, abbreviations,
    # hyphen compounds, floats, fractions, units, quotes
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
    # round-3b probes: ranges, roman numerals, phones, refs, URLs,
    # currency, ordinals, date-dots, sokr-before-capital boundaries
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
    # round-4 probes (ADVICE): single-letter sokr joins are now
    # digit-only — "с. 45" joins, "... с. Новый абзац" splits
    "Подробнее см. с. 45. Новый абзац начинается здесь.",
    "Это указано в п. 3. Следующее предложение отдельно.",
    "Смотри п. 7 и с. 12 приложения.",
]
words = [[t.text for t in razdel_rules.tokenize(s)] for s in sents]

ner = NER.load(f"{packs}/ner.tar")
morph = Morph.load(f"{packs}/morph.tar")
syntax = Syntax.load(f"{packs}/syntax.tar")

out = {"ner": [], "morph": [], "syntax": []}
for s in sents:
    markup = ner(s)
    out["ner"].append([[sp.start, sp.stop, sp.type] for sp in markup.spans])
for m in morph.map(words):
    out["morph"].append([[t.text, t.tag] for t in m.tokens])
for m in syntax.map(words):
    out["syntax"].append([[int(t.id), t.text, int(t.head_id), t.rel] for t in m.tokens])

print(json.dumps(out, ensure_ascii=False))
