# Generates the segmentation golden corpus checked into
# src/test/resources/segmentation_golden.tsv.
#
# The goldens are produced by tools/razdel_rules.py — the Python twin of
# the engine's tokenizer/sentenizer (same rule set, kept in lockstep).
# They pin engine<->twin parity over a combinatorial corpus of hard
# segmentation shapes inside plain `sbt test` (no Python needed at test
# time). CAVEAT, documented in SURVEY/BASELINE: the real razdel package
# is not installable in this zero-egress sandbox, so these are goldens
# for the twin (built from razdel's PUBLIC architecture/README), not for
# razdel itself — twin<->razdel equivalence remains asserted from public
# docs only.
#
# Deterministic: no randomness; the corpus is a pure function of this file.
#
# Usage: python3 tools/gen_segmentation_goldens.py  (writes the TSV + count)
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import razdel_rules as rz  # noqa: E402

cases = []


def add(text):
    cases.append(text)


# --- A. every join-sokr x following-token shape (digit / capital / close
#        paren / end-of-text) — the boundary family the round-4 ADVICE fix
#        (digit-only single-letter sokrs) changed behavior in.
SOKRS = sorted(rz.JOIN_SOKRS)
for sokr in SOKRS:
    add(f"Смотри {sokr}. 45 и далее по тексту.")
    add(f"Это {sokr}. Новый раздел начинается здесь.")
    add(f"Данные ({sokr}. 7) подтверждены документом.")
    add(f"Итог указан в {sokr}.")

# --- B. initials: single and double, with/without completed pair sokrs
for i1 in "АБВДИКМНОПСТ":
    add(f"{i1}. Иванов выступил на форуме.")
for i1, i2, last in [
    ("А", "С", "Пушкин"), ("Д", "И", "Менделеев"), ("Л", "Н", "Толстой"),
    ("М", "Ю", "Лермонтов"), ("Ф", "М", "Достоевский"), ("И", "П", "Павлов"),
    ("Н", "В", "Гоголь"), ("С", "П", "Королёв"), ("К", "Э", "Циолковский"),
    ("В", "В", "Маяковский"), ("Б", "Л", "Пастернак"), ("О", "Э", "Мандельштам"),
]:
    add(f"{i1}. {i2}. {last} родился в Москве.")
    add(f"Книгу написал {last}, то есть {i1}. {i2}. {last}.")
add("Пётр Волков и т. д. посетили музей.")
add("Там были стенды, плакаты и т. п. Затем все ушли.")
add("Он перечислил всё: карты, схемы и т. д. Новый день начался.")

# --- C. numbers: floats (comma/dot), fractions, ranges per dash char,
#        times, dates, phones, ordinals, currency, units
for f in ["5,3", "1.5", "0.25", "100,0", "3.14159", "0,5"]:
    add(f"Показатель вырос на {f}% за квартал.")
for num, den in [("2", "3"), ("50", "64"), ("1", "2"), ("99", "100")]:
    add(f"Опрос: {num}/{den} жителей согласны с решением.")
for d in rz.DASHES:
    add(f"В 1941{d}1945 гг. шла война.")
    add(f"Рост составил 3{d}5% за месяц.")
for t in ["9:00", "23:59", "0:01", "12:30:45"]:
    add(f"Офис открыт с {t} ежедневно.")
for dt in ["31.12.1999", "01.01.2000", "08.03.2020", "9.5.21"]:
    add(f"Он родился {dt} в роддоме № 1.")
add("Звоните: +7 (495) 123-45-67 до 18:00.")
add("Приказ № 7 подписан 1-го мая.")
add("Приказ №12 вступил в силу 2-го июня.")
for cur in ["100$", "90,5₽", "$1.02", "5 €"]:
    add(f"Цена достигла {cur} за единицу.")
for unit in ["км/ч", "м²", "см³", "кг", "°C", "л"]:
    add(f"Значение: 60 {unit} по нормативу.")
add("Выручка достигла 5\u00a0млрд руб. за год.")
add("Бюджет: 1,2 трлн руб. Затраты выросли.")

# --- D. quotes and brackets: endings inside/outside, nesting, dashes
QUOTE_PAIRS = [("«", "»"), ("\u201e", "\u201c"), ("\u201c", "\u201d"), ('"', '"')]
for qo, qc in QUOTE_PAIRS:
    add(f"Он сказал: {qo}Всё хорошо{qc}. Потом ушёл.")
    add(f"{qo}Где я?{qc} — спросил он тихо.")
    add(f"Компания {qo}Ромашка{qc} открыла филиал. Новость дня.")
    add(f"Статья {qo}Итоги. Перспективы{qc} вышла вчера.")
add("Он крикнул («услышат ли?») и замолчал.")
add("Список (см. прил. 2) прилагается. Конец.")
add("Вопрос [спорный!] остаётся открытым. Далее.")
add("«Северный поток — 2» остановлен.")
add("Фильм «Брат-2» вышел в 2000 г. Критики спорили.")

# --- E. ellipses and stacked endings
for e in ["...", "…", "?!", "!?", "?..", "!..", "??", "!!"]:
    add(f"Что это{e} Не знаю точно.")
    add(f"Он ушёл{e} Потом вернулся.")
add("Пауза... потом тихий ответ.")
add("Неужели?.. да, правда.")
add("Стой!.. кричал он вслед.")

# --- F. compounds: hyphens per dash char, underscores, Latin mixes,
#        acronym-digit models, slashes
for d in rz.DASHES:
    add(f"Кто{d}то постучал в дверь.")
    add(f"Ростов{d}на{d}Дону принял форум.")
add("Файл config_v2_final.txt сохранён.")
add("Переменная user_id_2 обновлена.")
for model in ["Ту-154", "МиГ-29", "COVID-19", "Су-57", "ИЛ-2"]:
    add(f"Аппарат {model} совершил посадку.")
add("Яндекс запустил сервис e-mail рассылок.")
add("iPhone 15 Pro поступил в продажу.")
add("Подробнее на example.com или по адресу info@example.com.")
add("Каталог books/fiction/2024 обновлён.")
add("Смесь 50/50 работает лучше.")

# --- G. sokr-chain and citation shapes (the hardest boundary family)
add("См. табл. 2 на стр. 10.")
add("Гл. 3, разд. 2.1 — см. с. 45.")
add("Подробнее см. с. 45. Новый абзац начинается здесь.")
add("Это указано в п. 3. Следующее предложение отдельно.")
add("Смотри п. 7 и с. 12 приложения.")
add("Ссылка: указ. соч. С. 77. Продолжение следует.")
add("В тексте: табл. 4, рис. 5, с. 6. Конец списка.")
add("Т.е. проект закрыт, т.к. нет денег.")
add("Работа т. н. «теневых» структур запрещена.")
add("Он жил в XIX в. Потом началась война.")
add("Фильм снят в XIX в. по роману.")
add("В 2020 г. в Казани прошла встреча. Итоги подвели позже.")
add("Встреча прошла 8 марта 2020 г. в Казани.")

# --- H. whitespace / newline / degenerate shapes
add("  Текст с ведущими пробелами.  ")
add("Первая строка.\nВторая строка без точки")
add("Один\n\nДва\r\nТри.")
add("Слово")
add("— Привет! — сказал он. — Как дела?")
add("1. Первый пункт повестки.")
add("2. Второй пункт. 3. Третий пункт.")
add("А)\tвариант один. Б) вариант два.")

# --- H2. combinatorial citation / list-item family (round 5, VERDICT #7):
#        every citation sokr crossed with the follower shapes that flip the
#        sentence-join decision — digit (joins for ALL sokrs), digit inside
#        a closing paren, capital word (joins UNLESS the sokr is
#        digit-only: "с."/"п." before a capital is a sentence end),
#        end-of-text, comma continuation — so the DIGIT_ONLY_SOKRS rule is
#        pinned per-sokr, not just on the two hand-picked cases.
CITE_SOKRS = ["с", "п", "стр", "табл", "рис", "гл", "разд", "ст", "илл", "изд"]
CITE_FOLLOWERS = [
    "45 и далее",           # digit → join for every sokr
    "7) настоящего акта",   # digit then closer → still a citation
    "Вывод очевиден",       # capital → split iff sokr is digit-only
    "",                     # end of text → dangling sokr
    "12, а также прочее",   # digit + comma continuation
]
for sokr in CITE_SOKRS:
    for follow in CITE_FOLLOWERS:
        tail = f" {follow}" if follow else ""
        add(f"Смотри {sokr}.{tail}.")
        add(f"Это описано в {sokr}.{tail}. Конец раздела.")
# chained citations: two sokrs in one clause, digit vs capital after each
for s1, s2 in [("гл", "с"), ("разд", "п"), ("табл", "стр"), ("рис", "илл")]:
    add(f"См. {s1}. 3, {s2}. 14 настоящего тома.")
    add(f"Ссылка на {s1}. 2 дана выше. {s2.capitalize()}. Далее новый текст.")
    add(f"В {s1}. 5 и {s2}. 9 приведены данные. Итоги ниже.")

# list items: numbering markers x bodies x separators — each marker's dot
# or closer must NOT glue items together, and lowercase bodies must not
# split mid-item.
LIST_MARKERS = ["1.", "2)", "10.", "а)", "б)", "А)", "IV."]
LIST_BODIES = [
    "подготовить отчёт до пятницы",
    "см. п. 4 регламента",
    "утвердить бюджет на 2021 г.",
]
for m in LIST_MARKERS:
    for body in LIST_BODIES:
        add(f"{m} {body}.")
        add(f"Повестка: {m} {body}. Решение принято.")
for sep in ["\n", " "]:
    add(f"1. Первый пункт.{sep}2. Второй пункт.{sep}3. Третий пункт.")
    add(f"а) один вариант.{sep}б) другой вариант.")

# --- I. pairwise concatenations of a stride-sampled subset: multi-sentence
#        interactions between families (boundary of case i feeding case j)
base = list(cases)
sample = base[:: max(1, len(base) // 28)][:28]
for i, a in enumerate(sample):
    b = sample[(i * 7 + 3) % len(sample)]
    add(f"{a.strip()} {b.strip()}")
    add(f"{a.strip()}\n{b.strip()}")


def esc(s):
    return s.replace("\\", "\\\\").replace("\t", "\\t") \
        .replace("\n", "\\n").replace("\r", "\\r")


out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "../src/test/resources/segmentation_golden.tsv")
os.makedirs(os.path.dirname(out_path), exist_ok=True)
with open(out_path, "w", encoding="utf-8") as f:
    f.write("# text<TAB>token spans s:e,...<TAB>sent spans s:e,...\n")
    f.write("# generated by tools/gen_segmentation_goldens.py from the\n")
    f.write("# razdel_rules.py twin — regenerate after any rule change\n")
    for text in cases:
        toks = ",".join(f"{t.start}:{t.stop}" for t in rz.tokenize(text))
        sents = ",".join(f"{s.start}:{s.stop}" for s in rz.sentenize(text))
        f.write(f"{esc(text)}\t{toks}\t{sents}\n")
print(f"wrote {len(cases)} cases to {os.path.normpath(out_path)}")
