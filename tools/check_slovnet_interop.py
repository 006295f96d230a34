# Interop check: load a pack DUMPED BY OUR ENGINE with the REFERENCE's own
# loader (slovnet.api.NER/Morph/Syntax.load) and compare its annotations to
# our engine's output for the same sentences.
#
# razdel is not installed in this sandbox; the reference only uses it for
# tokenize/sentenize, so we shim a minimal module whose behavior matches on
# the fixture charset (the same \w+|[^\w\s] contract our engine's
# tokenizer satisfies on the planted corpus — SURVEY.md §2.2).
import json
import re
import sys
import types

ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
packs = sys.argv[2] if len(sys.argv) > 2 else "/tmp/slovnet_packs"

razdel = types.ModuleType("razdel")


class _Tok:
    def __init__(self, start, stop, text):
        self.start, self.stop, self.text = start, stop, text


def _tokenize(text):
    for m in re.finditer(r"[\w\d_]+|[^\w\s]", text):
        yield _Tok(m.start(), m.end(), m.group())


def _sentenize(text):
    for m in re.finditer(r"[^\r\n]+", text):
        yield _Tok(m.start(), m.end(), m.group())


razdel.tokenize = _tokenize
razdel.sentenize = _sentenize
sys.modules["razdel"] = razdel
sys.path.insert(0, ref)

from slovnet import NER, Morph, Syntax  # noqa: E402

sents = [
    "Иван Петров купил завод в Москве.",
    "«Газпром» открыл филиал.",
    "директор Газпрома возглавил проект.",
    "Анна Иванова — лидер.",
    "Олег Смирнов, банкир, создал сервис.",
]
words = [[t.text for t in _tokenize(s)] for s in sents]

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
