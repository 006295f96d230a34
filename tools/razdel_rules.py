# Python port of the engine's razdel-equivalent tokenizer/sentenizer rules
# (mirror of src/main/scala/graft/text/Tokenizer.scala — SAME rule set, kept
# in lockstep so the slovnet interop check exercises identical tokenization
# on real-shaped Russian text without the razdel package, which is not
# installed in this sandbox). Architecture follows the public razdel repo
# (natasha/razdel, MIT): typed atoms RU/LAT/INT/PUNCT/OTHER + join rules.

RU, LAT, INT, PUNCT, OTHER = 0, 1, 2, 3, 4

DASHES = "-‐‑‒–—―−"
QUOTES = "\"'«»„“”‘’`"
BRACKETS = "()[]{}"
PUNCT_MISC = "\\/!#$%&*+,.:;<=>?@^|~№…_"
ENDINGS = ".?!…"
CLOSERS = "»\"'”’)]"
OPENERS = "«\"'“‘([{"

JOIN_SOKRS = set(
    "г гг в вв млн млрд тыс руб коп долл евро кг км см мм га ч мин сек л "
    "чел экз шт стр таб н э "
    "ул пер просп пр пл наб обл респ гор пос дер им акад проф доц канд св "
    "гл ст рис табл илл разд изд ред сост тел факс англ рус лат греч нем "
    "с п "
    "фр ит исп др проч ср напр зав зам деп чл корр "
    "vol p pp no n fig eq et al etc e i cf ca".split())


def _is_ru(c):
    return ("а" <= c <= "я") or ("А" <= c <= "Я") or c in "ёЁ"


def _is_lat(c):
    return ("a" <= c <= "z") or ("A" <= c <= "Z")


def _is_punct(c):
    return c in DASHES or c in PUNCT_MISC or c in QUOTES or c in BRACKETS


def _atoms(text):
    out = []  # (start, stop, kind)
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
        elif _is_ru(c):
            s = i
            while i < n and _is_ru(text[i]):
                i += 1
            out.append((s, i, RU))
        elif _is_lat(c):
            s = i
            while i < n and _is_lat(text[i]):
                i += 1
            out.append((s, i, LAT))
        elif c.isdecimal():
            s = i
            while i < n and text[i].isdecimal():
                i += 1
            out.append((s, i, INT))
        else:
            out.append((i, i + 1, PUNCT if _is_punct(c) else OTHER))
            i += 1
    return out


def _is_char_atom(text, a, chars):
    return a[1] == a[0] + 1 and text[a[0]] in chars


def _rule2112(text, atoms, li, ri, chars, both_int):
    lk = rk = None
    if _is_char_atom(text, atoms[li], chars):
        if li - 1 >= 0:
            lk, rk = atoms[li - 1][2], atoms[ri][2]
    elif _is_char_atom(text, atoms[ri], chars):
        if ri + 1 < len(atoms):
            lk, rk = atoms[li][2], atoms[ri + 1][2]
    if lk is None:
        return 0
    if both_int:
        return 1 if (lk == INT and rk == INT) else 0
    return 1 if (lk != PUNCT and rk != PUNCT) else 0


def _joins(text, atoms, li, ri):
    r = _rule2112(text, atoms, li, ri, DASHES, False)
    if r == 0:
        r = _rule2112(text, atoms, li, ri, "_", False)
    if r == 0:
        r = _rule2112(text, atoms, li, ri, ".,", True)
    if r == 0:
        r = _rule2112(text, atoms, li, ri, "/\\", True)
    if r != 0:
        return r > 0
    lk, rk = atoms[li][2], atoms[ri][2]
    if lk == PUNCT and rk == PUNCT:
        cl, cr = text[atoms[li][0]], text[atoms[ri][0]]
        return ((cl in ENDINGS and cr in ENDINGS)
                or (cl in DASHES and cr in DASHES)
                or (cl == "*" and cr == "*"))
    if lk == OTHER and rk in (OTHER, RU, LAT):
        return True
    if lk in (OTHER, RU, LAT) and rk == OTHER:
        return True
    return False


class Sub:
    def __init__(self, start, stop, text):
        self.start, self.stop, self.text = start, stop, text


def tokenize(text):
    atoms = _atoms(text)
    m = len(atoms)
    i = 0
    while i < m:
        s, e = atoms[i][0], atoms[i][1]
        while i + 1 < m and atoms[i + 1][0] == e and _joins(text, atoms, i, i + 1):
            i += 1
            e = atoms[i][1]
        yield Sub(s, e, text[s:e])
        i += 1


# citation-only single-letter sokrs: join ONLY before a digit ("с. 45",
# "п. 3") — mirrors Tokenizer.DigitOnlySokrs (round-4 ADVICE fix)
DIGIT_ONLY_SOKRS = {"с", "п"}


def _abbrev_before_dot(text, ls, le, dot):
    ws = dot
    while ws > ls and text[ws - 1].isalpha():
        ws -= 1
    if ws < dot:
        if dot - ws == 1 and text[ws].isupper():
            return True
        w = text[ws:dot].lower()
        if dot - ws == 1 and w in JOIN_SOKRS:
            # completed pair sokr ("т. д.", "т. п.") may end a sentence
            # even when the letter is a standalone sokr ("п.", "с.")
            p = ws
            while p > ls and text[p - 1].isspace():
                p -= 1
            if p > ls and text[p - 1] == ".":
                dot2 = p - 1
                w2 = dot2
                while w2 > ls and text[w2 - 1].isalpha():
                    w2 -= 1
                if dot2 - w2 == 1 and text[w2].islower():
                    return False
            if w in DIGIT_ONLY_SOKRS:
                k = dot + 1
                while k < le and (text[k].isspace() or text[k] in CLOSERS):
                    k += 1
                return k < le and text[k].isdecimal()
            return True
        return w in JOIN_SOKRS
    ds = dot
    while ds > ls and text[ds - 1].isdecimal():
        ds -= 1
    if ds < dot:
        return all(text[p].isspace() or text[p] in OPENERS
                   for p in range(ls, ds))
    return False


def _split_line(text, ls, le, out):
    s = i = ls
    while i < le:
        c = text[i]
        if c in ENDINGS:
            j = i + 1
            while j < le and text[j] in ENDINGS:
                j += 1
            close = j
            while close < le and text[close] in CLOSERS:
                close += 1
            k = close
            while k < le and text[k].isspace():
                k += 1
            single_dot = c == "." and j == i + 1
            join = False
            if close < le and k == close:
                join = True
            elif k < le:
                nc = text[k]
                if nc.isalpha() and nc.islower():
                    join = True
                elif nc in ",;:" or nc in CLOSERS:
                    join = True
                elif nc in DASHES:
                    k3 = k + 1
                    while k3 < le and text[k3].isspace():
                        k3 += 1
                    if k3 < le and text[k3].isalpha() and text[k3].islower():
                        join = True
            if not join and single_dot:
                join = _abbrev_before_dot(text, ls, le, i)
            if join:
                i = j
            else:
                _emit(text, s, close, out)
                s = i = k
        else:
            i += 1
    if s < le:
        _emit(text, s, le, out)


def _emit(text, s, e, out):
    while s < e and text[s].isspace():
        s += 1
    while e > s and text[e - 1].isspace():
        e -= 1
    if e > s:
        out.append(Sub(s, e, text[s:e]))


def sentenize(text):
    out = []
    ls, n = 0, len(text)
    while ls < n:
        while ls < n and text[ls] in "\r\n":
            ls += 1
        if ls < n:
            le = ls
            while le < n and text[le] not in "\r\n":
                le += 1
            _split_line(text, ls, le, out)
            ls = le
    return out
