"""Porter2 (Snowball English) stemmer, pure Python, zero dependencies.

The reference engine stems with surgebase/porter2 for tokens longer
than 3 chars and never lowercases (reference: document.go:61-64,
vector_query.go:63-65, bool_query.go:52-58).  No stemmer package is
available in this container, so this module implements the published
Snowball English algorithm itself.  It is the single shared stemming
spec: the Spark engine kernels, the pure-Python oracle, and the golden
token fixtures all import :func:`stem` from here, so engine/oracle
rank-identity never depends on a third-party library's revision.

Mixed-case input (the engine does not case-fold) is handled the way a
lowercase-only stemmer handles it: uppercase letters are not vowels
and match no suffix rule, so all-caps tokens pass through unchanged --
deterministic, which is what the parity tests pin.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTION2 = frozenset((
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
))


def _is_vowel(ch: str) -> bool:
    return ch in _VOWELS


def _preceding_regions(word: str) -> tuple[int, int]:
    """Return (R1, R2) start offsets for *word* (len(word) if absent)."""
    n = len(word)
    r1 = n
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return _is_vowel(word[0]) and not _is_vowel(word[1])
    if n >= 3:
        a, b, c = word[n - 3], word[n - 2], word[n - 1]
        return (not _is_vowel(a)) and _is_vowel(b) and (
            not _is_vowel(c) and c not in "wxY"
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


@lru_cache(maxsize=1 << 18)
def stem(word: str) -> str:
    """Snowball English ("Porter2") stem of *word*.

    Callers enforce the reference's len>3 gate; this function also
    returns words of length <= 2 unchanged, per the algorithm.
    """
    if len(word) <= 2:
        return word
    # Only the lowercase algorithm is defined; tokens containing
    # uppercase/non-ascii letters take the same path (uppercase chars
    # are consonants that match no rule), which is deterministic.
    exceptional = _EXCEPTION1.get(word)
    if exceptional is not None:
        return exceptional

    if word[0] == "'":
        word = word[1:]
    if word.startswith("y"):
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and _is_vowel(chars[i - 1]):
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _preceding_regions(word)

    # Step 0: strip trailing 's / ' / 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if any(_is_vowel(c) for c in word[:-2]):
            word = word[:-1]

    if word in _EXCEPTION2:
        return word

    # Step 1b
    if word.endswith(("eedly", "eed")):
        suf = "eedly" if word.endswith("eedly") else "eed"
        if len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if any(_is_vowel(c) for c in stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # Step 1c: y -> i after a consonant that is not word-initial
    if (
        len(word) > 2
        and word[-1] in "yY"
        and not _is_vowel(word[-2])
    ):
        word = word[:-1] + "i"

    # Step 2 (longest suffix first)
    step2 = (
        ("ization", "ize"), ("ational", "ate"), ("ousness", "ous"),
        ("iveness", "ive"), ("fulness", "ful"), ("biliti", "ble"),
        ("tional", "tion"), ("lessli", "less"), ("ation", "ate"),
        ("entli", "ent"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", None), ("li", None),
    )
    for suf, rep in step2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    # Step 3
    step3 = (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", None),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    )
    for suf, rep in step3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + rep
            break

    # Step 4
    step4 = (
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "ion", "er", "ic", "al",
    )
    for suf in step4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")
