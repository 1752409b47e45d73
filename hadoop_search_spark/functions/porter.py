"""Porter stemmer — reference operator P7 (SURVEY.md §2.2).

A pure-Python implementation of M.F. Porter's 1980 suffix-stripping
algorithm ("An algorithm for suffix stripping", Program 14(3)
130-137), matching the variant the reference embeds
(`hadoop_wiki_search/util/Stemmer.java:44-359`): the author's
published revision including the "Bug 1"/"Bug 2" guards and the
documented departures from the paper (``bli``→``ble`` rather than
``abli``→``able``, and the added ``logi``→``log`` rule).

Index side and query side MUST stem identically (the reference
guarantees this by sharing one class; we share this module — used by
`operators/index.py` and `plans/parser.py`).

The stemmer is the one genuinely non-relational scalar in the engine,
so it runs as an Arrow-batched pandas UDF with an LRU cache — corpus
vocabulary is Zipfian, so the cache hit rate is high and the
per-batch Python cost is a dict probe per token, not a stem per
token.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOWELS = "aeiou"


class _Stemmer:
    """One stemming pass over one word. b/k/j mirror the algorithm's
    published description: b = char buffer, k = last valid index,
    j = general offset set by ``_ends``."""

    __slots__ = ("b", "k", "j")

    def __init__(self, word: str) -> None:
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    def _cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self._cons(i - 1)
        return True

    def _m(self) -> int:
        """Number of consonant sequences in b[0..j]."""
        n = 0
        i = 0
        while True:
            if i > self.j:
                return n
            if not self._cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > self.j:
                    return n
                if self._cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > self.j:
                    return n
                if not self._cons(i):
                    break
                i += 1
            i += 1

    def _vowel_in_stem(self) -> bool:
        return any(not self._cons(i) for i in range(self.j + 1))

    def _doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self._cons(j)

    def _cvc(self, i: int) -> bool:
        if i < 2 or not self._cons(i) or self._cons(i - 1) or not self._cons(i - 2):
            return False
        return self.b[i] not in "wxy"

    def _ends(self, s: str) -> bool:
        o = self.k - len(s) + 1
        if o < 0:
            return False
        if self.b[o : self.k + 1] != list(s):
            return False
        self.j = self.k - len(s)
        return True

    def _setto(self, s: str) -> None:
        o = self.j + 1
        self.b[o : o + len(s)] = list(s)
        self.k = self.j + len(s)

    def _r(self, s: str) -> None:
        if self._m() > 0:
            self._setto(s)

    def _step1(self) -> None:
        # plurals and -ed/-ing
        if self.b[self.k] == "s":
            if self._ends("sses"):
                self.k -= 2
            elif self._ends("ies"):
                self._setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self._ends("eed"):
            if self._m() > 0:
                self.k -= 1
        elif (self._ends("ed") or self._ends("ing")) and self._vowel_in_stem():
            self.k = self.j
            if self._ends("at"):
                self._setto("ate")
            elif self._ends("bl"):
                self._setto("ble")
            elif self._ends("iz"):
                self._setto("ize")
            elif self._doublec(self.k):
                self.k -= 1
                if self.b[self.k] in "lsz":
                    self.k += 1
            elif self._m() == 1 and self._cvc(self.k):
                self._setto("e")

    def _step2(self) -> None:
        # terminal y -> i when there is another vowel in the stem
        if self._ends("y") and self._vowel_in_stem():
            self.b[self.k] = "i"

    _STEP3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def _step3(self) -> None:
        # double suffices -> single (e.g. -ization -> -ize)
        if self.k == 0:
            return
        for suffix, repl in self._STEP3.get(self.b[self.k - 1], ()):
            if self._ends(suffix):
                self._r(repl)
                return

    _STEP4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def _step4(self) -> None:
        # -ic-, -full, -ness etc.
        for suffix, repl in self._STEP4.get(self.b[self.k], ()):
            if self._ends(suffix):
                self._r(repl)
                return

    _STEP5 = {
        "a": ("al",),
        "c": ("ance", "ence"),
        "e": ("er",),
        "i": ("ic",),
        "l": ("able", "ible"),
        "n": ("ant", "ement", "ment", "ent"),
        "s": ("ism",),
        "t": ("ate", "iti"),
        "u": ("ous",),
        "v": ("ive",),
        "z": ("ize",),
    }

    def _step5(self) -> None:
        # -ant, -ence etc. removed in context <c>vcvc<v>
        if self.k == 0:
            return
        ch = self.b[self.k - 1]
        if ch == "o":
            # -ion only after s/t; -ou handles -ous
            if self._ends("ion") and self.j >= 0 and self.b[self.j] in "st":
                pass
            elif self._ends("ou"):
                pass
            else:
                return
        else:
            suffixes = self._STEP5.get(ch)
            if not suffixes:
                return
            if not any(self._ends(s) for s in suffixes):
                return
        if self._m() > 1:
            self.k = self.j

    def _step6(self) -> None:
        # final -e / -ll removal at m() > 1
        self.j = self.k
        if self.b[self.k] == "e":
            a = self._m()
            if a > 1 or (a == 1 and not self._cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self._doublec(self.k) and self._m() > 1:
            self.k -= 1

    def stem(self) -> str:
        if self.k > 1:
            self._step1()
            self._step2()
            self._step3()
            self._step4()
            self._step5()
            self._step6()
        return "".join(self.b[: self.k + 1])


@lru_cache(maxsize=1 << 20)
def porter_stem(word: str) -> str:
    """Stem one (lowercased) word."""
    return _Stemmer(word).stem()


@F.pandas_udf(T.StringType())
def porter_stem_udf(words: pd.Series) -> pd.Series:
    return words.map(porter_stem)
