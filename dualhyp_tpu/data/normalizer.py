"""English text normalisation for hypothesis generation.

Pragmatic implementation of the normalisation the reference applies to
Whisper outputs before building n-best lists (whisper's
EnglishTextNormalizer + num2words, ref: data/make_json_asr.py:13-14,
244-252): lowercase, strip bracketed asides, drop punctuation, expand
common contractions/abbreviations, spell out integers, collapse whitespace.

The upstream normaliser additionally carries a large British->American
spelling table; that table is data, not behavior — plug replacements in via
`extra_replacements` if exact parity on those words is needed.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

_CONTRACTIONS = {
    "won't": "will not",
    "can't": "can not",
    "shan't": "shall not",
    "n't": " not",
    "'re": " are",
    "'ve": " have",
    "'ll": " will",
    "'d": " would",
    "'m": " am",
    "ma'am": "madam",
    "o'clock": "oclock",
}

_ABBREVIATIONS = {
    "mr": "mister",
    "mrs": "missus",
    "st": "saint",
    "dr": "doctor",
    "prof": "professor",
    "jr": "junior",
    "sr": "senior",
}

_ONES = (
    "zero one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
).split()
_TENS = "zero ten twenty thirty forty fifty sixty seventy eighty ninety".split()


def number_to_words(n: int) -> str:
    """Integer -> English words (num2words equivalent for the integer path)."""
    if n < 0:
        return "minus " + number_to_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        tens, rem = divmod(n, 10)
        return _TENS[tens] + (f" {_ONES[rem]}" if rem else "")
    for scale, name in ((10**9, "billion"), (10**6, "million"), (10**3, "thousand"), (100, "hundred")):
        if n >= scale:
            head, rem = divmod(n, scale)
            out = f"{number_to_words(head)} {name}"
            if rem:
                out += f" {number_to_words(rem)}"
            return out
    return str(n)


class EnglishTextNormalizer:
    def __init__(self, extra_replacements: Optional[Dict[str, str]] = None):
        self.extra = extra_replacements or {}

    def __call__(self, text: str) -> str:
        s = text.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)  # remove <...> / [...] asides
        s = re.sub(r"\(([^)]+?)\)", "", s)  # remove parenthesised asides
        for pattern, replacement in _CONTRACTIONS.items():
            s = s.replace(pattern, replacement)
        # abbreviations followed by a period
        s = re.sub(
            r"\b(" + "|".join(_ABBREVIATIONS) + r")\.",
            lambda m: _ABBREVIATIONS[m.group(1)],
            s,
        )
        for src, dst in self.extra.items():
            s = re.sub(rf"\b{re.escape(src)}\b", dst, s)
        # spell out standalone integers
        s = re.sub(r"\b\d+\b", lambda m: number_to_words(int(m.group(0))), s)
        s = re.sub(r"[^\w\s']", " ", s)  # punctuation -> space
        s = s.replace("'", "")
        s = re.sub(r"\s+", " ", s).strip()
        return s
