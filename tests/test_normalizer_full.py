"""Differential test: our EnglishTextNormalizer vs the reference's own
whisper normalizer (ref: data/whisper/normalizers/{basic,english}.py).

The reference's EnglishSpellingNormalizer crashes on import (its
english.json asset is missing from the repo); we patch it to use OUR
spelling table on both sides so the differential covers everything else
(number parsing, contractions, symbol handling) exactly, and test the
spelling table separately.
"""

import importlib.util
import sys
import types
from pathlib import Path

import pytest

from dualhyp_tpu.data import normalizer as ours

_REF_DIR = Path("/root/reference/data/whisper/normalizers")
_ref_available = (_REF_DIR / "english.py").is_file()

requires_reference = pytest.mark.skipif(
    not _ref_available, reason="reference normalizers unavailable"
)


@pytest.fixture(scope="module")
def ref_norm():
    if not _ref_available:
        pytest.skip("reference normalizers unavailable")
    pkg = types.ModuleType("refnormalizers")
    pkg.__path__ = [str(_REF_DIR)]
    sys.modules.setdefault("refnormalizers", pkg)

    def load(name):
        spec = importlib.util.spec_from_file_location(
            f"refnormalizers.{name}", _REF_DIR / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refnormalizers.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    load("basic")
    english = load("english")

    # the reference repo is missing english.json — inject our table so both
    # sides share the same spelling data and the differential isolates the
    # parsing logic
    def patched_init(self):
        self.mapping = dict(ours._DEFAULT_UK_US)

    english.EnglishSpellingNormalizer.__init__ = patched_init
    return english


ADVERSARIAL = [
    # numbers: cardinals, ordinals, plurals, decimals, groupings
    "one hundred and twenty three",
    "two thousand and twenty four",
    "nineteen sixty",
    "twenty twenty one",
    "the nineteen sixties were wild",
    "one oh one dalmatians",
    "double oh seven reporting",
    "triple seven is a plane",
    "three point one four one five nine",
    "zero point five",
    "point five",
    "five hundred thousand",
    "one point five million people",
    "a hundred thousand",
    "two and a half hours",
    "five and a half million",
    "six and a half",
    "two hundred and seventy fourth place",
    "the thirty second and thirty third",
    "first second third fourth fifth twelfth twentieth",
    "hundredth thousandth millionth",
    "sixes and sevens",
    "twenties thirties forties",
    "ones and twos",
    "one one one",
    "fifty five fifty six",
    "seven eight nine ten eleven",
    "eleven twelve thirteen",
    "ten eleven",
    "twenty eleven",
    "two thousand eleven",
    # currency / percent
    "twenty dollars",
    "two dollars and seven cents",
    "two pounds fifty",
    "one euro",
    "seven euros and one cent",
    "fifty per cent of the time",
    "one percent",
    "five per cent",
    "per cent",
    "minus five degrees",
    "negative three point five",
    "plus eight",
    "positive six",
    "minus happy thoughts",
    "dollars and cents",
    "twenty million dollars",
    "$20 million",
    "1,000,000 reasons",
    "$1 and ¢50",
    "$0.25 each",
    "3.5%",
    "50%",
    # arabic digits + suffixes
    "in 1984 and 2001",
    "the 1960s were wild",
    "he came 2nd in the race",
    "the 274th regiment",
    "11th of september",
    "route 66",
    "2 x 4 lumber",
    "192.168.0.1 is an ip address",
    "version 3.5.1",
    "call 555 0123",
    "-5 degrees",
    "+3 points",
    # contractions / titles
    "i won't can't shan't",
    "let's go y'all",
    "ain't gonna wanna gotta",
    "i'ma do it imma do it",
    "woulda coulda shoulda",
    "ma'am and mr smith met dr jones",
    "mrs robinson st peter prof x",
    "capt america gov smith gen lee",
    "sen smith rep jones pres lincoln",
    "rev king hon judge asst manager",
    "assoc prof lt dan col sanders",
    "jr and sr esq",
    "it 's been a while",
    "he 'd gone home",
    "she'd been there",
    "he's got it",
    "they're we've i'll you'd i'm",
    "can not won 't",
    "doesn't don't isn't",
    # fillers / asides / symbols
    "hmm mm mhm mmm uh um okay",
    "so hmm i think",
    "[noise] hello (laughing) world",
    "<unk> token here",
    "hello... world!!",
    "what?! really?",
    "naïve café crème brûlée",
    "zürich and münchen",
    "smørrebrød øre",
    "straße",
    "łódź",
    "it cost £5",
    "temperature is 98.6 degrees",
    "a dash-separated word",
    "semi-colon; and colon:",
    'quotes "inside" here',
    "an ellipsis… here",
    # spelling (both sides share the table)
    "the colour of his behaviour",
    "realise and organise the programme",
    "the theatre centre is one metre away",
    "analyse the defence licence",
    "my favourite neighbour travelled",
    "grey tyres on the aeroplane",
    # mixtures
    "mr smith paid $2 and ¢7 for 2 apples in 1984",
    "she said umm i mean the 3rd of may",
    "one hundred and one dalmatians cost £101.50",
    "i got 99 problems and a half",
    "and a half",
    "half and a half",
    "point",
    "point blank",
    "double trouble",
    "triple",
    "and",
    "one and two and three",
    "a thousand and one nights",
    "four score and seven years ago",
    "",
    "   ",
    "oh",
    "o",
    "oh oh oh",
]


@requires_reference
def test_differential_adversarial(ref_norm):
    ref = ref_norm.EnglishTextNormalizer()
    mine = ours.EnglishTextNormalizer()
    for s in ADVERSARIAL:
        assert mine(s) == ref(s), f"input: {s!r}"


@requires_reference
def test_differential_fuzz(ref_norm, rng):
    """Random word salads over the number-word vocabulary exercise the
    parser state machine far beyond the curated list."""
    ref = ref_norm.EnglishTextNormalizer()
    mine = ours.EnglishTextNormalizer()
    pool = (
        "one two three nine ten eleven nineteen twenty ninety hundred "
        "thousand million billion first third fifth twentieth fifties "
        "sixties hundredth millionth twos sixes o oh zero point and double "
        "triple minus plus negative positive dollar dollars pound pounds "
        "euro euros cent cents per percent half a the cat 5 42 3.5 0.5 "
        "1,000 2nd 1960s $5 -3 +7 50%"
    ).split()
    for _ in range(400):
        k = int(rng.integers(1, 10))
        s = " ".join(rng.choice(pool, size=k))
        assert mine(s) == ref(s), f"input: {s!r}"


@requires_reference
def test_differential_basic_normalizer(ref_norm):
    import importlib

    basic = sys.modules["refnormalizers.basic"]
    cases = [
        "Hello, WORLD! (aside) [noise]",
        "naïve café straße łódź",
        "a—b–c‒d",
        "100% + $5 = €3",
        "ümlaut õ ñ ç",
    ]
    for remove_diacritics in (False, True):
        ref = basic.BasicTextNormalizer(remove_diacritics=remove_diacritics)
        mine = ours.BasicTextNormalizer(remove_diacritics=remove_diacritics)
        for s in cases:
            assert mine(s) == ref(s), (s, remove_diacritics)


def test_spelling_table_sanity():
    sp = ours.EnglishSpellingNormalizer()
    assert sp("colour") == "color"
    assert sp("realise organised") == "realize organized"
    assert sp("centre theatres") == "center theaters"
    assert sp("defence practise") == "defense practice"
    assert sp("favourite neighbourhood") == "favorite neighborhood"
    assert sp("travelled cancelling") == "traveled canceling"
    assert sp("surprise advise exercise") == "surprise advise exercise"
    assert sp("improvise") == "improvise"


def test_number_to_words_num2words_parity():
    """Golden outputs from num2words('en') cardinal."""
    cases = {
        "0": "zero",
        "7": "seven",
        "13": "thirteen",
        "21": "twenty-one",
        "100": "one hundred",
        "101": "one hundred and one",
        "115": "one hundred and fifteen",
        "121": "one hundred and twenty-one",
        "1000": "one thousand",
        "1001": "one thousand and one",
        "1100": "one thousand, one hundred",
        "1121": "one thousand, one hundred and twenty-one",
        "1984": "one thousand, nine hundred and eighty-four",
        "1000001": "one million and one",
        "1234567": (
            "one million, two hundred and thirty-four thousand, "
            "five hundred and sixty-seven"
        ),
        "20000000": "twenty million",
        "-3": "minus three",
        "+3": "three",
        "1.5": "one point five",
        "10.25": "ten point two five",
        "0.07": "zero point zero seven",
        "-0.5": "minus zero point five",
        "3.50": "three point five zero",
    }
    for s, want in cases.items():
        assert ours.number_to_words(s) == want, s


def test_hypothesis_normalizer_end_to_end():
    """The full reference normalize() pipeline
    (ref: data/make_json_asr.py:244-252)."""
    hn = ours.HypothesisNormalizer()
    assert (
        hn("I paid $20,000,000 for it in 1984!")
        == "i paid $twenty million for it in one thousand, "
        "nine hundred and eighty-four"
    )
    assert hn("Fifty percent done.") == "fifty percent done"
    assert hn("it rose 3.5% today") == "it rose three point five percent today"
    assert hn("Mr. Smith has two cats") == "mister smith has two cats"
    # number words -> digits -> words round trip goes through num2words style
    assert hn("one hundred and twenty one") == "one hundred and twenty-one"
