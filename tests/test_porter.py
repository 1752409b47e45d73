"""Porter stemmer golden tests.

Expected outputs derived by hand-tracing the published Porter
algorithm variant the reference embeds
(`hadoop_wiki_search/util/Stemmer.java`), including its inline
examples (`Stemmer.java:206-226`) and the harness vocabulary
(`util/QueryParser.java:375-388`).
"""

from hadoop_search_spark.functions.porter import porter_stem

GOLDEN = {
    # Stemmer.java:206-226 inline examples
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",
    "disabled": "disabl",
    "matting": "mat",
    "mating": "mate",
    "meeting": "meet",
    "milling": "mill",
    "messing": "mess",
    "meetings": "meet",
    # QueryParser.java:375-388 harness vocabulary
    "strawberry": "strawberri",
    "vanilla": "vanilla",
    "cake": "cake",
    "chocolate": "chocol",
    # step3/4/5 coverage (algorithm-defined pairs)
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "hesitanci": "hesit",
    "digitizer": "digit",
    "conformabli": "conform",
    "radicalli": "radic",
    "differentli": "differ",
    "vileli": "vile",
    "analogousli": "analog",
    "vietnamization": "vietnam",
    "predication": "predic",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "homologou": "homolog",
    "communism": "commun",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
    # y / short-word behavior
    "sky": "sky",
    "by": "by",
    "say": "sai",
    "crying": "cry",
    "flying": "fly",
    "dying": "dy",
}


def test_golden_words():
    failures = {w: (porter_stem(w), want) for w, want in GOLDEN.items() if porter_stem(w) != want}
    assert not failures, failures


def test_short_words_unchanged():
    for w in ["a", "i", "is", "be", "on", ""]:
        assert porter_stem(w) == w


def test_idempotent_on_fixture_vocab():
    # stemming an already-stemmed term must be stable for the harness
    # vocabulary (not a general Porter property, but holds here and
    # the query side relies on it for these words)
    for w in ["vanilla", "cake", "strawberri", "chocol"]:
        assert porter_stem(w) == w


def test_digits_passthrough():
    assert porter_stem("a1b2") == "a1b2"
    assert porter_stem("2024") == "2024"
