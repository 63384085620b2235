"""Analyzer + stemmer goldens (FIXTURES.md §3)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from splade_spark.config import AnalyzerConfig
from splade_spark.text.analyzer import analyze_series, analyze_text
from splade_spark.text.porter2 import stem

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "analyzer.jsonl")


# Porter2 behavior pinned on words whose stems follow directly from the
# published algorithm definition (exceptions list, steps 1a/1b/2/3/4).
STEM_VECTORS = {
    # exceptional forms (algorithm's explicit table)
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "atlas": "atlas", "bias": "bias",
    # 1a invariants-after
    "inning": "inning", "proceed": "proceed", "exceed": "exceed",
    # step 1a
    "caresses": "caress", "ties": "tie", "cries": "cri",
    "gaps": "gap", "gas": "gas",
    # step 1b
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail", "filing": "file",
    # 1c
    "happy": "happi", "cry": "cri", "by": "by", "say": "say",
    # step 2-4 families
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "format", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "communism", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "rate": "rate", "cease": "ceas",
    # short words untouched
    "a": "a", "be": "be", "ox": "ox",
}


def test_porter2_vectors():
    bad = {w: (stem(w), want) for w, want in STEM_VECTORS.items() if stem(w) != want}
    assert not bad, f"stemmer mismatches: {bad}"


def test_analyze_basic():
    cfg = AnalyzerConfig()
    assert analyze_text("The quick brown foxes were RUNNING fast!") == [
        "quick", "brown", "fox", "run", "fast",
    ]
    assert analyze_text("") == []
    assert analyze_text(None) == []
    # stopword-only
    assert analyze_text("the and of is", cfg) == []
    # numerals + punctuation runs
    assert analyze_text("v2.0-beta!!! 42 times", cfg) == ["v2", "0", "beta", "42", "time"]
    # unicode NFC + non-latin chars split tokens ("ve" is a frozen stopword)
    assert analyze_text("café naïve") == ["caf", "na"]


def test_analyze_nostem_mode():
    cfg = AnalyzerConfig(stem=False)
    assert analyze_text("The quick brown foxes were RUNNING fast!", cfg) == [
        "quick", "brown", "foxes", "running", "fast",
    ]


def test_analyze_series_matches_scalar():
    texts = pd.Series(
        ["Hello World", None, "", "running runs ran", "THE the The", "spark JOINS windows"]
    )
    for cfg in (AnalyzerConfig(), AnalyzerConfig(stem=False)):
        vec = analyze_series(texts, cfg).tolist()
        scalar = [analyze_text(t, cfg) for t in texts]
        assert vec == scalar


def test_golden_file():
    """Frozen golden token streams — regenerate ONLY with a documented spec change."""
    assert os.path.exists(GOLDEN), "run tests/make_goldens.py"
    with open(GOLDEN) as f:
        cases = [json.loads(line) for line in f]
    assert len(cases) >= 25
    for case in cases:
        cfg = AnalyzerConfig(stem=case.get("stem", True))
        assert analyze_text(case["input"], cfg) == case["tokens"], case["input"]


def test_analyze_udf_matches(spark):
    from splade_spark.text.udfs import analyze_udf

    texts = ["Running quickly", "the AND of", "spark streams 123", None, ""]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r["toks"] for r in df.select(analyze_udf()("text").alias("toks")).collect()]
    assert got == [analyze_text(t) for t in texts]


class TestCatalystParity:
    """The Catalyst tokenizer (text/catalyst.py) must match the frozen pandas
    analyzer exactly — ASCII fast path AND the non-ASCII python-normalized
    override (VERDICT.md round-2 scaling fix must not move the spec)."""

    CASES = [
        "The quick brown fox 42 JUMPS over; punct!! and-hyphen under_score",
        "",
        None,
        "   whitespace   only\t\n",
        "stopwords the a an of and or but", 
        "İstanbul ÉCOLE école Straße MÄDCHEN naïve café Kelvin",
        "mixed ASCII and ünïcode tokens 999",
        "école",  # decomposed é → NFC composes, no [a-z] change boundary
        "ALLCAPS lower MiXeD 0123456789",
    ]

    def test_nostem_tokens_match_pandas(self, spark):
        from pyspark.sql import functions as F

        from splade_spark.text.catalyst import nostem_tokens
        from splade_spark.text.udfs import normalized_or_null_udf

        df = spark.createDataFrame([(i, t) for i, t in enumerate(self.CASES)], ["i", "text"])
        norm = normalized_or_null_udf()(F.col("text"))
        got = {
            r["i"]: r["toks"]
            for r in df.select(
                "i", nostem_tokens(F.coalesce(norm, F.col("text"))).alias("toks")
            ).collect()
        }
        cfg = AnalyzerConfig(stem=False)
        for i, t in enumerate(self.CASES):
            assert got[i] == analyze_text(t, cfg), (i, t)

    def test_stem_map_equals_per_token_stemming(self, spark):
        """term_freqs(docs, stemmed cfg) == Counter(analyze_text(stem=True))"""
        from collections import Counter

        from splade_spark.build.indexer import build_index_from_docs
        from splade_spark.build.postings import term_freqs
        from splade_spark.config import DEFAULT

        texts = [t for t in self.CASES if t] + [
            "running runners ran quickly stemming stems stemmed generously",
        ]
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
        frames = build_index_from_docs(df, DEFAULT)
        got = {
            (r.doc_id, r.term): (r.tf, r.doclen)
            for r in term_freqs(frames.docs, DEFAULT).collect()
        }
        exp = {}
        for i, t in enumerate(texts):
            toks = analyze_text(t, DEFAULT.analyzer)
            for term, c in Counter(toks).items():
                exp[(i, term)] = (c, len(toks))
        assert got == exp


def test_surface_term_counts_property(spark):
    """Hypothesis-style fuzz (deterministic corpus sweep): the shuffle-free
    run-length surface tf must equal collections.Counter over the Catalyst
    tokens for adversarial shapes — empty docs, single tokens, all-dup docs,
    high-cardinality docs, unicode."""
    import random
    from collections import Counter

    from pyspark.sql import functions as F

    from splade_spark.build.postings import surface_term_counts

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(30)] + ["the", "and"]  # incl. stopwords
    docs = []
    for i in range(120):
        shape = i % 6
        if shape == 0:
            toks = []
        elif shape == 1:
            toks = [rng.choice(vocab)]
        elif shape == 2:
            toks = [rng.choice(vocab[:3])] * rng.randint(2, 50)
        elif shape == 3:
            toks = [rng.choice(vocab) for _ in range(rng.randint(2, 200))]
        elif shape == 4:
            toks = [f"u{j}" for j in range(rng.randint(1, 64))]  # all distinct
        else:
            toks = sorted(rng.choice(vocab) for _ in range(rng.randint(1, 99)))
        docs.append((i, toks))
    df = spark.createDataFrame(docs, ["doc_id", "tokens"]).withColumn(
        "doclen", F.size("tokens")
    )
    got = {}
    for r in surface_term_counts(df).collect():
        got[(r.doc_id, r.term)] = (r.tf, r.doclen)
    exp = {}
    for i, toks in docs:
        for t, c in Counter(toks).items():
            exp[(i, t)] = (c, len(toks))
    assert got == exp


def test_attach_tokens_refuses_missing_norm(spark):
    """ADVICE r2: a docs frame with text but no norm column must raise —
    silently substituting NULL would change tokenization on non-ASCII rows."""
    import pytest as _pytest

    from splade_spark.build.chunker import attach_tokens

    docs = spark.createDataFrame([(1, "Héllo wörld")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="norm"):
        attach_tokens(docs)
    # explicit opt-in for ASCII-only frames still works
    out = attach_tokens(
        spark.createDataFrame([(1, "hello world")], ["doc_id", "text"]),
        allow_missing_norm=True,
    ).collect()[0]
    assert out.tokens == ["hello", "world"] and out.doclen == 2
