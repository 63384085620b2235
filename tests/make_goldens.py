"""Regenerate frozen golden files. Run from repo root:  python tests/make_goldens.py

Goldens freeze OUR spec (FIXTURES.md) so it can never drift silently. They are
committed; this script only needs rerunning on a documented spec change.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from splade_spark.config import AnalyzerConfig
from splade_spark.text.analyzer import analyze_text

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

ANALYZER_INPUTS = [
    "The quick brown foxes were running fast",
    "Hello, World! hello world HELLO",
    "café naïve résumé",
    "the and of is are was",
    "",
    "   ",
    "42 v2.0 100x beta-3",
    "running runs ran runner",
    "studies studying studied study",
    "connection connections connected connecting connect",
    "relational conditional rational",
    "spark streams windows joins aggregations",
    "generously generate generic general",
    "communication community communism",
    "ties cries skies dying lying",
    "hopefulness decisiveness callousness",
    "a an I",
    "punctuation!!! ... --- ???",
    "MixedCASE TOKENS lowercase UPPERCASE",
    "tab\tseparated\nnewline\r\nwindows",
    "email@example.com http://url.test/path?q=1",
    "it's don't won't can't",
    "中文 text 日本語 mixed ascii",
    "zzz aaa mmm",
    "singly only early ugly",
    "edge-case hyphenated-words under_scored",
    "numbers 123 456 789 0",
    "Stemming: caresses ponies cats feed agreed plastered",
]


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, "analyzer.jsonl")
    with open(path, "w") as f:
        for text in ANALYZER_INPUTS:
            for stem_flag in (True, False):
                rec = {
                    "input": text,
                    "stem": stem_flag,
                    "tokens": analyze_text(text, AnalyzerConfig(stem=stem_flag)),
                }
                f.write(json.dumps(rec, ensure_ascii=False) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
