"""Differential test: the Python Porter stemmer must be behaviorally
identical to the reference's Java implementation
(`hadoop_wiki_search/util/Stemmer.java`), which it replaces on both
the index and query sides (SURVEY.md §7 risk #1).

Compiles the reference class read-only into a temp dir and streams a
~5k-word adversarial vocabulary (fixture corpus vocabulary + random
stems crossed with every suffix the algorithm handles) through both.
Skipped when javac or the reference checkout is unavailable.
"""

import random
import shutil
import subprocess
from pathlib import Path

import pytest

from hadoop_search_spark.functions.porter import porter_stem

REF = Path("/root/reference/hadoop_wiki_search/util/Stemmer.java")

SUFFIXES = [
    "", "s", "es", "ed", "ing", "ation", "ational", "tional", "enci",
    "anci", "izer", "bli", "alli", "entli", "eli", "ousli", "ization",
    "ator", "alism", "iveness", "fulness", "ousness", "aliti", "iviti",
    "biliti", "logi", "icate", "ative", "alize", "iciti", "ical", "ful",
    "ness", "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
    "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous",
    "ive", "ize", "y", "ies", "sses", "eed", "ll", "e",
]

MAIN = """
import util.Stemmer;
import java.io.*;
public class StemMain {
  public static void main(String[] args) throws Exception {
    BufferedReader r = new BufferedReader(new InputStreamReader(System.in));
    Stemmer s = new Stemmer();
    String line;
    while ((line = r.readLine()) != null) {
      s.add(line.toCharArray(), line.length());
      s.stem();
      System.out.println(s.toString());
    }
  }
}
"""


@pytest.mark.skipif(
    shutil.which("javac") is None or not REF.exists(),
    reason="needs javac and the reference checkout",
)
def test_stemmer_matches_reference_java(tmp_path):
    util = tmp_path / "util"
    util.mkdir()
    shutil.copy(REF, util / "Stemmer.java")
    (tmp_path / "StemMain.java").write_text(MAIN)
    subprocess.run(
        ["javac", "util/Stemmer.java", "StemMain.java"],
        cwd=tmp_path,
        check=True,
        capture_output=True,
    )

    rng = random.Random(42)
    words = set()
    for _ in range(4000):
        stem = "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(1, 8))
        )
        words.add(stem + rng.choice(SUFFIXES))
    for _ in range(1000):
        words.add(
            "".join(
                rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                for _ in range(rng.randint(1, 12))
            )
        )
    words = sorted(words)

    out = subprocess.run(
        ["java", "-cp", str(tmp_path), "StemMain"],
        input="\n".join(words),
        capture_output=True,
        text=True,
        check=True,
    )
    java_stems = out.stdout.splitlines()
    assert len(java_stems) == len(words)
    mismatches = [
        (w, porter_stem(w), j)
        for w, j in zip(words, java_stems)
        if porter_stem(w) != j
    ]
    assert not mismatches, mismatches[:10]
