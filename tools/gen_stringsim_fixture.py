#!/usr/bin/env python3
"""Regenerate StringSimilaritySpec's DuckDB parity fixture.

Prints (a, b, jaro_winkler_similarity, damerau_levenshtein) rows in Scala
tuple syntax over seeded random strings (incl. multi-byte UTF-8 and empties)
plus the classic linkage-literature pairs. Paste into the spec when the
fixture needs to grow."""
import duckdb, random

random.seed(42)
con = duckdb.connect()
alpha = "abcdefgh XYZ012üé"
cases = []
for _ in range(28):
    a = ''.join(random.choice(alpha) for _ in range(random.randint(0, 14)))
    b = ''.join(random.choice(alpha) for _ in range(random.randint(0, 14)))
    if random.random() < 0.4 and len(a) > 3:
        b = a[:len(a)//2] + b[:4]
    cases.append((a, b))
cases += [("MARTHA","MARHTA"), ("DIXON","DICKSONX"), ("CA","ABC"), ("",""),
          ("a",""), ("ab","ba"), ("abcdefxxxx","abcdefyyyy"), ("üben","uben")]
for a, b in cases:
    jw, dl = con.execute(
        "select jaro_winkler_similarity(?,?), damerau_levenshtein(?,?)",
        [a, b, a, b]).fetchone()
    print(f'    ({a!r}, {b!r}, {jw!r}, {dl}L),'.replace("'", '"'))
