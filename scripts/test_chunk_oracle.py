#!/usr/bin/env python3
"""Differential test: the recursive-CTE chunker oracle (GraftOracles
`chunkerWalkCte`, shared by chunk_docs / ingest_ids) must reproduce the
reference chunk_text algorithm on boundary-heavy texts — the cases the
harness corpus never exercises (its texts carry no sentence boundaries in
the scan windows), so this script is the only guard against the SQL twin
silently diverging on normal punctuation.

Usage: python3 scripts/test_chunk_oracle.py <verifyOutDir-with-oracle_sql.json>
       (defaults to extracting the SQL from the most recent /tmp/verify_*)
"""
import json
import sys

import duckdb


def chunk_text(text, chunk_size=120, overlap=20):
    """Reference algorithm (PDFToChromaIngester.py:94-124) at the harness
    parameters."""
    if len(text) <= chunk_size:
        return [text]
    chunks = []
    start = 0
    n = len(text)
    while start < n:
        end = start + chunk_size
        if end < n:
            best = -1
            for i in range(end - overlap, end):
                for b in ['. ', '! ', '? ', '\n\n']:
                    if i + len(b) <= n and text[i:i + len(b)] == b:
                        best = i + len(b)
            if best != -1:
                end = best
        chunk = text[start:min(end, n)].strip()
        if chunk:
            chunks.append(chunk)
        start = end - overlap
    return chunks


TEXTS = [
    ("sentences", "Sentence one is here. Sentence two follows! Does three ask? "
     "Yes.\n\nPara two begins and rambles on for a while longer to exceed the "
     "chunk size limit. Another sentence. And more filler text here to push "
     "past a second window boundary as well. Final bit."),
    ("short", "x" * 119),
    ("exact-boundary-cut", "A" * 595 + ". " + "B" * 300),
    ("words", "word " * 100),
    ("two-boundaries", "F" * 118 + ". " + "G" * 130 + "! " + "H" * 50),
    ("no-boundaries", "No boundaries at all " * 30),
    ("dense-periods", "Q. " * 80),
    ("whitespace-run", "Z" * 120 + " " * 200 + "Y" * 120),
    ("exactly-120", "m" * 120),
    ("exactly-121", "m" * 121),
]


def main(out_dir):
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["chunk_docs"]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
    for i, (_, t) in enumerate(TEXTS):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    rows = con.sql(sql).fetchall()
    got = {}
    for r in rows:
        got.setdefault(r[0], []).append(r[3])
    failures = 0
    for i, (name, t) in enumerate(TEXTS):
        exp = chunk_text(t)
        actual = got.get(i, [])
        if actual != exp:
            failures += 1
            print(f"XX {name}: expected {exp!r}\n        got {actual!r}")
        else:
            print(f"   {name}: OK ({len(exp)} chunks)")
    print(f"{len(TEXTS) - failures}/{len(TEXTS)} pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_r2h")
