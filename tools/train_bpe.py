#!/usr/bin/env python3
"""Train the byte-pair merge table shipped at
src/main/resources/graft/bpe_merges.txt.

Classic BPE training (Sennrich et al. 2016, the algorithm behind
tiktoken's cl100k_base vocabulary) over the project's own test corpus:
pretokenize with the same GPT-style regex the engine uses, count
pretoken frequencies, then repeatedly merge the most frequent adjacent
byte-pair. The real cl100k vocabulary cannot be shipped (no egress);
the engine implements the same MECHANISM over this corpus-trained table
— a documented divergence in vocabulary, not in truncation semantics
(SURVEY.md §7.4).

Output format: one merge per line, two hex-encoded byte strings
separated by a space, rank = line number. Deterministic: ties break on
the lexicographically smaller pair.

Usage: python3 tools/train_bpe.py [n_merges] (default 800)
"""
import collections
import re
import sys

import duckdb

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 800

# the cl100k_base pretokenizer pattern (public, from the tiktoken repo),
# with stdlib-re spellings matching graft.text.BpeTokenizer.Pretoken:
# \p{L} -> [^\W\d_]; the "not letter/digit" prefix and punctuation-run
# classes must ADMIT '_' (underscore is \w in stdlib re but neither \p{L}
# nor \p{N} in java.util.regex), hence the explicit |_ alternatives.
# \d vs \p{N} differ only on non-decimal numerals (rare in the corpus).
L = r"[^\W\d_]"
PAT = re.compile(
    rf"""'(?i:[sdmt]|ll|ve|re)|(?:[^\w\r\n]|_)?{L}+|\d{{1,3}}"""
    rf"""| ?(?:[^\s\w]|_)+[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+""",
)

texts = [r[0] for r in duckdb.sql(
    "SELECT text FROM '/root/testdata/sf0.01/documents.parquet' "
    "WHERE text IS NOT NULL ORDER BY doc_id").fetchall()]

pretokens = collections.Counter()
for t in texts:
    for m in PAT.findall(t):
        pretokens[tuple(m.encode('utf-8'))] += 1

# word -> list of current parts (each a bytes object)
words = {w: [bytes([b]) for b in w] for w in pretokens}

merges = []
for _ in range(N_MERGES):
    pairs = collections.Counter()
    for w, parts in words.items():
        f = pretokens[w]
        for a, b in zip(parts, parts[1:]):
            pairs[(a, b)] += f
    if not pairs:
        break
    best = max(pairs.items(), key=lambda kv: (kv[1], [-x for x in kv[0][0]],
                                              [-x for x in kv[0][1]]))
    (a, b), freq = best
    if freq < 2:
        break
    merges.append((a, b))
    ab = a + b
    for w, parts in words.items():
        i = 0
        out = []
        while i < len(parts):
            if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        words[w] = out

with open('src/main/resources/graft/bpe_merges.txt', 'w') as f:
    for a, b in merges:
        f.write(f"{a.hex()} {b.hex()}\n")
print(f"wrote {len(merges)} merges")
