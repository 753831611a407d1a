#!/usr/bin/env python3
"""Independent BPE trainer over the zip corpus fixture (CPython stdlib
only: zipfile + collections — zero graft code). Re-derives the word
dictionary (top 200 by (count desc, word asc)) and the merge sequence
(highest weighted pair count, ties by lexicographically smallest
(left, right)) and prints it for comparison with the Spark trainer.

Usage: bpe_oracle.py <fixtureDir> <nMerges>
"""
import sys, zipfile
from collections import Counter


def main():
    d, n_merges = sys.argv[1], int(sys.argv[2])
    words = []
    with zipfile.ZipFile(d + "/corpus.zip") as z:
        for name in sorted(z.namelist()):
            words.extend(z.read(name).decode("utf-8").split())
    dict_counts = Counter(words)
    top = sorted(dict_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    sym_words = [([c for c in w], c) for w, c in top]
    merges = []
    for _ in range(n_merges):
        pair_counts = Counter()
        for syms, c in sym_words:
            for k in range(len(syms) - 1):
                pair_counts[(syms[k], syms[k + 1])] += c
        if not pair_counts:
            break
        best, n = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((best[0], best[1], n))
        joined = best[0] + best[1]
        new_words = []
        for syms, c in sym_words:
            out, k = [], 0
            while k < len(syms):
                if (k + 1 < len(syms) and syms[k] == best[0]
                        and syms[k + 1] == best[1]):
                    out.append(joined)
                    k += 2
                else:
                    out.append(syms[k])
                    k += 1
            new_words.append((out, c))
        sym_words = new_words
    for r, (a, b, c) in enumerate(merges, 1):
        print("%d %s %s %s %d" % (r, a, b, a + b, c))
    print("BPE_ORACLE DONE n=%d" % len(merges))


if __name__ == "__main__":
    main()
