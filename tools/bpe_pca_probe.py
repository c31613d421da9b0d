"""Round-12 scale probes for the two new fit operators.

1. BPE (``text.bpe_learn``): the construction's scale claim is that the
   CORPUS is paid once (the word-frequency scan) and every merge round
   is Theta(vocab) — so learning cost should be ~flat as the corpus
   grows with a bounded vocabulary, and grow only with DISTINCT words.
   The probe times the corpus scan and the 8 merge rounds separately
   on the sf0.001 (500-doc) and sf0.1 (5000-doc) documents fixtures,
   then on an 8x-duplicated sf0.1 corpus (same vocab, 8x rows) where a
   corpus-shaped implementation would pay 8x in the rounds.

2. PCA (``clustering.gram_matrix``): one mergeable Theta(dim^2)
   aggregate pass — wall should track corpus rows linearly with a
   fixed dim^2 shuffle, and the 8x-duplicated frame should cost ~8x
   the scan, not 8x the driver work.

Usage: python tools/bpe_pca_probe.py   (writes a markdown row set to
stdout; paste into PLANS.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bearly_spark.operators import clustering as C
    from bearly_spark.operators import text as T
    from bearly_spark.operators.text import _bpe_initial_symbols, _bpe_word_freqs
    from bearly_spark.session import get_spark
    from bearly_spark.sources.tables import load_table

    spark = get_spark("bpe-pca-probe")
    spark.sparkContext.setLogLevel("ERROR")

    print("| probe | corpus | wall (s) |")
    print("|---|---|---|")

    for sf, label in [("sf0.001", "500 docs"), ("sf0.1", "5000 docs")]:
        docs = load_table(spark, f"/root/testdata/{sf}", "documents")
        t = time.time()
        _bpe_word_freqs(docs, "text").count()  # the one corpus pass
        scan = time.time() - t
        t = time.time()
        T.bpe_learn(docs, "text", n_merges=8)
        total = time.time() - t
        print(f"| bpe corpus scan | {label} | {scan:.2f} |")
        print(f"| bpe learn (scan + 8 rounds) | {label} | {total:.2f} |")

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    big = docs
    for _ in range(3):  # 8x rows, identical vocabulary
        big = big.unionByName(big)
    t = time.time()
    T.bpe_learn(big, "text", n_merges=8)
    print(f"| bpe learn | 8x-duplicated (40k rows, same vocab) | {time.time() - t:.2f} |")

    # sanity: duplicated corpus learns the same merges (freqs x8)
    m1 = T.bpe_learn(docs, "text", n_merges=3)
    m8 = T.bpe_learn(big, "text", n_merges=3)
    assert [(m["left"], m["right"]) for m in m1] == [
        (m["left"], m["right"]) for m in m8
    ], "duplicated corpus changed the merges"
    assert all(
        b["pair_count"] == 8 * a["pair_count"] for a, b in zip(m1, m8)
    ), "duplicated corpus pair counts are not 8x"

    for sf, label in [("sf0.001", "500 vecs"), ("sf0.1", "2000 vecs")]:
        emb = load_table(spark, f"/root/testdata/{sf}", "embeddings")
        t = time.time()
        C.gram_matrix(emb)
        print(f"| pca gram pass | {label} | {time.time() - t:.2f} |")
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    big = emb
    for _ in range(3):
        big = big.unionByName(big)
    t = time.time()
    G8 = C.gram_matrix(big)
    print(f"| pca gram pass | 8x-duplicated (16k vecs) | {time.time() - t:.2f} |")
    G1 = C.gram_matrix(emb)
    assert all(
        G8[i][j] == 8 * G1[i][j] for i in range(len(G1)) for j in range(len(G1))
    ), "duplicated gram is not exactly 8x"
    print("| (exactness: 8x-dup gram == 8 * gram, 8x-dup merges identical) | | ok |")


if __name__ == "__main__":
    main()
