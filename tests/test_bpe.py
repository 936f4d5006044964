"""BPE merge-training semantics pinned against a pure-Python greedy
reference (oracle equivalence is covered by test_queries_oracle; these
pin the algorithm itself on the classic Sennrich fixture plus the
overlapping-run edge case the gaps-and-islands selection must get
right)."""

from __future__ import annotations

from pyspark.sql import Row

from cust_sagemaker_feature_store_spark.operators import bpe as B


def _ref_merges(corpus: dict[str, int], rounds: int):
    """Reference greedy BPE: leftmost-first non-overlapping merge
    application, argmax tie-broken by (count DESC, lhs ASC, rhs ASC)."""
    vocab = {w: (tuple(w) + (B.END_OF_WORD,), c) for w, c in corpus.items()}
    out = []
    for r in range(rounds):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                pc[pair] = pc.get(pair, 0) + c
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((r, a, b, a + b, cnt))
        nv = {}
        for w, (syms, c) in vocab.items():
            o: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    o.append(a + b)
                    i += 2
                else:
                    o.append(syms[i])
                    i += 1
            nv[w] = (tuple(o), c)
        vocab = nv
    return out


CORPUS = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 4}


def _train(spark, corpus, rounds):
    words = spark.createDataFrame(
        [Row(word=w, cnt=c) for w, c in corpus.items()]
    )
    merges = B.train_merges(B.initial_symbols(words), rounds=rounds)
    return [
        (
            r["merge_round"], r["lhs"], r["rhs"], r["merged"],
            r["pair_count"],
        )
        for r in merges.orderBy("merge_round").collect()
    ]


def test_train_merges_matches_greedy_reference(spark):
    # the classic fixture plus "aaaa": its (a,a) pair count is 12
    # (3 overlapping instances x 4), and greedy application must
    # yield [aa, aa, </w>] — odd-rank island selection, not every
    # eligible position.
    got = _train(spark, CORPUS, rounds=8)
    assert got == _ref_merges(CORPUS, 8)
    assert got[0] == (0, "a", "a", "aa", 12)


def test_apply_merges_replays_training_tokenization(spark):
    words = spark.createDataFrame(
        [Row(word=w, cnt=c) for w, c in CORPUS.items()]
    )
    syms = B.initial_symbols(words)
    merges = B.train_merges(syms, rounds=6)
    # after round 0's (a, a) merge and no later merge touching 'aa',
    # "aaaa" tokenizes to [aa, aa, </w>]
    rows = (
        B.apply_merges(syms, merges)
        .filter("word = 'aaaa'")
        .orderBy("pos")
        .collect()
    )
    assert [r["sym"] for r in rows] == ["aa", "aa", B.END_OF_WORD]
    assert [r["pos"] for r in rows] == [1, 2, 3]


def test_train_merges_rejects_zero_rounds(spark):
    import pytest

    words = spark.createDataFrame([Row(word="ab", cnt=1)])
    with pytest.raises(ValueError, match="rounds"):
        B.train_merges(B.initial_symbols(words), rounds=0)


def test_apply_merges_fast_equals_replay(spark, sf_dir):
    """The single-pass grouped-pandas encode must be BIT-identical to
    the per-merge round replay on the full corpus symbol state —
    including the overlapping-run regime (left==right merges) the
    odd-rank islands selection exists for."""
    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.operators import bpe as B

    docs = load_table(spark, sf_dir, "documents")
    syms = B.initial_symbols(B.word_counts(docs)).localCheckpoint(eager=False)
    merges = B.train_merges(syms, rounds=8)
    slow = {
        (r["word"], r["pos"]): (r["sym"], r["cnt"])
        for r in B.apply_merges(syms, merges).collect()
    }
    fast = {
        (r["word"], r["pos"]): (r["sym"], r["cnt"])
        for r in B.apply_merges_fast(syms, merges).collect()
    }
    assert fast == slow
    # planted overlapping-run case: merge (a,a) over "aaaa a" words
    df = spark.createDataFrame(
        [("aaaa", 3), ("aaa", 2), ("a", 1)], "word string, cnt long"
    )
    s2 = B.initial_symbols(df)
    m2 = spark.createDataFrame(
        [(1, "a", "a"), (2, "aa", "aa")],
        "merge_round long, lhs string, rhs string",
    )
    slow2 = sorted(tuple(r) for r in B.apply_merges(s2, m2).collect())
    fast2 = sorted(tuple(r) for r in B.apply_merges_fast(s2, m2).collect())
    assert fast2 == slow2
