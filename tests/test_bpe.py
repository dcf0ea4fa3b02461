"""BPE tokenizer training/encoding: parity against an INDEPENDENT
reference implementation (different data structures, same published
algorithm), determinism, the greedy-encode consistency law
(encoding with the learned merges reproduces training's final
segmentation), and the Spark end-to-end."""

from __future__ import annotations

import collections
import json

import pytest

from finance_pipeline_spark.pipelines.bpe_tokenizer import (
    _EOW,
    bpe_encode_docs,
    encode_word,
    load_merges,
    train_and_save,
    train_merges,
    word_frequencies,
)


def _reference_bpe(word_freqs, n_merges):
    """Independent reference: the textbook algorithm over a
    Counter-of-tuples representation (vs the module's list-of-lists)."""
    vocab = collections.Counter()
    for w, n in word_freqs:
        vocab[tuple(list(w) + [_EOW])] += n
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = max(pairs.values())
        if best < 2:
            break
        pair = min(p for p, c in pairs.items() if c == best)
        merges.append(pair)
        new_vocab = collections.Counter()
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and (sym[i], sym[i + 1]) == pair
                ):
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += n
        vocab = new_vocab
    return merges, vocab


CORPUS = [
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
    ("newer", 4), ("wide", 2), ("low-key", 1),
]


def test_train_matches_independent_reference():
    for k in (1, 5, 10, 40):
        assert train_merges(CORPUS, k) == _reference_bpe(CORPUS, k)[0]


def test_training_stops_when_nothing_repeats():
    merges = train_merges([("ab", 1), ("cd", 1)], 50)
    # every pair is unique (count 1): no merge is ever made
    assert merges == []


def test_greedy_encode_reproduces_training_segmentation():
    """The BPE consistency law: encoding a training word with the
    learned ranks yields the same symbols the training loop left for
    that word."""
    merges, final_vocab = _reference_bpe(CORPUS, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    trained = {"".join(sym).replace(_EOW, ""): list(sym) for sym in final_vocab}
    for w, _ in CORPUS:
        assert encode_word(w, ranks) == trained[w], w


def test_encode_word_handles_oov_and_empty():
    merges = train_merges(CORPUS, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("", ranks) == [_EOW]
    oov = encode_word("zzz", ranks)
    assert "".join(oov) == "zzz" + _EOW  # falls back toward characters


def test_spark_end_to_end_train_save_encode(spark, tmp_path):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ate the rat"),
        (3, "THE CAT   the cat"),  # case + runs of spaces normalize
        (4, None),
        (5, ""),
        # non-space whitespace stays PART of its word on both the
        # training and the encoding side (F.trim ↔ .strip(' ') parity)
        (6, " the cat\tsat\n the mat\n"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    asset = tmp_path / "bpe" / "merges.json"
    stats = train_and_save(spark, docs, asset, n_merges=30, top_words=100)
    assert stats["merges"] > 0 and asset.exists()

    # the distributed word-frequency pass matches a local count
    local = collections.Counter()
    for _, t in rows:
        for w in (t or "").lower().strip(" ").split(" "):
            if w:
                local[w] += 1
    got = dict(word_frequencies(docs, 100))
    assert got == dict(local)

    merges = load_merges(asset)
    ranks = {p: i for i, p in enumerate(merges)}
    out = {r.doc_id: r for r in bpe_encode_docs(docs, merges).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    for doc_id, t in rows:
        text = (t or "").lower().strip(" ")
        words = [w for w in text.split(" ") if w]
        expect = sum(len(encode_word(w, ranks)) for w in words)
        assert (out[doc_id].n_words, out[doc_id].n_tokens_bpe) == (
            len(words),
            expect,
        ), doc_id
    # merges learned: common words compress below character count
    the_len = len(encode_word("the", ranks))
    assert the_len < len("the") + 1


def test_asset_round_trip_and_version_guard(tmp_path):
    from pathlib import Path

    p = tmp_path / "m.json"
    p.write_text(json.dumps({"version": 2, "eow": _EOW, "merges": []}))
    with pytest.raises(ValueError, match="unsupported"):
        load_merges(p)


def test_recursive_oracle_matches_greedy_property():
    """The exactness claim text_bpe_encode's DuckDB oracle rests on
    (r13): the recursive-CTE form (one lowest-rank leftmost merge per
    step) reproduces greedy encode_word for EVERY input — including
    the boundary-sharing chains (aeae) and identical-symbol runs
    (aaaaa) where the rejected nested-replace() draft diverges.
    Property-tested over random words and coherent random merge
    tables by running the real SQL against DuckDB."""
    import duckdb

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def oracle_sym(words, merges):
        def lit(s):
            return "'" + s.replace("'", "''").replace(
                "\x1f", "' || chr(31) || '"
            ) + "'"

        if merges:
            keys = ", ".join(lit(a + "\x1f" + b) for a, b in merges)
            ranks = ", ".join(str(i) for i in range(len(merges)))
            map_lit = f"MAP([{keys}], [{ranks}])"
        else:
            map_lit = "MAP([''], [999999])"  # no-op rank map
        wl = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
        sql = f"""
        WITH RECURSIVE m AS (SELECT {map_lit} AS mm),
        words0 AS (
            SELECT wid, list_append(regexp_split_to_array(word, ''), '</w>') AS sym
            FROM (SELECT generate_subscripts([{wl}], 1) AS wid,
                         unnest([{wl}]) AS word)
        ), enc AS (
            SELECT wid, sym, 0 AS it FROM words0
            UNION ALL
            SELECT wid,
                   list_concat(list_concat(sym[1:bi-1],
                       [sym[bi] || sym[bi+1]]), sym[bi+2:]) AS sym,
                   it + 1
            FROM (
                SELECT wid, sym, it, list_min(pr) AS br,
                       list_position(pr, list_min(pr)) AS bi
                FROM (
                    SELECT wid, sym, it,
                           [coalesce(map_extract(mm,
                                sym[i] || chr(31) || sym[i+1])[1], 999999)
                            FOR i IN range(1, len(sym))] AS pr
                    FROM enc, m
                )
            ) WHERE br < 999999
        )
        SELECT wid, sym FROM (
            SELECT wid, sym,
                   row_number() OVER (PARTITION BY wid ORDER BY it DESC) AS rn
            FROM enc
        ) WHERE rn = 1 ORDER BY wid
        """
        return [list(s) for _, s in duckdb.connect().execute(sql).fetchall()]

    @settings(max_examples=60, deadline=None)
    @given(
        corpus=st.lists(
            st.text(alphabet="abc", min_size=1, max_size=8),
            min_size=1, max_size=12,
        ),
        probes=st.lists(
            st.text(alphabet="abc", min_size=1, max_size=12),
            min_size=1, max_size=4,
        ),
        n_merges=st.integers(min_value=0, max_value=15),
    )
    def check(corpus, probes, n_merges):
        freqs = list(collections.Counter(corpus).items())
        merges = train_merges(freqs, n_merges)
        ranks = {p: i for i, p in enumerate(merges)}
        got = oracle_sym(probes, merges)
        want = [encode_word(w, ranks) for w in probes]
        assert got == want, (probes, merges)

    check()

    # the adversarial shapes that killed the nested-replace draft,
    # against the FROZEN production table + an (a,a)-style table
    from finance_pipeline_spark.pipelines.bpe_tokenizer import (
        FROZEN_MERGES_V1,
    )

    for merges in (list(FROZEN_MERGES_V1), [("a", "a"), ("e", "r")]):
        ranks = {p: i for i, p in enumerate(merges)}
        words = ["aeae", "aaaaa", "aaaa", "aaaaaaa", "erer", "ererer",
                 "hashhash", "the", "a"]
        assert oracle_sym(words, merges) == [
            encode_word(w, ranks) for w in words
        ]


def test_bpe_fertility_report_matches_duckdb_and_semantics(spark, tmp_path):
    """The staged r15 fertility oracle must equal bpe_fertility_report
    row-for-row on the driver corpus shape, and the metric must behave:
    a planted high-fertility language (words the frozen merges never
    compress — every char + </w> stays a token) scores strictly above
    a language of merge-friendly words, and fertility == tokens/words
    exactly per language."""
    import duckdb
    import pandas as pd

    from finance_pipeline_spark.operators.textops import (
        _bpe_fertility_oracle,
        text_bpe_fertility,
    )

    def compare(sf_dir):
        got = sorted(
            (r.lang, r.n_docs, r.n_words, r.n_tokens_bpe, r.fertility)
            for r in text_bpe_fertility(spark, sf_dir).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'"
        )
        want = sorted(map(tuple, con.execute(_bpe_fertility_oracle()).fetchall()))
        assert got == want and len(got) > 0
        return dict((g[0], g) for g in got)

    compare("/root/testdata/sf0.001")

    # planted: 'xx' words are merge-hostile (no frozen merge touches
    # q/x pairs beyond singles), 'zz' words are built FROM the merges
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["xqv qvx vxq xqv", "in in in in"],  # 4 words each
            "lang": ["xx", "zz"],
            "source": ["s", "s"],
            "n_chars": [15, 11],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = compare(str(tmp_path))
    assert got["xx"][2] == 4 and got["zz"][2] == 4
    assert got["xx"][4] == got["xx"][3] / got["xx"][2]
    # 'in' merges to one token + </w> handling per FROZEN_MERGES_V1
    assert got["xx"][4] > got["zz"][4]
