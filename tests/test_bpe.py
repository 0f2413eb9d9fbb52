"""Byte-level BPE tokenizer (round 6): the replace-chain production
encoder IS textbook BPE (parity vs the rank-priority reference on
crafted overlap cases and random strings), the embedded merge table is
deterministic, and the Spark map-only counting path matches local."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_financial_time_series_data_pipeline_architecture_spark.functions import bpe


def test_byte_alphabet_is_total_unique_and_space_free():
    m = bpe.bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    assert all(" " not in c and len(c) == 1 for c in m.values())
    assert m[ord(" ")] == "Ġ" and m[ord("a")] == "a"


def test_default_merges_deterministic_and_pinned():
    again = bpe.learn_merges([bpe.SEED_CORPUS], bpe.N_MERGES)
    assert again == bpe.DEFAULT_MERGES
    assert len(bpe.DEFAULT_MERGES) == bpe.N_MERGES
    # head pinned: a platform- or dict-order-dependent tie-break would
    # silently change every token count downstream
    assert bpe.DEFAULT_MERGES[:4] == [
        ("Ġ", "t"),
        ("h", "e"),
        ("Ġt", "he"),
        ("e", "r"),
    ]


def test_replace_chain_equals_reference_on_crafted_cases():
    """The cases that break naive single-space replace chains: adjacent
    repeated pairs (both must merge in one pass), overlapping triples
    (left-to-right greedy), merges creating later-rank pairs."""
    crafted = [
        "the",
        " the",
        " thethe",  # adjacent occurrences of every 'the' sub-merge
        " ttt",  # overlap on the (Ġ,t)-adjacent family
        "aaaa",
        " hehe",
        " thee",
        " tables windows",
        "12 34",
        "!?.",
        "   ",  # pure-whitespace pretoken
        " er er er",
    ]
    for text in crafted:
        for p in bpe.pretokenize(text):
            assert bpe.encode(p, bpe.DEFAULT_MERGES) == bpe.encode_ref(
                p, bpe.DEFAULT_MERGES
            ), p


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from("abcdefghijklmnopqrstuvwy the!?,.012 "),
        max_size=40,
    )
)
def test_replace_chain_equals_reference_property(text):
    for p in bpe.pretokenize(text):
        assert bpe.encode(p, bpe.DEFAULT_MERGES) == bpe.encode_ref(
            p, bpe.DEFAULT_MERGES
        ), p


def test_pretokenizer_partitions_text_exactly():
    for text in ("the quick 12 rows!", "  double  spaces ", "a1b2"):
        assert "".join(bpe.pretokenize(text)) == text


def test_rendered_token_count_matches_symbol_list():
    for p in (" the", "scan", "  ", " query"):
        s = bpe.encode_rendered(p, bpe.DEFAULT_MERGES)
        assert bpe.rendered_token_count(s) == len(
            bpe.encode(p, bpe.DEFAULT_MERGES)
        )


def test_merges_compress_the_seed_domain():
    """Learning worked: BPE tokens over seed-domain text are strictly
    fewer than raw bytes and at least the pretoken count."""
    text = "the fast query scans the small table and joins the batch"
    pres = bpe.pretokenize(text)
    n_tok = sum(
        len(bpe.encode(p, bpe.DEFAULT_MERGES)) for p in pres
    )
    assert len(pres) <= n_tok < len(text.encode())


def test_oracle_replace_chain_escaping_guard():
    import pytest

    with pytest.raises(ValueError, match="escaping"):
        bpe.oracle_replace_chain("s", [("a'b", "c")])


def test_spark_token_count_matches_local(spark):
    import pandas as pd

    texts = [
        "the fast query scans the small table",
        "key agg row scan slow fast",
        "",
        "windows  and   orders",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        r["doc_id"]: r for r in bpe.token_count(df).collect()
    }
    assert len(got) == len(texts)
    for i, t in enumerate(texts):
        pres = bpe.pretokenize(t)
        n_tok = sum(len(bpe.encode(p, bpe.DEFAULT_MERGES)) for p in pres)
        assert got[i]["n_pretokens"] == len(pres)
        assert got[i]["n_tokens"] == n_tok
        assert got[i]["n_bytes"] == len(t.encode())


def test_generated_oracle_matches_production_on_hostile_domain():
    """The driver-gate SQL must replay production BYTE-exactly beyond
    the ASCII fixture corpus (round-6 review repro: a per-character
    render diverged on 'café' and newline docs): non-ASCII 2/3/4-byte
    UTF-8, newlines/tabs/CR, empty and NULL text."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry_mod

    texts = [
        "café table",
        "line1\nline2",
        "",
        None,
        "héllo wörld 12",
        "汉字 test",
        "🙂 ok",
        "  double  spaces",
        "tabs\tand\rcr",
    ]
    con = duckdb.connect()
    con.register(
        "docsrc", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    con.execute("CREATE VIEW documents AS SELECT doc_id, text FROM docsrc")
    got = (
        con.execute(entry_mod.oracle_sql()["bpe_token_count"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        t2 = "" if t is None else t
        pres = bpe.pretokenize(t2)
        n_tok = sum(len(bpe.encode(p, bpe.DEFAULT_MERGES)) for p in pres)
        row = got.iloc[i]
        assert row["n_pretokens"] == len(pres), t
        assert row["n_tokens"] == n_tok, t
        assert row["n_bytes"] == len(t2.encode()), t


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(max_codepoint=0x2FFFF, exclude_categories=("Cs",)),
        max_size=30,
    )
)
def test_encode_decode_roundtrip_property(text):
    """decode(encode(p)) == p for EVERY pretoken of arbitrary unicode
    text — the tokenizer is lossless over its whole byte-level domain."""
    toks_per_pre = [
        bpe.encode(p, bpe.DEFAULT_MERGES) for p in bpe.pretokenize(text)
    ]
    assert bpe.decode_text(toks_per_pre) == text


def test_decode_rejects_non_alphabet_characters():
    import pytest

    with pytest.raises(ValueError, match="byte-alphabet"):
        bpe.decode([" "])  # raw space is never an alphabet character
