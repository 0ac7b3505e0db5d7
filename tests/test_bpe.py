"""Real merge-table BPE: encoder correctness + formulation differential.

The engine encoder (lowest-rank-first, GPT-2 iteration) and the oracle
reference encoder (rank-order passes, Sennrich formulation) are written
independently on purpose; their equivalence is the module's core
invariant (htmpark/bpe.py docstring) and is pinned here on adversarial
and random inputs, alongside the algorithmic properties any BPE must
hold (lossless concatenation, merge monotonicity, byte fallback).
"""
import random

from hypothesis import given, settings, strategies as st

from htmpark.bpe import (MERGES, RANK, TOKEN_ID, encode_text, encode_word,
                         ref_encode_word)


def decode_ids(ids) -> bytes:
    inv = {v: k for k, v in TOKEN_ID.items()}
    return b"".join(inv[i] for i in ids)


def test_vocab_shape():
    assert len(MERGES) == 64 and len(RANK) == 64
    products = [left + right for left, right in MERGES]
    assert len(set(products)) == len(products)  # unique products: the
    # equivalence proof of the two formulations depends on it
    for i, (left, right) in enumerate(MERGES):
        assert TOKEN_ID[left + right] == 256 + i


def test_known_encodings():
    # top-frequency training words merge to single tokens
    assert encode_word(b"the") == (TOKEN_ID[b"the"],)
    assert encode_word(b"data") == (TOKEN_ID[b"data"],)
    # single byte -> its own id; unseen ascii falls back to bytes
    assert encode_word(b"a") == (97,)
    assert encode_word(b"") == ()
    assert all(i < 256 for i in encode_word(b"qqq"))
    # multi-byte utf-8 encodes byte-level (no unicode special-casing)
    assert len(encode_word("é".encode())) == 2


def test_lossless_roundtrip_corpus_words():
    for w in ("the data join merge table row key sort scan hash group "
              "filter batch line part order small slow fast big window "
              "stream query value column vector customer spark agg dup "
              "a xyzzy 123 !?").split():
        b = w.encode()
        assert decode_ids(encode_word(b)) == b
        assert decode_ids(ref_encode_word(b)) == b


def test_formulation_differential_random():
    """3000 random byte strings: the two independent formulations must
    produce identical token streams (not just counts)."""
    rng = random.Random(20260817)
    for _ in range(3000):
        n = rng.randrange(0, 16)
        # bias toward the trained alphabet so merges actually fire
        b = bytes(rng.choice(b"abcdefghijklmnopqrstuvwxyz \xc3\x00")
                  for _ in range(n))
        assert encode_word(b) == tuple(ref_encode_word(b)), b


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=24))
def test_formulation_differential_hypothesis(b):
    assert encode_word(b) == tuple(ref_encode_word(b))
    assert decode_ids(encode_word(b)) == b


def test_adversarial_overlaps():
    """Overlapping-occurrence convention (leftmost-first) and
    chained-merge cases."""
    # 'hehe': (h,e) rank 0 fires twice -> [he, he]; no (he,he) merge
    assert decode_ids(encode_word(b"hehe")) == b"hehe"
    assert len(encode_word(b"hehe")) == 2
    # 'tthe': (t,he) needs he first; leading t stays a byte
    assert encode_word(b"tthe") == (116, TOKEN_ID[b"the"])
    aaa = encode_word(b"aaa")
    assert aaa == tuple(ref_encode_word(b"aaa"))
    assert decode_ids(aaa) == b"aaa"


def test_encode_text_composition():
    n, s = encode_text("the fast key")
    ids = (encode_word(b"the") + encode_word(b"fast")
           + encode_word(b"key"))
    assert (n, s) == (len(ids), sum(ids))
    # empty words (double spaces) contribute nothing
    assert encode_text("the  the") == (2, 2 * TOKEN_ID[b"the"])


def test_generator_is_reproducible():
    """bpe_vocab.py must be exactly what tools/gen_bpe_vocab.py emits
    for the committed training list (GENERATED-file contract)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "gen_bpe_vocab", os.path.join(os.path.dirname(__file__),
                                      "..", "tools", "gen_bpe_vocab.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    words = {w.encode(): 1000 // (r + 1)
             for r, w in enumerate(gen.TRAIN_WORDS)}
    assert gen.learn_merges(words, gen.N_MERGES) == MERGES
