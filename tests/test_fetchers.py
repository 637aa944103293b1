"""Tokenizer-fetcher tests: pure-function behavior + parity vs reference."""

import sys

import pytest

from tests.conftest import REFERENCE_ROOT, reference_available, enable_reference_imports
from peneo_tpu.data import fetchers as F


def _ref_fetchers():
    enable_reference_imports()
    import model.backbone_mapping as bm  # noqa

    return bm


XLM_CASES = [
    ("Hello world", ["▁Hello", "▁world"]),
    ("DATE: 2024-01-01", ["▁DATE", ":", "▁2024", "-", "01", "-", "01"]),
    ("ＡＢ ｃｄ", ["▁AB", "▁cd"]),  # full-width originals vs half-width tokens
    ("total  amount", ["▁total", "▁amount"]),  # double space collapse
    ("ab", ["▁a", "x", "b"]),  # token char with no original counterpart
]

ROBERTA_CASES = [
    ("Hello world", ["Hello", "Ġworld"]),
    ("DATE: 2024", ["DATE", ":", "Ġ2024"]),
    ("a ° b", ["a", "ĠÂ°", "Ġb"]),
    ("x  y", ["x", "Ġ", "Ġy"]),
    ("q €", ["q", "Ġ", "<unk>"]),
]

WORDPIECE_CASES = [
    ("Hello world", ["hello", "world"]),
    ("playing", ["play", "##ing"]),
    ("café bar", ["cafe", "bar"]),  # accent folding
    ("a € b", ["a", "[UNK]", "b"]),
]

V3_CASES = [
    ("Hello world", ["Hello", "Ġworld"]),
    (" lead", ["Ġlead"]),  # first-token leading space → ''
    ("a ° b", ["a", "ĠÂ°", "Ġb"]),
]


def _roundtrip(fetched, orig):
    return "".join(fetched)


@pytest.mark.parametrize("orig,toks", XLM_CASES)
def test_xlm_reconstruction(orig, toks):
    fetched = F.fetch_xlm(orig, toks)
    assert len(fetched) == len(toks)
    # concatenation must reproduce the original text modulo leading spaces
    assert _roundtrip(fetched, orig).replace(" ", "") == orig.replace(" ", "").translate(
        str.maketrans({chr(c): chr(c - 0xFEE0) for c in range(0xFF01, 0xFF5F)})
    ) or _roundtrip(fetched, orig) == orig


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("orig,toks", XLM_CASES)
def test_xlm_parity(orig, toks):
    ref = _ref_fetchers()
    assert F.fetch_xlm(orig, toks) == ref.fetcher_XLMTokenizer(orig, toks)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("orig,toks", ROBERTA_CASES)
def test_roberta_parity(orig, toks):
    ref = _ref_fetchers()
    assert F.fetch_roberta(orig, toks) == ref.fetcher_RobertaTokenizer(orig, toks)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("orig,toks", WORDPIECE_CASES)
def test_wordpiece_parity(orig, toks):
    ref = _ref_fetchers()
    assert F.fetch_wordpiece(orig, toks) == ref.fetcher_LayoutLMv2Tokenizer(orig, toks)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("orig,toks", V3_CASES)
def test_layoutlmv3_parity(orig, toks):
    ref = _ref_fetchers()
    assert F.fetch_layoutlmv3(orig, toks) == ref.fetcher_LayoutLMv3Tokenizer(orig, toks)


def test_empty_text():
    assert F.fetch_roberta("", ["a"]) == []
    assert F.fetch_wordpiece("   ", ["a"]) == []
    assert F.fetch_layoutlmv3("", []) == []
