"""Real-artifact loader seams (VERDICT r1 next #8): ARPA parsing +
backoff scoring, fastText header validation, the lm.get_model() swap-in
path (including through the fused kernel), and the PIL-optional image
decode seam — all against tiny checked-in / synthesized fixtures, no
network, no bundled binaries."""

from __future__ import annotations

import math
import os
import struct

import pytest

from data_quality_assessment_spark.functions import model_loaders as ml

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
ARPA = os.path.join(FIX, "tiny.arpa")


def test_arpa_parse_counts_and_entries():
    lm = ml.load_arpa(ARPA)
    assert len(lm.uni) == 5 and len(lm.bi) == 4
    assert lm.uni["the"] == (-0.60206, -0.30103)
    assert lm.bi[("the", "cat")] == (-0.30103, 0.0)


def test_arpa_backoff_scoring():
    lm = ml.load_arpa(ARPA)
    # existing bigram: direct log10 prob
    assert lm.score("the", "cat") == -0.30103
    # missing bigram (cat -> mat): backoff(cat) + uni(mat)
    assert lm.score("cat", "mat") == pytest.approx(-0.17609 + -1.0)
    # OOV current word maps to <unk>
    assert lm.score("the", "zzz") == pytest.approx(-0.30103 + -1.0)
    # case folding: engine tokens are matched lowercased
    assert lm.score("The", "CAT") == -0.30103


def test_arpa_perplexity_matches_hand_math():
    lm = ml.load_arpa(ARPA)
    # "the cat sat" -> score(the,cat) + score(cat,sat) over 2 transitions
    lp = -0.30103 + -0.39794
    want = round(10.0 ** (-lp / 2), 6)
    assert lm.perplexity("the cat sat") == want
    assert lm.perplexity("one") == 1.0  # <2 tokens


TRI_ARPA = """\\data\\
ngram 1=3
ngram 2=2
ngram 3=1

\\1-grams:
-0.5\tthe\t-0.2
-0.7\tcat\t-0.1
-0.9\tsat\t0.0

\\2-grams:
-0.3\tthe cat\t-0.15
-0.4\tcat sat

\\3-grams:
-0.25\tthe cat sat

\\end\\
"""


def test_arpa_trigram_backoff_chain(tmp_path):
    """Order-3 parsing + the standard backoff chain: existing trigram ->
    direct; missing trigram -> bigram backoff + bigram score."""
    p = tmp_path / "tri.arpa"
    p.write_text(TRI_ARPA)
    lm = ml.load_arpa(str(p))
    assert lm.order == 3
    assert lm.score3("the", "cat", "sat") == -0.25
    # (cat, sat, the): no trigram; backoff(cat sat)=0.0 + score(sat, the)
    # score(sat, the): no bigram (sat the) -> backoff(sat)=0.0 + uni(the)
    assert lm.score3("cat", "sat", "the") == pytest.approx(0.0 + 0.0 + -0.5)
    # perplexity: first transition scored as bigram, rest as trigram
    lp = lm.score("the", "cat") + lm.score3("the", "cat", "sat")
    assert lm.perplexity("the cat sat") == round(10.0 ** (-lp / 2), 6)


def test_arpa_order4_rejected(tmp_path):
    p = tmp_path / "o4.arpa"
    p.write_text("\\data\\\nngram 4=1\n\n\\4-grams:\n-1.0\ta b c d\n\\end\\\n")
    with pytest.raises(ValueError, match="unsupported"):
        ml.load_arpa(str(p))


def test_arpa_header_count_mismatch_rejected(tmp_path):
    bad = tmp_path / "bad.arpa"
    bad.write_text(
        "\\data\\\nngram 1=2\n\n\\1-grams:\n-1.0\tthe\t0.0\n\\end\\\n"
    )
    with pytest.raises(ValueError, match="declares 2"):
        ml.load_arpa(str(bad))


def test_get_model_arpa_seam(monkeypatch):
    from data_quality_assessment_spark.functions import lm as lm_mod

    model = lm_mod.get_model(arpa_path=ARPA)
    assert isinstance(model, ml.ArpaLM)
    # env-var path (the executor-side configuration)
    monkeypatch.setenv("DQ_SPARK_LM_ARPA", ARPA)
    model2 = lm_mod.get_model()
    assert isinstance(model2, ml.ArpaLM)
    monkeypatch.delenv("DQ_SPARK_LM_ARPA")
    assert not isinstance(lm_mod.get_model(), ml.ArpaLM)


def test_kernel_runs_with_arpa_model(monkeypatch):
    """The fused enrich kernel works with a swapped-in real LM (no
    perplexity_ids fast path) and its ppl matches the direct call."""
    monkeypatch.setenv("DQ_SPARK_LM_ARPA", ARPA)
    from data_quality_assessment_spark.functions.kernel import enrich_batch

    cols = enrich_batch([None], ["the cat sat on the mat"])
    lm = ml.load_arpa(ARPA)
    assert cols["ppl"][0] == lm.perplexity("the cat sat on the mat")
    monkeypatch.delenv("DQ_SPARK_LM_ARPA")


def _fake_fasttext_header(tmp_path, magic=ml.FASTTEXT_MAGIC, model=3):
    p = tmp_path / "lid.bin"
    ints = [16, 5, 5, 1, 5, 1, 3, model, 2_000_000, 2, 4, 100]  # dim..lrUpdateRate
    p.write_bytes(
        struct.pack("<ii", magic, 12)
        + struct.pack("<12i", *ints)
        + struct.pack("<d", 1e-4)
    )
    return str(p)


def test_fasttext_header_roundtrip(tmp_path):
    h = ml.read_fasttext_header(_fake_fasttext_header(tmp_path))
    assert h.dim == 16 and h.minn == 2 and h.maxn == 4
    assert h.is_supervised  # langid models are supervised
    assert h.t == pytest.approx(1e-4)


def test_fasttext_bad_magic_rejected(tmp_path):
    p = _fake_fasttext_header(tmp_path, magic=123)
    with pytest.raises(ValueError, match="not a fastText model"):
        ml.read_fasttext_header(p)


def test_image_decode_seam_fake_and_fallback():
    from data_quality_assessment_spark.functions import multimodal as mm

    assert mm._decode_image(mm.encode_fake_image(7, 9)) == (7, 9)
    if mm._PILImage is None:
        with pytest.raises(NotImplementedError):
            mm._decode_image(b"\x89PNG\r\n\x1a\nnotreal")
    else:
        # real codec present: a valid 1x1 PNG decodes through PIL
        import io

        buf = io.BytesIO()
        mm._PILImage.new("RGB", (3, 2)).save(buf, format="PNG")
        assert mm._decode_image(buf.getvalue()) == (3, 2)


def test_arpa_zero_count_higher_order_ignored(tmp_path):
    """Some tools emit 'ngram 4=0' in the header with no section body:
    that must parse cleanly (not KeyError); a NON-zero undeclared-body
    higher order still raises the clear unsupported-order error."""
    ok = tmp_path / "z4.arpa"
    ok.write_text(
        "\\data\\\nngram 1=1\nngram 4=0\n\n\\1-grams:\n-0.5\tthe\t0.0\n\\end\\\n"
    )
    lm = ml.load_arpa(str(ok))
    assert lm.score("x", "the") == -0.5
    bad = tmp_path / "nz4.arpa"
    bad.write_text(
        "\\data\\\nngram 1=1\nngram 4=3\n\n\\1-grams:\n-0.5\tthe\t0.0\n\\end\\\n"
    )
    with pytest.raises(ValueError, match="unsupported"):
        ml.load_arpa(str(bad))
