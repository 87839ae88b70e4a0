"""Scrubber unit + property tests (SURVEY.md §5.2.3-4)."""

from __future__ import annotations

from data_quality_assessment_spark.functions.textcore import scrub_text

try:
    from hypothesis import given, settings, strategies as st
    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def test_email():
    s, c = scrub_text("write to alice.smith+x@sub.example.co.uk now")
    assert s == "write to <EMAIL> now"
    assert c["pii_email"] == 1


def test_phone_variants():
    cases = [
        ("call +91-9876543210 now", "call <PHONE> now"),
        ("call (555) 123-4567 now", "call <PHONE> now"),
        ("fax 044-2345678 ok", "fax <PHONE> ok"),
        ("+1 5551234567", "<PHONE>"),
    ]
    for raw, want in cases:
        s, c = scrub_text(raw)
        assert s == want, raw
        assert c["pii_phone"] == 1, raw


def test_ip_and_boundaries():
    s, c = scrub_text("host 10.0.0.1 and 192.168.10.250, not 1.2.3.4.5 ok")
    assert "<IP>" in s and c["pii_ip"] == 2
    # dotted-quad run of 5 numbers is not a bare IPv4
    assert "1.2.3.4.5" in s


def test_slur_case_insensitive_word_boundary():
    s, c = scrub_text("GrokFlarp! but notgrokflarpish stays")
    assert s == "<SLUR>! but notgrokflarpish stays"
    assert c["toxicity_slur"] == 1


def test_email_takes_precedence_over_phone():
    s, _ = scrub_text("a1234567890@example.com")
    assert s == "<EMAIL>"


def test_unicode_preserved():
    s, _ = scrub_text("héllo wörld — нет piiä")
    assert s == "héllo wörld — нет piiä"


def test_idempotent_on_samples():
    samples = [
        "x a@b.co +91-9876543210 10.0.0.1 grokflarp y",
        "nested <EMAIL> token stays",
        "",
    ]
    for t in samples:
        once, _ = scrub_text(t)
        twice, _ = scrub_text(once)
        assert once == twice


if HAVE_HYP:

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=200))
    def test_idempotent_property(t):
        once, _ = scrub_text(t)
        twice, _ = scrub_text(once)
        assert once == twice


def test_slur_ascii_case_folding_gate_exact():
    """SLUR_RE is compiled with re.ASCII so the lowercase-substring
    fast-path in scrub_text is an exact necessary condition: Unicode
    case variants (U+0130 'İ', U+0131 'ı', U+017F 'ſ') neither match
    the regex nor pass the gate — no silent gate/regex divergence."""
    from data_quality_assessment_spark.functions.textcore import (
        SLUR_RE, SLUR_LEXICON,
    )

    variants = ["QUANDRİX", "quandrıx", "blortfang".replace("s", "ſ")]
    for t in variants:
        scrubbed, counts = scrub_text(t)
        gate = any(s in t.lower() for s in SLUR_LEXICON)
        assert bool(SLUR_RE.search(t)) == gate, t
        if not gate:
            assert scrubbed == t and counts["toxicity_slur"] == 0, t
    # plain ASCII case variants are still scrubbed
    s, c = scrub_text("QUANDRIX and Quandrix and quandrix")
    assert s == "<SLUR> and <SLUR> and <SLUR>" and c["toxicity_slur"] == 3
