"""The DuckDB scrub oracle (two-pass boundary-consuming rewrite of the
PHONE/IP lookarounds) must reproduce ``textcore.scrub_text`` byte-for-
byte, counts included — on adversarial adjacency chains especially,
since those are exactly where a consuming-boundary rewrite can diverge
from zero-width assertions."""

from __future__ import annotations

import duckdb
import pytest

from data_quality_assessment_spark.functions.textcore import scrub_text

try:
    from hypothesis import given, settings, strategies as st
    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def _duck_scrub(texts: list[str]):
    """Run the entry oracle's scrub SQL over an in-memory documents
    table shaped like the sf fixtures."""
    import __spark_entry__ as entry

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT "
        "row_number() OVER () - 1 AS doc_id, 'h' AS source, t AS text "
        "FROM (SELECT unnest(?) AS t)",
        [texts],
    )
    sql = entry._oracle_pipeline_scrub_sql()
    rows = con.execute(sql + " ORDER BY url").fetchall()
    con.close()
    # url embeds doc_id -> map back to input order
    out = {}
    for url, scrubbed, e, i, p, s in rows:
        idx = int(url.rsplit("/", 1)[1])
        out[idx] = (scrubbed, e, i, p, s)
    return [out[i] for i in range(len(texts))]


CASES = [
    "plain clean text with no pii at all",
    "write to alice.smith+x@sub.example.co.uk now",
    "host 10.0.0.1 and 192.168.10.250, not 1.2.3.4.5 ok",
    "call +91-9876543210 or (555) 123-4567 or 044-2345678",
    "GrokFlarp! but notgrokflarpish stays",
    # adjacency chains — single-char boundaries between matches (the
    # consuming-rewrite's hard case; needs the second pass)
    "1.1.1.1 2.2.2.2 3.3.3.3 4.4.4.4 5.5.5.5",
    "10.0.0.1,10.0.0.2,10.0.0.3",
    "044-2345678 055-2345678 066-2345678",
    "+1 5551234567 +2 5551234567",
    "a@b.co c@d.co e@f.co",
    # boundaries at string edges
    "1.2.3.4",
    "044-2345678",
    "x 1.2.3.4",
    "1.2.3.4 x",
    # rejected boundaries (alnum / dot adjacency)
    "51.2.3.4 and 1.2.3.45x and 1.2.3.4.5",
    "x044-2345678 and 044-23456789x",
    # the two rewrites that LOOK right and are wrong (see the oracle
    # docstring): token-boundary unblocking and inner-match stealing
    "044-2345678+91-9876543210",
    "044-2345678.(555) 123-4567",
    # mixed rules interacting in order (email eats digits first)
    "a1234567890@example.com then 9.9.9.9 grokflarp",
    "",
    "\n1.2.3.4\n5.6.7.8\n",
]


@pytest.mark.parametrize("text", CASES)
def test_duck_scrub_matches_python(text):
    scrubbed, counts = scrub_text(text)
    (d_scrub, de, di, dp, ds) = _duck_scrub([text])[0]
    assert d_scrub == scrubbed, (text, d_scrub, scrubbed)
    assert (de, di, dp, ds) == (
        counts["pii_email"], counts["pii_ip"], counts["pii_phone"],
        counts["toxicity_slur"],
    ), text


def test_duck_scrub_batch_consistency():
    want = [scrub_text(t) for t in CASES]
    got = _duck_scrub(list(CASES))
    for t, (w_s, w_c), (g_s, ge, gi, gp, gs) in zip(CASES, want, got):
        assert g_s == w_s, t
        assert (ge, gi, gp, gs) == (
            w_c["pii_email"], w_c["pii_ip"], w_c["pii_phone"],
            w_c["toxicity_slur"],
        ), t


if HAVE_HYP:
    pii_atoms = st.sampled_from([
        "1.2.3.4", "10.0.0.255", "044-2345678", "+91-9876543210",
        "(555) 123-4567", "a@b.co", "grokflarp", "QUANDRIX",
        " ", ",", "x", "5", ".", "-", "\n", "word",
    ])

    @settings(max_examples=150, deadline=None)
    @given(st.lists(pii_atoms, max_size=12))
    def test_duck_scrub_matches_python_property(atoms):
        text = "".join(atoms)
        scrubbed, counts = scrub_text(text)
        (d_scrub, de, di, dp, ds) = _duck_scrub([text])[0]
        assert d_scrub == scrubbed, text
        assert (de, di, dp, ds) == (
            counts["pii_email"], counts["pii_ip"], counts["pii_phone"],
            counts["toxicity_slur"],
        ), text
