"""The fused per-document enrich kernel (pure Python/numpy, no Spark).

One pass per document computing EVERYTHING the quality DAG needs from the
text: extraction, language id, perplexity, repetition signals, PII scrub,
and the heuristic text statistics. Shared across:

  * ``udfs.enrich_udf`` — the single ArrowEvalPython node of the flagship
    pipeline (each Arrow batch -> ``enrich_batch``),
  * the pandas test oracle (same functions, same floats — byte-identical
    by construction).

Why the stats moved here from native Columns (measured, 400k docs): the
pipeline's bottleneck at local[32] is JVM+Python core oversubscription —
every task runs a JVM thread AND a Python worker, and the JVM side was
spending ~7 regex passes per doc (textstats) while the Python side
re-tokenized the same text. Computing the stats from the tokens the
kernel already holds costs ~6µs/doc in Python and removes the JVM regex
work AND the ``text_extracted`` column from the Arrow return path
(~half the UDF output bytes). The native twins in ``textstats.py`` remain
the scale path for SQL-only callers and are pinned equal by tests.

Work sharing inside the kernel (profiled per ~90-word doc):
  tokenize once -> tokens; lowercase+VOCAB-lookup once -> ids;
  ids serve langid evidence, stopword_frac, AND the bigram LM;
  script counting is one searchsorted+bincount over the codepoints.
"""

from __future__ import annotations

from . import textcore
from .lm import get_model

ENRICH_COLS = (
    "lang_pred", "lang_conf", "ppl", "top_bigram_share",
    "scrubbed_text", "pii_email", "pii_ip", "pii_phone", "toxicity_slur",
    "nw", "mean_wl", "symbol_ratio", "stopword_frac", "dup_line_frac",
)


def enrich_doc(html: bytes | None, text: str | None) -> tuple:
    """Single-document enrich (the oracle-facing scalar form)."""
    cols = enrich_batch([html], [text])
    return tuple(cols[k][0] for k in ENRICH_COLS)


def enrich_batch(htmls, texts) -> dict[str, list]:
    """Columnar enrich over parallel sequences of (html, text).

    Extraction precedence: html when present, else the text column.
    Returns {column: list} in ENRICH_COLS order, ready for
    ``pd.DataFrame`` without a row->column transpose.
    """
    model = get_model()  # per-worker singleton
    # the frozen BigramLM scores straight from the shared ids array; a
    # swapped-in real LM (model_loaders.ArpaLM) scores from the tokens
    use_ids = hasattr(model, "perplexity_ids")
    # real fastText langid when DQ_SPARK_FASTTEXT is set (per-worker
    # singleton, numpy forward pass — model_loaders.FastTextModel);
    # None -> the heuristic textcore.lang_id
    from .model_loaders import get_fasttext

    ft = get_fasttext()
    out: dict[str, list] = {k: [] for k in ENRICH_COLS}
    ap = {k: out[k].append for k in ENRICH_COLS}
    n_stop = textcore.N_STOPWORDS
    symbol_findall = textcore._SYMBOL_RE.findall
    for b, t in zip(htmls, texts):
        if b is not None:
            txt = textcore.extract_text(bytes(b))
        elif isinstance(t, str):
            txt = t
        else:
            txt = ""
        toks = textcore.tokenize(txt)
        nw = len(toks)
        ids = textcore.word_ids(toks)
        lang, conf = (
            ft.predict_lang(txt) if ft is not None
            else textcore.lang_id(txt, toks, ids=ids)
        )
        scrubbed, c = textcore.scrub_text(txt)
        ap["lang_pred"](lang)
        ap["lang_conf"](conf)
        ap["ppl"](
            model.perplexity_ids(ids) if use_ids
            else model.perplexity(txt, toks)
        )
        ap["top_bigram_share"](textcore.top_bigram_share(txt, toks))
        # NULL means "no scrub rule fired: scrubbed text == extracted
        # text" (exactly when every rule count is 0 — a subn with n>0
        # always changes the text). On clean web text (the common case)
        # this shrinks the dominant Arrow output column to near zero —
        # the UDF no longer echoes the whole document back to the JVM.
        # Consumers needing the bytes coalesce via
        # plans.pipeline.materialize_scrubbed (native extraction twin).
        ap["scrubbed_text"](
            scrubbed
            if (c["pii_email"] or c["pii_ip"] or c["pii_phone"]
                or c["toxicity_slur"])
            else None
        )
        ap["pii_email"](c["pii_email"])
        ap["pii_ip"](c["pii_ip"])
        ap["pii_phone"](c["pii_phone"])
        ap["toxicity_slur"](c["toxicity_slur"])
        ap["nw"](nw)
        if nw:
            ap["mean_wl"](sum(map(len, toks)) / nw)
            ap["symbol_ratio"](len(symbol_findall(txt)) / nw)
            ap["stopword_frac"](int((ids < n_stop).sum()) / nw)
        else:
            ap["mean_wl"](0.0)
            ap["symbol_ratio"](0.0)
            ap["stopword_frac"](0.0)
        ap["dup_line_frac"](textcore.dup_line_frac(txt))
    return out
