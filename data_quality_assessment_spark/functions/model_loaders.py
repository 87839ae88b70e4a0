"""Real-artifact model loaders — the seams where production weights plug
into the langid / perplexity stages (VERDICT r1 next #8).

The in-repo stand-ins (``lm.BigramLM``, ``textcore.lang_id``) are what
run offline; these loaders make the swap-in path REAL and unit-tested
against tiny checked-in fixtures (tests/fixtures/):

  * ``load_arpa`` — parses the standard ARPA n-gram text format (the
    format KenLM reads/writes: ``\\data\\`` counts header, per-order
    ``\\N-grams:`` sections of ``log10p<TAB>ngram[<TAB>backoff]``).
    Returns an ``ArpaLM`` with KenLM-style backoff scoring and a
    ``perplexity(text, tokens)`` method API-compatible with
    ``BigramLM`` — ``lm.get_model`` returns it when the
    ``DQ_SPARK_LM_ARPA`` env var (or explicit path) is set.
  * ``read_fasttext_header`` — validates a fastText ``.bin``/``.ftz``
    model header (magic ``FastText_FileFormat_Magic_Int32`` =
    793712314, version, and the 12 int32/int64/double hyperparameters)
    so a real ``lid.176.ftz`` is recognized and its dims surfaced;
    actual inference requires the fasttext wheel (absent offline) and
    raises ``NotImplementedError`` past the header seam.

No network, no bundled binaries: fixtures are a ~20-line hand-written
ARPA file and a synthesized 64-byte fastText header.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

FASTTEXT_MAGIC = 793712314  # src/fasttext.cc FASTTEXT_FILEFORMAT_MAGIC_INT32
_UNK = "<unk>"


@dataclass(frozen=True)
class FastTextHeader:
    version: int
    dim: int
    ws: int
    epoch: int
    min_count: int
    neg: int
    word_ngrams: int
    loss: int          # 1=hs 2=ns 3=softmax
    model: int         # 1=cbow 2=sg 3=supervised (langid models)
    bucket: int
    minn: int
    maxn: int
    lr_update_rate: int
    t: float

    @property
    def is_supervised(self) -> bool:
        return self.model == 3


def read_fasttext_header(path: str) -> FastTextHeader:
    """Parse and validate a fastText model file header (.bin; .ftz is
    the same header — quantization flags only in the body)."""
    with open(path, "rb") as f:
        magic, version = struct.unpack("<ii", f.read(8))
        if magic != FASTTEXT_MAGIC:
            raise ValueError(
                f"not a fastText model (magic {magic} != {FASTTEXT_MAGIC})"
            )
        # Args::load order: dim ws epoch minCount neg wordNgrams loss
        # model bucket minn maxn lrUpdateRate (int32) + t (double)
        vals = struct.unpack("<12i", f.read(48))
        (t,) = struct.unpack("<d", f.read(8))
    return FastTextHeader(version, *vals, t)


class ArpaLM:
    """ARPA n-gram model (orders 1-3) with standard Katz-style backoff:

    p(w | u v) = trigram                       if present
               = backoff(u v) + p(w | v)       otherwise
    p(w | v)   = bigram                        if present
               = backoff(v) + p(w)             otherwise

    OOV words map to ``<unk>`` when present, else get ``oov_log10p``.
    ``perplexity`` mirrors KenLM: 10 ** (-mean log10 p over scored
    transitions; first transition bigram-scored in trigram mode),
    rounded 6dp like the in-repo BigramLM.
    """

    def __init__(
        self,
        uni: dict[str, tuple[float, float]],   # word -> (log10p, backoff)
        bi: dict[tuple[str, str], tuple[float, float]],  # (v,w) -> (log10p, backoff)
        tri: dict[tuple[str, str, str], float] | None = None,  # (u,v,w) -> log10p
        oov_log10p: float = -7.0,
    ) -> None:
        self.uni = uni
        self.bi = bi
        self.tri = tri or {}
        self.oov_log10p = oov_log10p

    @property
    def order(self) -> int:
        return 3 if self.tri else 2

    def _norm(self, w: str) -> str:
        wl = w.lower()
        return wl if wl in self.uni else _UNK

    def _uni_logp(self, w: str) -> float:
        e = self.uni.get(w)
        return e[0] if e is not None else self.oov_log10p

    def score(self, prev: str, cur: str) -> float:
        """Bigram score with unigram backoff."""
        v, w = self._norm(prev), self._norm(cur)
        p = self.bi.get((v, w))
        if p is not None:
            return p[0]
        bo = self.uni.get(v, (0.0, 0.0))[1]
        return bo + self._uni_logp(w)

    def score3(self, p2: str, p1: str, cur: str) -> float:
        """Trigram score with the standard backoff chain:
        p(w|u v) = trigram, else backoff(u v) + p(w|v)."""
        u, v, w = self._norm(p2), self._norm(p1), self._norm(cur)
        p = self.tri.get((u, v, w))
        if p is not None:
            return p
        bo = self.bi.get((u, v), (0.0, 0.0))[1]
        return bo + self.score(p1, cur)

    def perplexity(self, text: str, tokens: list[str] | None = None) -> float:
        from .textcore import tokenize

        ws = tokens if tokens is not None else tokenize(text or "")
        if len(ws) < 2:
            return 1.0
        lp = 0.0
        if self.tri:
            lp += self.score(ws[0], ws[1])
            for i in range(2, len(ws)):
                lp += self.score3(ws[i - 2], ws[i - 1], ws[i])
        else:
            for prev, cur in zip(ws, ws[1:]):
                lp += self.score(prev, cur)
        return float(round(10.0 ** (-lp / (len(ws) - 1)), 6))


def load_arpa(path: str) -> ArpaLM:
    """Parse an ARPA file (orders 1-3; KenLM writes exactly this text
    format). Higher orders are rejected with a clear error."""
    counts: dict[int, int] = {}
    uni: dict[str, tuple[float, float]] = {}
    bi: dict[tuple[str, str], tuple[float, float]] = {}
    tri: dict[tuple[str, str, str], float] = {}
    section = 0  # 0=preamble, 1=\data\, 2=n-grams
    order = 0
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            if line == "\\data\\":
                section = 1
                continue
            if line.startswith("\\") and line.endswith("-grams:"):
                order = int(line[1:line.index("-")])
                if order > 3:
                    raise ValueError(
                        f"ARPA order {order} unsupported (max trigram)"
                    )
                section = 2
                continue
            if line == "\\end\\":
                break
            if section == 1:
                # "ngram N=count"
                if line.startswith("ngram"):
                    n, c = line.split()[1].split("=")
                    counts[int(n)] = int(c)
                continue
            if section == 2:
                parts = line.split("\t")
                if len(parts) == 1:  # some writers use spaces
                    parts = line.split()
                    parts = [parts[0], " ".join(parts[1:order + 1]),
                             *parts[order + 1:]]
                logp = float(parts[0])
                ngram = parts[1]
                backoff = float(parts[2]) if len(parts) > 2 else 0.0
                if order == 1:
                    uni[ngram] = (logp, backoff)
                elif order == 2:
                    v, w = ngram.split(" ")
                    bi[(v, w)] = (logp, backoff)
                else:
                    u, v, w = ngram.split(" ")
                    tri[(u, v, w)] = logp
    for n, c in counts.items():
        if n > 3:
            # Some writers declare higher orders with zero entries
            # ("ngram 4=0" and no section body): harmless, skip. A
            # non-zero higher order is genuinely unsupported.
            if c == 0:
                continue
            raise ValueError(f"ARPA order {n} unsupported (max 3)")
        have = {1: len(uni), 2: len(bi), 3: len(tri)}[n]
        if have != c:
            raise ValueError(
                f"ARPA header declares {c} {n}-grams, file has {have}"
            )
    return ArpaLM(uni, bi, tri)
