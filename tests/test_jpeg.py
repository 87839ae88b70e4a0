"""Baseline JPEG decoder tests: a minimal spec-layout JPEG WRITER
(canonical Huffman, byte stuffing, restart markers) drives round-trips
whose expected pixels are derived by an INDEPENDENT explicit-cosine
IDCT in the test — not the decoder's basis matrix."""

from __future__ import annotations

import math
import struct

import numpy as np

from data_quality_assessment_spark.functions import jpeg as J
from data_quality_assessment_spark.functions import multimodal as mm


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _tables(symbols):
    """All symbols at code length 8 (canonical: codes 0..n-1)."""
    counts = [0] * 16
    counts[7] = len(symbols)
    enc = {s: (8, i) for i, s in enumerate(symbols)}
    return counts, list(symbols), enc


DC_SYMS = list(range(12))
AC_SYMS = sorted({(r << 4) | s for r in range(16) for s in range(11)} | {0x00})


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits (spec)

    def raw_marker(self, m):
        self.align()
        self.out += bytes([0xFF, m])


def _cat(v):
    return v.bit_length() if v > 0 else (-v).bit_length()


def _emit_block(bw, zz, pred, dc_enc, ac_enc):
    diff = int(zz[0]) - pred
    t = _cat(diff)
    ln, code = dc_enc[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    k = 1
    while k < 64:
        run = 0
        while k < 64 and zz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            ln, code = ac_enc[0x00]  # EOB
            bw.put(code, ln)
            break
        while run >= 16:
            ln, code = ac_enc[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        v = int(zz[k])
        s = _cat(v)
        ln, code = ac_enc[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        k += 1
    return int(zz[0])


def encode_jpeg(h, w, comps, qts, blocks, dri=0):
    """comps: [{'id','h','v','tq'}]; qts: {tid: 64 ints natural order};
    blocks[ci]: {(brow, bcol): 8x8 int array (quantized, natural)}."""
    out = bytearray(b"\xff\xd8")
    for tid, q in qts.items():
        q = np.asarray(q).reshape(64)
        zzq = q[J.ZIGZAG]  # DQT ships zig-zag order
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65)
        out += bytes([tid]) + bytes(int(x) for x in zzq)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w,
                                     len(comps))
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    dc_counts, dc_syms, dc_enc = _tables(DC_SYMS)
    ac_counts, ac_syms, ac_enc = _tables(AC_SYMS)
    for cls, (counts, syms) in ((0, (dc_counts, dc_syms)),
                                (1, (ac_counts, ac_syms))):
        out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(syms))
        out += bytes([cls << 4]) + bytes(counts) + bytes(syms)
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for c in comps:
        out += bytes([c["id"], 0x00])  # DC table 0, AC table 0
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl
    bw = _BitWriter()
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    preds = [0] * len(comps)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                bw.raw_marker(0xD0 + (rst % 8))
                rst += 1
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = blocks[ci][(my * c["v"] + by,
                                          mx * c["h"] + bx)]
                        zz = np.asarray(blk).reshape(64)[J.ZIGZAG]
                        preds[ci] = _emit_block(bw, zz, preds[ci],
                                                dc_enc, ac_enc)
            mcu_count += 1
    bw.align()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def _ref_idct(coeffs):
    """Independent explicit-cosine IDCT (T.81 A.3.3), no shared code."""
    out = np.zeros((8, 8))
    for y in range(8):  # y = sample row, pairs the VERTICAL frequency u
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * coeffs[u][v]
                          * math.cos((2 * y + 1) * u * math.pi / 16)
                          * math.cos((2 * x + 1) * v * math.pi / 16))
            out[y, x] = s / 4.0
    return out


# NOTE on orientation: coeffs[u][v] with u the vertical frequency —
# _ref_idct(coeffs)[row, col] must match the decoder's A.T @ F @ A.


def test_idct_basis_agreement():
    rng = np.random.RandomState(0)
    f = rng.randint(-50, 50, (8, 8)).astype(np.float64)
    np.testing.assert_allclose(J.idct_block(f), _ref_idct(f), atol=1e-9)


def test_jpeg_gray_dc_only():
    """Uniform 8x8: DC=8, quant 1 -> every sample 8/8=1 -> 129."""
    blk = np.zeros((8, 8), np.int64)
    blk[0, 0] = 8
    blob = encode_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1, "tq": 0}],
                       {0: np.ones(64, np.int64)}, [{(0, 0): blk}])
    got = J.jpeg_pixels(blob)
    assert got.shape == (8, 8, 3)
    assert (got == 129).all()


def test_jpeg_gray_dc_prediction_chain():
    """Two MCUs with different DCs: the second block's DC is DIFF-coded
    against the first (negative diff exercises sign extension)."""
    b1 = np.zeros((8, 8), np.int64)
    b1[0, 0] = 40
    b2 = np.zeros((8, 8), np.int64)
    b2[0, 0] = -24
    blob = encode_jpeg(8, 16, [{"id": 1, "h": 1, "v": 1, "tq": 0}],
                       {0: np.ones(64, np.int64)},
                       [{(0, 0): b1, (0, 1): b2}])
    got = J.jpeg_pixels(blob)
    assert (got[:, :8] == np.clip(round(40 / 8) + 128, 0, 255)).all()
    assert (got[:, 8:] == np.clip(round(-24 / 8) + 128, 0, 255)).all()


def test_jpeg_ac_pattern_roundtrip():
    """Random quantized blocks with a non-trivial quant table: decoder
    output equals the independent IDCT pipeline within rounding."""
    rng = np.random.RandomState(7)
    qt = rng.randint(1, 9, 64).astype(np.int64)
    grid = {}
    expect = np.zeros((16, 16))
    for br in range(2):
        for bc in range(2):
            blk = np.zeros((8, 8), np.int64)
            blk[0, 0] = rng.randint(-60, 60)
            for _ in range(6):
                blk[rng.randint(8), rng.randint(8)] = rng.randint(-30, 30)
            grid[(br, bc)] = blk
            deq = blk.astype(np.float64) * qt.reshape(8, 8)
            expect[br * 8:br * 8 + 8, bc * 8:bc * 8 + 8] = (
                _ref_idct(deq) + 128.0
            )
    blob = encode_jpeg(16, 16, [{"id": 1, "h": 1, "v": 1, "tq": 0}],
                       {0: qt}, [grid])
    got = J.jpeg_pixels(blob)[:, :, 0].astype(np.float64)
    np.testing.assert_allclose(
        got, np.clip(np.round(expect), 0, 255), atol=1.0
    )


def test_jpeg_color_420_uniform():
    """4:2:0 16x16, DC-only planes: Y=160, Cb=128+16, Cr=128-8 ->
    one flat RGB via the JFIF matrix."""
    ydc = (160 - 128) * 8  # spatial = dc/8
    cbdc = 16 * 8
    crdc = -8 * 8
    yb = np.zeros((8, 8), np.int64)
    yb[0, 0] = ydc
    cb = np.zeros((8, 8), np.int64)
    cb[0, 0] = cbdc
    cr = np.zeros((8, 8), np.int64)
    cr[0, 0] = crdc
    comps = [{"id": 1, "h": 2, "v": 2, "tq": 0},
             {"id": 2, "h": 1, "v": 1, "tq": 0},
             {"id": 3, "h": 1, "v": 1, "tq": 0}]
    blocks = [
        {(r, c): yb for r in range(2) for c in range(2)},
        {(0, 0): cb},
        {(0, 0): cr},
    ]
    blob = encode_jpeg(16, 16, comps, {0: np.ones(64, np.int64)}, blocks)
    got = J.jpeg_pixels(blob)
    assert got.shape == (16, 16, 3)
    r = round(160 + 1.402 * (-8))               # R pairs Cr
    g = round(160 - 0.344136 * 16 - 0.714136 * (-8))
    b = round(160 + 1.772 * 16)                 # B pairs Cb
    assert (got[:, :, 0] == r).all()
    assert (got[:, :, 1] == g).all()
    assert (got[:, :, 2] == b).all()


def test_jpeg_restart_markers():
    """DRI=1: an RSTn between every MCU, DC predictors reset — both
    blocks carry ABSOLUTE DCs."""
    b1 = np.zeros((8, 8), np.int64)
    b1[0, 0] = 16
    b2 = np.zeros((8, 8), np.int64)
    b2[0, 0] = 48
    blob = encode_jpeg(8, 16, [{"id": 1, "h": 1, "v": 1, "tq": 0}],
                       {0: np.ones(64, np.int64)},
                       [{(0, 0): b1, (0, 1): b2}], dri=1)
    got = J.jpeg_pixels(blob)
    assert (got[:, :8] == 16 // 8 + 128).all()
    assert (got[:, 8:] == 48 // 8 + 128).all()


def test_jpeg_header_dims_still_work():
    """jpeg_dimensions (header path) agrees with the full decode."""
    blk = np.zeros((8, 8), np.int64)
    blk[0, 0] = 8
    blob = encode_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1, "tq": 0}],
                       {0: np.ones(64, np.int64)}, [{(0, 0): blk}])
    assert mm.jpeg_dimensions(blob) == (8, 8)


def test_jpeg_pixels_non_jpeg():
    assert J.jpeg_pixels(b"not a jpeg") is None


def test_image_pixel_stats_jpeg(spark):
    """JPEG blobs flow through the mapInPandas extractor: a flat gray
    image has equal channel means at the DC value."""
    blk = np.zeros((8, 8), np.int64)
    blk[0, 0] = 8 * 32  # spatial 32 -> sample 160
    blob = encode_jpeg(8, 8, [{"id": 1, "h": 1, "v": 1, "tq": 0}],
                       {0: np.ones(64, np.int64)}, [{(0, 0): blk}])
    df = spark.createDataFrame(
        [(1, "image", blob, "image/jpeg")], mm.MEDIA_SCHEMA
    )
    r = mm.image_pixel_stats(df).collect()[0]
    assert (r.width, r.height) == (8, 8)
    assert (r.mean_r, r.mean_g, r.mean_b) == (160.0, 160.0, 160.0)
    assert r.valid


def test_encode_dc_jpeg_fixture():
    """The in-package DC-only fixture encoder round-trips through the
    decoder (multi-block image exercises the diff-0 chain)."""
    for dc in (-96, -8, 0, 8, 88):
        got = J.jpeg_pixels(J.encode_dc_jpeg(24, 16, dc))
        assert got.shape == (16, 24, 3)
        assert (got == np.clip(dc // 8 + 128, 0, 255)).all(), dc


def test_decode_block_raises_on_ac_run_past_block():
    """An AC symbol whose run escapes the block with a pending magnitude
    (not producible by a conforming encoder) must raise instead of
    silently breaking with the s bits unconsumed — the old break
    desynced the entropy stream and decoded later MCUs to garbage
    reported as valid=true stats (ADVICE r5)."""
    import numpy as np
    import pytest

    from data_quality_assessment_spark.functions import jpeg as J

    dc = J._Huffman([1] + [0] * 15, bytes([0]))        # t=0 at code 0
    ac = J._Huffman([1] + [0] * 15, bytes([0xF5]))     # run=15, s=5 at code 0
    # every symbol is the 1-bit code 0: k walks 16,32,48 then the 4th
    # ZRL-with-magnitude pushes k to 64 with s=5 pending
    br = J._BitReader(bytes(12), 0)
    with pytest.raises(ValueError):
        J._decode_block(br, dc, ac, 0, np.ones(64))
