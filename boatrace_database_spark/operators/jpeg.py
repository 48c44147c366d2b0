"""Pure-Python baseline JPEG codec (ITU-T T.81), no Pillow.

Round-10 closes the last stubbed media format: `decode_pixels` used to
raise for image/jpeg (the multimodal Pillow-fallback seam); this module
decodes baseline sequential-DCT JPEG from the public spec with numpy +
`struct` alone, so the real-decode path (extract_features / dHash /
resize / frame stats) is native for the most common real-corpus image
format. Like the other codecs it is driver-free: calls run inside
Arrow batches on executors, each touching only its own payload bytes.

Scope (public spec, ITU-T T.81 / JFIF):
- decode: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2:
  spectral selection, successive approximation, DC/AC first and
  refinement scans, EOB runs) — 8-bit, 1 or 3 components, any
  sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0 via nearest-neighbor
  chroma upsample), Huffman tables from DHT (the file's own tables —
  DCT JPEGs always carry them), restart intervals (DRI + RSTn),
  APPn/COM parsed for APP14 "Adobe" (4-component CMYK/YCCK with the
  Adobe inverted-sample convention), others skipped by the marker
  walk. Lossless/hierarchical SOFs, arithmetic coding, and 12-bit
  precision raise ValueError — the callers' fallback seam.
- encode: JFIF with the Annex-K example Huffman tables (a flat custom
  AC table for progressive scans — Annex-K defines no EOBn symbols)
  and Annex-K quantization tables scaled by the public libjpeg
  quality convention; grayscale or YCbCr at 4:4:4 (subsample=(1, 1)),
  4:2:0 (subsample=(2, 2)) or 4:2:2 (subsample=(2, 1)); optional
  restart interval (baseline);
  progressive spectral-selection script with optional successive
  approximation. Exists so tests can commit fixtures and
  property-check encode→decode round-trips — not a general imaging
  library. Progressive is an entropy REORDERING of the identical
  quantized coefficients, so progressive-decode == baseline-decode
  EXACTLY — the self-verifying invariant the tests pin.

Determinism contract (drives the `media_decode_jpeg` oracle in
queries/llm.py): quantization is floor(round(coef/Q + 0.5, 4)) and
the final sample reconstruction is
clip(floor(round(idct, 4) + 128.5), 0, 255). The 4-dp rounds collapse
float matmul noise (~1e-13) before each floor so a DuckDB oracle
computing the same closed form in exact arithmetic lands on the same
integer even when the true value sits exactly on a floor boundary
(encode side: DC ≡ Q/2 mod Q; decode side: a dequantized DC that is a
half-odd multiple of 8).

The DCT is one batched einsum over all blocks (T @ B @ T.T with the
orthonormal DCT-II basis), not a per-block loop; only the entropy
coder is sequential, as the bitstream itself is.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants from the public spec

# zigzag scan: ZIGZAG[k] = row-major index of the k-th coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)  # row-major index -> zigzag position

# Annex K Table K.1 / K.2 base quantization tables (row-major)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K example Huffman tables: (BITS[1..16], HUFFVAL). The decoder
# never assumes these — it builds tables from the file's DHT segments;
# the encoder writes them into DHT so any spec decoder can read ours.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Progressive AC Huffman table (encoder-side): the Annex-K baseline AC
# tables define no EOBn symbols (r<<4, r=1..14 — progressive-only), so
# progressive scans need their own table. A flat 8-bit canonical code
# over every symbol a progressive AC scan can emit (runs 0-15 × sizes
# 1-10, EOB0-EOB14, ZRL = 176 symbols < 255, so no all-ones code) —
# deliberately simple; the decoder reads whatever DHT the file carries.
AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
AC_PROG_VALS = (
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(15)]
    + [0xF0]
)

# orthonormal 8x8 DCT-II basis: T[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_T = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
_T.setflags(write=False)


def quality_tables(quality: int) -> tuple["np.ndarray", "np.ndarray"]:
    """Annex-K tables scaled by the public libjpeg quality convention:
    scale = 5000/q (q < 50) else 200 - 2q; Q = clip((base*scale+50)//100,
    1, 255). Returns (luma, chroma) row-major int64."""
    q = int(quality)
    if not 1 <= q <= 100:
        raise ValueError(f"encode_jpeg: quality must be in [1, 100], got {q}")
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def _s(base):
        return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)
    return _s(QUANT_LUMA), _s(QUANT_CHROMA)


# ---------------------------------------------------------------------------
# Huffman code construction (spec Annex C) — shared by encoder/decoder


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman for decoding: a (length, code) -> symbol map
    plus a 256-entry fast table resolving every code of <= 8 bits (the
    overwhelming majority in real tables) from one 8-bit peek."""
    table: dict[tuple[int, int], int] = {}
    fast: list = [None] * 256
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            if length <= 8:
                base = code << (8 - length)
                for suffix in range(1 << (8 - length)):
                    fast[base | suffix] = (vals[k], length)
            code += 1
            k += 1
        code <<= 1
    return {"map": table, "fast": fast}


def _bit_size(v: int) -> int:
    """JPEG magnitude category: number of bits to represent |v|."""
    return int(v).bit_length() if v else 0


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _fdct_quant(plane: "np.ndarray", qtab: "np.ndarray") -> "np.ndarray":
    """(bh*8, bw*8) float plane (already level-shifted) -> (bh*bw, 64)
    quantized zigzag coefficients, one batched einsum for the DCT."""
    h, w = plane.shape
    bh, bw = h // 8, w // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coefs = np.einsum("ux,nxy,vy->nuv", _T, blocks, _T, optimize=True)
    flat = coefs.reshape(-1, 64)[:, ZIGZAG]  # row-major -> zigzag
    # round 4 dp before the floor: collapses DCT matmul noise (~1e-13)
    # so coefficients landing exactly on a floor(+0.5) boundary (e.g.
    # DC ≡ Q/2 mod Q) quantize the way exact arithmetic would — the
    # encoder half of the determinism contract in the module docstring
    q = np.floor(np.round(flat / qtab[ZIGZAG] + 0.5, 4)).astype(np.int64)
    return q


def _encode_block(w: _BitWriter, zz: "np.ndarray", pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    dc = int(zz[0])
    diff = dc - pred
    s = _bit_size(diff)
    code, length = dc_codes[s]
    w.write(code, length)
    if s:
        w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (int(nz[-1]) + 1) if nz.size else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        s = _bit_size(v)
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return dc


def _pad_to(plane: "np.ndarray", mult_h: int, mult_w: int) -> "np.ndarray":
    """Edge-replicate so both dims are multiples of (mult_h, mult_w)."""
    h, w = plane.shape
    ph = (-h) % mult_h
    pw = (-w) % mult_w
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def rgb_to_ycbcr(px: "np.ndarray") -> "np.ndarray":
    """(h, w, 3) uint8 RGB -> float64 YCbCr (JFIF full-range BT.601)."""
    p = px.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: "np.ndarray") -> "np.ndarray":
    """float YCbCr -> uint8 RGB (JFIF full-range BT.601 inverse)."""
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(np.round(rgb, 4) + 0.5), 0, 255).astype(np.uint8)


def encode_jpeg(
    pixels: "np.ndarray",
    quality: int = 90,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
    progressive: bool = False,
    successive: bool = False,
    ycck: bool = False,
) -> bytes:
    """(h, w) uint8 gray, (h, w, 3) uint8 RGB, or (h, w, 4) uint8
    CMYK -> JFIF bytes.

    subsample=(1, 1) is 4:4:4; (2, 2) is 4:2:0 (chroma averaged over
    2x2, luma MCUs of 16x16); (2, 1) is 4:2:2. Gray input ignores
    subsample. A nonzero
    restart_interval writes DRI and emits RSTn every that-many MCUs
    (baseline only).

    CMYK input follows the Adobe convention real CMYK JPEGs use
    (Photoshop et al.): an APP14 "Adobe" marker is written and the
    stored samples are INVERTED (255 − value). ``ycck=True``
    additionally routes the inverted C/M/Y through the YCbCr forward
    transform (Adobe transform 2 — the wire format most CMYK photos
    ship with, since YCC decorrelates); default is transform 0
    (4:4:4 CMYK planes). CMYK is always encoded 4:4:4 with the luma
    quant/Huffman tables on all four components.

    progressive=True writes SOF2 with a spectral-selection script
    (interleaved DC scan, then one full 1-63 AC scan per component);
    successive=True additionally splits every scan into a first pass
    at Al=1 plus a refinement pass (Ah=1, Al=0), exercising the full
    successive-approximation surface (EOB runs, correction bits, new
    ±1 coefficients). Either way the QUANTIZED COEFFICIENTS are
    identical to the baseline encoding at the same quality/subsample —
    progressive is an entropy reordering, so decode must reproduce
    baseline-decode pixels EXACTLY (pinned in tests).
    """
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError("encode_jpeg: pixels must be uint8")
    if px.ndim == 2:
        ncomp = 1
    elif px.ndim == 3 and px.shape[2] == 3:
        ncomp = 3
    elif px.ndim == 3 and px.shape[2] == 4:
        ncomp = 4
    else:
        raise ValueError(
            "encode_jpeg: expected (h, w) gray, (h, w, 3) RGB or "
            f"(h, w, 4) CMYK, got shape {px.shape}"
        )
    if ycck and ncomp != 4:
        raise ValueError("encode_jpeg: ycck requires (h, w, 4) CMYK input")
    hs, vs = subsample
    if (hs, vs) not in ((1, 1), (2, 2), (2, 1)):
        raise ValueError(
            "encode_jpeg: subsample must be (1,1), (2,2) or (2,1)"
        )
    if ncomp in (1, 4):
        hs = vs = 1
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")
    qluma, qchroma = quality_tables(quality)

    # --- component planes (level-shifted), padded to the MCU grid
    if ncomp == 1:
        planes = [_pad_to(px.astype(np.float64) - 128.0, 8, 8)]
        samps = [(1, 1)]
        qtabs = [qluma]
        qids = [0]
    elif ncomp == 4:
        inv = 255.0 - px.astype(np.float64)  # Adobe inversion
        if ycck:
            ycc = rgb_to_ycbcr(np.clip(inv[..., :3], 0, 255).astype(np.uint8))
            chans = [ycc[..., 0], ycc[..., 1], ycc[..., 2], inv[..., 3]]
        else:
            chans = [inv[..., c] for c in range(4)]
        planes = [_pad_to(c - 128.0, 8, 8) for c in chans]
        samps = [(1, 1)] * 4
        qtabs = [qluma] * 4
        qids = [0] * 4
    else:
        ycc = rgb_to_ycbcr(px)
        ypl = _pad_to(ycc[..., 0] - 128.0, 8 * vs, 8 * hs)
        cbs, crs = [], []
        for c in (1, 2):
            pl = _pad_to(ycc[..., c], vs, hs)
            # box-average by the sampling factors, then pad to the
            # 8-grid (2x2 for 4:2:0; 1x2 for 4:2:2)
            if hs == 2 or vs == 2:
                pl = pl.reshape(
                    pl.shape[0] // vs, vs, pl.shape[1] // hs, hs
                )
                pl = pl.mean(axis=(1, 3))
            (cbs if c == 1 else crs).append(_pad_to(pl - 128.0, 8, 8))
        planes = [ypl, cbs[0], crs[0]]
        samps = [(hs, vs), (1, 1), (1, 1)]
        qtabs = [qluma, qchroma, qchroma]
        qids = [0, 1, 1]

    # --- quantized zigzag blocks per component, in raster block order
    zz = [_fdct_quant(pl, qt) for pl, qt in zip(planes, qtabs)]
    bw = [pl.shape[1] // 8 for pl in planes]  # blocks per row

    if progressive and restart_interval:
        raise ValueError(
            "encode_jpeg: restart_interval is supported for baseline "
            "encodes only (the decoder accepts both)"
        )

    # --- header segments
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
    if ncomp == 4:  # APP14 "Adobe": version 100, flags 0, transform
        out += b"\xff\xee" + struct.pack(">H", 14) + b"Adobe" \
            + struct.pack(">HHHB", 100, 0, 0, 2 if ycck else 0)
    for tid, qt in ((0, qluma),) + (((1, qchroma),) if ncomp == 3 else ()):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) \
            + bytes(int(v) for v in qt[ZIGZAG])
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i in range(ncomp):
        ch, cv = samps[i]
        out += bytes([i + 1, (ch << 4) | cv, qids[i]])
    ac_bits_l, ac_vals_l = (
        (AC_PROG_BITS, AC_PROG_VALS) if progressive
        else (AC_LUMA_BITS, AC_LUMA_VALS)
    )
    ac_bits_c, ac_vals_c = (
        (AC_PROG_BITS, AC_PROG_VALS) if progressive
        else (AC_CHROMA_BITS, AC_CHROMA_VALS)
    )
    huff = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
            (0x10, ac_bits_l, ac_vals_l)]
    if ncomp == 3:
        huff += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                 (0x11, ac_bits_c, ac_vals_c)]
    for tc_th, bits, vals in huff:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th) \
            + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(ac_bits_l, ac_vals_l)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(ac_bits_c, ac_vals_c)
    if ncomp == 4:  # luma tables on every component (only pair written)
        ctabs = [(dc_l, ac_l)] * 4
    else:
        ctabs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (ncomp - 1)
    mcux = planes[0].shape[1] // (8 * hs)
    mcuy = planes[0].shape[0] // (8 * vs)

    if progressive:
        _write_progressive_scans(
            out, zz, bw, samps, ncomp, (h, w), (mcux, mcuy),
            ctabs, successive,
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # --- baseline: ONE entropy-coded scan, MCU-interleaved
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        td_ta = 0x00 if (i == 0 or ncomp == 4) else 0x11
        out += bytes([i + 1, td_ta])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0
    writer = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    mcu_done = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_done and mcu_done % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci in range(ncomp):
                ch, cv = samps[ci]
                for by in range(cv):
                    for bx in range(ch):
                        bidx = (my * cv + by) * bw[ci] + (mx * ch + bx)
                        preds[ci] = _encode_block(
                            writer, zz[ci][bidx], preds[ci], *ctabs[ci]
                        )
            mcu_done += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (spectral selection + optional successive
# approximation) — the entropy REORDERING of the identical quantized
# coefficients; decode must equal baseline decode exactly


def _sos_header(comp_specs: list[tuple[int, int]], ss, se, ah, al) -> bytes:
    seg = bytearray(
        b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_specs),
                                  len(comp_specs))
    )
    for cid, td_ta in comp_specs:
        seg += bytes([cid, td_ta])
    seg += bytes([ss, se, (ah << 4) | al])
    return bytes(seg)


def _used_blocks(ci, samps, hs, vs, dims, grid):
    """Yield the non-interleaved (used) block indices of component ci,
    raster order — ceil(comp_dim/8) per axis, NOT the MCU-padded grid."""
    h, w = dims
    hmax, vmax = hs, vs  # frame maxima
    ch_, cv_ = samps[ci]
    cw = -(-w * ch_ // hmax)
    chh = -(-h * cv_ // vmax)
    bwu, bhu = -(-cw // 8), -(-chh // 8)
    gw = grid  # padded blocks per row for this component
    for by in range(bhu):
        for bx in range(bwu):
            yield by * gw + bx


class _ProgACWriter:
    """EOB-run-accumulating AC writer for progressive scans (the
    encode twin of `_ac_first`/`_ac_refine`, mirroring the public
    libjpeg structure so the bit order matches the spec decoder)."""

    def __init__(self, writer: _BitWriter, codes: dict):
        self.w = writer
        self.codes = codes
        self.eobrun = 0
        self.pending: list[int] = []

    def flush_eob(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, length = self.codes[r << 4]
            self.w.write(code, length)
            if r:
                self.w.write(self.eobrun, r)  # low r bits (top implied)
            self.eobrun = 0
        for bit in self.pending:
            self.w.write(bit, 1)
        self.pending = []

    def first_block(self, zz, al: int) -> None:
        r = 0
        for k in range(1, 64):
            v = int(zz[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            self.flush_eob()
            while r > 15:
                code, length = self.codes[0xF0]
                self.w.write(code, length)
                r -= 16
            s = t.bit_length()
            code, length = self.codes[(r << 4) | s]
            self.w.write(code, length)
            tv = t if v > 0 else -t
            self.w.write(tv if tv > 0 else tv + (1 << s) - 1, s)
            r = 0
        if r > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eob()

    def refine_block(self, zz, al: int) -> None:
        ab = [abs(int(zz[k])) >> al for k in range(64)]
        eob = 0
        for k in range(1, 64):
            if ab[k] == 1:
                eob = k
        r = 0
        br: list[int] = []
        for k in range(1, 64):
            t = ab[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                self.flush_eob()
                code, length = self.codes[0xF0]
                self.w.write(code, length)
                r -= 16
                for bit in br:
                    self.w.write(bit, 1)
                br = []
            if t > 1:  # already significant: correction bit
                br.append(t & 1)
                continue
            self.flush_eob()
            code, length = self.codes[(r << 4) | 1]
            self.w.write(code, length)
            self.w.write(1 if int(zz[k]) > 0 else 0, 1)
            for bit in br:
                self.w.write(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.pending.extend(br)
            if self.eobrun == 0x7FFF:
                self.flush_eob()


def _write_progressive_scans(
    out, zz, bw, samps, ncomp, dims, mcu_dims, ctabs, successive
):
    mcux, mcuy = mcu_dims
    hs = max(s[0] for s in samps)
    vs = max(s[1] for s in samps)
    al1 = 1 if successive else 0
    comp_specs = [
        (i + 1, 0x00 if (i == 0 or ncomp == 4) else 0x10)
        for i in range(ncomp)
    ]

    def dc_scan(ah, al):
        out.extend(_sos_header(comp_specs, 0, 0, ah, al))
        writer = _BitWriter()
        preds = [0] * ncomp
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    ch_, cv_ = samps[ci]
                    for by in range(cv_):
                        for bx in range(ch_):
                            bidx = (my * cv_ + by) * bw[ci] + (mx * ch_ + bx)
                            dc = int(zz[ci][bidx][0])
                            if ah == 0:  # first pass, point-transformed
                                val = dc >> al
                                diff = val - preds[ci]
                                preds[ci] = val
                                s = _bit_size(diff)
                                code, length = ctabs[ci][0][s]
                                writer.write(code, length)
                                if s:
                                    writer.write(
                                        diff if diff > 0
                                        else diff + (1 << s) - 1, s,
                                    )
                            else:  # refinement: one magnitude bit
                                writer.write((dc >> al) & 1, 1)
        writer.flush()
        out.extend(writer.out)

    def ac_scan(ci, ah, al):
        cid = ci + 1
        out.extend(
            _sos_header(
                [(cid, 0x00 if (ci == 0 or ncomp == 4) else 0x01)],
                1, 63, ah, al,
            )
        )
        writer = _BitWriter()
        prog = _ProgACWriter(writer, ctabs[ci][1])
        for bidx in _used_blocks(ci, samps, hs, vs, dims, bw[ci]):
            if ah == 0:
                prog.first_block(zz[ci][bidx], al)
            else:
                prog.refine_block(zz[ci][bidx], al)
        prog.flush_eob()
        writer.flush()
        out.extend(writer.out)

    dc_scan(0, al1)
    for ci in range(ncomp):
        ac_scan(ci, 0, al1)
    if successive:
        dc_scan(1, 0)
        for ci in range(ncomp):
            ac_scan(ci, 1, 0)


# ---------------------------------------------------------------------------
# decoder


class _BitReader:
    """MSB-first bit reader over the entropy segment: un-stuffs
    0xFF 0x00, consumes RSTn (resetting nothing itself — the caller
    resets predictors), stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        # trim consumed high bits so acc stays bounded (an unmasked
        # accumulator grows into an arbitrarily large int over a long
        # scan — quadratic shifts)
        self.acc &= (1 << self.nbits) - 1
        d = self.d
        while self.nbits <= 24:
            if self.pos >= len(d):
                raise ValueError("decode_jpeg: truncated entropy data")
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:
                    self.pos += 2
                elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                    # RSTn handled by sync_restart(); treat as barrier
                    break
                else:
                    break  # real marker (EOI/next segment) — no more bits
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                raise ValueError("decode_jpeg: bit starvation at marker")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            before = self.nbits
            self._fill()
            if self.nbits == before:
                raise ValueError("decode_jpeg: bit starvation at marker")
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def sync_restart(self) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.d
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF \
                and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("decode_jpeg: expected restart marker")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _decode_huffman(r: _BitReader, table: dict) -> int:
    if r.nbits < 8:
        try:
            r._fill()
        except ValueError:
            pass  # stream tail: the bit-by-bit path raises if starved
    length = 0
    code = 0
    if r.nbits >= 8:
        entry = table["fast"][(r.acc >> (r.nbits - 8)) & 0xFF]
        if entry is not None:
            sym, ln = entry
            r.nbits -= ln
            return sym
        # no code of <= 8 bits matches: consume 8 and extend below
        length = 8
        code = (r.acc >> (r.nbits - 8)) & 0xFF
        r.nbits -= 8
    mp = table["map"]
    while length < 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = mp.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("decode_jpeg: invalid Huffman code")


def _decode_block(r: _BitReader, dc_tab: dict, ac_tab: dict,
                  pred: int) -> tuple["np.ndarray", int]:
    zz = np.zeros(64, dtype=np.int64)
    s = _decode_huffman(r, dc_tab)
    diff = _extend(r.receive(s), s) if s else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _decode_huffman(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("decode_jpeg: AC index overflow")
        zz[k] = _extend(r.receive(size), size)
        k += 1
    return zz, dc


def decode_jpeg(payload: bytes) -> dict:
    """JPEG bytes -> {width, height, channels, pixels}.

    Decodes baseline sequential DCT (SOF0/1) and progressive DCT
    (SOF2: spectral selection + successive approximation, DC and AC
    first/refinement scans, EOB runs) — together the overwhelming
    majority of real-corpus JPEGs. pixels is (h, w) uint8 for
    1-component files, (h, w, 3) uint8 RGB for 3-component YCbCr,
    (h, w, 4) uint8 CMYK for 4-component files (APP14 "Adobe"
    transform 0/2 honored, including the Adobe sample inversion; an
    unmarked 4-component file decodes as plain CMYK, the libjpeg
    assumption). Raises ValueError for anything outside that scope
    (lossless / hierarchical SOFs, arithmetic coding, 12-bit) or for
    malformed/truncated payloads — the callers' fallback seam.
    """
    b = bytes(payload)
    if b[:3] != b"\xff\xd8\xff":
        raise ValueError("decode_jpeg: not a JPEG payload")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None  # dict once SOF parsed
    grids: list[np.ndarray] = []  # per component, (gh*gw, 64) zigzag coefs
    restart_interval = 0
    scans_done = 0
    adobe_transform = None  # APP14 transform byte (None = no marker)
    i = 2
    while i + 2 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"decode_jpeg: expected marker at {i}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede the
        # marker code — skip them instead of misreading 0xFF as the
        # code and the real code as the length high byte (r10 ADVICE #3)
        while i + 2 <= len(b) and b[i + 1] == 0xFF:
            i += 1
        if i + 2 > len(b):
            raise ValueError("decode_jpeg: truncated marker")
        marker = b[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            i += 2
            continue
        if i + 4 > len(b):
            raise ValueError("decode_jpeg: truncated segment header")
        (seg_len,) = struct.unpack_from(">H", b, i + 2)
        seg_end = i + 2 + seg_len
        if seg_len < 2 or seg_end > len(b):
            raise ValueError("decode_jpeg: truncated segment")
        seg = b[i + 4 : seg_end]
        if marker == 0xDB:  # DQT (possibly several tables)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise ValueError("decode_jpeg: 16-bit DQT unsupported")
                if j + 65 > len(seg):
                    raise ValueError("decode_jpeg: truncated DQT")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(seg[j + 1 : j + 65], np.uint8)
                qtabs[tq] = tab
                j += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                if len(vals) < n:
                    raise ValueError("decode_jpeg: truncated DHT")
                htabs[(tc, th)] = _build_decode_table(bits, vals)
                j += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (baseline), SOF2 (prog)
            if frame is not None:
                raise ValueError("decode_jpeg: duplicate SOF")
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("decode_jpeg: only 8-bit precision")
            if nc not in (1, 3, 4):
                raise ValueError(f"decode_jpeg: {nc}-component unsupported")
            if fh == 0 or fw == 0:
                raise ValueError("decode_jpeg: empty frame")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise ValueError(
                        f"decode_jpeg: sampling {hs}x{vs} unsupported"
                    )
                comps.append((cid, hs, vs, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-fw // (8 * hmax))
            mcuy = -(-fh // (8 * vmax))
            frame = {
                "h": fh, "w": fw, "comps": comps,
                "progressive": marker == 0xC2,
                "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
            }
            for cid, hs, vs, tq in comps:
                grids.append(
                    np.zeros((mcuy * vs * mcux * hs, 64), dtype=np.int64)
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "decode_jpeg: only baseline (SOF0/1) and progressive "
                f"(SOF2) DCT supported, got SOF marker 0x{marker:02x}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("decode_jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                scan.append((seg[1 + 2 * c], seg[2 + 2 * c] >> 4,
                             seg[2 + 2 * c] & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            i = _decode_scan(
                b, seg_end, frame, scan, (ss, se, ah, al),
                htabs, restart_interval, grids,
            )
            scans_done += 1
            continue
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            # APP14: transform byte governs 4-component color handling
            # (0 = CMYK, 2 = YCCK), and its PRESENCE signals the Adobe
            # inverted-sample convention
            adobe_transform = seg[11]
        # other APPn / COM / anything else: skipped
        i = seg_end
    if frame is None or scans_done == 0:
        raise ValueError("decode_jpeg: no SOS marker found")
    return _finalize(frame, grids, qtabs, adobe_transform)


def _comp_geometry(frame, ci):
    """(grid_width, used_block_cols, used_block_rows) for component ci:
    the coefficient store is MCU-padded (grid_width blocks per row);
    non-interleaved scans cover only the ceil(comp_dim/8) used blocks."""
    _, hs, vs, _ = frame["comps"][ci]
    gw = frame["mcux"] * hs
    cw = -(-frame["w"] * hs // frame["hmax"])
    ch = -(-frame["h"] * vs // frame["vmax"])
    return gw, -(-cw // 8), -(-ch // 8)


def _decode_scan(b, pos, frame, scan, band, htabs, restart_interval, grids):
    """Entropy-decode one scan into the coefficient grids; returns the
    byte offset just past the scan's entropy data."""
    ss, se, ah, al = band
    comps = frame["comps"]
    cidx = []
    for cs, td, ta in scan:
        matches = [k for k, c in enumerate(comps) if c[0] == cs]
        if not matches:
            raise ValueError("decode_jpeg: scan names unknown component")
        cidx.append(matches[0])
    progressive = frame["progressive"]
    if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("decode_jpeg: baseline scan must cover band 0-63")
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("decode_jpeg: progressive DC scan needs Se=0")
        if ss > 0 and len(scan) != 1:
            raise ValueError(
                "decode_jpeg: progressive AC scans are single-component"
            )
        if not (ss <= se <= 63):
            raise ValueError("decode_jpeg: bad spectral band")
    # table lookups (only the tables this scan actually needs)
    dc_tabs, ac_tabs = [], []
    for (cs, td, ta), k in zip(scan, cidx):
        need_dc = ss == 0 and ah == 0
        need_ac = se > 0
        if need_dc and (0, td) not in htabs:
            raise ValueError("decode_jpeg: missing DC DHT for scan")
        if need_ac and (1, ta) not in htabs:
            raise ValueError("decode_jpeg: missing AC DHT for scan")
        dc_tabs.append(htabs.get((0, td)))
        ac_tabs.append(htabs.get((1, ta)))

    reader = _BitReader(b, pos)
    preds = [0] * len(scan)
    eobrun = 0
    interleaved = len(scan) > 1
    if interleaved:
        units = frame["mcux"] * frame["mcuy"]
    else:
        _, bwu, bhu = _comp_geometry(frame, cidx[0])
        units = bwu * bhu
    done = 0
    for u in range(units):
        if restart_interval and done and done % restart_interval == 0:
            reader.sync_restart()
            preds = [0] * len(scan)
            eobrun = 0
        if interleaved:
            my, mx = divmod(u, frame["mcux"])
            for si, ci in enumerate(cidx):
                _, hs, vs, _ = comps[ci]
                gw = frame["mcux"] * hs
                for by in range(vs):
                    for bx in range(hs):
                        zz = grids[ci][(my * vs + by) * gw + (mx * hs + bx)]
                        preds[si] = _decode_unit(
                            reader, zz, frame, band, dc_tabs[si],
                            ac_tabs[si], preds[si], 0,
                        )[0]
        else:
            ci = cidx[0]
            gw, bwu, _ = _comp_geometry(frame, ci)
            by, bx = divmod(u, bwu)
            zz = grids[ci][by * gw + bx]
            preds[0], eobrun = _decode_unit(
                reader, zz, frame, band, dc_tabs[0], ac_tabs[0],
                preds[0], eobrun,
            )
        done += 1
    return reader.pos


def _decode_unit(reader, zz, frame, band, dc_tab, ac_tab, pred, eobrun):
    """Decode one block's portion of the current scan. Returns
    (new_dc_pred, new_eobrun)."""
    ss, se, ah, al = band
    if not frame["progressive"]:
        new_zz, pred = _decode_block(reader, dc_tab, ac_tab, pred)
        zz[:] = new_zz
        return pred, 0
    if ss == 0:
        if ah == 0:  # DC first: diffs in the scan (>>Al) domain
            s = _decode_huffman(reader, dc_tab)
            diff = _extend(reader.receive(s), s) if s else 0
            pred += diff
            zz[0] = pred << al
        else:  # DC refinement: one appended magnitude bit
            if reader.read_bit():
                zz[0] |= 1 << al
        return pred, eobrun
    if ah == 0:
        return pred, _ac_first(reader, zz, ss, se, al, ac_tab, eobrun)
    return pred, _ac_refine(reader, zz, ss, se, al, ac_tab, eobrun)


def _ac_first(reader, zz, ss, se, al, ac_tab, eobrun):
    """Progressive AC, first pass for this band (T.81 G.1.2.2): values
    arrive point-transformed (<< Al on decode); EOBn codes declare runs
    of all-zero-band blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huffman(reader, ac_tab)
        run, s = rs >> 4, rs & 0x0F
        if s == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1
            if run:
                eobrun += reader.receive(run)
            break
        k += run
        if k > se:
            raise ValueError("decode_jpeg: AC index overflow")
        zz[k] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine(reader, zz, ss, se, al, ac_tab, eobrun):
    """Progressive AC refinement (T.81 G.1.2.3): one correction bit per
    already-nonzero coefficient, new coefficients enter as ±(1<<Al);
    runs count only zero-history positions; blocks inside an EOB run
    still consume their correction bits."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k):
        if reader.read_bit() and (zz[k] & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huffman(reader, ac_tab)
            run, s = rs >> 4, rs & 0x0F
            if s:
                if s != 1:
                    raise ValueError(
                        "decode_jpeg: invalid AC refinement magnitude"
                    )
                newval = p1 if reader.read_bit() else m1
            else:
                if run != 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += reader.receive(run)
                    break
                newval = 0  # ZRL: skip 16 zero-history positions
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _finalize(frame, grids, qtabs, adobe_transform=None):
    """Dequantize + batched IDCT + upsample + color transform."""
    fh, fw = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        if tq not in qtabs:
            raise ValueError(f"decode_jpeg: missing DQT {tq}")
        gw = frame["mcux"] * hs
        gh = frame["mcuy"] * vs
        deq = (grids[ci] * qtabs[tq][ZIGZAG]).astype(np.float64)
        coefs = deq[:, UNZIGZAG].reshape(-1, 8, 8)
        blocks = np.einsum("xu,nuv,yv->nxy", _T.T, coefs, _T.T, optimize=True)
        plane = (
            blocks.reshape(gh, gw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gh * 8, gw * 8)
        )
        # deterministic reconstruction: round 4 dp, +128.5, floor, clip
        plane = np.clip(np.floor(np.round(plane, 4) + 128.5), 0, 255)
        if hs < hmax or vs < vmax:  # nearest-neighbor chroma upsample
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        px = planes[0].astype(np.uint8)
        return {"width": fw, "height": fh, "channels": 1, "pixels": px}
    if len(planes) == 4:
        # Adobe CMYK/YCCK: transform 2 routes C/M/Y through the YCbCr
        # inverse first; an APP14 marker (however transformed) means
        # the stored samples are inverted (the Photoshop convention —
        # unmarked 4-component files are taken as plain CMYK, the
        # libjpeg assumption)
        stack = np.stack(planes, axis=-1)
        if adobe_transform == 2:
            cmy = ycbcr_to_rgb(stack[..., :3]).astype(np.float64)
            stack = np.concatenate([cmy, stack[..., 3:]], axis=-1)
        if adobe_transform is not None:
            stack = 255.0 - stack
        px = np.clip(stack, 0, 255).astype(np.uint8)
        return {"width": fw, "height": fh, "channels": 4, "pixels": px}
    ycc = np.stack(planes, axis=-1)
    return {
        "width": fw,
        "height": fh,
        "channels": 3,
        "pixels": ycbcr_to_rgb(ycc),
    }
