"""Baseline JPEG codec on Python stdlib + numpy (round-10: closes the
JPEG half of the compressed-media seam; only VIDEO remains a deployment
stub).

Everything here is the public ITU-T T.81 baseline process: 8x8 blocks,
2-D DCT-II, zigzag, uniform quantization, differential DC + run-length
AC, canonical Huffman coding with the Annex K table set, JFIF marker
framing. The DCT is a pair of numpy matmuls (``_DCT @ block @ _DCT.T``),
so decode throughput is vectorized per block, and the whole codec ships
zero dependencies beyond numpy.

Supported on decode: baseline sequential (SOF0), 8-bit, grayscale or
3-component YCbCr at 4:4:4 or 4:2:0 sampling, restart markers, multiple
DQT/DHT segments. Progressive (SOF2), arithmetic coding, 12-bit, and
exotic samplings return ``ok=False`` — corrupt or unsupported streams
must fail closed, never decode silently.

Oracle determinism (the q319 contract): a block-CONSTANT grayscale image
encoded with a flat quant table whose DC step divides the DCT's DC gain
(8) round-trips EXACTLY — the only nonzero coefficient is
``DC = 8*(v-128)``, quantization ``round(8(v-128)/8) = v-128`` is
lossless, and the IDCT of a DC-only block is the constant it came from.
So planted block-constant JPEGs have SQL-replayable per-channel sums
even though the format is lossy in general; lossy-path accuracy is
covered by tolerance round-trip tests instead.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------------------
# DCT basis (orthonormal, JPEG scaling): D[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
# Forward: S = D @ B @ D.T ; inverse: B = D.T @ S @ D.
# ---------------------------------------------------------------------------
_DCT = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

#: zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient.
ZIGZAG = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1], rc[1] if (rc[0] + rc[1]) % 2 else rc[0]),
)
#: flat (row-major) position of the i-th zigzag coefficient — lets whole
#: (nblocks, 64) coefficient matrices zigzag/de-zigzag in one numpy scatter
#: instead of a 64-iteration Python loop per block.
_ZZ_FLAT = np.array([r * 8 + c for r, c in ZIGZAG])
#: MSB-first weights for packing a 16-bit sliding window in one matmul.
_POW16 = (1 << np.arange(15, -1, -1)).astype(np.int32)

#: Annex K quantization tables (luminance / chrominance), row-major.
QTAB_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
QTAB_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)
#: Flat table: DC step 8 divides the DCT DC gain -> block-constant images
#: round-trip exactly (the oracle-determinism table).
QTAB_FLAT8 = np.full((8, 8), 8)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL) per (class, id).
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical T.81 construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


#: Encoder code tables, built once at import (the encoder always emits the
#: Annex K set; rebuilding them per encode_jpeg call cost ~10% of encode).
_ENC_DC_CODES = {0: _canonical_codes(*_DC_LUMA), 1: _canonical_codes(*_DC_CHROMA)}
_ENC_AC_CODES = {0: _canonical_codes(*_AC_LUMA), 1: _canonical_codes(*_AC_CHROMA)}


@lru_cache(maxsize=64)
def _decode_lut(bits: tuple[int, ...], huffval: tuple[int, ...]):
    """16-bit Huffman lookup table: for every possible 16-bit window the
    decoded symbol and its code length (0 = invalid prefix). One array
    index replaces the old bit-at-a-time dict walk; cached per table
    content, so repeated decodes of streams carrying the same DHT (the
    Annex K set in practice) never rebuild it."""
    sym = np.zeros(1 << 16, dtype=np.uint8)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            if hi > (1 << 16):
                raise ValueError("overfull Huffman table")
            sym[lo:hi] = huffval[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    # plain lists: C-speed indexing from the symbol loop (numpy scalar
    # indexing costs ~10x a list index at this granularity)
    return sym.tolist(), ln.tolist()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1s per the spec


def _split_scan(data: bytes) -> list[bytes]:
    """Split raw entropy-coded scan bytes into restart-interval segments,
    unstuffing 0xFF00 -> 0xFF as we go. Segments are delimited by RSTn
    markers; any other marker (EOI, next SOS, garbage) ends the scan.
    A trailing lone 0xFF is treated as end-of-scan (it can only be pad)."""
    segs: list[bytes] = []
    cur = bytearray()
    i, n = 0, len(data)
    while True:
        j = data.find(0xFF, i)
        if j < 0 or j + 1 >= n:
            cur += data[i:] if j < 0 else data[i:j]
            break
        cur += data[i:j]
        nxt = data[j + 1]
        if nxt == 0x00:  # stuffed data byte
            cur.append(0xFF)
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:  # EOI / any other marker terminates the scan
            break
    segs.append(bytes(cur))
    return segs


class _ScanReader:
    """Vectorized entropy-scan reader. Per restart segment the bitstream is
    unpacked ONCE into a sliding 16-bit-window array, so a Huffman symbol
    is a single LUT index and an amplitude is a shift — no per-bit Python
    calls (the old reader cost ~100 Python calls per 8x8 block; this one
    costs ~6). Reads that would cross the end of the segment raise, which
    preserves the old reader's fail-closed behavior on truncated streams."""

    __slots__ = ("segs", "si", "win", "nbits", "pos")

    def __init__(self, data: bytes) -> None:
        self.segs = _split_scan(data)
        self._load(0)

    def _load(self, i: int) -> None:
        if i >= len(self.segs):
            raise ValueError("bitstream exhausted")
        self.si = i
        bits = np.unpackbits(np.frombuffer(self.segs[i], dtype=np.uint8))
        self.nbits = int(bits.size)
        padded = np.concatenate([bits, np.ones(16, dtype=np.uint8)])
        sw = np.lib.stride_tricks.sliding_window_view(padded, 16)
        win = sw.astype(np.int32) @ _POW16
        # list form for C-speed scalar indexing; keep the numpy array for
        # very large scans where materializing Python ints would dominate.
        self.win = win.tolist() if self.nbits < (1 << 20) else win
        self.pos = 0

    def next_segment(self) -> None:
        self._load(self.si + 1)

    def read_symbol(self, lut) -> int:
        sym, ln = lut
        w = self.win[self.pos]
        length = ln[w]
        if length == 0:
            raise ValueError("invalid Huffman code")
        if self.pos + length > self.nbits:
            raise ValueError("bitstream exhausted")
        self.pos += length
        return sym[w]

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("bitstream exhausted")
        v = int(self.win[self.pos]) >> (16 - n)
        self.pos += n
        return v


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _encode_block(bw: _BitWriter, zz: list[int], pred: int,
                  dc_codes, ac_codes, last_nz: int) -> int:
    diff = zz[0] - pred
    size = _size_cat(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(_amplitude_bits(diff, size), size)
    run = 0
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = _size_cat(zz[i])
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(_amplitude_bits(zz[i], size), size)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return zz[0]


def _last_nonzero(zz: np.ndarray) -> np.ndarray:
    """Per-row index of the last nonzero AC coefficient (0 if none) for a
    (nblocks, 64) zigzag matrix — vectorized replacement of the per-block
    generator max()."""
    ac = zz[:, 1:] != 0
    return np.where(ac.any(axis=1), 63 - np.argmax(ac[:, ::-1], axis=1), 0)


def _decode_block_into(br: _ScanReader, zz: np.ndarray, pred: int, dc_lut, ac_lut) -> int:
    """Entropy-decode one block's zigzag coefficients into ``zz`` (a 64-wide
    int row of a batch matrix). The inverse DCT happens batched afterwards."""
    size = br.read_symbol(dc_lut)
    dc = pred + _extend(br.read_bits(size), size)
    zz[0] = dc
    i = 1
    while i < 64:
        sym = br.read_symbol(ac_lut)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        run, size = sym >> 4, sym & 0xF
        i += run
        if i > 63 or size == 0:
            raise ValueError("AC run past block end")
        zz[i] = _extend(br.read_bits(size), size)
        i += 1
    return dc


def _fdct_quant_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """FDCT + quantize + zigzag an entire component at once: (H, W) plane
    -> (nblocks, 64) int zigzag rows in row-major block order."""
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    coeffs = np.round(np.matmul(_DCT, np.matmul(blocks, _DCT.T)) / qtab)
    return coeffs.reshape(-1, 64)[:, _ZZ_FLAT].astype(np.int64)


def _dequant_idct_blocks(zz: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """De-zigzag + dequantize + inverse-DCT a whole component's (nblocks,
    64) zigzag rows in three batched numpy ops -> (nblocks, 8, 8) pixels."""
    flat = np.zeros((zz.shape[0], 64))
    flat[:, _ZZ_FLAT] = zz
    coeffs = flat.reshape(-1, 8, 8) * qtab
    spatial = np.matmul(_DCT.T, np.matmul(coeffs, _DCT))
    return np.clip(np.round(spatial + 128.0), 0, 255)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
    ], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    return np.clip(np.round(np.stack([
        y + 1.402 * cr,
        y - 0.344136286 * cb - 0.714136286 * cr,
        y + 1.772 * cb,
    ], axis=-1)), 0, 255)


def encode_jpeg(
    pixels: np.ndarray,
    quant_luma: np.ndarray | None = None,
    quant_chroma: np.ndarray | None = None,
    subsample: bool = False,
) -> bytes:
    """Baseline JFIF encoder. ``pixels`` is uint8 (H, W) grayscale or
    (H, W, 3) RGB; dimensions are padded to block multiples by edge
    replication. ``subsample=True`` emits 4:2:0 (box-averaged chroma),
    else 4:4:4. Annex K quant tables by default; pass ``QTAB_FLAT8`` for
    the exact block-constant tier (module docstring)."""
    px = np.asarray(pixels, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qly = QTAB_LUMA if quant_luma is None else np.asarray(quant_luma)
    qlc = QTAB_CHROMA if quant_chroma is None else np.asarray(quant_chroma)

    def pad(plane: np.ndarray, mult: int) -> np.ndarray:
        ph = (-plane.shape[0]) % mult
        pw = (-plane.shape[1]) % mult
        if not (ph or pw):
            return plane
        return np.pad(plane, ((0, ph), (0, pw)), mode="edge")

    if gray:
        comps = [(pad(px, 8), qly, 1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px)
        if subsample:
            y = pad(ycc[..., 0], 16)
            cbcr_full = [pad(ycc[..., i], 16) for i in (1, 2)]
            cbcr = [p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
                    for p in cbcr_full]
            comps = [(y, qly, 2, 2), (cbcr[0], qlc, 1, 1), (cbcr[1], qlc, 1, 1)]
        else:
            comps = [(pad(ycc[..., 0], 8), qly, 1, 1)] + [
                (pad(ycc[..., i], 8), qlc, 1, 1) for i in (1, 2)
            ]

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qly),) + (((1, qlc),) if not gray else ()):
        body = bytes([tid]) + bytes(int(q[r, c]) for r, c in ZIGZAG)
        out += b"\xFF\xDB" + struct.pack(">H", 2 + len(body)) + body
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = (comps[ci][2], comps[ci][3])
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else (0 if gray else 1)])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tclass_id, (bits, huffval) in tables:
        body = bytes([tclass_id]) + bytes(bits) + bytes(huffval)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    dc_codes, ac_codes = _ENC_DC_CODES, _ENC_AC_CODES
    bw = _BitWriter()
    preds = [0] * ncomp
    # FDCT+quantize+zigzag every component in one batched numpy pass; the
    # sequential loop below only does entropy coding over the int rows.
    comp_zz = [_fdct_quant_blocks(plane, qtab) for plane, qtab, _, _ in comps]
    comp_last = [_last_nonzero(zz).tolist() for zz in comp_zz]
    comp_rows = [zz.tolist() for zz in comp_zz]
    if gray or not subsample:
        mcu_h = comps[0][0].shape[0] // 8
        mcu_w = comps[0][0].shape[1] // 8
        for by in range(mcu_h):
            for bx in range(mcu_w):
                k = by * mcu_w + bx
                for ci in range(ncomp):
                    tid = 0 if ci == 0 else 1
                    preds[ci] = _encode_block(
                        bw, comp_rows[ci][k], preds[ci],
                        dc_codes[tid], ac_codes[tid], comp_last[ci][k])
    else:  # 4:2:0 MCU = 4 luma blocks + 1 Cb + 1 Cr
        y = comps[0][0]
        nbx_y = y.shape[1] // 8
        nbx_c = comps[1][0].shape[1] // 8
        for my in range(y.shape[0] // 16):
            for mx in range(y.shape[1] // 16):
                for sy in range(2):
                    for sx in range(2):
                        k = (my * 2 + sy) * nbx_y + (mx * 2 + sx)
                        preds[0] = _encode_block(
                            bw, comp_rows[0][k], preds[0],
                            dc_codes[0], ac_codes[0], comp_last[0][k])
                kc = my * nbx_c + mx
                for ci in (1, 2):
                    preds[ci] = _encode_block(
                        bw, comp_rows[ci][kc], preds[ci],
                        dc_codes[1], ac_codes[1], comp_last[ci][kc])
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes | None) -> dict:
    """Baseline JPEG decoder (module docstring scope). Returns the same
    shape as the other media decoders: ok/width/height/channels plus
    exact per-channel integer sums and one-division means."""
    bad = {
        "ok": False, "width": None, "height": None, "channels": None,
        "sum_r": None, "sum_g": None, "sum_b": None,
        "mean_r": None, "mean_g": None, "mean_b": None,
    }
    if payload is None or len(payload) < 4 or payload[:2] != b"\xFF\xD8":
        return bad
    try:
        qtabs: dict[int, np.ndarray] = {}
        htabs: dict[int, dict] = {}
        frame = None
        scan = None
        restart_interval = 0
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return bad
            marker = payload[pos + 1]
            if marker == 0xD9:  # EOI
                break
            (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
            body = payload[pos + 4:pos + 2 + seglen]
            if len(body) != seglen - 2:
                return bad
            if marker == 0xDB:  # DQT (possibly several tables)
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 0xF
                    if pq != 0:
                        return bad  # 16-bit tables: out of baseline scope
                    qf = np.zeros(64)
                    qf[_ZZ_FLAT] = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                    qtabs[tq] = qf.reshape(8, 8)
                    i += 65
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(body):
                    tc_th = body[i]
                    bits = tuple(body[i + 1:i + 17])
                    n = sum(bits)
                    huffval = tuple(body[i + 17:i + 17 + n])
                    htabs[tc_th] = _decode_lut(bits, huffval)
                    i += 17 + n
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8 or nc not in (1, 3):
                    return bad
                comps = []
                for ci in range(nc):
                    cid, hv, tq = body[6 + ci * 3:9 + ci * 3]
                    comps.append((cid, hv >> 4, hv & 0xF, tq))
                frame = (h, w, comps)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return bad  # non-baseline processes: fail closed
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:  # SOS
                ns = body[0]
                scan_comps = []
                for ci in range(ns):
                    cs, td_ta = body[1 + ci * 2:3 + ci * 2]
                    scan_comps.append((cs, td_ta >> 4, td_ta & 0xF))
                scan = (scan_comps, payload[pos + 2 + seglen:])
                break
            pos += 2 + seglen
        if frame is None or scan is None:
            return bad
        h, w, comps = frame
        scan_comps, data = scan
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if (hmax, vmax) not in ((1, 1), (2, 2)) or len(comps) != len(scan_comps):
            return bad
        for _, ch, cv, _ in comps:
            if (ch, cv) not in ((1, 1), (hmax, vmax)):
                return bad
        mcu_w, mcu_h = 8 * hmax, 8 * vmax
        mcus_x = (w + mcu_w - 1) // mcu_w
        mcus_y = (h + mcu_h - 1) // mcu_h
        n_mcus = mcus_y * mcus_x
        # entropy pass: decode every block's zigzag row into a per-component
        # batch matrix; the IDCT runs batched afterwards (3 numpy ops per
        # component instead of one small matmul per block).
        comp_zz = [
            np.zeros((n_mcus * ch * cv, 64), dtype=np.int32)
            for _, ch, cv, _ in comps
        ]
        comp_luts = [
            (htabs[0x00 | td], htabs[0x10 | ta]) for _, td, ta in scan_comps
        ]
        cursors = [0] * len(comps)
        br = _ScanReader(data)
        preds = [0] * len(comps)
        mcu_index = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                    br.next_segment()
                    preds = [0] * len(comps)
                for ci, comp in enumerate(comps):
                    _, ch, cv, _ = comp
                    dc_lut, ac_lut = comp_luts[ci]
                    zzc, k = comp_zz[ci], cursors[ci]
                    for _ in range(ch * cv):
                        preds[ci] = _decode_block_into(
                            br, zzc[k], preds[ci], dc_lut, ac_lut)
                        k += 1
                    cursors[ci] = k
                mcu_index += 1
        planes = []
        for (_, ch, cv, tq), zzc in zip(comps, comp_zz):
            blocks = _dequant_idct_blocks(zzc, qtabs[tq])
            # block order is (my, mx, sy, sx); reassemble the plane grid
            plane = (
                blocks.reshape(mcus_y, mcus_x, cv, ch, 8, 8)
                .transpose(0, 2, 4, 1, 3, 5)
                .reshape(mcus_y * cv * 8, mcus_x * ch * 8)
            )
            planes.append(plane)
    except (ValueError, KeyError, IndexError, struct.error):
        return bad

    n = h * w
    if len(comps) == 1:
        img = planes[0][:h, :w]
        s = int(img.sum())
        return {
            "ok": True, "width": w, "height": h, "channels": 1,
            "sum_r": s, "sum_g": s, "sum_b": s,
            "mean_r": s / n, "mean_g": s / n, "mean_b": s / n,
        }
    full = []
    for (cid, ch, cv, _), plane in zip(comps, planes):
        if (ch, cv) == (hmax, vmax):
            full.append(plane)
        else:  # box upsample 2x
            full.append(np.repeat(np.repeat(plane, vmax // cv, axis=0),
                                  hmax // ch, axis=1))
    ycc = np.stack([p[:mcus_y * mcu_h, :mcus_x * mcu_w] for p in full], axis=-1)
    rgb = _ycbcr_to_rgb(ycc)[:h, :w]
    sums = [int(rgb[..., i].sum()) for i in range(3)]
    return {
        "ok": True, "width": w, "height": h, "channels": 3,
        "sum_r": sums[0], "sum_g": sums[1], "sum_b": sums[2],
        "mean_r": sums[0] / n, "mean_g": sums[1] / n, "mean_b": sums[2] / n,
    }
