"""Deterministic image-FILE corpus generator — the encode-side
counterpart of the pure-Python decoders in sources/multimodal.py,
used by the directory-scale media rehearsal (scripts/media_dir_study.py)
and the on-disk end-to-end tests. NOT an engine operator: nothing here
runs inside a Spark job; it writes ordinary PNG/BMP/PPM files that the
``read_media_dir`` binaryFile ingest then treats as opaque payloads.

Near-dup structure is planted at the GRID level (the r12 lesson:
perceptual-hash differentials need pixel-level planting — payload-level
perturbation avalanches). Each group of ``variants`` files shares one
base image; variant v>=1 repaints one grid-aligned box to white, which
changes exactly one cell of the 8 x 9 luma grid and therefore at most
two dHash bits (cell c feeds only the (c-1,c) and (c,c+1) row
comparisons); the last variant is a byte-exact copy (hamming 0). All
content derives from the group index, so every run writes identical
bytes.
"""

from __future__ import annotations

import zlib
from pathlib import Path

# geometry: 40 x 36 pixels over the 8 x 9 phash grid -> 5 x 4 boxes
IMG_H, IMG_W = 40, 36
GRID_ROWS, GRID_COLS = 8, 9
_BOX_H, _BOX_W = IMG_H // GRID_ROWS, IMG_W // GRID_COLS


def _mix(v: int) -> int:
    """32-bit xorshift-multiply mix (deterministic, no imports)."""
    v &= 0xFFFFFFFF
    v ^= v >> 13
    v = (v * 1103515245 + 12345) & 0xFFFFFFFF
    v ^= v >> 16
    return (v * 2654435761) & 0xFFFFFFFF


def base_image(seed: int, h: int = IMG_H, w: int = IMG_W):
    """Deterministic pseudo-noise RGB image as list[list[(r, g, b)]].

    Per-pixel hashed noise, NOT a gradient: a gradient's response to
    the seed is a near-uniform luma shift, which dHash (adjacent-cell
    COMPARISONS) cancels — two different gradient bases can land
    within hamming 2 and merge unrelated groups. Hashed noise makes
    cross-seed fingerprints effectively independent (P[hamming <= 2]
    ~ 2^-53 per pair)."""
    out = []
    for r in range(h):
        row = []
        for c in range(w):
            v = _mix((r * w + c) + (seed + 1) * 0x9E3779B1)
            row.append(((v >> 16) & 255, (v >> 8) & 255, v & 255))
        out.append(row)
    return out


def perturb_box(img, box_row: int, box_col: int):
    """Copy of ``img`` with one grid-aligned box repainted white —
    exactly one phash grid cell moves, so dHash hamming <= 2."""
    out = [list(row) for row in img]
    for r in range(box_row * _BOX_H, (box_row + 1) * _BOX_H):
        for c in range(box_col * _BOX_W, (box_col + 1) * _BOX_W):
            out[r][c] = (255, 255, 255)
    return out


def encode_ppm(rgb_rows) -> bytes:
    """P6 binary PPM (maxval 255)."""
    h, w = len(rgb_rows), len(rgb_rows[0])
    raster = b"".join(bytes(px) for row in rgb_rows for px in row)
    return f"P6\n{w} {h}\n255\n".encode() + raster


def encode_bmp(rgb_rows) -> bytes:
    """24-bpp uncompressed bottom-up BMP (BITMAPINFOHEADER)."""
    h, w = len(rgb_rows), len(rgb_rows[0])
    stride = ((w * 3 + 3) // 4) * 4
    raster = b""
    for row in reversed(rgb_rows):              # bottom-up
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)  # BGR
        raster += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    header = (b"BM" + (off + len(raster)).to_bytes(4, "little")
              + b"\x00" * 4 + off.to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + h.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little")
              + len(raster).to_bytes(4, "little")
              + (0).to_bytes(4, "little") * 4)
    return header + raster


def encode_png(rgb_rows, filters=(0, 1, 2, 3, 4)) -> bytes:
    """8-bit RGB non-interlaced PNG; scanline filter type cycles
    through ``filters`` so decode exercises every unfilter path."""
    h, w = len(rgb_rows), len(rgb_rows[0])
    ch = 3
    raw = b""
    prev = [0] * (w * ch)
    for y, row in enumerate(rgb_rows):
        flat = [v for px in row for v in px]
        f = filters[y % len(filters)]
        line = bytearray()
        for x in range(w * ch):
            a = flat[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (a if pa <= pb and pa <= pc
                        else b if pb <= pc else c)
            line.append((flat[x] - pred) % 256)
        raw += bytes([f]) + bytes(line)
        prev = flat

    def chunk(typ, data):
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# Baseline JFIF (JPEG) encoder — the lossy counterpart of the lossless
# encoders above, used to rehearse the perceptual-hash family THROUGH a
# genuinely lossy codec (the real-crawl shape: near-dups survive
# re-compression). Spec constants are ITU-T T.81 Annex K (quantization
# tables, typical Huffman tables) and the JFIF v1.1 layout; the decoder
# in sources/multimodal.py shares NONE of these tables — it reads
# DQT/DHT/SOF0 from the bitstream, so encoder and decoder cannot cancel
# a shared table bug.
# ---------------------------------------------------------------------------

# natural-order index of the k-th coefficient in zigzag scan order
JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

# Annex K base quantization tables, natural (row-major) order
_Q_LUMA = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
_Q_CHROMA = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

# Annex K typical Huffman specs: (BITS[1..16], VALUES)
_DC_LUMA = ((0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
            tuple(range(12)))
_DC_CHROMA = ((0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
              tuple(range(12)))
_AC_LUMA = ((0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D), (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA))
_AC_CHROMA = ((0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77), (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA))


def _huff_encode_table(bits, vals):
    """Canonical Huffman: symbol -> (code, length)."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def scaled_quant(base, quality: int):
    """IJG quality scaling of an Annex K base table (natural order)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (q * scale + 50) // 100)) for q in base]


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc = self._n = 0

    def byte_align(self):
        """Pad the current partial byte with 1-bits (spec fill)."""
        while self._n:
            self.write(1, 1)


def _category(v: int) -> int:
    return abs(v).bit_length()


def _fdct_quant(blocks, qtab):
    """Forward DCT + quantize: ndarray[n, 8, 8] level-shifted float ->
    int32 coefficient blocks (natural order). Orthonormal separable
    DCT matrix == the T.81 FDCT normalization exactly."""
    import numpy as np

    x = np.arange(8)
    t = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    t[0] *= np.sqrt(0.5)
    t *= 0.5
    coef = t @ blocks @ t.T
    q = np.asarray(qtab, dtype=np.float64).reshape(8, 8)
    return np.round(coef / q).astype(np.int32)


def _encode_component_block(bw, zz, pred, dc_tab, ac_tab):
    """Huffman-encode one zigzag coefficient block; returns new DC."""
    d = int(zz[0]) - pred
    s = _category(d)
    code, ln = dc_tab[s]
    bw.write(code, ln)
    if s:
        bw.write(d if d > 0 else d + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]          # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]              # EOB
        bw.write(code, ln)
    return int(zz[0])


def _pad_to(plane, bh: int, bw_: int):
    """Edge-replicate a 2-D float plane to multiples of (bh, bw_)."""
    import numpy as np

    h, w = plane.shape
    ph = (bh - h % bh) % bh
    pw = (bw_ - w % bw_) % bw_
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _plane_blocks(plane):
    """(H, W) plane -> (H//8 * W//8, 8, 8) blocks in raster order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def encode_jpeg(rgb_rows, quality: int = 90, subsample: bool = True,
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF encoder (SOF0, two quant + four Huffman tables,
    4:2:0 chroma subsampling when ``subsample`` else 4:4:4, optional
    DRI/RSTn restart markers). Pure Python + numpy; driver-side
    generator only — nothing here runs inside a Spark job."""
    import numpy as np

    rgb = np.asarray(rgb_rows, dtype=np.float64)
    h, w = rgb.shape[0], rgb.shape[1]
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    planes = [0.299 * r + 0.587 * g + 0.114 * b,
              128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
              128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]

    if subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
        ev = _pad_to(planes[0], 2, 2)
        planes = [planes[0]] + [
            p.reshape(ev.shape[0] // 2, 2, ev.shape[1] // 2, 2)
            .mean(axis=(1, 3))
            for p in (_pad_to(planes[1], 2, 2), _pad_to(planes[2], 2, 2))]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)

    q_luma = scaled_quant(_Q_LUMA, quality)
    q_chroma = scaled_quant(_Q_CHROMA, quality)
    qtabs = [q_luma, q_chroma, q_chroma]

    # per-component quantized blocks, indexed [comp][block_row][block_col];
    # each plane is edge-padded so its block grid covers whole MCUs
    mcus_y = (h + 8 * max_v - 1) // (8 * max_v)
    mcus_x = (w + 8 * max_h - 1) // (8 * max_h)
    comp_blocks = []
    for ci, (p, (sh, sv)) in enumerate(zip(planes, samp)):
        need_h, need_w = 8 * sv * mcus_y, 8 * sh * mcus_x
        pp = np.pad(p, ((0, need_h - p.shape[0]),
                        (0, need_w - p.shape[1])), mode="edge")
        blocks = _fdct_quant(_plane_blocks(pp - 128.0), qtabs[ci])
        comp_blocks.append(blocks.reshape(need_h // 8, need_w // 8, 8, 8))

    dc_l = _huff_encode_table(*_DC_LUMA)
    dc_c = _huff_encode_table(*_DC_CHROMA)
    ac_l = _huff_encode_table(*_AC_LUMA)
    ac_c = _huff_encode_table(*_AC_CHROMA)
    htabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]

    bw = _BitWriter()
    preds = [0, 0, 0]
    n_rst = 0
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and \
                    mcu_i % restart_interval == 0:
                bw.byte_align()
                bw.out += bytes((0xFF, 0xD0 + n_rst % 8))
                n_rst += 1
                preds = [0, 0, 0]
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        blk = comp_blocks[ci][my * sv + by, mx * sh + bx]
                        zz = [int(blk.flat[JPEG_ZIGZAG[k]])
                              for k in range(64)]
                        preds[ci] = _encode_component_block(
                            bw, zz, preds[ci], htabs[ci][0], htabs[ci][1])
            mcu_i += 1
    bw.byte_align()

    def seg(marker, payload):
        return bytes((0xFF, marker)) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    def dqt(tid, tab):
        return seg(0xDB, bytes([tid]) + bytes(
            tab[JPEG_ZIGZAG[k]] for k in range(64)))

    def dht(cls, tid, spec):
        bits, vals = spec
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))

    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([3]) + b"".join(
            bytes([cid + 1, (samp[cid][0] << 4) | samp[cid][1],
                   0 if cid == 0 else 1])
            for cid in range(3))
    sos = bytes([3]) + b"".join(
        bytes([cid + 1, 0x00 if cid == 0 else 0x11])
        for cid in range(3)) + bytes([0, 63, 0])

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, q_luma) + dqt(1, q_chroma)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += seg(0xC0, sof)
    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    out += seg(0xDA, sos) + bytes(bw.out) + b"\xff\xd9"
    return out


# levels spaced 28 apart: adjacent-box margins >> JPEG quantization
# noise, so dHash comparisons survive the lossy round trip
_SMOOTH_LEVELS = tuple(16 + 28 * k for k in range(8))


def smooth_image(seed: int, h: int = IMG_H, w: int = IMG_W):
    """Deterministic SMOOTH RGB image: each phash grid box is a
    constant gray level drawn from 8 well-separated levels, adjacent
    boxes in a row forced to DIFFERENT levels. The JPEG counterpart of
    ``base_image``: hashed per-pixel noise is the adversarial worst
    case for a lossy codec (quantization error flips near-tie dHash
    comparisons), while smooth content with >= 28-level margins is the
    shape perceptual hashing is FOR — near-dups must survive
    re-compression."""
    grid_levels = []
    for gr in range(GRID_ROWS):
        row_levels = []
        for gc in range(GRID_COLS):
            li = _mix((gr * GRID_COLS + gc) + (seed + 1) * 0x9E3779B1) % 8
            if gc and _SMOOTH_LEVELS[li] == row_levels[-1]:
                li = (li + 1) % 8
            row_levels.append(_SMOOTH_LEVELS[li])
        grid_levels.append(row_levels)
    out = []
    for r in range(h):
        gr = min(r // _BOX_H, GRID_ROWS - 1)
        row = []
        for c in range(w):
            gc = min(c // _BOX_W, GRID_COLS - 1)
            v = grid_levels[gr][gc]
            row.append((v, v, v))
        out.append(row)
    return out


def write_jpeg_corpus(out_dir: str | Path, *, n_groups: int,
                      variants: int = 4, quality: int = 90) -> dict:
    """Write ``n_groups * variants`` baseline-JPEG files: v0 = smooth
    base, middle variants repaint one grid box white BEFORE encoding
    (the near-dup survives the lossy codec), last variant = byte-exact
    copy of v0. Mirrors ``write_image_corpus``'s planted structure so
    the same recovery assertions apply through a LOSSY payload path."""
    if variants < 2:
        raise ValueError(f"variants must be >= 2, got {variants}")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n_files = total = 0
    for g in range(n_groups):
        base = smooth_image(g)
        payloads = {0: encode_jpeg(base, quality=quality)}
        for v in range(1, variants - 1):
            pert = perturb_box(base, (v * 3 + g) % GRID_ROWS,
                               (v * 5 + 2 * g) % GRID_COLS)
            payloads[v] = encode_jpeg(pert, quality=quality)
        payloads[variants - 1] = payloads[0]
        for v, buf in payloads.items():
            p = out / f"g{g:05d}_v{v}.jpg"
            p.write_bytes(buf)
            n_files += 1
            total += len(buf)
    return {"files": n_files, "bytes": total}


_CODECS = (("png", encode_png), ("bmp", encode_bmp), ("ppm", encode_ppm))


def write_image_corpus(out_dir: str | Path, *, n_groups: int,
                       variants: int = 4) -> dict:
    """Write ``n_groups * variants`` image files into ``out_dir``.

    Group g, variant v -> file ``g{g:05d}_v{v}.{ext}`` (codec cycles
    by group so the corpus mixes all three formats). v0 = base image;
    1 <= v < variants-1 = one grid box repainted (near-dup, dHash
    hamming <= 2 to base); v = variants-1 = byte-exact copy of base
    (hamming 0). Returns {files, bytes} written."""
    if variants < 2:
        raise ValueError(f"variants must be >= 2, got {variants}")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n_files = total = 0
    for g in range(n_groups):
        ext, enc = _CODECS[g % len(_CODECS)]
        base = base_image(g)
        payloads = {0: enc(base)}
        for v in range(1, variants - 1):
            pert = perturb_box(base, (v * 3 + g) % GRID_ROWS,
                               (v * 5 + 2 * g) % GRID_COLS)
            payloads[v] = enc(pert)
        payloads[variants - 1] = payloads[0]
        for v, buf in payloads.items():
            p = out / f"g{g:05d}_v{v}.{ext}"
            p.write_bytes(buf)
            n_files += 1
            total += len(buf)
    return {"files": n_files, "bytes": total}
