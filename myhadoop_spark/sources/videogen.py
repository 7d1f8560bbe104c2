"""Deterministic video-FILE corpus generator — animated GIF89a files
(global palette, full-frame, non-interlaced) with REAL LZW
compression, the encode-side counterpart of the pure-Python GIF
parser in sources/multimodal.py. Used by the directory-scale video
rehearsal (scripts/video_dir_study.py) and the on-disk end-to-end
tests. NOT an engine operator: it writes ordinary .gif files that the
``read_media_dir`` binaryFile ingest treats as opaque payloads.

Near-dup structure is planted at the FRAME-grid level (the imagegen
lesson): each group of ``variants`` files shares one base frame
sequence; variant v >= 1 repaints one grid-aligned box of exactly ONE
frame to the white palette entry — that frame's dHash moves <= 2 bits
and every other frame stays byte-identical, so positional
frame-matching recovers the group. The last variant is a byte-exact
copy. All content derives from the group index: every run writes
identical bytes.

The LZW encoder is the real variable-width GIF algorithm (dictionary
build, width growth 9→12 bits, CLEAR on table overflow), so the
parser's decode path is exercised on genuinely compressed streams,
not just literal codes.
"""

from __future__ import annotations

from pathlib import Path

from myhadoop_spark.sources.imagegen import _mix

# geometry: 40 x 36 pixels over the 8 x 9 phash grid -> 5 x 4 boxes
VID_H, VID_W = 40, 36
GRID_ROWS, GRID_COLS = 8, 9
_BOX_H, _BOX_W = VID_H // GRID_ROWS, VID_W // GRID_COLS
N_FRAMES = 4
_WHITE = 255     # palette index pinned to (255, 255, 255)


def palette() -> list[tuple[int, int, int]]:
    """Fixed 256-color global table: hashed colors, index 255 white."""
    out = []
    for i in range(255):
        v = _mix(i * 3 + 17)
        out.append(((v >> 16) & 255, (v >> 8) & 255, v & 255))
    out.append((255, 255, 255))
    return out


def base_frames(seed: int, n_frames: int = N_FRAMES):
    """Deterministic pseudo-noise index frames (values 0..254 — white
    is reserved for perturbation): list of list[list[int]]."""
    frames = []
    for f in range(n_frames):
        rows = []
        for r in range(VID_H):
            rows.append([
                _mix((f * VID_H + r) * VID_W + c
                     + (seed + 1) * 0x9E3779B1) % 255
                for c in range(VID_W)])
        frames.append(rows)
    return frames


def perturb_frame_box(frames, frame: int, box_row: int, box_col: int):
    """Copy of ``frames`` with one grid-aligned box of one frame
    repainted white — exactly one phash grid cell of that frame moves,
    so its dHash hamming <= 2; all other frames are untouched."""
    out = [[list(row) for row in fr] for fr in frames]
    for r in range(box_row * _BOX_H, (box_row + 1) * _BOX_H):
        for c in range(box_col * _BOX_W, (box_col + 1) * _BOX_W):
            out[frame][r][c] = _WHITE
    return out


def lzw_encode(indices: list[int], mcs: int = 8) -> bytes:
    """GIF variable-width LZW: emits CLEAR, dictionary-compresses the
    index stream (width grows 9→12; CLEAR + reset when the table hits
    4096), ends with EOI. LSB-first bit packing per the GIF spec."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return ({bytes([i]): i for i in range(1 << mcs)}, eoi + 1,
                mcs + 1)

    table, next_code, width = fresh()
    put(clear, width)
    w = b""
    for k in indices:
        kb = bytes([k])
        if w + kb in table:
            w += kb
            continue
        while next_code > (1 << width) and width < 12:
            width += 1
        put(table[w], width)
        if next_code < 4096:
            table[w + kb] = next_code
            next_code += 1
        else:
            while next_code > (1 << width) and width < 12:
                width += 1
            put(clear, width)
            table, next_code, width = fresh()
        w = kb
    if w:
        while next_code > (1 << width) and width < 12:
            width += 1
        put(table[w], width)
        next_code += 1  # the decoder adds one more entry after this code
    while next_code > (1 << width) and width < 12:
        width += 1
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(frames, pal=None) -> bytes:
    """Animated GIF89a: global 256-color table, one full-frame
    non-interlaced image block per frame, real LZW streams."""
    pal = pal or palette()
    h, w = len(frames[0]), len(frames[0][0])
    gct = b"".join(bytes(c) for c in pal)
    # logical screen descriptor: GCT present, 8 bits/color, size 2^8
    lsd = (w.to_bytes(2, "little") + h.to_bytes(2, "little")
           + bytes([0xF7, 0, 0]))
    out = bytearray(b"GIF89a" + lsd + gct)
    for fr in frames:
        out += b"\x2c" + (0).to_bytes(2, "little") * 2 \
            + w.to_bytes(2, "little") + h.to_bytes(2, "little") \
            + bytes([0])  # no local table, not interlaced
        indices = [px for row in fr for px in row]
        out += bytes([8]) + _sub_blocks(lzw_encode(indices, 8))
    out += b"\x3b"
    return bytes(out)


def write_video_corpus(out_dir: str | Path, *, n_groups: int,
                       variants: int = 4,
                       n_frames: int = N_FRAMES) -> dict:
    """Write ``n_groups * variants`` animated GIFs into ``out_dir``.

    Group g, variant v -> file ``g{g:05d}_v{v}.gif``. v0 = base frame
    sequence; 1 <= v < variants-1 = one grid box of frame v repainted
    white (near-dup: that frame's dHash <= 2 bits moved, other frames
    identical); v = variants-1 = byte-exact copy. Returns
    {files, bytes} written."""
    if not 2 <= variants <= n_frames + 1:
        raise ValueError(
            f"variants must be in [2, n_frames+1], got {variants}")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pal = palette()
    n_files = total = 0
    for g in range(n_groups):
        base = base_frames(g, n_frames)
        payloads = {0: encode_gif(base, pal)}
        for v in range(1, variants - 1):
            pert = perturb_frame_box(base, v, (v * 3 + g) % GRID_ROWS,
                                     (v * 5 + 2 * g) % GRID_COLS)
            payloads[v] = encode_gif(pert, pal)
        payloads[variants - 1] = payloads[0]
        for v, buf in payloads.items():
            p = out / f"g{g:05d}_v{v}.gif"
            p.write_bytes(buf)
            n_files += 1
            total += len(buf)
    return {"files": n_files, "bytes": total}
