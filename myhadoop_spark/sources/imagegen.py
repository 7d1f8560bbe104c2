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
