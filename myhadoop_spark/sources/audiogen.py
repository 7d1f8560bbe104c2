"""Deterministic audio-FILE corpus generator — the encode-side
counterpart of the pure-Python WAV parser in sources/multimodal.py,
used by the directory-scale audio rehearsal
(scripts/audio_dir_study.py) and the on-disk end-to-end tests. NOT an
engine operator: nothing here runs inside a Spark job; it writes
ordinary 16-bit PCM RIFF/WAVE files that the ``read_media_dir``
binaryFile ingest then treats as opaque payloads.

Near-dup structure is planted with PROVABLE fingerprint locality: each
group of ``variants`` files shares one pseudo-noise base signal;
variant v >= 1 adds a pure DC offset to exactly one time frame. The
FFT is linear, so a constant added to a frame moves only that frame's
bin-0 (DC) energy — one cell of the frames × bands energy grid —
flipping at most the two Haitsma–Kalker bits that read band 0 of that
frame (bits (v−1, 0) and (v, 0)); the last variant is a byte-exact
copy (hamming 0). Cross-group signals are independent hashed noise, so
unrelated fingerprints sit ~32 bits apart. All content derives from
the group index: every run writes identical bytes.
"""

from __future__ import annotations

from pathlib import Path

from myhadoop_spark.sources.imagegen import _mix

# geometry: 9 frames x 512 samples over the 9 x 9 energy grid
FRAMES, FRAME_LEN = 9, 512
N_SAMPLES = FRAMES * FRAME_LEN
_AMP = 2000        # base amplitude bound (|s| < 2^11 — no clip risk)
_DC = 600          # planted per-frame DC offset


def base_signal(seed: int, n: int = N_SAMPLES) -> list[int]:
    """Deterministic pseudo-noise int16 signal in [-_AMP, _AMP].

    Hashed noise, NOT a tone: independent cross-seed spectra make
    unrelated fingerprints effectively random (~32 bits apart), the
    imagegen base_image lesson."""
    return [(_mix(i + (seed + 1) * 0x85EBCA6B) % (2 * _AMP + 1)) - _AMP
            for i in range(n)]


def dc_offset_frame(samples: list[int], frame: int,
                    dc: int = _DC) -> list[int]:
    """Copy of ``samples`` with a constant added to one frame — moves
    exactly one energy-grid cell (that frame's DC band), so the
    Haitsma–Kalker fingerprint flips <= 2 bits."""
    if not 0 <= frame < FRAMES:
        raise ValueError(f"frame out of range: {frame}")
    out = list(samples)
    for i in range(frame * FRAME_LEN, (frame + 1) * FRAME_LEN):
        out[i] += dc
    return out


def encode_wav(samples: list[int], *, rate: int = 8000,
               channels: int = 1) -> bytes:
    """16-bit PCM RIFF/WAVE bytes. channels > 1 duplicates the mono
    signal into every channel (the parser's floor-mean downmix then
    recovers it exactly)."""
    frames = b"".join(
        int(s).to_bytes(2, "little", signed=True) * channels
        for s in samples)
    byte_rate = rate * channels * 2
    fmt = ((1).to_bytes(2, "little")
           + channels.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + byte_rate.to_bytes(4, "little")
           + (channels * 2).to_bytes(2, "little")
           + (16).to_bytes(2, "little"))
    body = (b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(frames).to_bytes(4, "little") + frames)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def write_audio_corpus(out_dir: str | Path, *, n_groups: int,
                       variants: int = 4) -> dict:
    """Write ``n_groups * variants`` WAV files into ``out_dir``.

    Group g, variant v -> file ``g{g:05d}_v{v}.wav``. v0 = base
    signal; 1 <= v < variants-1 = DC offset on frame v (near-dup,
    hk64 hamming <= 2 to base); v = variants-1 = byte-exact copy of
    base (hamming 0). Returns {files, bytes} written."""
    if not 2 <= variants <= FRAMES:
        raise ValueError(f"variants must be in [2, {FRAMES}], "
                         f"got {variants}")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n_files = total = 0
    for g in range(n_groups):
        base = base_signal(g)
        payloads = {0: encode_wav(base)}
        for v in range(1, variants - 1):
            payloads[v] = encode_wav(dc_offset_frame(base, v))
        payloads[variants - 1] = payloads[0]
        for v, buf in payloads.items():
            p = out / f"g{g:05d}_v{v}.wav"
            p.write_bytes(buf)
            n_files += 1
            total += len(buf)
    return {"files": n_files, "bytes": total}
