"""Stdlib-only media codecs: RIFF/PCM16 WAV, 24-bit BI_RGB BMP, P6 PPM.

These are REAL parsers/encoders for the uncompressed container formats —
no codec library needed, only ``struct`` — so the multimodal pipeline's
decode seam (operators/multimodal.py) runs genuine bytes-in → values-out
end to end. Formats that genuinely need external codec libraries
(JPEG/PNG/MP3/H.264 video) stay behind the loudly-raising stub; these
three cover the "opaque binary column + typed decode" contract the
reference-scale training pipeline needs to prove
(/root/reference/src/batch_etl_to_bq.py:40-88 is the analogous
parse-opaque-payload-into-typed-columns seam for JSON).

Public format references: WAVE = RIFF chunks per the Microsoft/IBM
Multimedia Programming Interface spec (fmt chunk: audio format 1 = PCM,
little-endian int16 frames, channel-interleaved); BMP = BITMAPFILEHEADER
+ BITMAPINFOHEADER (biCompression 0 = BI_RGB, 24 bpp, rows bottom-up,
each row padded to 4 bytes, pixels stored B,G,R); PPM = netpbm "P6"
(ASCII header ``P6\\n<w> <h>\\n<maxval>\\n`` then binary R,G,B bytes).

Every decoder is STRICT: wrong magic, truncated payload, or an
unsupported sub-format (compressed BMP, non-PCM WAV, maxval != 255 PPM)
raises ``ValueError`` — a corrupt blob in a 100 TB corpus must surface
in the pipeline's error channel, not parse as garbage statistics.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- WAV


def encode_wav(
    frames: list[tuple[int, ...]], sample_rate: int, channels: int
) -> bytes:
    """Canonical 44-byte-header PCM16 WAV: RIFF(WAVE) + fmt + data.

    ``frames`` is a list of per-frame tuples (one int16 per channel).
    """
    if channels < 1:
        raise ValueError("channels must be >= 1")
    data = b"".join(
        struct.pack("<%dh" % channels, *fr) for fr in frames
    )
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> dict:
    """Chunk-walking PCM16 WAV parser (skips unknown chunks like LIST).

    Returns channels, sample_rate, n_frames, duration_ms and exact
    integer sample statistics (sum / sum of squares over ALL channels,
    plus per-channel sums) so callers derive float means with ONE IEEE
    division — bit-reproducible against a SQL oracle.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_seen = False
    channels = sample_rate = 0
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", blob, pos + 4)
        body_at = pos + 8
        if body_at + clen > len(blob):
            raise ValueError("truncated WAV chunk %r" % cid)
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            audio_format, channels, sample_rate, _br, _ba, bits = (
                struct.unpack_from("<HHIIHH", blob, body_at)
            )
            if audio_format != 1 or bits != 16:
                raise ValueError(
                    "only PCM16 supported (format=%d bits=%d)"
                    % (audio_format, bits)
                )
            fmt_seen = True
        elif cid == b"data":
            data = blob[body_at : body_at + clen]
        pos = body_at + clen + (clen & 1)  # chunks are word-aligned
    if not fmt_seen or data is None:
        raise ValueError("missing fmt/data chunk")
    if channels < 1 or len(data) % (2 * channels):
        raise ValueError("data chunk not frame-aligned")
    samples = struct.unpack("<%dh" % (len(data) // 2), data)
    n_frames = len(samples) // channels
    per_channel_sum = [0] * channels
    for i, s in enumerate(samples):
        per_channel_sum[i % channels] += s
    return {
        "format": "wav",
        "channels": channels,
        "sample_rate": sample_rate,
        "n_frames": n_frames,
        "n_samples": len(samples),
        "duration_ms": (n_frames * 1000) / sample_rate,
        "sample_sum": sum(per_channel_sum),
        "sample_sumsq": sum(s * s for s in samples),
        "per_channel_sum": per_channel_sum,
        "samples": samples,  # interleaved, for resample stages
    }


# ---------------------------------------------------------------- BMP


def _bmp_row_size(width: int) -> int:
    return (width * 3 + 3) // 4 * 4


def encode_bmp(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """24-bit BI_RGB BMP from ``pixels[y][x] = (r, g, b)`` (row 0 = top).

    Rows are stored bottom-up, B,G,R per pixel, padded to 4 bytes —
    the canonical Windows 3.x layout every viewer accepts.
    """
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    row_size = _bmp_row_size(width)
    data_size = row_size * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for r, g, b in pixels[y]:
            row += bytes((b, g, r))
        row += b"\x00" * (row_size - len(row))
        rows.append(bytes(row))
    return header + b"".join(rows)


def decode_bmp(blob: bytes) -> dict:
    """24-bit BI_RGB bottom-up BMP parser.

    Returns width/height and exact per-channel integer sums (one IEEE
    division from a mean) plus the pixel grid for resample stages.
    """
    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", blob, 10)
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            "only 24bpp BI_RGB supported (bpp=%d comp=%d)" % (bpp, compression)
        )
    if height <= 0 or width <= 0:
        raise ValueError("top-down/degenerate BMP not supported")
    row_size = _bmp_row_size(width)
    if data_offset + row_size * height > len(blob):
        raise ValueError("truncated BMP pixel array")
    pixels = []
    for y in range(height):  # emit top-down
        base = data_offset + (height - 1 - y) * row_size
        row = []
        for x in range(width):
            b, g, r = blob[base + 3 * x : base + 3 * x + 3]
            row.append((r, g, b))
        pixels.append(row)
    sums = [0, 0, 0]
    for row in pixels:
        for r, g, b in row:
            sums[0] += r
            sums[1] += g
            sums[2] += b
    return {
        "format": "bmp",
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "sum_r": sums[0],
        "sum_g": sums[1],
        "sum_b": sums[2],
        "pixels": pixels,
    }


# ---------------------------------------------------------------- PPM


def encode_ppm(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Binary netpbm P6, maxval 255: ``P6\\n<w> <h>\\n255\\n`` + RGB bytes."""
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    out = bytearray(b"P6\n%d %d\n255\n" % (width, height))
    for row in pixels:
        for r, g, b in row:
            out += bytes((r, g, b))
    return bytes(out)


def decode_ppm(blob: bytes) -> dict:
    """P6 PPM parser (maxval 255, no comment lines — strict)."""
    if blob[:3] != b"P6\n":
        raise ValueError("not a P6 PPM payload")
    # header: P6\n<w> <h>\n255\n
    nl2 = blob.find(b"\n", 3)
    nl3 = blob.find(b"\n", nl2 + 1) if nl2 != -1 else -1
    if nl2 == -1 or nl3 == -1:
        raise ValueError("truncated PPM header")
    try:
        w_s, h_s = blob[3:nl2].split()
        width, height = int(w_s), int(h_s)
    except ValueError as e:
        raise ValueError("bad PPM dimensions") from e
    if blob[nl2 + 1 : nl3] != b"255":
        raise ValueError("only maxval 255 supported")
    body = blob[nl3 + 1 :]
    if len(body) < 3 * width * height or width <= 0 or height <= 0:
        raise ValueError("truncated PPM pixel data")
    pixels = []
    for y in range(height):
        row = []
        for x in range(width):
            o = 3 * (y * width + x)
            row.append((body[o], body[o + 1], body[o + 2]))
        pixels.append(row)
    sums = [0, 0, 0]
    for row in pixels:
        for r, g, b in row:
            sums[0] += r
            sums[1] += g
            sums[2] += b
    return {
        "format": "ppm",
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "sum_r": sums[0],
        "sum_g": sums[1],
        "sum_b": sums[2],
        "pixels": pixels,
    }


# ------------------------------------------------------- dispatch


def sniff_format(blob: bytes) -> str:
    """Container format from magic bytes — decode trusts the BYTES, not
    the metadata column (a mislabeled blob must fail loudly)."""
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:3] == b"P6\n":
        return "ppm"
    raise ValueError("unrecognized media payload (first bytes %r)" % blob[:4])


def decode_any(blob: bytes) -> dict:
    return {"wav": decode_wav, "bmp": decode_bmp, "ppm": decode_ppm}[
        sniff_format(blob)
    ](blob)


# ------------------------------------------------- transformations


def resize_nearest(
    pixels: list[list[tuple[int, int, int]]], tw: int, th: int
) -> list[list[tuple[int, int, int]]]:
    """Nearest-neighbor resample: target (x, y) reads source pixel
    (x * sw // tw, y * sh // th) — the floor mapping a SQL oracle can
    reproduce exactly (no kernel, no float coordinates)."""
    sh = len(pixels)
    sw = len(pixels[0]) if sh else 0
    return [
        [pixels[y * sh // th][x * sw // tw] for x in range(tw)]
        for y in range(th)
    ]


def decimate_frames(
    samples: tuple[int, ...], channels: int, factor: int
) -> list[tuple[int, ...]]:
    """Keep every ``factor``-th frame (all channels of it) — the integer
    downsample whose output a SQL oracle reproduces via i % factor = 0."""
    frames = [
        tuple(samples[i : i + channels])
        for i in range(0, len(samples), channels)
    ]
    return frames[::factor]
