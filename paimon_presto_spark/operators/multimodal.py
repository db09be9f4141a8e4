"""Multimodal column processing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch shapes, partition sizing, UDF
signatures — is real and tested, and so is decoding for the formats the
standard library can handle: PNG (zlib inflate + per-scanline unfilter),
BMP (uncompressed 24/32-bit), PPM (P6), and WAV (stdlib ``wave``). When
``pillow`` / ``av`` are importable they take over (JPEG/WebP/video);
otherwise unsupported formats raise a clear error. A deterministic fake
decoder remains available (``use_fake_decoder=True``) so pipelines can be
tested end-to-end with arbitrary payload bytes.

Scale notes:
- Binary payloads ride in the same parquet as metadata; Spark's vectorized
  reader handles them, and ``spark.sql.files.maxPartitionBytes`` bounds the
  per-task byte budget (media rows are big — size partitions by bytes, not
  rows).
- ``mapInPandas`` streams Arrow record batches: peak memory per task is one
  batch, not one partition. Keep ``spark.sql.execution.arrow
  .maxRecordsPerBatch`` modest (e.g. 64) for multi-MB payloads.
"""

from __future__ import annotations

import math
import struct
import zlib
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: media row schema: binary payload + typed metadata
MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms bigint"
)

IMAGE_FEATURE_SCHEMA = (
    "media_id bigint, width int, height int, n_bytes bigint, "
    "mean_luma double, phash bigint"
)

FRAME_SAMPLE_SCHEMA = "media_id bigint, frame_idx int, frame_ts_ms bigint, frame binary"

AUDIO_FEATURE_SCHEMA = (
    "media_id bigint, sample_rate int, n_channels int, n_samples bigint, "
    "duration_ms bigint, rms double"
)


# ---------------------------------------------------------------------------
# Real decoders (pure-Python stdlib formats; pillow/av take over if present)
# ---------------------------------------------------------------------------


def _pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def _pyav():
    try:
        import av  # noqa: F401

        return av
    except ImportError:
        return None


def _decode_png(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Minimal PNG decoder: 8-bit gray/RGB/gray+alpha/RGBA, no interlace.

    Returns (width, height, rows) with each row a packed RGB bytes object —
    enough for feature extraction and resizing without pillow.
    """
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    pos, width, height, channels = 8, 0, 0, 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in (0, 2, 4, 6):
                raise ValueError(
                    f"unsupported PNG layout (depth={depth} color={color} "
                    f"interlace={interlace}); install pillow"
                )
            channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if not width or not idat:
        raise ValueError("truncated PNG stream")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    rows: list[bytes] = []
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        prev = line
        # expand to packed RGB
        if channels == 3:
            rows.append(bytes(line))
        elif channels == 4:
            rows.append(bytes(b for i in range(0, stride, 4) for b in line[i : i + 3]))
        elif channels == 1:
            rows.append(bytes(b for v in line for b in (v, v, v)))
        else:  # gray+alpha
            rows.append(
                bytes(b for i in range(0, stride, 2) for b in (line[i],) * 3)
            )
    return width, height, rows


def _decode_bmp(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Uncompressed 24/32-bit BMP (the common BITMAPINFOHEADER layout)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp} compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    nch = bpp // 8
    stride = (width * nch + 3) & ~3
    rows: list[bytes] = []
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        off = data_off + src_y * stride
        line = payload[off : off + width * nch]
        # BGR(A) → RGB
        rows.append(
            bytes(
                b
                for i in range(0, width * nch, nch)
                for b in (line[i + 2], line[i + 1], line[i])
            )
        )
    return width, height, rows


def _decode_ppm(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Binary PPM (P6), maxval 255."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    # header tokens: P6 <w> <h> <maxval>, with comments allowed
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    stride = width * 3
    if len(payload) - pos < stride * height:
        raise ValueError("truncated PPM pixel data")
    return width, height, [payload[pos + y * stride : pos + (y + 1) * stride] for y in range(height)]


def decode_image_pixels(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Decode an image payload to (width, height, packed-RGB rows).

    Prefers pillow when importable (JPEG/WebP/everything); otherwise the
    pure-Python PNG/BMP/PPM decoders above. Unsupported formats raise
    ``NotImplementedError`` naming the missing dependency.
    """
    Image = _pil()
    if Image is not None:
        import io

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        width, height = img.size
        raw = img.tobytes()
        stride = width * 3
        return width, height, [raw[y * stride : (y + 1) * stride] for y in range(height)]
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise NotImplementedError(
        f"unsupported image format (magic {payload[:4]!r}): built-in decoders "
        "cover PNG/BMP/PPM; install pillow for JPEG/WebP/TIFF"
    )


def _luma_rows(rows: list[bytes]) -> list[list[float]]:
    return [
        [
            0.299 * row[i] + 0.587 * row[i + 1] + 0.114 * row[i + 2]
            for i in range(0, len(row), 3)
        ]
        for row in rows
    ]


def _average_hash(luma: list[list[float]], grid: int = 8) -> int:
    """aHash: box-average luma onto grid×grid, threshold at the mean, pack
    row-major into a signed 64-bit int (parquet bigint)."""
    h, w = len(luma), len(luma[0])
    cells = []
    for gy in range(grid):
        y0, y1 = gy * h // grid, max((gy + 1) * h // grid, gy * h // grid + 1)
        for gx in range(grid):
            x0, x1 = gx * w // grid, max((gx + 1) * w // grid, gx * w // grid + 1)
            vals = [luma[y][x] for y in range(y0, min(y1, h)) for x in range(x0, min(x1, w))]
            cells.append(sum(vals) / len(vals) if vals else 0.0)
    mean = sum(cells) / len(cells)
    bits = 0
    for i, v in enumerate(cells):
        if v > mean:
            bits |= 1 << (len(cells) - 1 - i)
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def _real_decode(payload: bytes) -> dict:
    width, height, rows = decode_image_pixels(payload)
    luma = _luma_rows(rows)
    total = sum(sum(r) for r in luma)
    return {
        "width": width,
        "height": height,
        "mean_luma": total / (width * height * 255.0),
        "phash": _average_hash(luma),
    }


def _fake_decode(payload: bytes) -> dict:
    """Deterministic pseudo-decode derived from the payload bytes.

    Stands in for a real image decode so batch shapes, schemas, and
    downstream aggregations can be exercised with arbitrary bytes.
    """
    n = len(payload)
    checksum = sum(payload[:1024]) if n else 0
    return {
        "width": 16 + checksum % 64,
        "height": 16 + (checksum // 64) % 64,
        "mean_luma": (checksum % 256) / 255.0,
        "phash": int.from_bytes(payload[:8].ljust(8, b"\0"), "big") >> 1,
    }


def encode_ppm(width: int, height: int, rows: list[bytes]) -> bytes:
    """Re-encode packed-RGB rows as binary PPM — the dependency-free output
    format for the resize path."""
    return b"P6\n%d %d\n255\n" % (width, height) + b"".join(rows)


def _resize_nearest(
    width: int, height: int, rows: list[bytes], out_w: int, out_h: int
) -> list[bytes]:
    out = []
    for y in range(out_h):
        sy = min(y * height // out_h, height - 1)
        src = rows[sy]
        line = bytearray()
        for x in range(out_w):
            sx = min(x * width // out_w, width - 1) * 3
            line += src[sx : sx + 3]
        out.append(bytes(line))
    return out


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def extract_image_features(media: DataFrame, use_fake_decoder: bool = False) -> DataFrame:
    """Per-image features via Arrow-batched mapInPandas.

    Real path: pillow when importable, else the built-in PNG/BMP/PPM
    decoders; luma statistics and a real 8×8 average-hash. Fake path
    (``use_fake_decoder=True``): deterministic pseudo-features from the
    payload bytes, for plumbing tests with arbitrary payloads.
    """
    import pandas as pd

    decode = _fake_decode if use_fake_decoder else _real_decode

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                d = decode(payload)
                rows.append(
                    (
                        int(mid),
                        d["width"],
                        d["height"],
                        len(payload),
                        d["mean_luma"],
                        d["phash"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_bytes",
                    "mean_luma",
                    "phash",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, use_fake_decoder: bool = False
) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame —
    the 1→N batch shape (each input row yields a variable number of output
    rows) that real frame extraction needs.

    Real path requires ``av`` (PyAV): demux, decode, keep one frame per
    ``every_ms``, re-encode each kept frame as PPM. Without PyAV the real
    path raises; the fake path derives pseudo-frames from payload bytes.
    """
    import pandas as pd

    def run(batches):
        av = None if use_fake_decoder else _pyav()
        for pdf in batches:
            out = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                payload = bytes(payload or b"")
                if not use_fake_decoder:
                    if av is None:
                        raise NotImplementedError(
                            "video decoding requires PyAV (pip install av); "
                            "pass use_fake_decoder=True for the deterministic "
                            "test double"
                        )
                    import io

                    with av.open(io.BytesIO(payload)) as container:
                        stream = container.streams.video[0]
                        next_ts, idx = 0, 0
                        for frame in container.decode(stream):
                            ts_ms = int((frame.pts or 0) * stream.time_base * 1000)
                            if ts_ms >= next_ts:
                                rgb = frame.to_rgb().to_ndarray()
                                rows = [bytes(r.tobytes()) for r in rgb]
                                out.append(
                                    (
                                        int(mid),
                                        idx,
                                        ts_ms,
                                        encode_ppm(rgb.shape[1], rgb.shape[0], rows),
                                    )
                                )
                                idx += 1
                                # anchor on the kept frame's own timestamp:
                                # after a PTS gap, `next_ts += every_ms`
                                # would lag behind ts_ms and keep a burst
                                # of consecutive frames until it catches up
                                next_ts = ts_ms + every_ms
                    continue
                n_frames = max(1, int((dur or 0) // every_ms))
                for i in range(n_frames):
                    ts = i * every_ms
                    fake_frame = payload[i % max(len(payload), 1) :][:16]
                    out.append((int(mid), i, ts, fake_frame))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_ts_ms", "frame"]
            )

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id bigint, out_width int, out_height int, resized binary, "
    "n_bytes_in bigint, n_bytes_out bigint"
)


def resize_images(
    media: DataFrame,
    out_width: int = 224,
    out_height: int = 224,
    use_fake_decoder: bool = False,
) -> DataFrame:
    """Batch image resize (decode → resize → re-encode) via mapInPandas.

    The 1→1 payload-transform shape: output rows carry a new binary column
    whose size differs from the input (the part that matters for partition
    sizing — plan output partitions by expected OUTPUT bytes when the
    resize shrinks 10×). Real path: pillow's ``Image.resize`` when
    importable, else decode via the built-in PNG/BMP/PPM decoders,
    nearest-neighbor resample, re-encode as PPM. The deterministic fake
    derives a pseudo-thumbnail by strided byte sampling.
    """
    import pandas as pd

    target = max(1, (out_width * out_height) // 8)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                if use_fake_decoder:
                    stride = max(1, len(payload) // target)
                    resized = payload[::stride][:target]
                else:
                    w, h, px = decode_image_pixels(payload)
                    resized = encode_ppm(
                        out_width,
                        out_height,
                        _resize_nearest(w, h, px, out_width, out_height),
                    )
                rows.append(
                    (
                        int(mid),
                        out_width,
                        out_height,
                        resized,
                        len(payload),
                        len(resized),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "out_width",
                    "out_height",
                    "resized",
                    "n_bytes_in",
                    "n_bytes_out",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def extract_audio_features(
    media: DataFrame, use_fake_decoder: bool = False
) -> DataFrame:
    """Per-clip audio features via mapInPandas. Real path parses WAV (PCM
    8/16-bit) with the stdlib ``wave`` module — sample rate, channel count,
    duration, RMS amplitude; other containers need librosa/ffmpeg and
    raise. Fake path derives pseudo-features from payload bytes."""
    import pandas as pd

    def _wav_features(payload: bytes) -> tuple[int, int, int, int, float]:
        rate, nch, nframes, vals = _wav_pcm_decode(payload)
        # math.sqrt, not ** 0.5: sqrt is IEEE-correctly-rounded and equals
        # SQL engines' SQRT bit-for-bit; pow(x, 0.5) is not guaranteed to
        rms = (
            math.sqrt(sum(v * v for v in vals) / len(vals)) if vals else 0.0
        )
        dur_ms = int(nframes * 1000 / rate) if rate else 0
        return rate, nch, nframes, dur_ms, rms

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                if use_fake_decoder:
                    n = len(payload)
                    checksum = sum(payload[:1024]) if n else 0
                    rows.append(
                        (int(mid), 16000, 1, n, n * 1000 // 16000, float(checksum % 97))
                    )
                    continue
                rate, nch, nframes, dur_ms, rms = _wav_features(payload)
                rows.append((int(mid), rate, nch, nframes, dur_ms, rms))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_channels",
                    "n_samples",
                    "duration_ms",
                    "rms",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=AUDIO_FEATURE_SCHEMA
    )


def _wav_pcm_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a WAV/PCM payload: (rate, channels, frames, samples).
    Stdlib ``wave``; 8/16-bit PCM — the ONE support envelope both
    ``extract_audio_features`` and ``extract_audio_fingerprint`` share
    (a wider codec added here widens both). Channels stay interleaved:
    both consumers reduce over sums of squares, which commute across
    deinterleaving."""
    import io
    import wave

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            f"unsupported audio container (magic {payload[:4]!r}): "
            "built-in decoding covers WAV/PCM; install librosa for "
            "mp3/flac/ogg"
        )
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, nch, nframes, sw = (
            w.getframerate(),
            w.getnchannels(),
            w.getnframes(),
            w.getsampwidth(),
        )
        raw = w.readframes(nframes)
    if sw == 2:
        vals = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    elif sw == 1:
        vals = [b - 128 for b in raw]
    else:
        raise NotImplementedError(
            f"{8 * sw}-bit WAV unsupported; install librosa/soundfile"
        )
    return rate, nch, nframes, vals


def _energy_sign_hash(vals: list[int], blocks: int = 64) -> int:
    """Energy-band sign hash (chromaprint-lite): split the sample stream
    into ``blocks`` equal time blocks, block energy E[p] = Σ v² (EXACT
    integer math), bit p set iff blocks·E[p] > ΣE — strictly above the
    clip-mean block energy, the audio analog of the image aHash's
    above-mean-luma bit. Integer-exact end to end, so a SQL oracle can
    replay the whole computation symbolically. Packed MSB-first into a
    signed 64-bit int (parquet bigint), same convention as
    ``_average_hash``."""
    n = len(vals)
    if n == 0:
        return 0
    energies = []
    for p in range(blocks):
        lo, hi = p * n // blocks, (p + 1) * n // blocks
        energies.append(sum(v * v for v in vals[lo:hi]))
    total = sum(energies)
    bits = 0
    for p, e in enumerate(energies):
        if blocks * e > total:
            bits |= 1 << (blocks - 1 - p)
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def extract_audio_fingerprint(
    media: DataFrame, blocks: int = 64, use_fake_decoder: bool = False
) -> DataFrame:
    """Per-clip 64-bit acoustic fingerprint via Arrow-batched mapInPandas:
    real WAV decode (stdlib ``wave``) → integer block energies →
    above-mean sign map (``_energy_sign_hash``). The output column
    ``afp`` feeds ``operators/dedup.hamming_banded_pairs`` directly —
    near-identical clips (re-encodes, small edits) differ in a few
    energy-sign bits, exactly the property banded Hamming dedup needs.
    Fake path: deterministic pseudo-fingerprint from payload bytes for
    plumbing tests.

    100 TB shape: decode+hash is a 1→1 Arrow map — raw audio bytes never
    shuffle; only the 8-byte fingerprint does.
    """
    import pandas as pd

    if not 0 < blocks <= 64:
        raise ValueError(f"blocks must be in 1..64, got {blocks}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                if use_fake_decoder:
                    fp = int.from_bytes(
                        payload[:8].ljust(8, b"\0"), "big"
                    ) >> 1
                    rows.append((int(mid), len(payload), fp))
                    continue
                _rate, _nch, _nframes, vals = _wav_pcm_decode(payload)
                rows.append(
                    (int(mid), len(vals), _energy_sign_hash(vals, blocks))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "afp"]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema="media_id bigint, n_samples bigint, afp bigint"
    )


def _ppm_stream_frames(payload: bytes) -> list[bytes]:
    """Split a concatenation of binary-PPM (P6) images into per-frame
    payloads — the engine's raw-frames interchange format (``encode_ppm``
    writes it; ``sample_frames``' real path emits one such PPM per kept
    frame). Strict by design: header is ``P6␣w␣h␣255␣`` with
    whitespace-separated ASCII tokens and no comments, exactly the bytes
    ``encode_ppm`` produces."""
    frames, pos, n = [], 0, len(payload)
    while pos < n:
        start = pos
        if payload[pos : pos + 2] != b"P6":
            raise ValueError(
                f"PPM stream: expected 'P6' magic at byte {pos}, got "
                f"{payload[pos:pos + 2]!r}"
            )
        pos += 2
        tokens = []
        while len(tokens) < 3:
            while pos < n and payload[pos : pos + 1].isspace():
                pos += 1
            tok = pos
            while pos < n and not payload[pos : pos + 1].isspace():
                pos += 1
            if tok == pos:
                raise ValueError("PPM stream: truncated header")
            tokens.append(int(payload[tok:pos]))
        pos += 1  # single whitespace after maxval
        width, height, maxval = tokens
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        if width <= 0 or height <= 0:
            # a non-positive dimension would move pos BACKWARD (or not at
            # all) and re-parse the same header forever — fail loudly on
            # the corrupt header instead
            raise ValueError(
                f"PPM stream: non-positive dimensions {width}x{height}"
            )
        pos += width * height * 3
        if pos > n:
            raise ValueError("PPM stream: truncated pixel data")
        frames.append(payload[start:pos])
    return frames


def _majority_hash(hashes: list[int], bits: int = 64) -> int:
    """Temporal majority vote over per-frame signed 64-bit hashes: output
    bit p is set iff a STRICT majority of frames set it (ties — possible
    only for even frame counts — resolve to 0). Majority is deliberately
    order-insensitive: it is robust to frame-rate jitter, re-encodes, and
    dropped frames, the property video near-dup needs (cf. the
    binarized temporal-majority aggregation in published video-copy
    detection, e.g. the TMK baseline). Packed signed, same convention as
    ``_average_hash``/``_energy_sign_hash``."""
    n = len(hashes)
    if n == 0:
        return 0
    mask = (1 << bits) - 1
    uhashes = [h & mask for h in hashes]
    out = 0
    for p in range(bits):
        if 2 * sum((h >> p) & 1 for h in uhashes) > n:
            out |= 1 << p
    return out - (1 << bits) if out >= 1 << (bits - 1) else out


def extract_video_fingerprint(
    media: DataFrame, every_ms: int = 1000, use_fake_decoder: bool = False
) -> DataFrame:
    """Per-clip 64-bit video fingerprint via Arrow-batched mapInPandas:
    demux → per-frame decode → per-frame 8×8 average-hash
    (``_average_hash``, the same bit map the image path uses) → temporal
    majority vote (``_majority_hash``). The output column ``vfp`` feeds
    ``operators/dedup.hamming_banded_pairs`` directly, completing
    perceptual near-dup across all four modalities (text SimHash / image
    aHash / audio energy-sign / video frame-majority) over ONE
    signature-agnostic banding core.

    Demux envelope, mirroring the image decoders' dependency policy:
    payloads starting with ``P6`` are raw PPM-frame streams (the engine's
    own interchange format — what ``sample_frames`` emits per frame, and
    what a decode stage upstream of fingerprinting would stage) and every
    frame in the stream votes (the stream IS the sampled frames).
    Anything else (mp4/mkv/webm) requires PyAV: when importable the real
    demux samples one frame per ``every_ms`` exactly like
    ``sample_frames``; otherwise NotImplementedError names the dependency
    — the designed stub. Fake path: deterministic pseudo-fingerprint from
    payload bytes for plumbing tests.

    100 TB shape: demux+hash is a 1→1 Arrow map — raw video bytes (the
    heaviest media payloads of all) never shuffle; only the 8-byte
    fingerprint and a frame count do. Partition sizing follows INPUT
    bytes (``spark.sql.files.maxPartitionBytes``), one clip per task-row.
    """
    import pandas as pd

    def _clip_hashes_ppm(payload: bytes) -> list[int]:
        return [
            _average_hash(_luma_rows(decode_image_pixels(frame)[2]))
            for frame in _ppm_stream_frames(payload)
        ]

    def _clip_hashes_av(av, payload: bytes) -> list[int]:
        import io

        hashes = []
        with av.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            next_ts = 0
            for frame in container.decode(stream):
                ts_ms = int((frame.pts or 0) * stream.time_base * 1000)
                if ts_ms >= next_ts:
                    rgb = frame.to_rgb().to_ndarray()
                    rows = [bytes(r.tobytes()) for r in rgb]
                    hashes.append(_average_hash(_luma_rows(rows)))
                    next_ts = ts_ms + every_ms  # anchor on kept frame
        return hashes

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        av = None if use_fake_decoder else _pyav()
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                if use_fake_decoder:
                    fp = int.from_bytes(
                        payload[:8].ljust(8, b"\0"), "big"
                    ) >> 1
                    rows.append((int(mid), 1, fp))
                    continue
                if payload[:2] == b"P6":
                    hashes = _clip_hashes_ppm(payload)
                elif av is not None:
                    hashes = _clip_hashes_av(av, payload)
                else:
                    raise NotImplementedError(
                        f"unsupported video container (magic "
                        f"{payload[:4]!r}): built-in demux covers raw "
                        "PPM-frame streams; install PyAV (pip install av) "
                        "for mp4/mkv/webm"
                    )
                rows.append(
                    (int(mid), len(hashes), _majority_hash(hashes))
                )
            yield pd.DataFrame(rows, columns=["media_id", "n_frames", "vfp"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema="media_id bigint, n_frames int, vfp bigint"
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata rollup (no decode): byte/row counts per kind."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max(F.length("payload")).alias("max_bytes"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )
