"""Pure-numpy media decoders (no external codec libraries).

Real decode kernels for the container formats that need nothing beyond
the standard library + numpy — these back the multimodal stages'
``decoder="auto"`` path, replacing the deterministic fakes wherever the
payload is one of:

- **PPM (P6)** — binary RGB, the simplest interchange image format;
- **BMP** — uncompressed 24/32-bit Windows bitmaps (BI_RGB),
  bottom-up or top-down rows, 4-byte row padding;
- **WAV** — RIFF PCM (8/16/32-bit int) mono/stereo.

Compressed formats (JPEG/PNG/MP3/...) still require external codecs and
raise :class:`UnsupportedMediaFormat`; the stages can fall back to the
seeded deterministic stub for those, keeping pipelines runnable in
codec-free environments while decoding everything they genuinely can.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedMediaFormat(ValueError):
    """Payload is not one of the natively-decodable formats."""


# ------------------------------------------------------------------- images

def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 binary PPM → (h, w, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise UnsupportedMediaFormat("not a P6 PPM")
    # header: magic, whitespace/comments, width, height, maxval, single ws
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise UnsupportedMediaFormat("16-bit PPM not supported")
    need = w * h * 3
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return data.reshape(h, w, 3).copy()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP (BI_RGB) → (h, w, 3) uint8 RGB."""
    if not payload.startswith(b"BM"):
        raise UnsupportedMediaFormat("not a BMP")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise UnsupportedMediaFormat("pre-BITMAPINFOHEADER BMP")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise UnsupportedMediaFormat(f"BMP bpp={bpp} compression={compression}")
    h = abs(h_raw)
    bottom_up = h_raw > 0
    nbytes = bpp // 8
    row_stride = (w * nbytes + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * h, offset=data_offset
    ).reshape(h, row_stride)
    px = rows[:, : w * nbytes].reshape(h, w, nbytes)
    if bottom_up:
        px = px[::-1]
    # BGR(A) → RGB
    return px[:, :, 2::-1].copy()


def decode_image(payload: bytes) -> np.ndarray:
    """Auto-detect and decode PPM/BMP → (h, w, 3) uint8.

    Malformed payloads that merely SNIFF as a known container (bad
    header fields, truncated pixel data) surface as
    :class:`UnsupportedMediaFormat` too, so the stages' fallback
    contract holds for corrupt real-world bytes."""
    try:
        if payload.startswith(b"P6"):
            return decode_ppm(payload)
        if payload.startswith(b"BM"):
            return decode_bmp(payload)
    except UnsupportedMediaFormat:
        raise
    except (ValueError, struct.error, IndexError) as e:
        raise UnsupportedMediaFormat(f"malformed image payload: {e}") from e
    raise UnsupportedMediaFormat("unknown image container")


def resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure indexing — the vectorized kernel a
    batch stage wants)."""
    src_h, src_w = img.shape[:2]
    ys = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return img[ys[:, None], xs[None, :]]


# -------------------------------------------------------------------- video

_Y4M_MAGIC = b"YUV4MPEG2"


def _y4m_plane_shapes(cs: bytes, w: int, h: int) -> tuple[int, int, int]:
    """(y_size, chroma_w, chroma_h) per Y4M colorspace tag."""
    if cs.startswith(b"420"):
        return w * h, (w + 1) // 2, (h + 1) // 2
    if cs.startswith(b"422"):
        return w * h, (w + 1) // 2, h
    if cs.startswith(b"444"):
        return w * h, w, h
    if cs == b"mono":
        return w * h, 0, 0
    raise UnsupportedMediaFormat(f"Y4M colorspace C{cs.decode()} not supported")


def decode_y4m(payload: bytes, *, rgb: bool = True) -> tuple[np.ndarray, dict]:
    """YUV4MPEG2 (Y4M) uncompressed video → (frames, meta).

    Y4M is the plain-text-headered raw-video interchange format of the
    mjpegtools suite (public spec): a ``YUV4MPEG2`` stream header with
    ``W``/``H``/``F``/``C`` parameters, then per frame a ``FRAME`` line
    followed by raw planar YUV. No codec library needed — this is the
    real decode path behind the video stage's ``decoder="auto"``.

    Supports C420*, C422, C444 and Cmono. Returns frames as a
    ``(n, h, w, 3)`` uint8 array — BT.601 limited-range RGB when
    ``rgb=True``, else YUV with chroma nearest-upsampled to 4:4:4
    (mono fills neutral chroma 128). ``meta`` carries width/height/
    fps_num/fps_den/colorspace/n_frames."""
    if not payload.startswith(_Y4M_MAGIC):
        raise UnsupportedMediaFormat("not a YUV4MPEG2 stream")
    try:
        return _decode_y4m_body(payload, rgb)
    except UnsupportedMediaFormat:
        raise
    except (ValueError, struct.error, IndexError) as e:
        raise UnsupportedMediaFormat(f"malformed Y4M payload: {e}") from e


def _decode_y4m_body(payload: bytes, rgb: bool) -> tuple[np.ndarray, dict]:
    nl = payload.index(b"\n")
    w = h = None
    fps_num, fps_den = 25, 1
    cs = b"420jpeg"  # the spec's default when C is absent
    for tok in payload[len(_Y4M_MAGIC):nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"F":
            num, den = val.split(b":")
            fps_num, fps_den = int(num), int(den)
        elif key == b"C":
            cs = val
        # I (interlacing), A (aspect), X (comment) don't affect plane layout
    if not w or not h:
        raise UnsupportedMediaFormat("Y4M header missing W/H")
    y_size, cw, ch = _y4m_plane_shapes(cs, w, h)
    c_size = cw * ch
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:fnl].split(b" ")[0] != b"FRAME":
            raise UnsupportedMediaFormat("expected FRAME marker")
        pos = fnl + 1
        if pos + y_size + 2 * c_size > len(payload):
            raise UnsupportedMediaFormat("truncated Y4M frame")
        y = np.frombuffer(payload, np.uint8, count=y_size, offset=pos).reshape(h, w)
        pos += y_size
        if c_size:
            u = np.frombuffer(payload, np.uint8, count=c_size, offset=pos).reshape(ch, cw)
            pos += c_size
            v = np.frombuffer(payload, np.uint8, count=c_size, offset=pos).reshape(ch, cw)
            pos += c_size
            # nearest-neighbor chroma upsample to 4:4:4
            if (ch, cw) != (h, w):
                u = u[(np.arange(h) * ch // h)[:, None], (np.arange(w) * cw // w)[None, :]]
                v = v[(np.arange(h) * ch // h)[:, None], (np.arange(w) * cw // w)[None, :]]
        else:
            u = v = np.full((h, w), 128, dtype=np.uint8)
        frames.append(np.stack([y, u, v], axis=-1))
    out = np.stack(frames) if frames else np.zeros((0, h, w, 3), dtype=np.uint8)
    if rgb and len(out):
        out = yuv_to_rgb(out)
    meta = {
        "width": w, "height": h, "fps_num": fps_num, "fps_den": fps_den,
        "colorspace": "C" + cs.decode("ascii"), "n_frames": len(frames),
    }
    return out, meta


def yuv_to_rgb(yuv: np.ndarray) -> np.ndarray:
    """BT.601 limited-range YCbCr → RGB (uint8 in, uint8 out), vectorized
    over any leading shape ending in a channel axis of 3."""
    f = yuv.astype(np.float64)
    yp = (f[..., 0] - 16.0) * (255.0 / 219.0)
    cb = f[..., 1] - 128.0
    cr = f[..., 2] - 128.0
    r = yp + 1.596 * cr
    g = yp - 0.392 * cb - 0.813 * cr
    b = yp + 2.017 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 255.0).round().astype(np.uint8)


def encode_y4m(
    frames: np.ndarray, *, fps: tuple[int, int] = (25, 1), colorspace: str = "C444"
) -> bytes:
    """Y4M stream from ``(n, h, w, 3)`` uint8 YUV frames (fixture/test
    helper, the inverse of ``decode_y4m(rgb=False)``; C444 round-trips
    bit-exactly, C420 subsamples chroma by top-left-of-2x2 nearest)."""
    n, h, w, _ = frames.shape
    cs = colorspace.encode("ascii").lstrip(b"C")
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n" % (w, h, fps[0], fps[1], cs)
    parts = [head]
    for i in range(n):
        parts.append(b"FRAME\n")
        f = np.ascontiguousarray(frames[i], dtype=np.uint8)
        parts.append(f[:, :, 0].tobytes())
        if cs.startswith(b"444"):
            parts.append(f[:, :, 1].tobytes())
            parts.append(f[:, :, 2].tobytes())
        elif cs.startswith(b"420"):
            parts.append(f[::2, ::2, 1].tobytes())
            parts.append(f[::2, ::2, 2].tobytes())
        elif cs.startswith(b"422"):
            parts.append(f[:, ::2, 1].tobytes())
            parts.append(f[:, ::2, 2].tobytes())
        elif cs == b"mono":
            pass
        else:
            raise UnsupportedMediaFormat(f"encode colorspace {colorspace} not supported")
    return b"".join(parts)


# -------------------------------------------------------------------- audio

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM WAV → (mono float32 waveform in [-1, 1], sample_rate).

    Supports 8-bit unsigned, 16/32-bit signed PCM, any channel count
    (channels average to mono). Malformed RIFF payloads surface as
    :class:`UnsupportedMediaFormat` (fallback contract)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedMediaFormat("not a RIFF/WAVE container")
    try:
        return _decode_wav_body(payload)
    except UnsupportedMediaFormat:
        raise
    except (ValueError, struct.error, IndexError) as e:
        raise UnsupportedMediaFormat(f"malformed WAV payload: {e}") from e


def _decode_wav_body(payload: bytes) -> tuple[np.ndarray, int]:
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise UnsupportedMediaFormat("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format != 1:
        raise UnsupportedMediaFormat(f"non-PCM WAV (format {audio_format})")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise UnsupportedMediaFormat(f"{bits}-bit PCM not supported")
    if n_channels > 1:
        x = x[: len(x) - len(x) % n_channels].reshape(-1, n_channels).mean(axis=1)
    return x, sample_rate


def resample_linear(x: np.ndarray, n_out: int) -> np.ndarray:
    """Linear-interpolation resample to exactly ``n_out`` samples."""
    if len(x) == 0:
        return np.zeros(n_out, dtype=np.float32)
    if len(x) == n_out:
        return x.astype(np.float32)
    src = np.linspace(0.0, 1.0, num=len(x))
    dst = np.linspace(0.0, 1.0, num=n_out)
    return np.interp(dst, src, x).astype(np.float32)


# ---------------------------------------------------------------- encoders
# (test/fixture helpers: build valid payloads without external libs)

def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit bottom-up BMP from an (h, w, 3) uint8 RGB array."""
    h, w = img.shape[:2]
    row_stride = (w * 3 + 3) & ~3
    img_size = row_stride * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    return header + info + rows.tobytes()


def encode_wav(x: np.ndarray, sample_rate: int) -> bytes:
    """16-bit mono PCM WAV from a float waveform in [-1, 1]."""
    pcm = (np.clip(x, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
