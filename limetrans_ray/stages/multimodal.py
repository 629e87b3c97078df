"""Multimodal column stages (image/audio/video as opaque binary).

Decode paths per stage:

- ``decoder="auto"`` — REAL pure-numpy decoders for the formats that
  need no external codec library (functions/media.py): P6 PPM and
  uncompressed 24/32-bit BMP images, RIFF PCM WAV audio, with real
  nearest-neighbor resize / linear resampling. Compressed formats
  (JPEG/PNG/MP3/…) still need external codecs: per-payload they raise
  :class:`DecoderNotAvailable` (``fallback="error"``) or degrade to the
  stub (``fallback="stub"``).
- ``decoder="stub"`` (default) — deterministic fake seeded from the
  payload digest, for codec-free smoke pipelines.

Video frame extraction is REAL for YUV4MPEG2 (Y4M) payloads — the
public uncompressed raw-video format, parsed in pure numpy — with
sampled frames re-emitted as PPM payloads that feed straight into
:class:`ImageDecodeStage`; compressed containers (MP4/WebM/…) raise or
degrade to the byte-window stub exactly like the image/audio stages.

Usage pattern (binary payloads dominate block size, so batches stay
small and the batch format stays Arrow end-to-end):

    ds.map_batches(ImageDecodeStage(target=(64, 64), decoder="auto"),
                   batch_format="pyarrow", batch_size=64,
                   concurrency=8, num_cpus=1)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.media import (
    UnsupportedMediaFormat,
    decode_image,
    decode_wav,
    resample_linear,
    resize_nearest,
)

__all__ = [
    "AudioDecodeStage",
    "DecoderNotAvailable",
    "FrameSampleStage",
    "ImageDecodeStage",
    "ImageFeatureStage",
]


class DecoderNotAvailable(NotImplementedError):
    """Raised when decoding is requested for a payload format that
    needs an external codec library this environment lacks."""


def _decode_stub(payload: bytes, channels: int, side: int) -> np.ndarray:
    """Deterministic fake decode: seeded uint8 tensor derived from the
    payload digest — stable across processes, no wall clock."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(side, side, channels), dtype=np.uint8)


class ImageDecodeStage:
    """binary image column → fixed-size uint8 tensor + typed metadata.

    Actor-pool stage: the (stubbed) decoder and resize kernel are set up
    once per actor; per batch everything stays Arrow. Output columns:
    ``pixels`` (FixedSizeList<uint8>), ``height``/``width``/``channels``.
    """

    def __init__(
        self,
        image_col: str = "payload",
        target: tuple[int, int] = (32, 32),
        *,
        decoder: str = "stub",
        fallback: str = "error",
        real_decoder: bool | None = None,
    ):
        if real_decoder:  # back-compat spelling of decoder="auto"
            decoder = "auto"
        if decoder not in ("stub", "auto"):
            raise ValueError(f"unknown decoder {decoder!r}")
        if fallback not in ("stub", "error"):
            raise ValueError(f"unknown fallback {fallback!r}")
        self.image_col = image_col
        self.h, self.w = target
        self.decoder = decoder
        self.fallback = fallback

    def _decode(self, p: bytes) -> np.ndarray:
        if self.decoder == "auto":
            try:
                return resize_nearest(decode_image(p), self.h, self.w)
            except UnsupportedMediaFormat as e:
                if self.fallback == "error":
                    raise DecoderNotAvailable(
                        f"payload needs an external codec ({e}); pass "
                        "fallback='stub' to degrade to the deterministic fake"
                    ) from e
        return _decode_stub(p, 3, max(self.h, self.w))[: self.h, : self.w]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.image_col).to_pylist()
        n = len(payloads)
        tensors = np.empty((n, self.h * self.w * 3), dtype=np.uint8)
        for i, p in enumerate(payloads):
            tensors[i] = self._decode(p).reshape(-1)
        pixels = pa.FixedSizeListArray.from_arrays(
            pa.array(tensors.reshape(-1)), self.h * self.w * 3
        )
        out = batch.drop_columns([self.image_col])
        out = out.append_column("pixels", pixels)
        out = out.append_column("height", pa.array(np.full(n, self.h, dtype=np.int32)))
        out = out.append_column("width", pa.array(np.full(n, self.w, dtype=np.int32)))
        out = out.append_column("channels", pa.array(np.full(n, 3, dtype=np.int32)))
        return out


class ImageFeatureStage:
    """pixels tensor → small float feature vector (channel means/stds —
    a stand-in for a real embedding model; the actor-pool/batch shape is
    what a model-inference stage would use, weights loaded in
    ``__init__``)."""

    def __init__(self, pixels_col: str = "pixels"):
        self.pixels_col = pixels_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.pixels_col)
        flat = np.asarray(col.combine_chunks().flatten(), dtype=np.float64)
        n = batch.num_rows
        per = flat.reshape(n, -1, 3)
        feats = np.concatenate(
            [per.mean(axis=1), per.std(axis=1)], axis=1
        )  # (n, 6)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1)), 6)
        return batch.append_column("features", arr)


class AudioDecodeStage:
    """binary audio column → fixed-rate int16 waveform + typed metadata.

    Same contract as :class:`ImageDecodeStage`: the decode kernel is a
    deterministic stub (seeded from the payload digest — swap for
    ffmpeg/soundfile), the Arrow plumbing is real. Output columns:
    ``waveform`` (FixedSizeList<int16>), ``sample_rate``, ``n_samples``.
    """

    def __init__(
        self,
        audio_col: str = "payload",
        n_samples: int = 4096,
        sample_rate: int = 16_000,
        *,
        decoder: str = "stub",
        fallback: str = "error",
        real_decoder: bool | None = None,
    ):
        if real_decoder:  # back-compat spelling of decoder="auto"
            decoder = "auto"
        if decoder not in ("stub", "auto"):
            raise ValueError(f"unknown decoder {decoder!r}")
        if fallback not in ("stub", "error"):
            raise ValueError(f"unknown fallback {fallback!r}")
        self.audio_col = audio_col
        self.n_samples = n_samples
        self.sample_rate = sample_rate
        self.decoder = decoder
        self.fallback = fallback

    def _decode(self, p: bytes) -> tuple[np.ndarray, int]:
        """(int16 waveform of exactly n_samples, source sample rate)."""
        if self.decoder == "auto":
            try:
                x, sr = decode_wav(p)
                wav = resample_linear(x, self.n_samples)
                return (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16), sr
            except UnsupportedMediaFormat as e:
                if self.fallback == "error":
                    raise DecoderNotAvailable(
                        f"payload needs an external codec ({e}); pass "
                        "fallback='stub' to degrade to the deterministic fake"
                    ) from e
        seed = int.from_bytes(hashlib.blake2b(p, digest_size=8).digest(), "little")
        rng = np.random.default_rng(seed)
        return (
            rng.integers(-(2**15), 2**15, size=self.n_samples, dtype=np.int16),
            self.sample_rate,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.audio_col).to_pylist()
        n = len(payloads)
        waves = np.empty((n, self.n_samples), dtype=np.int16)
        rates = np.empty(n, dtype=np.int32)
        for i, p in enumerate(payloads):
            waves[i], rates[i] = self._decode(p)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(waves.reshape(-1)), self.n_samples)
        out = batch.drop_columns([self.audio_col])
        out = out.append_column("waveform", arr)
        out = out.append_column("sample_rate", pa.array(rates))
        out = out.append_column(
            "n_samples", pa.array(np.full(n, self.n_samples, dtype=np.int32))
        )
        return out


class FrameSampleStage:
    """binary "video" column → ``n_frames`` evenly-spaced frames per row.

    ``decoder="auto"``: REAL frame extraction for YUV4MPEG2 (Y4M)
    payloads — the public uncompressed raw-video interchange format,
    parsed in pure numpy (functions/media.py:decode_y4m). Sampled frames
    are re-emitted as P6 PPM payloads in the ``frame`` binary column, so
    the stage composes directly with ``ImageDecodeStage(decoder="auto")``
    (video → frames → pixels → features, all real). Compressed
    containers (MP4/WebM/…) still need external codecs: they raise
    :class:`DecoderNotAvailable` (``fallback="error"``) or degrade to
    the byte-window stub (``fallback="stub"``).

    ``decoder="stub"`` (default): fixed-stride byte windows standing in
    for frame extraction. Both modes share the explode contract — one
    input row → ``n_frames`` output rows with ``frame_idx`` = sample
    ordinal — and the same output schema."""

    def __init__(
        self,
        video_col: str = "payload",
        n_frames: int = 4,
        frame_bytes: int = 256,
        *,
        decoder: str = "stub",
        fallback: str = "error",
    ):
        if decoder not in ("stub", "auto"):
            raise ValueError(f"unknown decoder {decoder!r}")
        if fallback not in ("stub", "error"):
            raise ValueError(f"unknown fallback {fallback!r}")
        self.video_col = video_col
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes
        self.decoder = decoder
        self.fallback = fallback

    def _stub_frames(self, p: bytes) -> list[bytes]:
        stride = max(1, len(p) // self.n_frames)
        return [
            p[min(f * stride, max(0, len(p) - 1)):][: self.frame_bytes]
            for f in range(self.n_frames)
        ]

    def _frames(self, p: bytes) -> list[bytes]:
        if self.decoder == "auto":
            from ..functions.media import decode_y4m, encode_ppm

            try:
                frames, _meta = decode_y4m(p, rgb=True)
                if len(frames) == 0:
                    return [b""] * self.n_frames
                # evenly-spaced source frames (first and last included)
                pick = np.linspace(0, len(frames) - 1, self.n_frames).round().astype(int)
                return [encode_ppm(frames[i]) for i in pick]
            except UnsupportedMediaFormat as e:
                if self.fallback == "error":
                    raise DecoderNotAvailable(
                        f"payload needs an external codec ({e}); pass "
                        "fallback='stub' to degrade to byte windows"
                    ) from e
        return self._stub_frames(p)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.video_col).to_pylist()
        other_cols = [c for c in batch.column_names if c != self.video_col]
        out_idx, frames, frame_no = [], [], []
        for i, p in enumerate(payloads):
            for f, payload in enumerate(self._frames(p)):
                frames.append(payload)
                frame_no.append(f)
                out_idx.append(i)
        cols = {c: batch.column(c).take(pa.array(out_idx)) for c in other_cols}
        cols["frame_idx"] = pa.array(frame_no, pa.int32())
        cols["frame"] = pa.array(frames, pa.binary())
        return pa.table(cols)
