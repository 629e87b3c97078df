"""Pure-numpy media codec round-trips (functions/media.py) — the real
decode kernels behind the multimodal stages' auto mode."""

import numpy as np
import pytest

from limetrans_ray.functions.media import (
    UnsupportedMediaFormat,
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    resample_linear,
    resize_nearest,
)


@pytest.fixture()
def img():
    rng = np.random.default_rng(9)
    return rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)  # odd dims


class TestImages:
    def test_ppm_roundtrip(self, img):
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)

    def test_ppm_with_comment(self, img):
        raw = encode_ppm(img)
        commented = b"P6\n# a comment line\n" + raw[3:]
        assert np.array_equal(decode_ppm(commented), img)

    def test_bmp_roundtrip(self, img):
        # odd width exercises the 4-byte row padding
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_auto_dispatch(self, img):
        assert np.array_equal(decode_image(encode_ppm(img)), img)
        assert np.array_equal(decode_image(encode_bmp(img)), img)
        with pytest.raises(UnsupportedMediaFormat):
            decode_image(b"\xff\xd8\xff jpeg-ish")

    def test_resize_nearest(self, img):
        up = resize_nearest(img, 26, 34)
        assert up.shape == (26, 34, 3)
        assert np.array_equal(up[::2, ::2], img)
        same = resize_nearest(img, 13, 17)
        assert np.array_equal(same, img)


class TestAudio:
    def test_wav_roundtrip_16bit(self):
        t = np.arange(4000) / 4000.0
        x = np.sin(2 * np.pi * 220 * t) * 0.25
        wav, sr = decode_wav(encode_wav(x, 22050))
        assert sr == 22050
        assert len(wav) == 4000
        assert np.abs(wav - x).max() < 1e-3  # 16-bit quantization

    def test_wav_stereo_averages_to_mono(self):
        import struct

        left = np.full(100, 0.5)
        right = np.full(100, -0.5)
        inter = np.empty(200)
        inter[0::2], inter[1::2] = left, right
        pcm = (inter * 32767).astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        payload = (
            b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
        )
        wav, sr = decode_wav(payload)
        assert sr == 8000 and len(wav) == 100
        assert np.abs(wav).max() < 1e-3  # L/R cancel

    def test_non_riff_rejected(self):
        with pytest.raises(UnsupportedMediaFormat):
            decode_wav(b"ID3 mp3-ish payload")

    def test_resample_linear(self):
        x = np.linspace(0, 1, 100)
        y = resample_linear(x, 50)
        assert len(y) == 50
        assert abs(y[0]) < 1e-6 and abs(y[-1] - 1.0) < 1e-6
