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
    decode_y4m,
    encode_bmp,
    encode_ppm,
    encode_wav,
    encode_y4m,
    resample_linear,
    resize_nearest,
    yuv_to_rgb,
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


class TestVideo:
    @pytest.fixture()
    def yuv_frames(self):
        rng = np.random.default_rng(11)
        return rng.integers(16, 236, size=(5, 12, 16, 3), dtype=np.uint8)

    def test_y4m_c444_roundtrip_bit_exact(self, yuv_frames):
        payload = encode_y4m(yuv_frames, fps=(30, 1), colorspace="C444")
        out, meta = decode_y4m(payload, rgb=False)
        assert np.array_equal(out, yuv_frames)
        assert meta == {
            "width": 16, "height": 12, "fps_num": 30, "fps_den": 1,
            "colorspace": "C444", "n_frames": 5,
        }

    def test_y4m_c420_roundtrip_on_2x2_constant_chroma(self, yuv_frames):
        # chroma constant per 2x2 block → top-left subsample + nearest
        # upsample is the identity
        f = yuv_frames.copy()
        f[:, :, :, 1:] = np.repeat(np.repeat(f[:, ::2, ::2, 1:], 2, axis=1), 2, axis=2)
        out, meta = decode_y4m(encode_y4m(f, colorspace="C420"), rgb=False)
        assert np.array_equal(out, f)
        assert meta["colorspace"] == "C420"

    def test_y4m_c422_roundtrip_on_paired_columns(self, yuv_frames):
        f = yuv_frames.copy()
        f[:, :, :, 1:] = np.repeat(f[:, :, ::2, 1:], 2, axis=2)
        out, _ = decode_y4m(encode_y4m(f, colorspace="C422"), rgb=False)
        assert np.array_equal(out, f)

    def test_y4m_mono_fills_neutral_chroma(self, yuv_frames):
        out, meta = decode_y4m(encode_y4m(yuv_frames, colorspace="Cmono"), rgb=False)
        assert np.array_equal(out[..., 0], yuv_frames[..., 0])
        assert (out[..., 1:] == 128).all()
        assert meta["colorspace"] == "Cmono"

    def test_yuv_to_rgb_reference_points(self):
        # BT.601 limited range: Y=16 → black, Y=235 → white (neutral chroma)
        black = yuv_to_rgb(np.array([[[16, 128, 128]]], dtype=np.uint8))
        white = yuv_to_rgb(np.array([[[235, 128, 128]]], dtype=np.uint8))
        assert (black == 0).all()
        assert (white == 255).all()
        # pure red-ish: Cr high raises R, lowers G
        red = yuv_to_rgb(np.array([[[81, 90, 240]]], dtype=np.uint8))[0, 0]
        assert red[0] > 200 and red[1] < 60 and red[2] < 60

    def test_y4m_rejects_junk_and_truncation(self, yuv_frames):
        with pytest.raises(UnsupportedMediaFormat):
            decode_y4m(b"\x00\x00\x00\x18ftypmp42 mp4-ish")
        good = encode_y4m(yuv_frames)
        with pytest.raises(UnsupportedMediaFormat):
            decode_y4m(good[: len(good) - 7])

    def test_y4m_default_colorspace_is_420(self, yuv_frames):
        payload = encode_y4m(yuv_frames, colorspace="C420")
        # strip the C tag: the decoder must assume 4:2:0 per the spec
        head_end = payload.index(b"\n")
        stripped = payload[:head_end].replace(b" C420", b"") + payload[head_end:]
        out, meta = decode_y4m(stripped, rgb=False)
        assert meta["colorspace"] == "C420jpeg"
        assert out.shape == yuv_frames.shape


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
