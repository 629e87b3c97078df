"""Multimodal stub plumbing (schema, actor signature, explode layout)
and the text-analysis stage wrappers over Ray Data."""

import numpy as np
import pyarrow as pa
import pytest

from limetrans_ray.stages.multimodal import (
    DecoderNotAvailable,
    FrameSampleStage,
    ImageDecodeStage,
    ImageFeatureStage,
)
from limetrans_ray.stages.textstats import (
    FingerprintStage,
    LangIdStage,
    QualityStage,
    TokenCountStage,
)


@pytest.fixture()
def media_ds(ray_session):
    import ray.data as rd

    payloads = [bytes([i]) * (1000 + i) for i in range(8)]
    return rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(8), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )


def test_image_decode_stage(ray_session, media_ds):
    out = media_ds.map_batches(
        ImageDecodeStage("payload", target=(16, 16)),
        batch_format="pyarrow",
        batch_size=4,
        concurrency=2,
    )
    tbl = out.to_pandas().sort_values("media_id")
    assert len(tbl) == 8
    assert (tbl["height"] == 16).all() and (tbl["channels"] == 3).all()
    assert all(len(p) == 16 * 16 * 3 for p in tbl["pixels"])
    # deterministic: same payload → same fake pixels across runs
    tbl2 = media_ds.map_batches(
        ImageDecodeStage("payload", target=(16, 16)), batch_format="pyarrow"
    ).to_pandas().sort_values("media_id")
    assert np.array_equal(np.stack(tbl["pixels"].values), np.stack(tbl2["pixels"].values))


def test_auto_decoder_rejects_unknown_containers():
    # compressed/unknown formats still need external codecs: per-payload
    # DecoderNotAvailable in auto mode with fallback="error"
    stage = ImageDecodeStage(real_decoder=True)
    with pytest.raises(DecoderNotAvailable):
        stage(
            pa.table(
                {"media_id": pa.array([0], pa.int64()),
                 "payload": pa.array([b"\x89PNG not-actually-decodable"], pa.binary())}
            )
        )


def test_auto_image_decode_ppm_bmp(ray_session):
    """REAL decode path: PPM/BMP payloads round-trip through the stage
    with exact pixel values (nearest-neighbor identity at same size)."""
    import ray.data as rd

    from limetrans_ray.functions.media import encode_bmp, encode_ppm

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8) for _ in range(4)]
    payloads = [encode_ppm(imgs[0]), encode_bmp(imgs[1]), encode_ppm(imgs[2]), encode_bmp(imgs[3])]
    ds = rd.from_arrow(
        pa.table(
            {"media_id": pa.array(range(4), pa.int64()),
             "payload": pa.array(payloads, pa.binary())}
        )
    )
    out = (
        ds.map_batches(
            ImageDecodeStage("payload", target=(16, 16), decoder="auto"),
            batch_format="pyarrow", batch_size=2,
        )
        .to_pandas()
        .sort_values("media_id")
    )
    for i in range(4):
        got = np.asarray(out["pixels"].iloc[i]).reshape(16, 16, 3)
        assert np.array_equal(got, imgs[i]), i
    # resize path: 16x16 source → 8x8 target picks every other pixel
    out8 = (
        ds.map_batches(
            ImageDecodeStage("payload", target=(8, 8), decoder="auto"),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("media_id")
    )
    got = np.asarray(out8["pixels"].iloc[0]).reshape(8, 8, 3)
    assert np.array_equal(got, imgs[0][::2, ::2])


def test_auto_audio_decode_wav(ray_session):
    """REAL WAV decode: a 440 Hz sine round-trips with the source
    sample rate reported and the waveform shape normalized."""
    import ray.data as rd

    from limetrans_ray.stages.multimodal import AudioDecodeStage
    from limetrans_ray.functions.media import encode_wav

    t = np.arange(8000) / 8000.0
    sine = np.sin(2 * np.pi * 440 * t) * 0.5
    ds = rd.from_arrow(
        pa.table(
            {"media_id": pa.array([0], pa.int64()),
             "payload": pa.array([encode_wav(sine, 8000)], pa.binary())}
        )
    )
    out = ds.map_batches(
        AudioDecodeStage("payload", n_samples=2048, decoder="auto"),
        batch_format="pyarrow",
    ).to_pandas()
    assert out["sample_rate"].iloc[0] == 8000
    wav = np.asarray(out["waveform"].iloc[0], dtype=np.float64) / 32767.0
    assert len(wav) == 2048
    # energy preserved within resampling tolerance
    assert abs(np.sqrt((wav ** 2).mean()) - np.sqrt((sine ** 2).mean())) < 0.02


def test_feature_stage_chains(ray_session, media_ds):
    out = media_ds.map_batches(
        ImageDecodeStage("payload", target=(8, 8)), batch_format="pyarrow", batch_size=4
    ).map_batches(ImageFeatureStage(), batch_format="pyarrow", batch_size=4)
    tbl = out.to_pandas()
    assert all(len(f) == 6 for f in tbl["features"])


def test_frame_sample_explodes(ray_session, media_ds):
    out = media_ds.map_batches(
        FrameSampleStage("payload", n_frames=4), batch_format="pyarrow", batch_size=3
    ).to_pandas()
    assert len(out) == 8 * 4
    assert set(out["frame_idx"]) == {0, 1, 2, 3}
    assert out.groupby("media_id").size().eq(4).all()


def test_frame_sample_real_y4m_chains_into_image_decode(ray_session):
    """Real video path: Y4M payloads → evenly-spaced frames as PPM →
    ImageDecodeStage(auto) — the full video→pixels pipeline with no stub
    anywhere."""
    import ray.data as rd

    from limetrans_ray.functions.media import decode_ppm, encode_y4m, yuv_to_rgb

    rng = np.random.default_rng(5)
    clips = [
        rng.integers(16, 236, size=(9, 6, 8, 3), dtype=np.uint8) for _ in range(3)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(3), pa.int64()),
                "payload": pa.array(
                    [encode_y4m(c, colorspace="C444") for c in clips], pa.binary()
                ),
            }
        )
    )
    frames = ds.map_batches(
        FrameSampleStage("payload", n_frames=4, decoder="auto"),
        batch_format="pyarrow",
        batch_size=2,
    )
    tbl = frames.to_pandas().sort_values(["media_id", "frame_idx"])
    assert len(tbl) == 3 * 4
    # sample ordinal 0..3 maps to source frames 0, 3, 5, 8 of 9
    row0 = tbl[(tbl.media_id == 0) & (tbl.frame_idx == 0)].iloc[0]
    row3 = tbl[(tbl.media_id == 0) & (tbl.frame_idx == 3)].iloc[0]
    assert np.array_equal(decode_ppm(row0["frame"]), yuv_to_rgb(clips[0][0]))
    assert np.array_equal(decode_ppm(row3["frame"]), yuv_to_rgb(clips[0][8]))
    # frames chain into the real image decode path
    pixels = frames.map_batches(
        ImageDecodeStage("frame", target=(6, 8), decoder="auto"),
        batch_format="pyarrow",
        batch_size=4,
    ).to_pandas()
    assert len(pixels) == 12 and all(len(p) == 6 * 8 * 3 for p in pixels["pixels"])


def test_frame_sample_auto_rejects_compressed_containers(ray_session):
    stage = FrameSampleStage("payload", n_frames=2, decoder="auto")
    batch = pa.table(
        {"payload": pa.array([b"\x1aE\xdf\xa3 webm-ish bytes"], pa.binary())}
    )
    with pytest.raises(DecoderNotAvailable):
        stage(batch)
    lenient = FrameSampleStage(
        "payload", n_frames=2, decoder="auto", fallback="stub"
    )
    out = lenient(batch)
    assert out.num_rows == 2  # byte-window stub keeps the explode contract


def test_textstats_stages(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": [
                    "the cat sat on the mat and it was happy today",
                    "der hund ist auf der straße und er ist froh heute",
                    "le chat est dans la maison avec le chien aussi",
                ],
            }
        )
    )
    lang = ds.map_batches(LangIdStage(), batch_format="pyarrow").to_pandas()
    assert lang.sort_values("doc_id")["lang_pred"].tolist() == ["en", "de", "fr"]

    q = ds.map_batches(QualityStage(), batch_format="pyarrow").to_pandas()
    assert {"q_n_chars", "q_quality", "q_stop_ratio"} <= set(q.columns)
    assert (q["q_quality"] > 0).all()

    t = ds.map_batches(TokenCountStage(), batch_format="pyarrow").to_pandas()
    assert (t["n_tokens_bpeish"] >= 9).all()

    f = ds.map_batches(FingerprintStage(), batch_format="pyarrow").to_pandas()
    assert f["fingerprint"].str.len().eq(16).all()
    assert f["fingerprint"].nunique() == 3
