"""Multimodal decode stage: codecs, PSNR invariant, stub gating, and
the actor-pool pipeline over the synthetic payload."""

import numpy as np
import pytest

from osm_replication_rust_ray.stages.decode import (
    LOSSLESS_PSNR_DB,
    decode_image,
    decode_raw,
    decode_rle,
    encode_rle,
    psnr_db,
)


def test_raw_roundtrip_and_psnr():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 24, 3), np.uint8)
    out = decode_raw(img.tobytes(), 24, 16)
    assert (out == img).all()
    assert psnr_db(img, out) == LOSSLESS_PSNR_DB


def test_rle_roundtrip_including_long_runs():
    img = np.zeros((8, 8, 3), np.uint8)
    img[4:, :, 1] = 200  # long constant runs > 255 bytes
    buf = encode_rle(img)
    out = decode_rle(buf, 8, 8)
    assert (out == img).all()


def test_unknown_format_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"", 4, 4, "jpeg")


def test_psnr_of_noise_is_low():
    rng = np.random.RandomState(0)
    a = rng.randint(0, 256, (32, 32, 3), np.uint8)
    b = rng.randint(0, 256, (32, 32, 3), np.uint8)
    assert psnr_db(a, b) < 10.0


def test_decode_stats_pipeline(ray_session):
    from osm_replication_rust_ray.pipelines.queries import q_decode_psnr

    df = q_decode_psnr("/root/testdata/sf0.001", n_rows=200).to_pandas()
    assert len(df) == 200
    # lossless raw payloads: exact pixels + captions everywhere
    assert (df["psnr"] == LOSSLESS_PSNR_DB).all()
    assert df["caption_ok"].all()
    assert (df["n_pixels"] > 0).all()
