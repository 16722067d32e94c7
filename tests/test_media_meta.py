"""Real header-parse media metadata (stages/media_meta.py): exact
dimensions/rates/durations from stdlib-built container files."""

import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.stages.media_meta import (
    _bmp_bytes,
    _gif_bytes,
    _jpeg_bytes,
    _png_bytes,
    _wav_bytes,
    extract_media_meta,
    parse_media_header,
    synth_real_media,
)


def test_parse_exact_headers():
    assert parse_media_header(_png_bytes(33, 21)) == {
        "format": "png", "width": 33, "height": 21, "n_channels": None,
        "sample_rate_hz": None, "bit_depth": 8, "duration_ms": None,
        "n_bytes": len(_png_bytes(33, 21))}
    g = parse_media_header(_gif_bytes(640, 480))
    assert (g["format"], g["width"], g["height"]) == ("gif", 640, 480)
    b = parse_media_header(_bmp_bytes(17, 9))
    assert (b["format"], b["width"], b["height"]) == ("bmp", 17, 9)
    j = parse_media_header(_jpeg_bytes(320, 200))
    assert (j["format"], j["width"], j["height"], j["n_channels"]) == (
        "jpeg", 320, 200, 3)
    w = parse_media_header(_wav_bytes(8000, 2, 16, 250))
    assert (w["format"], w["n_channels"], w["sample_rate_hz"],
            w["bit_depth"], w["duration_ms"]) == ("wav", 2, 8000, 16, 250)


def test_parse_garbage_and_truncated():
    assert parse_media_header(b"")["format"] == "unknown"
    assert parse_media_header(b"\x89PNG\r\n\x1a\nIH")["format"] == "unknown"
    assert parse_media_header(b"RIFFxxxxWAVE")["format"] == "unknown"
    # PIL-decodable validation of our PNG builder (skip if PIL absent)
    try:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(_png_bytes(12, 5)))
        assert img.size == (12, 5)
    except ImportError:
        pass


def test_stage_over_synth_corpus(ray_session):
    media = rd.from_arrow(synth_real_media(110))
    out = extract_media_meta(media).to_pandas().set_index("media_id")
    assert len(out) == 110
    counts = out.format.value_counts().to_dict()
    assert counts["unknown"] == 10  # every 11th row is junk
    assert set(counts) == {"png", "gif", "bmp", "jpeg", "wav", "unknown"}
    # spot-exact: row 0 is a PNG with w=10+0, h=7+0
    assert (out.loc["m-00000", ["format", "width", "height"]].tolist()
            == ["png", 10, 7])
    # wav rows (i%5==4, not junk): duration matches the generator
    i = 4
    assert out.loc[f"m-{i:05d}", "duration_ms"] == 100 + 10 * (i % 7)
