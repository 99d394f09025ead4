"""The WAV/PNG codec paths must be REAL decoders, not byte-pattern fakes:
corrupting the container structure (CRC, magic, filter byte) must fail
decode, and unfiltering must actually reconstruct pixel values.
"""

import io

import numpy as np
import pytest

from vectordb_from_scratch_spark.operators import multimodal as mm


def _one_png(spark, text: str) -> bytes:
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return bytes(mm.synth_png_assets(df).collect()[0]["png"])


def _one_wav(spark, text: str) -> bytes:
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return bytes(mm.synth_wav_assets(df).collect()[0]["wav"])


TEXT = "the quick brown fox jumps over the lazy dog " * 3


def test_png_roundtrip_reconstructs_exact_pixels(spark):
    png = _one_png(spark, TEXT)
    # decode via the registered kernel through Spark
    df = spark.createDataFrame([(0, bytearray(png))], "asset_id long, png binary")
    row = mm.decode_png_features(df).collect()[0]
    pix = TEXT.encode()
    h = (len(pix) + mm.PNG_WIDTH - 1) // mm.PNG_WIDTH
    padded = pix.ljust(h * mm.PNG_WIDTH, b"\x00")
    arr = np.frombuffer(padded, dtype=np.uint8)
    assert row["width"] == mm.PNG_WIDTH and row["height"] == h
    assert row["max_pixel"] == int(arr.max())
    assert row["pixel_sum"] == int(arr.sum())  # unfiltering reconstructed rows
    assert row["n_pixels"] == h * mm.PNG_WIDTH


def test_png_zero_height_decodes_to_null_stats(spark):
    """A zero-height PNG (empty source text) must decode to a stats row
    with NULL max/sum and 0 pixels — matching the oracle's aggregates
    over an empty pixel list — not crash in np.stack."""
    png = _one_png(spark, "")
    df = spark.createDataFrame([(0, bytearray(png))], "asset_id long, png binary")
    row = mm.decode_png_features(df).collect()[0]
    assert row["width"] == mm.PNG_WIDTH and row["height"] == 0
    assert row["max_pixel"] is None and row["pixel_sum"] is None
    assert row["n_pixels"] == 0


def test_png_decoder_rejects_corrupt_crc(spark):
    png = bytearray(_one_png(spark, TEXT))
    # flip one byte inside the IDAT body (after sig+IHDR chunk)
    idat_at = png.find(b"IDAT")
    png[idat_at + 10] ^= 0xFF
    df = spark.createDataFrame([(0, png)], "asset_id long, png binary")
    with pytest.raises(Exception, match="CRC|PythonException"):
        mm.decode_png_features(df).collect()


def test_png_decoder_rejects_bad_signature(spark):
    png = bytearray(_one_png(spark, TEXT))
    png[0] = 0x00
    df = spark.createDataFrame([(0, png)], "asset_id long, png binary")
    with pytest.raises(Exception, match="signature|PythonException"):
        mm.decode_png_features(df).collect()


def _one_bmp(spark, text: str) -> bytes:
    df = spark.createDataFrame([(2, text)], "doc_id long, text string")
    return bytes(mm.synth_bmp_assets(df).collect()[0]["bmp"])


def test_bmp_roundtrip_reconstructs_pixels_and_row_order(spark):
    """Decode must honor bottom-up storage (top_row_sum = sum of the
    FIRST text row, not the last) and strip the 4-byte stride padding
    (pixel_sum excludes pad columns)."""
    bmp = _one_bmp(spark, TEXT)
    df = spark.createDataFrame([(2, bytearray(bmp))], "asset_id long, bmp binary")
    row = mm.decode_bmp_features(df).collect()[0]
    pix = TEXT.encode()
    h = (len(pix) + mm.BMP_WIDTH - 1) // mm.BMP_WIDTH
    padded = pix.ljust(h * mm.BMP_WIDTH, b"\x00")
    arr = np.frombuffer(padded, dtype=np.uint8)
    assert row["width"] == mm.BMP_WIDTH and row["height"] == h
    assert row["max_pixel"] == int(arr.max())
    assert row["pixel_sum"] == int(arr.sum())
    assert row["top_row_sum"] == int(arr[: mm.BMP_WIDTH].sum())
    # order-sensitivity: a file-order (non-flipped) read would return the
    # LAST text row here; prove the two differ on this fixture
    assert int(arr[: mm.BMP_WIDTH].sum()) != int(arr[(h - 1) * mm.BMP_WIDTH :].sum())


def test_bmp_decoder_rejects_bad_magic(spark):
    bmp = bytearray(_one_bmp(spark, TEXT))
    bmp[0] = 0x00
    df = spark.createDataFrame([(2, bmp)], "asset_id long, bmp binary")
    with pytest.raises(Exception, match="signature|PythonException"):
        mm.decode_bmp_features(df).collect()


def test_bmp_zero_height_decodes_to_null_stats(spark):
    bmp = _one_bmp(spark, "")
    df = spark.createDataFrame([(2, bytearray(bmp))], "asset_id long, bmp binary")
    row = mm.decode_bmp_features(df).collect()[0]
    assert row["height"] == 0
    assert row["max_pixel"] is None and row["pixel_sum"] is None
    assert row["top_row_sum"] is None


def test_wav_roundtrip_matches_direct_pcm_stats(spark):
    wav = _one_wav(spark, TEXT)
    # the payload is a genuine WAV: stdlib wave parses it standalone
    import wave as wave_mod

    with wave_mod.open(io.BytesIO(wav), "rb") as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (1, 2, mm.WAV_RATE)
        assert w.getnframes() == len(TEXT)
    df = spark.createDataFrame([(1, bytearray(wav))], "asset_id long, wav binary")
    row = mm.decode_wav_features(df).collect()[0]
    samples = np.array([(b - 128) * 256 for b in TEXT.encode()], dtype="float64")
    assert row["n_frames"] == len(TEXT)
    assert row["peak"] == int(np.abs(samples).max())
    assert row["rms"] == pytest.approx(float(np.sqrt(np.mean(samples**2))), abs=1e-6)


def test_wav_decoder_rejects_truncated_header(spark):
    wav = bytearray(_one_wav(spark, TEXT))[:20]  # cut mid-header
    df = spark.createDataFrame([(1, wav)], "asset_id long, wav binary")
    with pytest.raises(Exception):
        mm.decode_wav_features(df).collect()
