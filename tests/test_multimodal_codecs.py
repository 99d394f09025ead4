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


def test_jpeg_roundtrip_reconstructs_exact_block_pixels():
    """The baseline-JFIF codec must round-trip EXACTLY on block-constant
    images (DC quantized losslessly at step 8): every 8x8 block decodes
    to its source byte, through real Huffman entropy coding + IDCT."""
    pix = TEXT.encode()
    img = mm._decode_jpeg_gray(mm.encode_jpeg_gray_blocks(pix))
    hb = (len(pix) + mm.JPEG_BLOCKS_W - 1) // mm.JPEG_BLOCKS_W
    assert img.shape == (hb * 8, mm.JPEG_WIDTH)
    blocks = list(pix.ljust(hb * mm.JPEG_BLOCKS_W, b"\x00"))
    for b, v in enumerate(blocks):
        rb, cb = divmod(b, mm.JPEG_BLOCKS_W)
        assert (img[rb * 8 : rb * 8 + 8, cb * 8 : cb * 8 + 8] == v).all()
    assert int(img.sum()) == 64 * sum(pix)


def test_jpeg_decoder_rejects_corrupt_payloads():
    """Real decoder, not a byte-pattern fake: bad SOI, truncation, a
    non-baseline frame marker, and a garbled entropy stream all raise."""
    good = mm.encode_jpeg_gray_blocks(TEXT.encode())
    with pytest.raises(ValueError):
        mm._decode_jpeg_gray(b"\x00\x01" + good[2:])  # bad SOI
    with pytest.raises(ValueError):
        mm._decode_jpeg_gray(good[: len(good) // 3])  # truncated pre-scan
    # SOF0 -> SOF2 (progressive): must be rejected, not mis-decoded
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        mm._decode_jpeg_gray(prog)
    # flip a byte in the entropy-coded data: Huffman stream garbles into
    # an invalid code / marker / overrun — never a silent wrong image
    bad = bytearray(good)
    bad[-20] ^= 0xFF
    with pytest.raises(ValueError):
        mm._decode_jpeg_gray(bytes(bad))


def test_jpeg_color_roundtrip_reconstructs_all_channels():
    """The 3-component 4:4:4 codec (r8) round-trips EXACTLY per channel:
    interleaved MCUs with per-component DC predictors decode each plane
    back to its derived constant (Y=v, Cb=255-v, Cr=(v+85)%256)."""
    pix = TEXT.encode()
    y, cb, cr = mm._decode_jpeg(mm.encode_jpeg_color_blocks(pix))
    hb = (len(pix) + mm.JPEG_BLOCKS_W - 1) // mm.JPEG_BLOCKS_W
    assert y.shape == cb.shape == cr.shape == (hb * 8, mm.JPEG_WIDTH)
    blocks = list(pix.ljust(hb * mm.JPEG_BLOCKS_W, b"\x00"))
    for b, v in enumerate(blocks):
        rb, cbk = divmod(b, mm.JPEG_BLOCKS_W)
        sl = (slice(rb * 8, rb * 8 + 8), slice(cbk * 8, cbk * 8 + 8))
        vy, vcb, vcr = mm._jpeg_color_channels(v)
        assert (y[sl] == vy).all() and (cb[sl] == vcb).all() and (cr[sl] == vcr).all()


def test_jpeg_color_decoder_rejects_corrupt_payloads():
    """Corrupt-rejection extends to the color path: truncated interleaved
    scan, garbled entropy byte, subsampled-chroma SOF, and the gray
    reader refusing a color payload all raise."""
    good = mm.encode_jpeg_color_blocks(TEXT.encode())
    with pytest.raises(ValueError):
        mm._decode_jpeg(good[: len(good) - 10])  # truncated scan
    bad = bytearray(good)
    bad[-20] ^= 0xFF
    with pytest.raises(ValueError):
        mm._decode_jpeg(bytes(bad))
    # 4:2:0 (2×2 luma) is now a SUPPORTED layout (r9) — but factor
    # combinations outside {4:4:4, 4:2:0} must still be refused, not
    # mis-tiled (2×1 luma = 4:2:2, and 2×2 chroma over 1×1 luma)
    sub = good.replace(bytes([1, 0x11, 0, 2, 0x11, 0]), bytes([1, 0x21, 0, 2, 0x11, 0]), 1)
    with pytest.raises(ValueError):
        mm._decode_jpeg(sub)
    sub2 = good.replace(bytes([1, 0x11, 0, 2, 0x11, 0]), bytes([1, 0x11, 0, 2, 0x22, 0]), 1)
    with pytest.raises(ValueError):
        mm._decode_jpeg(sub2)
    with pytest.raises(ValueError):
        mm._decode_jpeg_gray(good)  # gray contract rejects color


def test_jpeg_420_roundtrip_reconstructs_all_channels():
    """The 4:2:0 codec (r9, VERDICT r8 #5) round-trips EXACTLY per
    channel: each MCU's four Y blocks decode to the constant byte, the
    chroma planes decode at quarter resolution and replication-upsample
    to the same constants at full frame size, and a truncated scan
    still raises."""
    pix = TEXT.encode()
    y, cb, cr = mm._decode_jpeg(mm.encode_jpeg_420_blocks(pix))
    hb = (len(pix) + mm.JPEG_MCUS_W_420 - 1) // mm.JPEG_MCUS_W_420
    assert y.shape == cb.shape == cr.shape == (hb * 16, 16 * mm.JPEG_MCUS_W_420)
    mcus = list(pix.ljust(hb * mm.JPEG_MCUS_W_420, b"\x00"))
    for m, v in enumerate(mcus):
        rm, cm = divmod(m, mm.JPEG_MCUS_W_420)
        sl = (slice(rm * 16, rm * 16 + 16), slice(cm * 16, cm * 16 + 16))
        vy, vcb, vcr = mm._jpeg_color_channels(v)
        assert (y[sl] == vy).all() and (cb[sl] == vcb).all() and (cr[sl] == vcr).all()
    good = mm.encode_jpeg_420_blocks(pix)
    with pytest.raises(ValueError):
        mm._decode_jpeg(good[: len(good) - 12])


def test_jpeg_420_encoder_rejects_sof_height_overflow():
    """SOF0's 16-bit height field caps a 16px-MCU-row payload at
    4095 rows; one byte past the ceiling raises the codec family's
    explicit ValueError instead of a bare struct overflow (ADVICE r9),
    and the ceiling byte itself still encodes."""
    max_bytes = 0xFFFF // 16 * mm.JPEG_MCUS_W_420
    assert mm.encode_jpeg_420_blocks(b"x" * max_bytes)[:2] == b"\xff\xd8"
    with pytest.raises(ValueError, match="65535px SOF0 limit"):
        mm.encode_jpeg_420_blocks(b"x" * (max_bytes + 1))


def test_jpeg_decoder_handles_general_ac_symbols():
    """The decoder implements FULL baseline AC decoding (run/size,
    ZRL, EOB), not just the EOB path our encoder emits: a hand-built
    scan with a real AC coefficient and a ZRL run decodes per spec."""
    import struct

    import numpy as np

    # tables: DC cat 0..1 (bits len1: sym0, len2... keep standard), use
    # the module's DC table; AC table with symbols EOB(0x00), 0x01
    # (run 0, size 1) and 0xF0 (ZRL)
    ac_bits = (1, 2) + (0,) * 14
    ac_vals = (0x00, 0x01, 0xF0)

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # quant 1: identity
    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(mm._JPEG_DC_BITS) + bytes(mm._JPEG_DC_VALS))
    dht += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    w = mm._JpegBitWriter()
    dc_codes = mm._huff_encode_table(mm._JPEG_DC_BITS, mm._JPEG_DC_VALS)
    ac_codes = mm._huff_encode_table(ac_bits, ac_vals)
    w.put(*dc_codes[0])            # DC diff 0 -> dc = 0
    w.put(*ac_codes[0xF0])         # ZRL: skip 16 zero coefficients
    w.put(*ac_codes[0x01])         # run 0, size 1 at zigzag k=17
    w.put(1, 1)                    # amplitude bit -> coefficient +1
    w.put(*ac_codes[0x00])         # EOB
    data = b"\xff\xd8" + dqt + sof + dht + sos + w.flush() + b"\xff\xd9"
    img = mm._decode_jpeg_gray(data)
    # expected: S[zigzag 17] = 1 (natural (2,4) per the zigzag table),
    # everything else 0 -> IDCT basis product + 128 level shift
    S = np.zeros((8, 8))
    S[mm._ZIGZAG[17] // 8, mm._ZIGZAG[17] % 8] = 1.0
    want = np.clip(np.round(mm._idct_2d(S)) + 128, 0, 255).astype("int64")
    assert (img == want).all()
