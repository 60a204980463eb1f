"""Baseline JPEG codec (operators/jpeg.py) — round-trip, exactness, and
robustness pins.

The exactness contract (module docstring): with the DC quantizer at 8,
a block-constant image round-trips BIT-EXACTLY (DC = 8·(v−128) is
divisible by 8 for every integer v; AC terms are analytically zero), so
the exact tests drive the full pipeline — DCT, quantization, zigzag, DC
prediction, Huffman, byte stuffing, restart resets, dequantization,
IDCT — with a hash-sharp assertion, the JPEG analogue of the PNG
round-trip tests. Arbitrary content is pinned to small bounded error
under all-ones (near-lossless) quantization.
"""

from __future__ import annotations

import numpy as np
import pytest

from weather_bigquery_lakehouse_spark.operators import jpeg as J


def _tile_image(rng, h, w, tile):
    """Random block-constant image: one value per tile×tile cell."""
    th, tw = -(-h // tile), -(-w // tile)
    cells = rng.integers(0, 256, size=(th, tw))
    return (
        np.repeat(np.repeat(cells, tile, axis=0), tile, axis=1)[:h, :w]
    ).astype(np.uint8)


def test_zigzag_table_matches_spec_prefix():
    """The generated zigzag walk equals the public scan order (pinned on
    the first 10 and last 3 entries so a walk bug can't hide behind the
    encoder/decoder sharing the same table)."""
    rm = [r * 8 + c for r, c in J._zigzag_pairs()]
    assert rm[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert rm[-3:] == [55, 62, 63]
    assert sorted(rm) == list(range(64))


def test_grayscale_block_constant_roundtrip_exact():
    rng = np.random.default_rng(11)
    for h, w in ((8, 8), (24, 32), (17, 41), (1, 1), (7, 9)):
        img = _tile_image(rng, h, w, 8)
        dec = J.decode_jpeg_pixels(J.encode_jpeg(img, quant_luma=8))
        assert dec is not None and dec.shape == (h, w, 3)
        assert (dec == img[:, :, None]).all(), (h, w)


def test_grayscale_near_lossless_bounded():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(23, 37)).astype(np.uint8)
    dec = J.decode_jpeg_pixels(J.encode_jpeg(img, quant_luma=1))
    assert dec.shape == (23, 37, 3)
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 2


def test_rgb_444_near_lossless_bounded():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(16, 24, 3)).astype(np.uint8)
    dec = J.decode_jpeg_pixels(J.encode_jpeg(img, quant_luma=1))
    # all-ones quant: the only loss is YCbCr round-tripping (≤ ~2) plus
    # coefficient rounding (≤ ~2)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 5


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
def test_gray_valued_rgb_constant_tiles_exact_all_subsamplings(sub):
    """R=G=B images have Cb=Cr=128 exactly, so chroma subsampling is
    information-free and the round-trip stays bit-exact for 16-aligned
    constant tiles under every sampling mode — this is what drives the
    decoder's general (h, v) MCU block walk and replication upsample."""
    rng = np.random.default_rng(19)
    g = _tile_image(rng, 35, 50, 16)
    img = np.stack([g, g, g], axis=-1)
    dec = J.decode_jpeg_pixels(J.encode_jpeg(img, quant_luma=8, subsampling=sub))
    assert dec is not None and dec.shape == img.shape
    assert (dec == img).all(), sub


def test_restart_markers_roundtrip_exact_and_bounded():
    rng = np.random.default_rng(23)
    img = _tile_image(rng, 24, 40, 8)
    for interval in (1, 2, 7):
        payload = J.encode_jpeg(img, quant_luma=8, restart_interval=interval)
        assert b"\xff\xdd" in payload  # DRI present
        assert any(bytes([0xFF, 0xD0 + m]) in payload for m in range(8))
        dec = J.decode_jpeg_pixels(payload)
        assert (dec == img[:, :, None]).all(), interval
    # and for arbitrary content the predictors must reset identically
    img2 = rng.integers(0, 256, size=(24, 40)).astype(np.uint8)
    dec2 = J.decode_jpeg_pixels(J.encode_jpeg(img2, quant_luma=1, restart_interval=3))
    assert np.abs(dec2[:, :, 0].astype(int) - img2.astype(int)).max() <= 2


def test_zrl_long_zero_runs_roundtrip():
    """A block whose only nonzero quantized AC is the LAST zigzag
    coefficient forces three ZRL (16-zero-run) symbols before it — the
    run-length path a flat or natural image never takes. The block is
    built by inverse-DCT of a chosen coefficient pair, and the test
    first proves the encoder's own quantizer sees exactly {DC, zz[63]}
    nonzero, so the round-trip equality certifies ZRL on both sides."""
    F = np.zeros((8, 8))
    F[0, 0] = 8.0 * 16  # DC well inside range after the +128 shift
    F[7, 7] = 16 * 3  # dequantized target for quant=16
    block = J._DCT_T.T @ F @ J._DCT_T
    img = np.clip(np.round(block + 128.0), 0, 255).astype(np.uint8)
    # the encoder's view: quantized zigzag must be {0: dc, 63: ±3-ish}
    coef = J._DCT_T @ (img.astype(np.float64) - 128.0) @ J._DCT_T.T
    qz = np.round(coef / 16.0).astype(int)[J._ZZ_ROWS, J._ZZ_COLS]
    assert qz[63] != 0 and (qz[1:63] == 0).all(), qz
    payload = J.encode_jpeg(img, quant_luma=16)
    dec = J.decode_jpeg_pixels(payload)
    # same quantized coefficients on the far side ⇒ pixels match within
    # the IDCT rounding of the non-integer source block
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_16bit_quant_tables():
    """Quant entries > 255 switch DQT to 16-bit precision (Pq=1); the
    decoder reads them back and the constant-image DC error is bounded
    by Q/16 as the quantizer predicts."""
    img = np.full((16, 16), 200, dtype=np.uint8)
    payload = J.encode_jpeg(img, quant_luma=300)
    dec = J.decode_jpeg_pixels(payload)
    assert dec is not None
    assert np.abs(dec[:, :, 0].astype(int) - 200).max() <= 300 // 16 + 1


def test_nonuniform_quant_array_and_header_parity():
    rng = np.random.default_rng(29)
    q = np.full((8, 8), 24)
    q[0, 0] = 8  # exact DC, coarse AC
    img = _tile_image(rng, 40, 56, 8)
    payload = J.encode_jpeg(img, quant_luma=q)
    from weather_bigquery_lakehouse_spark.operators.multimodal import (
        decode_pixels,
        parse_image_header,
    )

    assert parse_image_header(payload) == ("jpeg", 56, 40)
    decoded = decode_pixels(payload)
    assert decoded is not None and decoded[1] == "jpeg"
    assert (decoded[0] == img[:, :, None]).all()


def test_validation_errors():
    img = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError):
        J.encode_jpeg(img, subsampling="4:1:1")
    with pytest.raises(ValueError):
        J.encode_jpeg(img, quant_luma=0)
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((0, 4), dtype=np.uint8))


def test_decoder_quarantines_unsupported_and_malformed():
    img = np.full((8, 8), 100, dtype=np.uint8)
    payload = bytearray(J.encode_jpeg(img, quant_luma=8))
    # progressive SOF2 in place of SOF0 → None, not a crash
    i = payload.find(b"\xff\xc0")
    prog = bytes(payload[:i]) + b"\xff\xc2" + bytes(payload[i + 2 :])
    assert J.decode_jpeg_pixels(prog) is None
    # truncations at every interesting boundary: None or a valid decode
    # (dropping only the EOI still decodes), never an exception
    for cut in (0, 1, 2, 3, 10, 30, len(payload) // 2, len(payload) - 1):
        out = J.decode_jpeg_pixels(bytes(payload[:cut]))
        assert out is None or isinstance(out, np.ndarray)
    # not-a-jpeg
    assert J.decode_jpeg_pixels(b"") is None
    assert J.decode_jpeg_pixels(b"\x89PNG\r\n\x1a\n") is None


def test_decoder_never_raises_under_fuzz():
    """Random FFD8-prefixed byte soup and random single-byte mutations of
    a valid payload must decode to None or an array — never raise (the
    quarantine contract the Arrow kernels rely on)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rng = np.random.default_rng(31)
    base = J.encode_jpeg(_tile_image(rng, 16, 16, 8), quant_luma=8)

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=80), st.data())
    def check(noise, data):
        out = J.decode_jpeg_pixels(b"\xff\xd8" + noise)
        assert out is None or isinstance(out, np.ndarray)
        pos = data.draw(st.integers(0, len(base) - 1))
        val = data.draw(st.integers(0, 255))
        mutated = base[:pos] + bytes([val]) + base[pos + 1 :]
        out2 = J.decode_jpeg_pixels(mutated)
        assert out2 is None or isinstance(out2, np.ndarray)

    check()


def test_reencode_stability():
    """decode(encode(x)) is a fixed point for DC-exact inputs: encoding
    the decoded image reproduces identical bytes (the encoder is a pure
    function and the pixels are unchanged)."""
    rng = np.random.default_rng(37)
    img = _tile_image(rng, 24, 24, 8)
    first = J.encode_jpeg(img, quant_luma=8)
    dec = J.decode_jpeg_pixels(first)
    second = J.encode_jpeg(dec[:, :, 0], quant_luma=8)
    assert first == second


def test_hand_crafted_spec_vectors_decode():
    """Decoder vs the SPEC, not vs our own encoder: a minimal JPEG whose
    DHT, DQT, and entropy bytes are written BY HAND from T.81's rules,
    with expected pixels computed analytically — a symmetric
    encoder/decoder bug cannot hide here.

    Vector 1 (two blocks, DC only): custom DC table ('0'→cat 0, '1'→cat
    2), AC table EOB-only; entropy byte 0xE8 = 1,11 (diff +3), 0 (EOB),
    1,00 (diff −3), 0 (EOB). Quant 16 ⇒ block 1 constant
    3·16/8+128 = 134, block 2 back to 128 (pins DC PREDICTION).

    Vector 2 (one block, one AC): AC table '0'→EOB, '10'→(run 1,
    size 1); entropy 0,10,1,0 ⇒ zigzag k=2 → (r,c)=(1,0), coefficient
    +16; expected pixels from the raw DCT-III cosine formula built
    inline (independent of the module's matrix)."""
    import struct

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    dht_dc = seg(0xC4, bytes([0x00]) + bytes([2] + [0] * 15) + bytes([0, 2]))

    # --- vector 1: 8x16, two blocks, DC prediction ---
    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    p1 = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
        + bytes([0xE8]) + b"\xff\xd9"
    )
    dec = J.decode_jpeg_pixels(p1)
    assert dec is not None and dec.shape == (8, 16, 3)
    assert (dec[:, :8] == 134).all()  # 3*16/8 + 128
    assert (dec[:, 8:] == 128).all()  # predictor 3, diff -3

    # --- vector 2: 8x8, one AC coefficient through a (run, size) code ---
    sof2 = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht_ac2 = seg(
        0xC4, bytes([0x10]) + bytes([1, 1] + [0] * 14) + bytes([0x00, 0x11])
    )
    # bits: 0 (DC cat 0) | 10 (run 1, size 1) | 1 (+1) | 0 (EOB), then
    # three 1-fill pad bits → 0b01010111
    p2 = (
        b"\xff\xd8" + dqt + sof2 + dht_dc + dht_ac2 + sos
        + bytes([0b01010111]) + b"\xff\xd9"
    )
    dec2 = J.decode_jpeg_pixels(p2)
    assert dec2 is not None and dec2.shape == (8, 8, 3)
    # zigzag index 2 → (row 1, col 0): F[1,0] = +16, all else 0
    x = np.arange(8)
    basis = 0.5 * np.cos((2 * x + 1) * 1 * np.pi / 16.0)  # u=1 DCT row
    expected = np.clip(
        np.round(16.0 * np.outer(basis, np.full(8, 0.5 / np.sqrt(2))) + 128.0),
        0, 255,
    ).astype(np.uint8)
    assert (dec2[:, :, 0] == expected).all()


# ---------------------------------------------------------------------------
# Decoder vs an INDEPENDENT external encoder/decoder (VERDICT r11 Next #4)
# ---------------------------------------------------------------------------

_DATA = __file__.rsplit("/", 1)[0] + "/data"


def _load_expected(path):
    toks = open(path).read().split()
    h, w, nb = int(toks[0]), int(toks[1]), int(toks[2])
    return np.array(toks[3:], dtype=np.int64).reshape(h, w, nb)


def test_decode_external_imageio_grayscale_jpeg():
    """Decode a baseline JPEG produced by a DIFFERENT encoder — Java
    `javax.imageio` (JDK 17, committed fixture `imageio_gray24.jpg`:
    JFIF APP0, Annex-K-style quant table, libjpeg-lineage Huffman
    tables, none of which our encoder emits) — against that library's
    own decode of the same bytes (`imageio_gray24_expected.txt`, raw
    raster samples). Grayscale ⇒ no chroma-upsampling variance between
    decoders; agreement is IDCT-rounding-tight (observed max |Δ| = 1).
    A symmetric encode/decode bug in our codec cannot hide here, and
    neither can a table-parsing bug that only our own DHT/DQT layout
    avoids."""
    payload = open(f"{_DATA}/imageio_gray24.jpg", "rb").read()
    ours = J.decode_jpeg_pixels(payload)
    expected = _load_expected(f"{_DATA}/imageio_gray24_expected.txt")
    assert ours is not None and ours.shape == (24, 24, 3)
    # grayscale replicates across channels
    assert (ours[:, :, 0] == ours[:, :, 1]).all()
    assert (ours[:, :, 0] == ours[:, :, 2]).all()
    diff = np.abs(ours[:, :, 0].astype(np.int64) - expected[:, :, 0])
    assert diff.max() <= 2, f"max |Δ| vs independent decoder = {diff.max()}"


def test_decode_external_cpython_color_jpeg():
    """Decode the CPython test-suite's `python.jpg` (PSF-licensed test
    fixture, 16×16 3-component baseline SOF0 with 2×2/1×1 sampling and
    four file-supplied DHT tables — a real-world external encoder's
    output) against Java ImageIO's decode of the same bytes. The two
    decoders use different chroma-upsampling methods (ours:
    nearest-replication; ImageIO: libjpeg-style fancy/triangular), so
    per-sample RGB can differ at sharp chroma edges — the pin is the
    upsampling-independent part: the derived luma plane is tight and
    the overall RGB error is small (observed: luma max 6.6, RGB mean
    4.97)."""
    payload = open(f"{_DATA}/cpython_python16.jpg", "rb").read()
    ours = J.decode_jpeg_pixels(payload)
    expected = _load_expected(f"{_DATA}/cpython_python16_expected.txt")
    assert ours is not None and ours.shape == (16, 16, 3)
    a, b = ours.astype(np.float64), expected.astype(np.float64)

    def luma(x):
        return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]

    assert np.abs(luma(a) - luma(b)).max() <= 8.0
    assert np.abs(a - b).mean() <= 8.0


def test_encode_rejects_oversized_dimensions():
    """h/w past the 16-bit SOF field raise the codec's documented
    ValueError, not struct.error (ADVICE r11)."""
    with pytest.raises(ValueError, match="65535"):
        J.encode_jpeg(np.zeros((65536, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="65535"):
        J.encode_jpeg(np.zeros((4, 70000), dtype=np.uint8))


def test_numpy_scalar_quantizer_accepted():
    """Any 0-dimensional quantizer builds the uniform table instead of
    tripping the 8x8-shape error. _qtab dispatches on np.ndim(q) == 0,
    which covers Python ints, numpy generics like np.int64 (these were
    already np.isscalar-true), AND 0-d ndarrays like np.array(8), which
    np.isscalar rejects (ADVICE r11/r12)."""
    img = np.full((8, 8), 130, dtype=np.uint8)
    base = J.encode_jpeg(img, quant_luma=8)
    assert J.encode_jpeg(img, quant_luma=np.int64(8)) == base
    assert J.encode_jpeg(img, quant_luma=np.array(8)) == base


def test_adobe_app14_rgb_transform_quarantined():
    """A 3-component frame carrying an Adobe APP14 transform=0 marker
    stores RGB planes directly; applying the YCbCr inverse would be
    silently wrong, so the decoder quarantines (ADVICE r11). A malformed
    transform=2 (YCCK — spec-valid only for 4 components) on a
    3-component stream quarantines too, as does any other unknown value
    (ADVICE r12). The same stream with transform=1 (explicit YCbCr)
    must still decode."""
    import struct as _s

    rgb = np.full((8, 8, 3), 90, dtype=np.uint8)
    payload = J.encode_jpeg(rgb, quant_luma=8)

    def app14(transform):
        body = b"Adobe" + _s.pack(">HHHB", 100, 0, 0, transform)
        return b"\xff\xee" + _s.pack(">H", 2 + len(body)) + body

    assert J.decode_jpeg_pixels(payload[:2] + app14(0) + payload[2:]) is None
    assert J.decode_jpeg_pixels(payload[:2] + app14(2) + payload[2:]) is None
    assert J.decode_jpeg_pixels(payload[:2] + app14(3) + payload[2:]) is None
    with_ycc = J.decode_jpeg_pixels(payload[:2] + app14(1) + payload[2:])
    assert with_ycc is not None and (with_ycc == J.decode_jpeg_pixels(payload)).all()


def _imageio_decode(spark, payload: bytes):
    """Decode JPEG bytes with the JVM's javax.imageio reader (reached
    via the Spark session's py4j gateway) — a fully independent decoder
    implementation — returning (h, w, bands) int64 raster samples, or
    None where ImageIO cannot parse the stream."""
    jvm = spark._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytearray(payload))
    img = jvm.javax.imageio.ImageIO.read(stream)
    if img is None:
        return None
    h, w = img.getHeight(), img.getWidth()
    raster = img.getRaster()
    nb = raster.getNumBands()
    out = np.zeros((h, w, nb), dtype=np.int64)
    for b in range(nb):
        vals = raster.getSamples(0, 0, w, h, b, None)
        out[:, :, b] = np.array(list(vals), dtype=np.int64).reshape(h, w)
    return out


def test_encoder_output_decodes_exactly_in_independent_decoder(spark):
    """The encoder docstring claims its engine-built canonical Huffman
    tables and stream layout are 'spec-valid for any conformant reader'
    — here a CONFORMANT READER WE DID NOT WRITE (javax.imageio, JDK 17)
    decodes our output, and on the DC-exact input class (block-constant
    tiles, quantizer 8) it must reproduce the source BIT-EXACTLY:
    grayscale, RGB 4:4:4, and RGB 4:2:0 with restart markers (gray-
    valued tiles ⇒ constant chroma ⇒ subsampling is lossless). An
    encoder bug that our own decoder forgives symmetrically (marker
    layout, DHT bits/vals ordering, byte stuffing, RST sequencing)
    breaks this test."""
    rng = np.random.default_rng(5)
    tiles = (
        np.repeat(np.repeat(rng.integers(0, 256, (3, 3)), 8, 0), 8, 1)
    ).astype(np.uint8)

    got = _imageio_decode(spark, J.encode_jpeg(tiles, quant_luma=8))
    assert got is not None and (got[:, :, 0] == tiles).all()

    rgb = np.stack([tiles] * 3, axis=-1)
    got = _imageio_decode(spark, J.encode_jpeg(rgb, quant_luma=8))
    assert got is not None and (got == rgb).all()

    got = _imageio_decode(
        spark,
        J.encode_jpeg(rgb, quant_luma=8, subsampling="4:2:0", restart_interval=2),
    )
    assert got is not None and (got == rgb).all()

    # 16-bit DQT (extended sequential): lossy by construction at quant
    # 300 but must parse and stay within the quantization error bound
    got = _imageio_decode(
        spark, J.encode_jpeg(tiles, quant_luma=np.full((8, 8), 300))
    )
    assert got is not None
    assert np.abs(got[:, :, 0] - tiles.astype(np.int64)).max() <= 300


def _imageio_jpeg_encode(spark, arr, quality: float) -> bytes:
    """Encode an array as JPEG with the JDK's ImageIO writer at an
    explicit compression quality — an external encoder whose quant
    tables (Annex-K scaled by quality), Huffman tables, and stream
    layout we do not control."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    h, w = arr.shape[:2]
    gray = arr.ndim == 2
    kind = (
        jvm.java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        if gray
        else jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    img = jvm.java.awt.image.BufferedImage(w, h, kind)
    if gray:
        raster = img.getRaster()
        for r in range(h):
            for c in range(w):
                raster.setSample(c, r, 0, int(arr[r, c]))
    else:
        packed = gw.new_array(jvm.int, h * w)
        for i in range(h * w):
            r, c = divmod(i, w)
            packed[i] = (
                (int(arr[r, c, 0]) << 16)
                | (int(arr[r, c, 1]) << 8)
                | int(arr[r, c, 2])
            )
        img.setRGB(0, 0, w, h, packed, 0, w)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    param = writer.getDefaultWriteParam()
    param.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(float(quality))
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    writer.dispose()
    ios.close()
    return bytes(baos.toByteArray())


def test_decode_imageio_jpegs_across_quality_settings(spark):
    """Decoder vs the JDK encoder across its quality range, compared
    against the JDK's OWN decode of the same bytes (both ends
    independent of this codec). Quality scales the Annex-K quant tables
    — tables this codec never emits — so coarse (q=0.3) and fine
    (q=0.95) quantization of the dequant path are both exercised.
    Grayscale has no upsampling variance: agreement within ±1. The
    color case uses a LOW-CHROMA image (near-constant Cb/Cr, no channel
    clipping) so ImageIO's fancy chroma upsampling and our
    nearest-replication agree on the 4:2:0 stream it writes: ±2."""
    rng = np.random.default_rng(11)
    gray = (
        np.repeat(np.repeat(rng.integers(0, 256, (4, 4)), 6, 0), 6, 1)
    ).astype(np.uint8)
    for q in (0.3, 0.95):
        payload = _imageio_jpeg_encode(spark, gray, q)
        ours = J.decode_jpeg_pixels(payload)
        ref = _imageio_decode(spark, payload)
        assert ours is not None and ref is not None
        diff = np.abs(ours[:, :, 0].astype(np.int64) - ref[:, :, 0])
        assert diff.max() <= 1, f"q={q}: max |Δ| = {diff.max()}"

    base = (
        np.repeat(np.repeat(rng.integers(60, 196, (4, 4)), 6, 0), 6, 1)
    ).astype(np.int64)
    rgb = np.stack(
        [np.clip(base + 8, 0, 255), base, np.clip(base - 8, 0, 255)], axis=-1
    ).astype(np.uint8)
    payload = _imageio_jpeg_encode(spark, rgb, 0.8)
    ours = J.decode_jpeg_pixels(payload)
    ref = _imageio_decode(spark, payload)
    assert ours is not None and ref is not None
    assert np.abs(ours.astype(np.int64) - ref.astype(np.int64)).max() <= 2


def test_decode_imageio_jpeg_422(spark):
    """Reverse-direction 4:2:2 interop (VERDICT r12 Next #5): the
    quality sweep covers JDK-encoded 4:2:0 and grayscale, and our own
    4:2:2 output is decoded by ImageIO in the forward test — this
    closes the last asymmetry by feeding a JDK-ENCODED 4:2:2 stream to
    OUR decoder. The JDK writer only emits 4:2:2 when the native
    metadata tree's componentSpec sampling factors say so (Y 2x1,
    chroma 1x1); the SOF0 bytes are asserted so the test fails loudly
    if a future JDK changes that contract. Low-chroma input keeps
    ImageIO's fancy chroma upsampling and our nearest-replication
    within ±2, same as the 4:2:0 quality-sweep case; width 20 leaves a
    partial MCU column so the 4:2:2 crop path is exercised too."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    h, w = 24, 20
    rng = np.random.default_rng(17)
    base = np.repeat(np.repeat(rng.integers(60, 196, (3, 3)), 8, 0), 8, 1)[
        :h, :w
    ].astype(np.int64)
    rgb = np.stack(
        [np.clip(base + 8, 0, 255), base, np.clip(base - 8, 0, 255)], axis=-1
    ).astype(np.uint8)

    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    packed = gw.new_array(jvm.int, h * w)
    for i in range(h * w):
        r, c = divmod(i, w)
        packed[i] = (
            (int(rgb[r, c, 0]) << 16) | (int(rgb[r, c, 1]) << 8) | int(rgb[r, c, 2])
        )
    img.setRGB(0, 0, w, h, packed, 0, w)

    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    param = writer.getDefaultWriteParam()
    param.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.8)
    spec = jvm.javax.imageio.ImageTypeSpecifier.createFromBufferedImageType(
        jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    meta = writer.getDefaultImageMetadata(spec, param)
    fmt = "javax_imageio_jpeg_image_1.0"
    tree = meta.getAsTree(fmt)
    nodes = tree.getElementsByTagName("componentSpec")
    nodes.item(0).setAttribute("HsamplingFactor", "2")
    nodes.item(0).setAttribute("VsamplingFactor", "1")
    for i in (1, 2):
        nodes.item(i).setAttribute("HsamplingFactor", "1")
        nodes.item(i).setAttribute("VsamplingFactor", "1")
    meta.setFromTree(fmt, tree)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, meta), param)
    writer.dispose()
    ios.close()
    payload = bytes(baos.toByteArray())

    import struct as _s

    i, sof_samp = 2, None
    while i < len(payload) - 4:
        assert payload[i] == 0xFF
        marker = payload[i + 1]
        ln = _s.unpack(">H", payload[i + 2 : i + 4])[0]
        if marker == 0xC0:
            seg = payload[i + 4 : i + 2 + ln]
            nc = seg[5]
            sof_samp = [
                (seg[7 + 3 * k] >> 4, seg[7 + 3 * k] & 15) for k in range(nc)
            ]
            break
        if marker == 0xDA:
            break
        i += 2 + ln
    assert sof_samp == [(2, 1), (1, 1), (1, 1)], sof_samp  # genuinely 4:2:2

    ours = J.decode_jpeg_pixels(payload)
    ref = _imageio_decode(spark, payload)
    assert ours is not None and ref is not None
    assert ours.shape == (h, w, 3) and ref.shape == (h, w, 3)
    assert np.abs(ours.astype(np.int64) - ref.astype(np.int64)).max() <= 2


def test_externally_encoded_progressive_jpeg_quarantined(spark):
    """A REAL progressive JPEG (ImageIO writer in progressive mode —
    SOF2 with multiple scans, not our hand-mutated marker) must take the
    documented quarantine path: decode returns None, never a wrong
    image or an exception."""
    jvm = spark._jvm
    rng = np.random.default_rng(3)
    gray = (
        np.repeat(np.repeat(rng.integers(0, 256, (3, 3)), 8, 0), 8, 1)
    ).astype(np.uint8)
    img = jvm.java.awt.image.BufferedImage(
        24, 24, jvm.java.awt.image.BufferedImage.TYPE_BYTE_GRAY
    )
    raster = img.getRaster()
    for r in range(24):
        for c in range(24):
            raster.setSample(c, r, 0, int(gray[r, c]))
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    writer.dispose()
    ios.close()
    payload = bytes(baos.toByteArray())
    assert b"\xff\xc2" in payload  # genuinely progressive (SOF2)
    assert J.decode_jpeg_pixels(payload) is None
