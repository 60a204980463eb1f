"""Cross-implementation codec pins: our from-scratch PNG/WAV codecs vs
the JVM's independent implementations (javax.imageio, javax.sound),
reached through the Spark session's py4j gateway — no Python image or
audio libraries exist in this container, but every test session already
carries a JVM whose codecs we did not write.

Both formats are LOSSLESS here, so every assertion is bit-exactness:
a symmetric encoder/decoder bug (filter bytes, chunk CRCs, RIFF field
layout, sample packing) that our own round-trip tests forgive cannot
survive an independent implementation on either side of the boundary.
The JPEG analogues (lossy, DC-exact class) live in test_jpeg.py.
"""

from __future__ import annotations

import numpy as np

from weather_bigquery_lakehouse_spark.operators.multimodal import (
    decode_png_pixels,
    decode_wav_pcm,
    encode_png,
    encode_wav,
)


def _imageio_decode(spark, payload: bytes):
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(payload))
    )
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


def _rgb_fixture():
    return np.array(
        [
            (r * 37 + c * 11 + ch * 5) % 256
            for r in range(9)
            for c in range(7)
            for ch in range(3)
        ],
        dtype=np.uint8,
    ).reshape(9, 7, 3)


def test_png_encoder_output_decodes_exactly_in_imageio(spark):
    """Our PNG encoder exercising ALL FIVE scanline filters (cycled
    row_filters) must decode bit-exactly in javax.imageio — RGB and
    RGBA. A filter-byte or CRC bug our own decoder mirrors breaks
    here."""
    rgb = _rgb_fixture()
    got = _imageio_decode(spark, encode_png(rgb, row_filters=[0, 1, 2, 3, 4]))
    assert got is not None and (got == rgb).all()

    alpha = (np.arange(63) % 256).reshape(9, 7).astype(np.uint8)
    rgba = np.dstack([rgb, alpha])
    got = _imageio_decode(spark, encode_png(rgba, row_filters=[4, 3, 2, 1, 0]))
    assert got is not None and got.shape == (9, 7, 4) and (got == rgba).all()


def test_imageio_png_decodes_exactly_in_our_decoder(spark):
    """The reverse direction: a PNG written by javax.imageio (its own
    filter heuristics and zlib parameters — an external encoder's
    stream) must decode bit-exactly in decode_png_pixels."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    rgb = _rgb_fixture()
    img = jvm.java.awt.image.BufferedImage(
        7, 9, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    packed = gw.new_array(jvm.int, 63)
    for i in range(63):
        r, c = divmod(i, 7)
        packed[i] = (
            (int(rgb[r, c, 0]) << 16)
            | (int(rgb[r, c, 1]) << 8)
            | int(rgb[r, c, 2])
        )
    img.setRGB(0, 0, 7, 9, packed, 0, 7)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "png", baos)
    external = bytes(baos.toByteArray())
    ours = decode_png_pixels(external)
    assert ours is not None and (ours == rgb).all()


def test_wav_encoder_output_reads_exactly_in_javax_sound(spark):
    """javax.sound must parse our RIFF/WAVE header to the exact format
    (PCM signed, 16-bit, mono, little-endian, the declared rate and
    frame count) and stream back the identical PCM bytes."""
    jvm = spark._jvm
    samples = (np.sin(np.arange(400) / 7.0) * 12000).astype(np.int16)
    wav = encode_wav(samples, rate=8000)
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(wav))
    )
    fmt = ais.getFormat()
    assert fmt.getSampleRate() == 8000.0
    assert fmt.getSampleSizeInBits() == 16
    assert fmt.getChannels() == 1
    assert not fmt.isBigEndian()
    assert int(ais.getFrameLength()) == 400
    got = np.frombuffer(bytes(ais.readAllBytes()), dtype="<i2")
    assert (got == samples).all()


def test_javax_sound_wav_decodes_exactly_in_our_decoder(spark):
    """The reverse direction: a WAV container written by
    javax.sound.sampled.AudioSystem around raw PCM must come back
    sample-exact through decode_wav_pcm."""
    jvm = spark._jvm
    samples = ((np.arange(300) * 173 + 41) % 20000 - 10000).astype(np.int16)
    fmt = jvm.javax.sound.sampled.AudioFormat(11025.0, 16, 1, True, False)
    ais = jvm.javax.sound.sampled.AudioInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(samples.tobytes())),
        fmt,
        300,
    )
    baos = jvm.java.io.ByteArrayOutputStream()
    wave_type = jvm.javax.sound.sampled.AudioFileFormat.Type.WAVE
    jvm.javax.sound.sampled.AudioSystem.write(ais, wave_type, baos)
    external = bytes(baos.toByteArray())
    got = decode_wav_pcm(external)
    assert got is not None and got.shape == (300, 1)
    assert (got[:, 0] == samples).all()
