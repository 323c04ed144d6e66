"""Real multimodal decoders over real files (r3 verdict #3).

The files are ENCODED in-test with stdlib codecs (zlib/struct for PNG,
the ``wave`` writer for WAV), so the decoders are exercised against
genuine file formats with independently-known ground truth — no fixture
binaries in the repo, no optional deps required. When Pillow IS
importable the image path uses it; these tests pass under either tier
because both read the same header bytes.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest

from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from hadoop_lab_spark.functions import multimodal as M


# --- in-test encoders (ground truth by construction) -----------------------


def make_png(width: int, height: int) -> bytes:
    """A complete, valid 8-bit grayscale PNG of the given dimensions."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"


def make_bmp(width: int, height: int) -> bytes:
    """BMP file header + BITMAPINFOHEADER (no pixel data needed for dims)."""
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 0, 0, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    return header + info


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG marker stream: SOI, APP0, DQT, SOF0(dims), EOI."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def make_wav(samples: list[int], nchannels: int = 1, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nchannels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def _payload_df(spark, payloads: list[bytes | None]):
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], schema
    )


# --- image decode ----------------------------------------------------------

IMAGES = [
    ("png", make_png, (37, 53)),
    ("gif", make_gif, (320, 200)),
    ("bmp", make_bmp, (64, 48)),
    ("jpeg", make_jpeg, (123, 45)),
]


def test_decode_image_real_reads_actual_headers(spark):
    payloads = [enc(w, h) for _, enc, (w, h) in IMAGES]
    payloads += [None, b"not an image at all"]
    df = _payload_df(spark, payloads)
    rows = {r.doc_id: r for r in M.decode_image_real(df).collect()}
    assert len(rows) == len(payloads)
    for i, (fmt, _, (w, h)) in enumerate(IMAGES):
        assert (rows[i].width, rows[i].height) == (w, h), fmt
        assert rows[i].n_bytes == len(payloads[i])
        assert len(rows[i].sha_prefix) == 16
    # NULL payload → NULL everything; garbage → NULL dims, real n_bytes
    assert rows[4].width is None and rows[4].n_bytes is None
    assert rows[5].width is None and rows[5].n_bytes == len(payloads[5])


def test_decode_image_real_top_down_bmp_height_is_positive(spark):
    """Top-down BMPs store a NEGATIVE height; dims must come back abs()."""
    info = struct.pack("<Iii", 40, 64, -48) + bytes(28)
    bmp = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + info
    df = _payload_df(spark, [bmp])
    row = M.decode_image_real(df).collect()[0]
    assert (row.width, row.height) == (64, 48)


# --- audio decode ----------------------------------------------------------


def test_decode_audio_real_windows_match_ground_truth(spark):
    # 2500 mono samples → windows of 1024: [1024, 1024, 452]
    samples = [((i * 37) % 2001) - 1000 for i in range(2500)]
    df = _payload_df(spark, [make_wav(samples)])
    rows = sorted(M.decode_audio_real(df).collect(), key=lambda r: r.window_idx)
    assert [r.n_samples for r in rows] == [1024, 1024, 452]
    w = M.WAV_WINDOW_SAMPLES
    for r in rows:
        chunk = samples[r.window_idx * w : (r.window_idx + 1) * w]
        assert r.energy == sum(abs(s) for s in chunk)
        assert r.peak == max(abs(s) for s in chunk)


def test_decode_audio_real_stereo_interleaves_channels(spark):
    # 1030 stereo frames = 2060 samples → windows of 1024*2: [2048, 12]
    left = [100] * 1030
    right = [-200] * 1030
    inter = [s for pair in zip(left, right) for s in pair]
    df = _payload_df(spark, [make_wav(inter, nchannels=2)])
    rows = sorted(M.decode_audio_real(df).collect(), key=lambda r: r.window_idx)
    assert [r.n_samples for r in rows] == [2048, 12]
    assert rows[0].energy == 1024 * (100 + 200)
    assert rows[0].peak == 200


def test_decode_audio_real_rejects_garbage_without_crashing(spark):
    df = _payload_df(spark, [None, b"RIFFgarbage", make_wav([1, -1, 32767])])
    rows = M.decode_audio_real(df).collect()
    # only the valid WAV yields windows
    assert {r.doc_id for r in rows} == {2}
    assert rows[0].energy == 1 + 1 + 32767
    assert rows[0].peak == 32767


def test_pillow_tier_agrees_when_present(spark):
    """When Pillow is importable both tiers must agree — the stdlib
    parser reads the same header bytes PIL's lazy .size does."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        pytest.skip("Pillow not installed — stdlib tier already covered above")
    for fmt, enc, (w, h) in IMAGES:
        assert Image.open(io.BytesIO(enc(w, h))).size == (w, h), fmt


def test_decode_image_real_randomized_dims_single_pass(spark):
    """~40 random and extreme dimension pairs across all four formats in
    ONE Spark job — catches endianness/offset mistakes the single
    handpicked sizes above could mask. Ground truth is the encoder
    input, independent of the parser."""
    import random

    rnd = random.Random(20260814)
    cases = [(1, 1), (65535, 1), (1, 65535), (65535, 65535)]
    cases += [(rnd.randint(1, 65535), rnd.randint(1, 65535)) for _ in range(6)]
    payloads, expect = [], []
    for w, h in cases:
        for enc in (make_png, make_gif, make_bmp, make_jpeg):
            payloads.append(enc(w, h))
            expect.append((w, h))
    df = _payload_df(spark, payloads)
    rows = {r.doc_id: r for r in M.decode_image_real(df).collect()}
    for i, (w, h) in enumerate(expect):
        assert (rows[i].width, rows[i].height) == (w, h), (i, w, h)


def test_decode_audio_real_extreme_samples(spark):
    """int16 extremes: abs(-32768) must not overflow or wrap, and a
    silent window must report zero energy."""
    samples = [-32768, 32767, 0, -1] + [0] * 1020 + [5] * 10
    df = _payload_df(spark, [make_wav(samples)])
    rows = sorted(M.decode_audio_real(df).collect(), key=lambda r: r.window_idx)
    assert rows[0].energy == 32768 + 32767 + 0 + 1
    assert rows[0].peak == 32768
    assert rows[1].energy == 50 and rows[1].peak == 5


# --- ADVICE r4 decoder hardening -------------------------------------------


def test_jpeg_fill_bytes_before_markers_are_skipped(spark):
    """0xFF fill bytes before a marker are legal padding (ITU T.81
    B.1.1.2); the walker must skip runs of 0xFF instead of reading a
    bogus length segment for marker 0xFF."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", 77, 99)
        + b"\x01\x11\x00"
    )
    jpg = b"\xff\xd8" + app0 + b"\xff\xff\xff" + sof0 + b"\xff\xd9"
    row = M.decode_image_real(_payload_df(spark, [jpg])).collect()[0]
    assert (row.width, row.height) == (99, 77)


def test_jpeg_walk_terminates_at_sos_and_eoi(spark):
    """A JPEG whose SOS (or EOI) arrives before any SOF must quarantine
    (NULL dims) — entropy-coded scan bytes after SOS are markerless, so
    walking past it would read garbage as segment lengths."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    # SOS followed by scan bytes that LOOK like a huge plausible SOF
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x00\x00"
    fake_scan = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 1, 1) + b"\x01\x11\x00"
    no_sof = b"\xff\xd8" + app0 + sos + fake_scan + b"\xff\xd9"
    eoi_first = b"\xff\xd8" + app0 + b"\xff\xd9" + fake_scan
    rows = {
        r.doc_id: r
        for r in M.decode_image_real(_payload_df(spark, [no_sof, eoi_first])).collect()
    }
    for i in (0, 1):
        assert rows[i].width is None and rows[i].height is None
        assert rows[i].n_bytes is not None  # still identified for quarantine


def make_bmp_os2(width: int, height: int) -> bytes:
    """OS/2 BITMAPCOREHEADER: 12-byte DIB header, 16-bit unsigned dims."""
    core = struct.pack("<IHHHH", 12, width, height, 1, 24)
    return b"BM" + struct.pack("<IHHI", 26, 0, 0, 26) + core


def test_bmp_os2_core_header_dims(spark):
    """A BITMAPCOREHEADER BMP must decode its 16-bit dims, not silently
    mis-unpack 32-bit fields at the BITMAPINFOHEADER offsets."""
    df = _payload_df(spark, [make_bmp_os2(300, 200)])
    row = M.decode_image_real(df).collect()[0]
    assert (row.width, row.height) == (300, 200)


def test_bmp_unknown_dib_header_quarantines(spark):
    """A DIB header size that is neither >=40 nor 12 (here 20) is not a
    layout we know — NULL dims, never wrong non-NULL ones."""
    weird = b"BM" + struct.pack("<IHHI", 34, 0, 0, 34) + struct.pack("<Iii", 20, 9, 9) + bytes(8)
    row = M.decode_image_real(_payload_df(spark, [weird])).collect()[0]
    assert row.width is None and row.height is None


def test_unsupported_formats_null_on_every_tier(spark):
    """WEBP/TIFF are outside the four-format contract: BOTH tiers must
    return NULL dims (the Pillow tier sniffs magic before Image.open),
    so results never depend on which workers have Pillow."""
    webp = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + bytes(8)
    tiff = b"II*\x00" + bytes(16)
    rows = {
        r.doc_id: r
        for r in M.decode_image_real(_payload_df(spark, [webp, tiff])).collect()
    }
    for i in (0, 1):
        assert rows[i].width is None and rows[i].height is None
        assert rows[i].n_bytes is not None
