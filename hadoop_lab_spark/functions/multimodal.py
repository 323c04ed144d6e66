"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw bytes as an
opaque ``binary`` column next to typed metadata, partition by content
hash or source, and run decode / feature-extraction as Arrow-batched
``mapInPandas`` — one Python process per partition, columnar transfer,
no per-row serialization.

Two decoder tiers ship side by side:

- REAL decoders (``decode_image_real``, ``decode_audio_real``): parse
  actual PNG/GIF/BMP/JPEG headers (Pillow when importable, a stdlib
  struct parser otherwise — they read the same bytes) and decode real
  WAV PCM via the stdlib ``wave`` module. Tested against files encoded
  in-test with independent stdlib codecs (tests/test_multimodal_real.py)
  — no raise on the default path, no optional dependency required.
- deterministic FAKE decoders (everything else): derive pseudo-metadata
  from sha256 of the payload, which a SQL oracle reproduces bit-for-bit
  — these keep the entire Python/Arrow plumbing (schemas, UDF
  signatures, 1→1 and 1→N batch shapes, NULL propagation) under the
  cross-engine differential gate, which real codecs cannot be.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Output schema of the fake image-feature extractor.
IMAGE_FEATURES_SCHEMA = (
    "doc_id BIGINT, n_bytes INT, sha_prefix STRING, width INT, height INT"
)

#: Output schema of the fake frame sampler (1→N).
FRAME_SAMPLE_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_sha STRING"

#: Bytes-per-frame for the fake frame sampler; cap bounds the fan-out.
FRAME_BYTES = 100
MAX_FRAMES = 8


def payload_from_text(text: Column | str) -> Column:
    """Deterministic stand-in payload: the document text as UTF-8 bytes.

    In a real pipeline this column holds image/audio bytes read from
    object storage; deriving it from text keeps the fixture synthetic
    and the oracle reproducible (DuckDB ``encode(text)``).
    """
    c = F.col(text) if isinstance(text, str) else text
    return c.cast("binary")


def extract_image_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over a binary column (1→1).

    mapInPandas receives an iterator of pandas batches — the loop below
    touches each batch once, allocates nothing per row but the output
    columns, and never materializes the whole partition.

    The pseudo width/height (64 + hash-byte % 192) is the deterministic
    fake standing in for a codec's header parse.

    NOTE (self-contained closure): UDF bodies in this repo must not
    reference package-level symbols — the consuming driver puts the repo
    on sys.path in the *driver* process only, so a by-reference pickle
    of anything in hadoop_lab_spark fails to import on Python workers.
    Nested functions + stdlib imports are pickled by value and always
    work.
    """

    def extract(batches: Iterator) -> Iterator:
        import hashlib as _hl

        import pandas as pd

        for pdf in batches:
            # None payload (e.g. NULL source column) → NULL features,
            # matching SQL null propagation — a missing blob must not
            # crash the batch (tests/test_adversarial_corpus.py).
            shas = [
                None if b is None else _hl.sha256(b).hexdigest()
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [
                        None if b is None else len(b) for b in pdf[payload_col]
                    ],
                    "sha_prefix": [None if s is None else s[:16] for s in shas],
                    "width": [
                        None if s is None else 64 + int(s[0:2], 16) % 192 for s in shas
                    ],
                    "height": [
                        None if s is None else 64 + int(s[2:4], 16) % 192 for s in shas
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Fake frame sampling over a binary "video" column (1→N).

    Emits min(n_bytes // FRAME_BYTES, MAX_FRAMES) frames per document;
    each frame's sha256 covers its byte slice. Exercises the exploding
    batch shape (output rows ≠ input rows) that real frame extraction
    has, with a bounded fan-out.
    """

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, shas = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:  # missing blob → zero frames, not a crash
                    continue
                n_frames = min(len(payload) // FRAME_BYTES, MAX_FRAMES)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(
                            payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                        ).hexdigest()[:16]
                    )
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_sha": shas})

    return df.select(id_col, payload_col).mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


def decode_image_real(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """REAL image decode over a binary column (1→1).

    Same mapInPandas shape as :func:`extract_image_features`; the batch
    body parses ACTUAL image headers. Two tiers per batch, chosen at
    worker import time:

    - Pillow, when importable: ``Image.open(BytesIO).size`` (lazy header
      parse — it does not decompress pixel data either).
    - stdlib fallback (always available): direct header parsing for
      PNG (IHDR), GIF (logical screen descriptor), BMP (BITMAPINFOHEADER)
      and JPEG (SOF segment walk) — the same bytes PIL reads for
      ``.size``, so the two tiers agree on any well-formed file
      (pinned by tests/test_multimodal_real.py on in-test-encoded
      files).

    Both tiers sniff the magic number FIRST and accept only these four
    formats — the Pillow tier deliberately refuses formats the stdlib
    tier can't parse (WEBP, TIFF, ...), because on a cluster with
    heterogeneous Python envs a Pillow-only format would decode on some
    workers and NULL on others, making output depend on executor
    placement (ADVICE r4). Unsupported-but-valid images land in the
    same NULL-dims quarantine as corrupt blobs, identically on every
    worker.

    Undecodable or NULL payloads yield NULL dims (null propagation, not
    a crashed batch) — at 100 TB some corrupt blobs are a certainty and
    one must not kill a task. n_bytes/sha_prefix still identify the bad
    blob for quarantine queries.
    """

    def decode(batches: Iterator) -> Iterator:
        import hashlib as _hl
        import struct as _st

        import pandas as pd

        try:  # Pillow preferred when present; stdlib tier otherwise
            from PIL import Image as _img  # type: ignore
            import io as _io
        except ImportError:
            _img = None

        def _supported(b: bytes) -> bool:
            # The four-format contract, shared by BOTH tiers.
            return (
                (b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR")
                or b[:6] in (b"GIF87a", b"GIF89a")
                or b[:2] == b"BM"
                or b[:2] == b"\xff\xd8"
            )

        def _dims(b: bytes):
            if not _supported(b):
                return (None, None)
            if _img is not None:
                try:
                    return _img.open(_io.BytesIO(b)).size
                except Exception:
                    return (None, None)
            try:
                if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
                    return _st.unpack(">II", b[16:24])
                if b[:6] in (b"GIF87a", b"GIF89a"):
                    return _st.unpack("<HH", b[6:10])
                if b[:2] == b"BM":
                    # DIB header size discriminates BITMAPINFOHEADER (>=40,
                    # 32-bit signed dims at 18) from the OS/2
                    # BITMAPCOREHEADER (12, 16-bit unsigned dims at 18);
                    # anything else is quarantined, not mis-unpacked.
                    (dib,) = _st.unpack("<I", b[14:18])
                    if dib >= 40:
                        w, h = _st.unpack("<ii", b[18:26])
                        return (abs(w), abs(h))  # negative h = top-down rows
                    if dib == 12:
                        return _st.unpack("<HH", b[18:22])
                    return (None, None)
                if b[:2] == b"\xff\xd8":  # JPEG: walk to a SOFn marker
                    i = 2
                    while i + 9 < len(b):
                        if b[i] != 0xFF:
                            return (None, None)
                        # Runs of 0xFF are legal fill before any marker.
                        while i + 9 < len(b) and b[i + 1] == 0xFF:
                            i += 1
                        marker = b[i + 1]
                        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                            i += 2  # standalone markers have no length
                            continue
                        if marker in (0xDA, 0xD9):
                            # SOS starts entropy-coded data (markerless
                            # scan bytes) and EOI ends the stream: a SOF
                            # past either doesn't exist — stop walking.
                            return (None, None)
                        seglen = _st.unpack(">H", b[i + 2 : i + 4])[0]
                        if 0xC0 <= marker <= 0xCF and marker not in (
                            0xC4,
                            0xC8,
                            0xCC,
                        ):
                            h, w = _st.unpack(">HH", b[i + 5 : i + 9])
                            return (w, h)
                        i += 2 + seglen
            except (_st.error, IndexError):
                pass
            return (None, None)

        for pdf in batches:
            sizes = [
                (None, None) if b is None else _dims(bytes(b))
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [
                        None if b is None else len(b) for b in pdf[payload_col]
                    ],
                    "sha_prefix": [
                        None if b is None else _hl.sha256(bytes(b)).hexdigest()[:16]
                        for b in pdf[payload_col]
                    ],
                    "width": [s[0] for s in sizes],
                    "height": [s[1] for s in sizes],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


#: Output schema of the fake audio-energy extractor (1→N windows).
AUDIO_ENERGY_SCHEMA = "doc_id BIGINT, window_idx INT, energy BIGINT, peak INT"

#: Bytes per analysis window; cap bounds the fan-out like MAX_FRAMES.
AUDIO_WINDOW = 32
MAX_WINDOWS = 8


def audio_window_energy(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Fake audio analysis over a binary "PCM" column (1→N windows).

    Emits min(n_bytes // AUDIO_WINDOW, MAX_WINDOWS) complete windows per
    payload with integer energy (byte sum) and peak (byte max) — the
    deterministic stand-in for RMS/peak metering, exact cross-engine
    because every metric is integer arithmetic over the same bytes. A
    real decoder swaps the per-batch body (like decode_image_real), the
    Arrow batch shape and bounded fan-out stay identical.
    """

    def energy(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, es, ps = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:  # missing blob → zero windows
                    continue
                n = min(len(payload) // AUDIO_WINDOW, MAX_WINDOWS)
                for i in range(n):
                    w = payload[i * AUDIO_WINDOW : (i + 1) * AUDIO_WINDOW]
                    ids.append(doc_id)
                    idxs.append(i)
                    es.append(sum(w))
                    ps.append(max(w))
            yield pd.DataFrame(
                {"doc_id": ids, "window_idx": idxs, "energy": es, "peak": ps}
            )

    return df.select(id_col, payload_col).mapInPandas(energy, AUDIO_ENERGY_SCHEMA)


#: Output schema of the REAL WAV analyzer (1→N windows).
AUDIO_WAV_SCHEMA = (
    "doc_id BIGINT, window_idx INT, n_samples INT, energy BIGINT, peak INT"
)

#: PCM samples per analysis window for the real WAV path (~23 ms @ 44.1k).
WAV_WINDOW_SAMPLES = 1024


def decode_audio_real(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio analysis: decode a binary WAV payload with the stdlib
    ``wave`` module and emit per-window sum-of-|sample| energy and peak
    over the 16-bit PCM stream (1→N, window = WAV_WINDOW_SAMPLES frames,
    channels interleaved into the same window).

    No optional dependency at all — ``wave``/``struct``/``array`` are
    stdlib — so unlike images there is no fake/real split: this IS the
    shipped decoder. Integer metrics keep results engine- and
    platform-exact (no float RMS accumulation order to pin).

    Non-WAV, compressed, non-16-bit, or NULL payloads yield zero windows
    rather than a crashed batch (same quarantine-not-kill policy as
    decode_image_real). The per-document fan-out is |frames|/window —
    bounded by payload size, which object stores already cap.
    """

    def analyze(batches: Iterator) -> Iterator:
        import array as _arr
        import io as _io
        import sys as _sys
        import wave as _wave

        import pandas as pd

        win = 1024  # WAV_WINDOW_SAMPLES, inlined: closure must be self-contained
        for pdf in batches:
            ids, idxs, ns, es, ps = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    with _wave.open(_io.BytesIO(bytes(payload))) as w:
                        if w.getsampwidth() != 2 or w.getcomptype() != "NONE":
                            continue
                        nch = w.getnchannels()
                        raw = w.readframes(w.getnframes())
                except Exception:
                    continue  # not a (supported) WAV → zero windows
                samples = _arr.array("h")
                samples.frombytes(raw[: len(raw) - (len(raw) % 2)])
                if _sys.byteorder == "big":  # WAV PCM is little-endian
                    samples.byteswap()
                step = win * nch
                for i in range(0, len(samples), step):
                    chunk = samples[i : i + step]
                    ids.append(doc_id)
                    idxs.append(i // step)
                    ns.append(len(chunk))
                    es.append(sum(abs(s) for s in chunk))
                    ps.append(max(abs(s) for s in chunk))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "window_idx": idxs,
                    "n_samples": ns,
                    "energy": es,
                    "peak": ps,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(analyze, AUDIO_WAV_SCHEMA)


#: Output schema of the fake resize planner (1→1).
RESIZE_SCHEMA = (
    "doc_id BIGINT, width INT, height INT, out_width INT, out_height INT"
)

#: Bounding box for the aspect-preserving resize.
RESIZE_BOX = 64


def resize_images(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Fake aspect-preserving resize over a binary "image" column (1→1).

    Reads the pseudo header dims (same sha256 derivation as
    extract_image_features) and computes the output size fitting
    RESIZE_BOX × RESIZE_BOX with aspect preserved, entirely in integer
    arithmetic (w·BOX // max_dim) so the oracle is exact. A real
    implementation swaps the body for PIL's Image.resize and writes the
    resized bytes; batch shape, schema discipline, and the bounded
    integer planner are identical.
    """

    def resize(batches: Iterator) -> Iterator:
        import hashlib as _hl

        import pandas as pd

        box = 64  # RESIZE_BOX, inlined: closures must be self-contained
        ids, ws, hs, ows, ohs = [], [], [], [], []
        for pdf in batches:
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    ids.append(doc_id)
                    ws.append(None)
                    hs.append(None)
                    ows.append(None)
                    ohs.append(None)
                    continue
                sha = _hl.sha256(payload).hexdigest()
                w = 64 + int(sha[0:2], 16) % 192
                h = 64 + int(sha[2:4], 16) % 192
                m = max(w, h)
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                ows.append(max(1, w * box // m))
                ohs.append(max(1, h * box // m))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": ws,
                    "height": hs,
                    "out_width": ows,
                    "out_height": ohs,
                }
            )
            ids, ws, hs, ows, ohs = [], [], [], [], []

    return df.select(id_col, payload_col).mapInPandas(resize, RESIZE_SCHEMA)
