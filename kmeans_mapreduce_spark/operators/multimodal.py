"""Multimodal columns (north-star): opaque binary payloads with typed
metadata, processed via Arrow-batched ``mapInPandas``.

One REAL format per modality, decoded with the standard library only
(this container has no codec packages):

- image: binary PPM (``P6``) — header parsed byte-wise, raw RGB pixels
  out; resize is a real nearest-neighbor resample over the pixel grid.
- audio: RIFF/WAVE PCM via the stdlib ``wave`` module — canonical
  44-byte header, 16-bit mono frames out.
- video: RIFF/AVI written and parsed with stdlib ``struct`` (RIFF is
  the same container family the stdlib already reads for WAV): real
  headers (avih/strh/BITMAPINFOHEADER), real chunk walking, real
  frames out. Two codecs decode for real — UNCOMPRESSED (``DIB ``,
  raw RGB24 ``00db`` chunks) and MOTION-JPEG (``MJPG``, one baseline
  JPEG per ``00dc`` chunk, entropy+DCT decoded by
  ``functions/jpeg.py`` from the public T.81 spec, stdlib+numpy
  only). Inter-frame codecs (h264 etc.) still raise a clearly-marked
  error (``_decode_stub`` / the ``_decode_avi`` codec check) — swap
  in pyav/ffmpeg on a real cluster; the plan, schema, and batch
  shapes are unchanged.

Scale notes: payloads live in a ``binary`` column (parquet column
pruning keeps them out of unrelated scans); decode/feature extraction
is a narrow mapInPandas pass — no shuffle; metadata predicates (kind,
width, n_bytes) push down to the scan.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "media_id LONG, kind STRING, n_bytes LONG, decoded BOOLEAN, "
    "dec_width INT, dec_height INT, n_samples LONG, byte_mean DOUBLE"
)

MEDIA_SCHEMA = (
    "media_id LONG, kind STRING, payload BINARY, format STRING, "
    "width INT, height INT, n_bytes LONG"
)

KINDS = ["image", "audio", "video"]
FORMATS = {"image": "image/ppm", "audio": "audio/wav", "video": "video/avi"}

WAV_RATE = 8000  # Hz, mono 16-bit PCM

# Uncompressed-AVI video geometry: small fixed frames keep synthesized
# payloads tiny (584 B/frame incl. chunk header) while the container is
# fully real. 3·16·12 = 576 is a multiple of 16, so digest-cycled frame
# content keeps the byte_mean oracle formula exact (zero remainder).
VID_W, VID_H = 16, 12
VID_FPS = 10
VID_FRAME_BYTES = 3 * VID_W * VID_H  # RGB24
# total file size for F frames: fixed header scaffolding (224 B — see
# _encode_avi layout) + F·(8-byte chunk header + frame)
AVI_FIXED_BYTES = 224


def avi_total_bytes(n_frames: int) -> int:
    return AVI_FIXED_BYTES + n_frames * (8 + VID_FRAME_BYTES)


def _vid_frames(doc_id: int) -> int:
    return doc_id % 4 + 2


def _repeat_trunc(blob: bytes, n: int) -> bytes:
    """Deterministic filler: ``blob`` cycled to exactly ``n`` bytes."""
    return (blob * (n // len(blob) + 1))[:n]


def _media_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 64 + 64, doc_id % 48 + 48


def _wav_samples(doc_id: int) -> int:
    return doc_id % 500 + 100


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents with REAL container
    formats: kind cycles by doc_id; images are valid binary PPMs whose
    pixel bytes cycle the text's md5 digest, audio is a valid PCM WAV
    (stdlib ``wave`` writer, so the 44-byte header is canonical) whose
    sample bytes cycle the digest, video is a valid UNCOMPRESSED AVI
    (:func:`_encode_avi` — real RIFF headers, raw-RGB24 ``00db``
    frames) whose frame pixels cycle the digest. Pixel/PCM/frame
    content cycling a known digest keeps every downstream feature
    oracle-replayable while the decoders exercise real parsers."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                digest = hashlib.md5((text or "").encode()).digest()
                kind = KINDS[did % 3]
                w, h = _media_dims(did)
                if kind == "image":
                    header = f"P6\n{w} {h}\n255\n".encode("ascii")
                    payload = header + _repeat_trunc(digest, 3 * w * h)
                elif kind == "audio":
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as wv:
                        wv.setnchannels(1)
                        wv.setsampwidth(2)
                        wv.setframerate(WAV_RATE)
                        wv.writeframes(
                            _repeat_trunc(digest, 2 * _wav_samples(did))
                        )
                    payload = buf.getvalue()
                else:
                    frame = _repeat_trunc(digest, VID_FRAME_BYTES)
                    payload = _encode_avi(
                        VID_W, VID_H, [frame] * _vid_frames(did)
                    )
                    w, h = VID_W, VID_H  # the container's real geometry
                rows.append((did, kind, payload, FORMATS[kind], w, h, len(payload)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "format",
                    "width", "height", "n_bytes",
                ],
            )

    return docs.select("doc_id", "text").mapInPandas(fn, schema=MEDIA_SCHEMA)


def _decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Binary PPM (P6) parser: magic, whitespace-separated width /
    height / maxval, one whitespace byte, then raw RGB rows."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6 magic missing)")
    toks: list[bytes] = []
    i, n = 2, len(payload)
    while len(toks) < 3 and i < n:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    i += 1  # the single whitespace byte after maxval
    if len(toks) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = (int(t) for t in toks)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pixels = payload[i : i + 3 * w * h]
    if len(pixels) != 3 * w * h:
        raise ValueError("truncated PPM pixel data")
    return w, h, pixels


def _decode_wav(payload: bytes) -> tuple[int, int, bytes]:
    """RIFF/WAVE PCM via the stdlib wave reader: (n_samples, rate,
    frame bytes)."""
    with wave.open(io.BytesIO(payload), "rb") as wv:
        n = wv.getnframes()
        return n, wv.getframerate(), wv.readframes(n)


def _encode_avi(
    w: int,
    h: int,
    frames: list[bytes],
    fps: int = VID_FPS,
    codec: bytes = b"DIB ",
) -> bytes:
    """Minimal VALID AVI: RIFF('AVI ') → LIST('hdrl') with a real avih
    main header + one 'vids' stream (strh + BITMAPINFOHEADER strf) →
    LIST('movi') of frame chunks. Two codecs:

    - ``b"DIB "`` (default): raw-RGB24 ``00db`` chunks, every frame
      exactly 3·w·h bytes. Fixed scaffolding = 224 bytes:

        12  RIFF header           8+56  avih
        12  LIST hdrl             12    LIST strl
        8+56  strh                8+40  strf (BITMAPINFOHEADER)
        12  LIST movi             F×(8+frame)  00db chunks

    - ``b"MJPG"``: Motion-JPEG — each ``00dc`` chunk is one complete
      baseline JPEG (:mod:`kmeans_mapreduce_spark.functions.jpeg`),
      variable-length; odd-sized chunks get the RIFF pad byte.
    """
    import struct

    fsz = 3 * w * h
    if codec == b"DIB ":
        for fr in frames:
            if len(fr) != fsz:
                raise ValueError(f"frame is {len(fr)} bytes, want {fsz}")
        buf_sz = fsz
        chunk_id = b"00db"
        compression = 0
    elif codec == b"MJPG":
        for fr in frames:
            if fr[:2] != b"\xff\xd8":
                raise ValueError("MJPG frame is not a JPEG (missing SOI)")
        buf_sz = max((len(fr) for fr in frames), default=0)
        chunk_id = b"00dc"
        compression = struct.unpack("<I", b"MJPG")[0]  # BI_FOURCC
    else:
        raise ValueError(f"unsupported AVI codec {codec!r}")
    avih = struct.pack(
        "<10I4I",
        1_000_000 // fps, 0, 0, 0, len(frames), 0, 1, buf_sz, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sI2H8I4H",
        b"vids", codec, 0, 0, 0, 0, 1, fps, 0, len(frames), buf_sz, 0, fsz,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<I2i2H6I", 40, w, h, 1, 24, compression, fsz, 0, 0, 0, 0
    )
    strl = b"strl" + b"strh" + struct.pack("<I", 56) + strh \
        + b"strf" + struct.pack("<I", 40) + strf
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", 56) + avih \
        + b"LIST" + struct.pack("<I", len(strl)) + strl
    movi = b"movi" + b"".join(
        chunk_id + struct.pack("<I", len(fr)) + fr + (b"\x00" * (len(fr) & 1))
        for fr in frames
    )
    riff = b"AVI " + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl \
        + b"LIST" + struct.pack("<I", len(movi)) + movi
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _decode_avi(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Parse an AVI: validate RIFF/'AVI ' magic, read width/height from
    the avih main header, walk the chunk tree to the 'movi' list and
    collect ``00db``/``00dc`` frame chunks. Frames come out as raw
    RGB24 regardless of codec: uncompressed chunks must be exactly
    3·w·h bytes; MJPEG chunks (detected by their JPEG SOI magic) are
    decoded with the stdlib+numpy baseline decoder
    (:func:`kmeans_mapreduce_spark.functions.jpeg.decode_baseline_jpeg`)
    and must decode to the container's geometry. Returns (width,
    height, frames). Raises ValueError on malformed containers and on
    codec-bound frames neither path can decode (h264 etc. — pyav/
    ffmpeg territory on a real cluster)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = None
    frames: list[tuple[bytes, bytes]] = []  # (chunk fourcc, body)

    # iterative chunk walk (explicit stack of (cursor, container-end)
    # spans): a hostile payload of nested LISTs is 12 bytes per level,
    # so a recursive walk would hit Python's recursion limit (and
    # escape the documented ValueError contract as RecursionError) at
    # ~60 KB of input — fuzz-found, matching jpeg.py's discipline that
    # untrusted bytes either parse or raise ValueError, never crash
    stack: list[tuple[int, int]] = [(12, len(payload))]
    buf = payload
    while stack:
        i, end = stack.pop()
        while i + 8 <= end:
            fourcc = buf[i : i + 4]
            (size,) = struct.unpack("<I", buf[i + 4 : i + 8])
            if i + 8 + size > end:
                # a chunk whose declared size overruns its container is
                # a truncated/corrupt file — raise, never return a
                # silently-short frame (review fix: the documented
                # contract is ValueError on malformed, and the
                # degrade-don't-die callers rely on it)
                raise ValueError(
                    f"truncated AVI: chunk {fourcc!r} claims {size} bytes "
                    f"past its container"
                )
            body = buf[i + 8 : i + 8 + size]
            if fourcc == b"LIST":
                # resume THIS container after the list, then descend
                # (skip the 4-byte list type tag). Real AVI nests ≤ ~4
                # deep (hdrl→strl, movi→rec); cap keeps hostile
                # 12-bytes-per-level nesting from ballooning the stack
                if len(stack) >= 64:
                    raise ValueError("AVI LIST nesting deeper than 64")
                stack.append((i + 8 + size + (size & 1), end))
                i, end = i + 12, i + 8 + size
                continue
            elif fourcc == b"avih" and size >= 40:
                w, h = struct.unpack("<2I", body[32:40])
            elif fourcc in (b"00db", b"00dc"):
                frames.append((fourcc, body))
            i += 8 + size + (size & 1)  # RIFF chunks pad to even
    if w is None or h is None:
        raise ValueError("AVI without an avih main header")
    w, h = int(w), int(h)
    fsz = 3 * w * h
    out: list[bytes] = []
    seen: dict[bytes, bytes] = {}  # within-container identical-chunk memo
    # dispatch on the CHUNK ID, not the body length: '00db' is
    # uncompressed by definition, '00dc' is compressed (MJPEG here) —
    # a JPEG that happens to be exactly 3·w·h bytes must never be
    # passed through as raw pixels (review fix: silent corruption the
    # structural gates cannot catch)
    for fourcc, fr in frames:
        if fourcc == b"00db":
            if len(fr) != fsz:
                raise ValueError(
                    f"uncompressed AVI frame is {len(fr)} bytes, want {fsz}"
                )
            out.append(fr)
        elif fr[:2] == b"\xff\xd8":  # 00dc: one baseline JPEG per chunk
            hit = seen.get(fr)
            if hit is not None:
                out.append(hit)
                continue
            import numpy as np

            from kmeans_mapreduce_spark.functions.jpeg import (
                decode_baseline_jpeg,
            )

            jw, jh, nc, rgb = decode_baseline_jpeg(fr)
            if (jw, jh) != (w, h):
                raise ValueError(
                    f"MJPEG frame geometry {jw}x{jh} != container {w}x{h}"
                )
            if nc == 1:  # grayscale MJPEG: expand to RGB24 (vectorized)
                rgb = np.repeat(
                    np.frombuffer(rgb, np.uint8), 3
                ).tobytes()
            seen[fr] = rgb
            out.append(rgb)
        else:
            raise ValueError(
                f"AVI 00dc frame ({len(fr)} bytes) is not a baseline "
                "JPEG (MJPG) — other codecs are out of scope"
            )
    return w, h, out


def _decode_stub(kind: str, payload: bytes):
    """Genuinely codec-bound payloads land here: compressed inter-frame
    video / unknown kinds have no stdlib codec, so this raises rather
    than fake a decode.

    CLUSTER SWAP (the exact public pyav API this stub stands in for):

        import av, io
        with av.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            stream.thread_type = "AUTO"          # frame+slice threads
            for frame in container.decode(stream):  # av.VideoFrame
                rgb = frame.to_ndarray(format="rgb24")  # H×W×3 uint8

    i.e. ``av.open`` → ``container.decode(video_stream)`` →
    ``VideoFrame.to_ndarray(format="rgb24")``, which covers h264/h265/
    vp9/av1 through the bundled FFmpeg. Frame SAMPLING (the
    ``frame_sample`` path) becomes ``container.seek(pts,
    stream=stream)`` + decode-next instead of decoding every frame.
    The Spark-side plumbing is unchanged: this function already runs
    inside the Arrow-batched ``mapInPandas`` decode pass, so the swap
    is these ~6 lines plus shipping the ``av`` wheel to executors.

    The swap is WIRED as an optional extra (r12 verdict task 7):
    when the ``av`` wheel is importable the pinned calls above run via
    :func:`_decode_av`; when it is absent (this container) the stub
    raises exactly as before. A skipped-unless-available test
    exercises the live path so the stub closes the day the wheel
    exists."""
    try:
        import av  # noqa: F401 — optional extra, absent in this container
    except ImportError:
        raise NotImplementedError(f"no stdlib decoder for kind={kind!r}")
    return _decode_av(kind, payload)


def _decode_av(kind: str, payload: bytes):
    """The live pyav path behind :func:`_decode_stub`'s guard — the
    docstring's pinned public API, verbatim. Same return contract as
    the stdlib decoders ((content, w, h, n_frames)); malformed or
    stream-less payloads raise ValueError like every other decoder
    here (degrade-don't-die at the callers)."""
    import io

    import av

    try:
        with av.open(io.BytesIO(payload)) as container:
            if not container.streams.video:
                raise ValueError(
                    f"av: no video stream in kind={kind!r} payload"
                )
            stream = container.streams.video[0]
            stream.thread_type = "AUTO"  # frame+slice threads
            frames = []
            w = h = None
            for frame in container.decode(stream):  # av.VideoFrame
                rgb = frame.to_ndarray(format="rgb24")  # H×W×3 uint8
                if w is None:
                    h, w = rgb.shape[:2]
                elif rgb.shape[:2] != (h, w):
                    # mid-stream resolution change (legal in ffmpeg)
                    # would break the fixed-size frame-grid contract
                    # (len(content) == n_frames·w·h·3) the stdlib
                    # decoders guarantee — refuse like any malformed
                    # payload rather than emit misaligned pixels
                    raise ValueError(
                        f"av: variable frame geometry "
                        f"{rgb.shape[1]}x{rgb.shape[0]} != {w}x{h} "
                        f"in kind={kind!r}"
                    )
                frames.append(rgb.tobytes())
    except av.error.FFmpegError as exc:
        raise ValueError(f"av could not decode kind={kind!r}: {exc}") from exc
    if not frames:
        raise ValueError(f"av decoded zero frames for kind={kind!r}")
    return b"".join(frames), w, h, len(frames)


def decode_media(kind: str, payload: bytes) -> tuple[bytes, int | None, int | None, int | None]:
    """Dispatch to the real per-modality decoder. Returns
    ``(content_bytes, width, height, n_samples)`` where content is the
    decoded payload body (RGB pixels / PCM frames / concatenated video
    frames; n_samples = PCM samples or frame count). Raises
    ``NotImplementedError`` for codec-bound kinds."""
    if kind == "image":
        w, h, pixels = _decode_ppm(payload)
        return pixels, w, h, None
    if kind == "audio":
        n, _rate, frames = _decode_wav(payload)
        return frames, None, None, n
    if kind == "video":
        w, h, frames = _decode_avi(payload)
        return b"".join(frames), w, h, len(frames)
    return _decode_stub(kind, payload)


def media_embedding(media: DataFrame, dim: int = 16) -> DataFrame:
    """Decoded content bytes → dense float vector (first ``dim``
    content bytes, zero-padded) — the deterministic stand-in for a
    real encoder model, with the REAL plumbing a GPU-batched embedder
    needs: binary column in, real decode, Arrow batch iteration,
    ``array<double>`` column out, narrow map (no shuffle). MALFORMED
    payloads fall back to raw payload bytes (degrade-don't-die). The
    oracle equivalence the media-cluster twin relies on: every
    synthesized modality's decoded content STARTS with the text's md5
    digest cycle (PPM pixels, PCM samples, and AVI frame bytes alike),
    so the first ``dim`` content bytes equal the first ``dim`` digest
    bytes regardless of kind. Swap the byte slice for a model forward
    pass and nothing else changes. Output: (media_id, vec
    ARRAY<DOUBLE>)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = []
            for k, p in zip(pdf["kind"], pdf["payload"]):
                blob = bytes(p)
                try:
                    content, *_ = decode_media(k, blob)
                except Exception:
                    # stub kinds AND malformed payloads (truncated PPM,
                    # corrupt WAV) degrade to raw bytes, never crash
                    content = blob
                head = content[:dim] + b"\x00" * max(0, dim - len(content))
                vecs.append([float(b) for b in head])
            yield pd.DataFrame({"media_id": pdf["media_id"], "vec": vecs})

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, "media_id LONG, vec ARRAY<DOUBLE>"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads, with a
    REAL decode step per modality: images report their parsed PPM
    dimensions and mean pixel byte, audio its wave frame count and
    mean PCM byte, video its AVI geometry, frame count and mean frame
    byte; codec-bound or malformed payloads degrade to
    ``decoded=false`` with byte stats over the raw payload. byte_mean
    is an exact integer sum divided once, so the DuckDB twin is
    bit-identical."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for mid, k, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                blob = bytes(p)
                try:
                    content, w, h, ns = decode_media(k, blob)
                    decoded = True
                except Exception:
                    # stub kinds AND malformed payloads degrade to the
                    # decoded=false path instead of failing the stage
                    content, w, h, ns = blob, None, None, None
                    decoded = False
                mean = float(sum(content)) / len(content) if content else 0.0
                rows.append((int(mid), k, len(blob), decoded, w, h, ns, mean))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_bytes", "decoded",
                    "dec_width", "dec_height", "n_samples", "byte_mean",
                ],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=FEATURE_SCHEMA
    )


def media_meta(media: DataFrame) -> DataFrame:
    """Typed-metadata projection (oracle-checkable: no binary in the
    output, so the DuckDB twin reproduces it arithmetically)."""
    return media.select("media_id", "kind", "n_bytes", "width", "height")


AUDIO_FEATURE_SCHEMA = (
    "media_id LONG, n_samples LONG, zero_crossings LONG, peak LONG, "
    "sum_sq LONG, decoded BOOLEAN"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Time-domain audio screening over REAL decoded PCM — the pass an
    audio-curation pipeline runs before any model hears a clip
    (silence / clipping / loudness screens). Production plumbing end
    to end: binary WAV payload in, stdlib decode, zero-copy numpy
    int16 view, vectorized feature math per Arrow batch, narrow map —
    payloads never shuffle, so at 100 TB the cost is decode CPU,
    embarrassingly parallel. Features stay exact-integer where the
    cross-engine gate needs bit equality: ``zero_crossings`` is the
    strict sign-flip count (``s[i]·s[i−1] < 0`` — a zero sample breaks
    the run identically on both engines), ``sum_sq`` an exact int64
    (32768² · 599 samples ≪ 2⁶³), ``peak`` the max absolute sample.
    RMS is deliberately NOT computed here: callers derive it from the
    exact parts with the shared IEEE expression (see
    extensions.q_multimodal_audio) so both engines run identical
    float ops. Malformed payloads degrade to ``decoded=false`` with
    null features rather than failing the stage."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    # The int16-mono view below is only valid for
                    # sampwidth=2 / nchannels=1 PCM; anything else must
                    # take the decoded=false degrade path rather than
                    # yield silently wrong features.
                    with wave.open(io.BytesIO(bytes(p)), "rb") as wv:
                        if wv.getsampwidth() != 2 or wv.getnchannels() != 1:
                            raise ValueError(
                                "audio_features requires 16-bit mono PCM"
                            )
                        n = wv.getnframes()
                        frames = wv.readframes(n)
                    s = np.frombuffer(frames, dtype="<i2").astype(np.int64)
                    rows.append(
                        (
                            int(mid),
                            int(n),
                            int(np.sum(s[1:] * s[:-1] < 0)),
                            int(np.max(np.abs(s))) if len(s) else 0,
                            int(np.dot(s, s)),
                            True,
                        )
                    )
                except Exception:
                    rows.append((int(mid), None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "zero_crossings", "peak",
                    "sum_sq", "decoded",
                ],
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(fn, schema=AUDIO_FEATURE_SCHEMA)
    )


RESIZE_SCHEMA = (
    "media_id LONG, kind STRING, out_width INT, out_height INT, "
    "n_bytes LONG, payload BINARY"
)

FRAME_SCHEMA = "media_id LONG, frame_idx INT, frame_bytes BINARY"


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """REAL image resize over binary payloads — narrow mapInPandas
    pass: decode the PPM, nearest-neighbor resample the H×W×3 pixel
    grid to height×width (numpy index sampling with the corner-based
    ``floor(i·h/H)`` mapping — NOTE: PIL's ``Image.NEAREST`` uses the
    center-based ``floor((i+0.5)·h/H)``, so outputs differ from PIL at
    the pixel level by design), re-encode as PPM. Kind filter is
    pushed to the scan; no shuffle. A malformed payload is SKIPPED
    (not re-emitted, not a stage crash) — the degrade-don't-die
    contract of extract_features/media_embedding, since one corrupt
    crawl image must never fail a 100 TB rewrite job."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, pixels = _decode_ppm(bytes(p))
                except ValueError:
                    continue
                img = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3)
                yi = (np.arange(height) * h) // height
                xi = (np.arange(width) * w) // width
                out = img[yi][:, xi]
                enc = (
                    f"P6\n{width} {height}\n255\n".encode("ascii")
                    + out.tobytes()
                )
                rows.append((int(mid), "image", width, height, len(enc), enc))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "kind", "out_width", "out_height",
                        "n_bytes", "payload",
                    ],
                )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(fn, schema=RESIZE_SCHEMA)
    )


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling: one output row per sampled REAL frame.

    The 1→N multimodal fan-out shape (mapInPandas emitting multiple
    rows per input): each AVI payload is container-parsed
    (:func:`_decode_avi`) and every ``every_n``-th raw-RGB24 frame is
    emitted with its true frame index. A malformed payload is SKIPPED
    (degrade-don't-die, same contract as resize). Swap the parser for
    pyav/ffmpeg keyframe extraction on compressed codecs in
    production; schema, batching, and the explode-like output contract
    stay identical."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    _w, _h, frames = _decode_avi(bytes(p))
                except ValueError:
                    continue
                for i in range(0, len(frames), every_n):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_bytes.append(frames[i])
            if out_ids:
                yield pd.DataFrame(
                    {
                        "media_id": out_ids,
                        "frame_idx": out_idx,
                        "frame_bytes": out_bytes,
                    }
                )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(fn, schema=FRAME_SCHEMA)
    )


MJPEG_STATS_SCHEMA = (
    "media_id LONG, n_frames INT, dec_width INT, dec_height INT, "
    "rgb_bytes LONG"
)


def mjpeg_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """MJPEG exercise, end to end, in ONE narrow mapInPandas pass: for
    every video-kind document, synthesize the digest-cycled RGB frames,
    ENCODE each as a baseline JPEG, wrap them in an ``MJPG`` AVI
    (:func:`_encode_avi`), then DECODE the container back through
    :func:`_decode_avi` (which entropy+DCT-decodes every frame chunk)
    and report what the decoder actually saw: frame count, geometry,
    and total decoded RGB bytes. The outputs are STRUCTURAL — exactly
    derivable from doc_id arithmetic — so a DuckDB twin hash-gates the
    whole encode→container→decode path without needing a SQL JPEG
    decoder (pixel fidelity itself is pinned separately by the ±2
    roundtrip fixtures). A decode failure drops the row, so any
    codec-path regression shows up as a row-count mismatch."""
    import hashlib as _hl

    from kmeans_mapreduce_spark.functions.jpeg import encode_baseline_jpeg

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                if did % 3 != 2:  # video kind only (media_from_documents)
                    continue
                digest = _hl.md5((text or "").encode()).digest()
                raw = _repeat_trunc(digest, VID_FRAME_BYTES)
                jf = encode_baseline_jpeg(VID_W, VID_H, raw)
                payload = _encode_avi(
                    VID_W, VID_H, [jf] * _vid_frames(did), codec=b"MJPG"
                )
                try:
                    w, h, frames = _decode_avi(payload)
                except ValueError:
                    continue  # degrade-don't-die: row vanishes, gate trips
                rows.append(
                    (did, len(frames), w, h, sum(len(fr) for fr in frames))
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "n_frames", "dec_width", "dec_height",
                        "rgb_bytes",
                    ],
                )

    return docs.select("doc_id", "text").mapInPandas(
        fn, schema=MJPEG_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup (r13 verdict task 3 — the one LLM-pipeline
# family with zero image coverage while text near-dup had nine gated
# variants). pHash, integer-exact end to end so the DuckDB twin can
# replay the hash arithmetically from the generator's cycled digests:
#
#   decode PPM → integer luma ((299r + 587g + 114b) // 1000)
#   → 32×32 nearest-neighbor resample (floor(i·dim/32) index grid, the
#     resize_images corner-based mapping)
#   → 2-D DCT-II via a SCALED-INTEGER cosine table (round(cos·2¹⁴) —
#     the float cosines live only in generating the shared constant
#     table, so the transform itself is exact int64: |coef| ≤ 2¹⁴,
#     row pass ≤ 255·2¹⁴·32 < 2²⁷, column pass < 2⁴⁶)
#   → keep the top-left 8×8 block minus DC = 63 coefficients
#   → threshold each against the block median (63 values → the exact
#     middle element, no averaging) → 63-bit hash (fits signed int64).
#
# 63 bits deliberately: band blocking splits into max_hamming+1 = 3
# bands of 21 bits (pigeonhole — see dedup.simhash_pairs), and bit 63
# never sets so the hash stays non-negative in both engines.
# ---------------------------------------------------------------------------

PHASH_SIZE = 32  # resample grid
PHASH_DCT_N = 8  # retained low-frequency block
PHASH_SCALE = 1 << 14  # integer-cosine scaling
PHASH_BITS = PHASH_DCT_N * PHASH_DCT_N - 1  # 63: 8x8 minus DC
PHASH_MAX_HAMMING = 2  # 3 bands of 21 bits
# planted near-dup: a copy of every image with one low pixel bit
# nudged every PHASH_NOISE_EVERY payload bytes — the re-encoded-copy
# perturbation profile, fully digest-replayable in SQL
PHASH_COPY_OFFSET = 1_000_000_000
PHASH_NOISE_EVERY = 499
PHASH_NOISE_XOR = 2

PHASH_SCHEMA = "media_id LONG, width INT, height INT, phash LONG"


def _phash_coef() -> list[list[int]]:
    """The shared scaled-integer DCT-II table: C[u][x] =
    round(cos(π·(2x+1)·u / (2·32)) · 2¹⁴) for u in 0..7, x in 0..31.
    Float cosine appears ONLY here; both the Spark kernel and the
    DuckDB twin embed these exact integers, so libm variance cannot
    split the engines."""
    import math

    return [
        [
            round(
                math.cos(math.pi * (2 * x + 1) * u / (2 * PHASH_SIZE))
                * PHASH_SCALE
            )
            for x in range(PHASH_SIZE)
        ]
        for u in range(PHASH_DCT_N)
    ]


PHASH_COEF = _phash_coef()


def images_with_planted_copies(docs: DataFrame) -> DataFrame:
    """Image media table with one planted near-duplicate per image:
    for every image-kind document (doc_id % 3 == 0) emit the original
    digest-cycled PPM (media_id = doc_id) AND a noisy copy
    (media_id = doc_id + PHASH_COPY_OFFSET) whose payload pixel byte
    ``p`` is XORed with PHASH_NOISE_XOR whenever
    ``p % PHASH_NOISE_EVERY == 0`` — the small-perturbation profile of
    a re-encoded copy, kept arithmetic so the oracle can rebuild both
    variants from md5(text). Narrow mapInPandas synth, no shuffle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                if did % 3 != 0:
                    continue
                digest = hashlib.md5((text or "").encode()).digest()
                w, h = _media_dims(did)
                header = f"P6\n{w} {h}\n255\n".encode("ascii")
                pixels = bytearray(_repeat_trunc(digest, 3 * w * h))
                rows.append((did, "image", bytes(header + pixels)))
                for p in range(0, len(pixels), PHASH_NOISE_EVERY):
                    pixels[p] ^= PHASH_NOISE_XOR
                rows.append(
                    (
                        did + PHASH_COPY_OFFSET,
                        "image",
                        bytes(header + pixels),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["media_id", "kind", "payload"]
                )

    return docs.select("doc_id", "text").mapInPandas(
        fn, schema="media_id LONG, kind STRING, payload BINARY"
    )


def _phash_of_pixels(img) -> int:
    """The shared integer pHash of one decoded H×W×3 uint8 array —
    the module-header pipeline from the luma step down (used by the
    PPM image kernel and the per-frame video kernel so the two can
    never drift)."""
    import numpy as np

    C = np.array(PHASH_COEF, dtype=np.int64)
    h, w = img.shape[0], img.shape[1]
    s = PHASH_SIZE
    yi = (np.arange(s) * h) // s
    xi = (np.arange(s) * w) // s
    g = img[yi][:, xi].astype(np.int64)
    lum = (299 * g[..., 0] + 587 * g[..., 1] + 114 * g[..., 2]) // 1000
    dct = C @ lum @ C.T  # exact int64, |val| < 2^46
    vals = dct.reshape(-1)[1:]  # drop DC -> 63 coefficients
    med = int(np.sort(vals)[(PHASH_BITS - 1) // 2])
    bits = 0
    for i, v in enumerate(vals):
        if int(v) > med:
            bits |= 1 << i
    return bits


def image_phash(media: DataFrame) -> DataFrame:
    """64-ish-bit (63) perceptual hash per image — the module-header
    integer pipeline, one narrow Arrow pass (decode + resample + two
    int64 matmuls per image, no shuffle; at 100 TB this runs inside
    the scan stage and only the (id, int64) sketch ever moves).
    Malformed payloads are skipped (degrade-don't-die, same contract
    as resize_images)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, pixels = _decode_ppm(bytes(p))
                except ValueError:
                    continue
                img = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3)
                rows.append((int(mid), w, h, _phash_of_pixels(img)))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["media_id", "width", "height", "phash"]
                )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(fn, schema=PHASH_SCHEMA)
    )


VIDEO_PHASH_SCHEMA = (
    "media_id LONG, frame_idx INT, n_frames INT, phash LONG"
)


def video_frame_phash(media: DataFrame) -> DataFrame:
    """Per-FRAME perceptual hash over real decoded video: walk the AVI
    container (:func:`_decode_avi` — real RIFF headers, DIB raw-RGB24
    or MJPG entropy+DCT frames), hash every frame with the SAME
    integer pipeline as :func:`image_phash` (shared
    :func:`_phash_of_pixels`, so image and video hashing cannot
    drift). One row per frame — the sketch a video near-dup pass
    bands on (two videos are near-dups when their frame-hash sets
    overlap; the banded join is ``dedup.hamming_banded_pairs`` over
    this table, same as images). Narrow Arrow pass; malformed
    containers are skipped (degrade-don't-die)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, frames = _decode_avi(bytes(p))
                except ValueError:
                    continue
                for i, fr in enumerate(frames):
                    img = np.frombuffer(fr, dtype=np.uint8).reshape(h, w, 3)
                    rows.append(
                        (int(mid), i, len(frames), _phash_of_pixels(img))
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "frame_idx", "n_frames", "phash"],
                )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(fn, schema=VIDEO_PHASH_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Audio fingerprint near-dup — the fourth and last modality (text/image/
# video near-dup all have gated families; this closes audio). Envelope
# dHash: split the PCM clip into AFP_CHUNKS equal windows, integer
# energy per window (Σ|sample|, exact int64), bit i = e_i > e_{i+1} —
# 63 bits from 64 windows. Comparing ADJACENT energies (not a median
# threshold) makes the fingerprint invariant to amplitude scaling
# (any monotone gain preserves every pairwise order), the property a
# re-encoded/level-normalized copy needs. Same banding as pHash:
# 3 pigeonhole bands of 21 bits via dedup.hamming_banded_pairs.
# ---------------------------------------------------------------------------

AFP_CHUNKS = 64
AFP_BITS = AFP_CHUNKS - 1  # 63: fits signed int64, 3 bands of 21
AFP_MAX_HAMMING = 2
AFP_COPY_OFFSET = 1_000_000_000  # audio ids are doc_id%3==1 — disjoint
AFP_NOISE_EVERY = 257  # XOR bit 0 of every 257th PCM byte in the copy
AFP_SCHEMA = "media_id LONG, n_samples LONG, afp LONG"


def _afp_of_samples(sm) -> int:
    """The shared integer envelope fingerprint of one int16 sample
    array (numpy) — used by the kernel and mirrored arithmetically by
    the DuckDB twin."""
    import numpy as np

    n = len(sm)
    e = []
    for c in range(AFP_CHUNKS):
        lo, hi = (c * n) // AFP_CHUNKS, ((c + 1) * n) // AFP_CHUNKS
        e.append(int(np.abs(sm[lo:hi].astype(np.int64)).sum()))
    bits = 0
    for i in range(AFP_BITS):
        if e[i] > e[i + 1]:
            bits |= 1 << i
    return bits


def audio_with_planted_copies(docs: DataFrame) -> DataFrame:
    """Audio media table with one planted near-duplicate per clip:
    the original digest-cycled PCM WAV (media_id = doc_id) AND a noisy
    copy (media_id = doc_id + AFP_COPY_OFFSET) whose PCM byte ``p`` is
    XORed with 1 whenever ``p % AFP_NOISE_EVERY == 0`` — the
    re-encode-noise profile, digest-replayable in SQL."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                if did % 3 != 1:
                    continue
                digest = hashlib.md5((text or "").encode()).digest()
                pcm = bytearray(
                    _repeat_trunc(digest, 2 * _wav_samples(did))
                )

                def wav(frames: bytes) -> bytes:
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as wv:
                        wv.setnchannels(1)
                        wv.setsampwidth(2)
                        wv.setframerate(WAV_RATE)
                        wv.writeframes(frames)
                    return buf.getvalue()

                rows.append((did, "audio", wav(bytes(pcm))))
                for p in range(0, len(pcm), AFP_NOISE_EVERY):
                    pcm[p] ^= 1
                rows.append(
                    (did + AFP_COPY_OFFSET, "audio", wav(bytes(pcm)))
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["media_id", "kind", "payload"]
                )

    return docs.select("doc_id", "text").mapInPandas(
        fn, schema="media_id LONG, kind STRING, payload BINARY"
    )


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """63-bit envelope fingerprint per audio clip — real stdlib WAV
    decode, then the module-header integer pipeline. Narrow Arrow
    pass; malformed payloads skipped (degrade-don't-die)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    n, _rate, frames = _decode_wav(bytes(p))
                except (ValueError, EOFError, wave.Error):
                    continue
                sm = np.frombuffer(frames, dtype="<i2")
                if len(sm) < AFP_CHUNKS:
                    continue  # too short to fingerprint
                rows.append((int(mid), len(sm), _afp_of_samples(sm)))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["media_id", "n_samples", "afp"]
                )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(fn, schema=AFP_SCHEMA)
    )
