"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schema, Arrow-batched mapInPandas, partition
sizing, UDF signatures — is real and tested.  Header-level image metadata
(width / height / channels / format) is decoded for REAL from the container
formats' public byte layouts — PNG IHDR, JPEG SOFn markers, GIF logical
screen descriptor, WAV RIFF chunks, MP4 ISO-BMFF boxes (v0 and v1
mvhd/tkhd, 64-bit largesize) — in pure Python (no image library needed).
Full pixel decoding would need a codec library the container lacks, so
payloads in an unrecognized format raise NotImplementedError unless
``fake=True``, which swaps in a deterministic md5-derived stub (stable
across runs, usable in tests and oracles), or ``on_error="null"``, which
emits a NULL metadata struct plus an error-reason column and keeps going —
the policy a 100 TB crawl decode needs, where corrupt payloads are a
certainty, not an exception.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (spec §11.2.2: 0 gray, 2 truecolor, 3 palette
# (1 index channel), 4 gray+alpha, 6 truecolor+alpha)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG markers that carry frame dimensions: SOF0-SOF15 except DHT (0xC4),
# JPG (0xC8) and DAC (0xCC)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}
# standalone markers with no length field (RST0-7, SOI, EOI, TEM)
_JPEG_STANDALONE = set(range(0xD0, 0xDA)) | {0x01}


def parse_image_header(payload: bytes):
    """(width, height, channels, format) from the header bytes of a PNG,
    JPEG or GIF payload — pure Python over the formats' public byte
    layouts, no image library.  Raises ValueError for anything else.

    PNG: 8-byte magic, then the IHDR chunk (4-byte big-endian width at
    offset 16, height at 20, color type at 25).  JPEG: scan the marker
    stream for the first SOFn segment (big-endian height/width at offsets
    +5/+7 inside it, component count at +9).  GIF: little-endian
    width/height at offsets 6/8 of the logical screen descriptor."""
    if payload.startswith(_PNG_MAGIC):
        if len(payload) < 26 or payload[12:16] != b"IHDR":
            raise ValueError("truncated PNG: no IHDR chunk")
        width = int.from_bytes(payload[16:20], "big")
        height = int.from_bytes(payload[20:24], "big")
        color_type = payload[25]
        if color_type not in _PNG_CHANNELS:
            raise ValueError(f"invalid PNG color type {color_type}")
        return width, height, _PNG_CHANNELS[color_type], "png"
    if payload.startswith(b"\xff\xd8"):
        pos = 2
        while pos + 1 < len(payload):
            if payload[pos] != 0xFF:
                raise ValueError(f"invalid JPEG marker stream at byte {pos}")
            # fill bytes: any number of 0xFF may pad a marker
            while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
                pos += 1
            if pos + 1 >= len(payload):
                # trailing 0xFF fill with no marker byte: ValueError (the
                # on_error='null' contract), never an IndexError that
                # would escape the handler and kill the decode pass
                raise ValueError("truncated JPEG: fill bytes at end of data")
            marker = payload[pos + 1]
            if marker in _JPEG_STANDALONE:
                pos += 2
                continue
            if pos + 4 > len(payload):
                break
            seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            if marker in _JPEG_SOF:
                if pos + 10 > len(payload):
                    raise ValueError("truncated JPEG SOF segment")
                height = int.from_bytes(payload[pos + 5 : pos + 7], "big")
                width = int.from_bytes(payload[pos + 7 : pos + 9], "big")
                channels = payload[pos + 9]
                return width, height, channels, "jpeg"
            if marker == 0xDA:  # SOS: entropy-coded data follows, no SOF seen
                break
            pos += 2 + seg_len
        raise ValueError("JPEG without SOF frame header")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("truncated GIF header")
        width = int.from_bytes(payload[6:8], "little")
        height = int.from_bytes(payload[8:10], "little")
        # palette-indexed RGB
        return width, height, 3, "gif"
    raise ValueError("unrecognized image container format")


def _check_on_error(on_error: str) -> None:
    if on_error not in ("raise", "null"):
        raise ValueError(
            f"on_error must be 'raise' or 'null', got {on_error!r}"
        )


def _fake_decode(payload: bytes):
    """Deterministic fake: metadata derived from the md5 content digest —
    md5 (unlike sha1) exists in every SQL engine, so the whole fake
    pipeline is oracle-checkable end to end."""
    digest = hashlib.md5(payload or b"").digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    channels = 1 + digest[2] % 3
    return width, height, channels, "fake", hashlib.md5(payload or b"").hexdigest()


def decode_image_metadata(
    df: DataFrame,
    binary_col: str,
    out_col: str = "image_meta",
    fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Decode image metadata for every row via Arrow-batched mapInPandas.

    PNG / JPEG / GIF headers are parsed for real (:func:`parse_image_header`
    — pure Python, no image library).  Payloads in any other format raise
    NotImplementedError (full pixel decoding needs a codec library this
    container lacks) unless ``fake=True``, which decodes EVERY payload with
    the deterministic md5-derived stub instead.  The plumbing (schema
    propagation, batch iteration, column passthrough) is identical either
    way.

    ``on_error`` is the corpus-scale survival knob (mirrors
    PythonUdfTransform's exception policy): the default ``"raise"`` is
    fail-fast; ``"null"`` emits a NULL metadata struct plus the failure
    reason in an extra ``{out_col}_error`` string column and keeps going —
    at 100 TB a real crawl always contains truncated/corrupt payloads and
    one of them must not abort the whole decode pass.
    """
    _check_on_error(on_error)
    fields = list(df.schema.fields) + [T.StructField(out_col, IMAGE_META_SCHEMA)]
    if on_error == "null":
        fields.append(T.StructField(out_col + "_error", T.StringType()))
    out_schema = T.StructType(fields)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            metas = []
            errors = []
            for payload in batch[binary_col]:
                raw = bytes(payload) if payload is not None else b""
                if fake:
                    w, h, c, fmt, digest = _fake_decode(raw)
                else:
                    try:
                        w, h, c, fmt = parse_image_header(raw)
                    except ValueError as e:
                        if on_error == "null":
                            metas.append(None)
                            errors.append(str(e))
                            continue
                        raise NotImplementedError(
                            f"cannot decode payload ({e}); only PNG/JPEG/GIF "
                            "header metadata is supported without an image "
                            "library — re-run with fake=True for the "
                            "deterministic stub, or on_error='null' to skip "
                            "undecodable payloads"
                        ) from e
                    digest = hashlib.md5(raw).hexdigest()
                metas.append(
                    {
                        "width": w,
                        "height": h,
                        "channels": c,
                        "format": fmt,
                        "content_md5": digest,
                    }
                )
                errors.append(None)
            batch = batch.copy()
            batch[out_col] = metas
            if on_error == "null":
                batch[out_col + "_error"] = errors
            yield batch

    return df.mapInPandas(decode_batches, schema=out_schema)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def parse_audio_header(payload: bytes):
    """(n_channels, sample_rate, bits_per_sample, duration_ms, format) from
    a WAV (RIFF) header — pure Python over the public byte layout, no audio
    library.  Raises ValueError for anything else.

    RIFF container: 'RIFF' + size + 'WAVE' at offset 0/8, then a chunk
    stream of (fourcc, little-endian size, payload).  The 'fmt ' chunk
    carries channels/rate/bits; the 'data' chunk size over the byte rate
    gives the duration."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("unrecognized audio container format")
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if fourcc == b"fmt ":
            if pos + 24 > len(payload):
                raise ValueError("truncated WAV fmt chunk")
            n_channels = int.from_bytes(payload[pos + 10 : pos + 12], "little")
            sample_rate = int.from_bytes(payload[pos + 12 : pos + 16], "little")
            byte_rate = int.from_bytes(payload[pos + 16 : pos + 20], "little")
            bits = int.from_bytes(payload[pos + 22 : pos + 24], "little")
            fmt = (n_channels, sample_rate, byte_rate, bits)
        elif fourcc == b"data":
            data_size = size
        # chunk payloads are word-aligned (odd sizes padded by one byte)
        pos += 8 + size + (size % 2)
    if fmt is None:
        raise ValueError("WAV without fmt chunk")
    n_channels, sample_rate, byte_rate, bits = fmt
    if byte_rate <= 0:
        raise ValueError("invalid WAV byte rate")
    duration_ms = (
        (data_size * 1000) // byte_rate if data_size is not None else 0
    )
    return n_channels, sample_rate, bits, duration_ms, "wav"


def _fake_audio_decode(payload: bytes):
    """Deterministic md5-derived stub (mirrors _fake_decode for images)."""
    digest = hashlib.md5(payload or b"").digest()
    n_channels = 1 + digest[0] % 2
    sample_rate = (8000, 16000, 44100, 48000)[digest[1] % 4]
    bits = (8, 16, 24, 32)[digest[2] % 4]
    duration_ms = 100 + digest[3] * 37
    return (
        n_channels, sample_rate, bits, duration_ms, "fake",
        hashlib.md5(payload or b"").hexdigest(),
    )


def decode_audio_metadata(
    df: DataFrame,
    binary_col: str,
    out_col: str = "audio_meta",
    fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Decode audio metadata for every row via Arrow-batched mapInPandas.

    WAV (RIFF) headers are parsed for real (:func:`parse_audio_header`);
    other formats raise NotImplementedError unless ``fake=True`` (the
    deterministic md5-derived stub, applied to every payload).
    ``on_error="null"`` emits a NULL metadata struct plus the failure
    reason in ``{out_col}_error`` instead of aborting (see
    :func:`decode_image_metadata`)."""
    _check_on_error(on_error)
    fields = list(df.schema.fields) + [T.StructField(out_col, AUDIO_META_SCHEMA)]
    if on_error == "null":
        fields.append(T.StructField(out_col + "_error", T.StringType()))
    out_schema = T.StructType(fields)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            metas = []
            errors = []
            for payload in batch[binary_col]:
                raw = bytes(payload) if payload is not None else b""
                if fake:
                    ch, sr, bits, dur, fmt, digest = _fake_audio_decode(raw)
                else:
                    try:
                        ch, sr, bits, dur, fmt = parse_audio_header(raw)
                    except ValueError as e:
                        if on_error == "null":
                            metas.append(None)
                            errors.append(str(e))
                            continue
                        raise NotImplementedError(
                            f"cannot decode payload ({e}); only WAV header "
                            "metadata is supported without an audio library "
                            "— re-run with fake=True for the deterministic "
                            "stub, or on_error='null' to skip undecodable "
                            "payloads"
                        ) from e
                    digest = hashlib.md5(raw).hexdigest()
                metas.append(
                    {
                        "n_channels": ch,
                        "sample_rate": sr,
                        "bits_per_sample": bits,
                        "duration_ms": dur,
                        "format": fmt,
                        "content_md5": digest,
                    }
                )
                errors.append(None)
            batch = batch.copy()
            batch[out_col] = metas
            if on_error == "null":
                batch[out_col + "_error"] = errors
            yield batch

    return df.mapInPandas(decode_batches, schema=out_schema)


RESIZE_META_SCHEMA = T.StructType(
    [
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("dst_width", T.IntegerType()),
        T.StructField("dst_height", T.IntegerType()),
        T.StructField("scale", T.DoubleType()),
        T.StructField("format", T.StringType()),
    ]
)


def resize_plan(
    df: DataFrame,
    binary_col: str,
    max_width: int,
    max_height: int,
    out_col: str = "resize_meta",
    fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Aspect-preserving resize geometry for every image payload: parse the
    REAL header (PNG/JPEG/GIF, :func:`parse_image_header`), fit the source
    box into (max_width, max_height) without upscaling, and emit
    (src/dst dimensions, scale, format).  The geometry — the part a resize
    JOB plans with (output sizing, storage estimates, batch shapes) — is
    fully real; actual pixel resampling needs a codec library this
    container lacks, so only the metadata is produced.  ``fake=True`` runs
    the md5-derived stub decoder instead for undecodable payloads.
    ``on_error="null"`` emits a NULL geometry struct plus the failure
    reason in ``{out_col}_error`` instead of aborting (see
    :func:`decode_image_metadata`)."""
    _check_on_error(on_error)
    fields = list(df.schema.fields) + [T.StructField(out_col, RESIZE_META_SCHEMA)]
    if on_error == "null":
        fields.append(T.StructField(out_col + "_error", T.StringType()))
    out_schema = T.StructType(fields)

    def plan_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            metas = []
            errors = []
            for payload in batch[binary_col]:
                raw = bytes(payload) if payload is not None else b""
                if fake:
                    w, h, _, fmt, _ = _fake_decode(raw)
                else:
                    try:
                        w, h, _, fmt = parse_image_header(raw)
                    except ValueError as e:
                        if on_error == "null":
                            metas.append(None)
                            errors.append(str(e))
                            continue
                        raise NotImplementedError(
                            f"cannot decode payload ({e}); re-run with "
                            "fake=True for the deterministic stub, or "
                            "on_error='null' to skip undecodable payloads"
                        ) from e
                # fit into the box, never upscale; round half up like the
                # reference geometry every image tool uses.  Extreme
                # aspect ratios can round a dimension to 0 (1x10000 into a
                # (100, 1) box) — clamp to 1px, the convention of every
                # resize library, so no downstream job gets a zero-sized
                # plan
                scale = min(max_width / w, max_height / h, 1.0) if w and h else 1.0
                metas.append(
                    {
                        "src_width": w,
                        "src_height": h,
                        "dst_width": max(1, int(w * scale + 0.5)),
                        "dst_height": max(1, int(h * scale + 0.5)),
                        "scale": round(scale, 6),
                        "format": fmt,
                    }
                )
                errors.append(None)
            batch = batch.copy()
            batch[out_col] = metas
            if on_error == "null":
                batch[out_col + "_error"] = errors
            yield batch

    return df.mapInPandas(plan_batches, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    binary_col: str,
    every_n_ms: int = 1000,
    duration_ms_col: str = None,
) -> DataFrame:
    """Plan-only helper for video frame sampling: emits one row per sampled
    frame offset.  Pass ``duration_ms_col`` to drive the grid from a REAL
    decoded duration (e.g. ``video_meta.duration_ms`` from
    :func:`decode_video_metadata`); without it the duration derives
    deterministically from the payload's md5 (portable across engines, so
    even the stub grid is oracle-checkable)."""
    from pyspark.sql import functions as F

    duration_ms = (
        F.col(duration_ms_col).cast("bigint")
        if duration_ms_col
        else (
            F.expr(
                f"CAST(conv(substr(md5(`{binary_col}`), 1, 8), 16, 10) AS BIGINT)"
            )
            % F.lit(10_000)
            + F.lit(1000)
        )
    )
    return (
        df.withColumn("__duration_ms__", duration_ms)
        .withColumn(
            "frame_offset_ms",
            F.explode(
                F.sequence(F.lit(0), F.col("__duration_ms__"), F.lit(every_n_ms))
            ),
        )
        .drop("__duration_ms__")
    )


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("timescale", T.IntegerType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def _walk_boxes(
    payload: bytes, start: int, end: int, tolerate_truncated_tail: bool = False
):
    """Yield (fourcc, body_start, body_end) for each ISO BMFF box in
    payload[start:end] (4-byte big-endian size incl. header + 4-byte type;
    size 0 = to end of enclosing box; size 1 = an 8-byte largesize follows
    the type — the >4 GiB-file encoding modern encoders emit).

    ``tolerate_truncated_tail`` is for the TOP-level walk over a
    header-prefix payload (the natural thing to store for header-only
    metadata at crawl scale — a faststart MP4's ftyp + moov followed by a
    cut-off mdat): a final OPAQUE MEDIA box (mdat/free/skip/wide) whose
    declared size runs past the payload ends the walk instead of raising,
    like the WAV parser's tolerance of a truncated trailing data chunk.
    A truncated STRUCTURAL box (moov etc.) still raises — its metadata is
    genuinely missing — and inner walks always raise: a child overflowing
    its ENCLOSING box is structurally invalid."""
    opaque = (b"mdat", b"free", b"skip", b"wide")
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(payload[pos : pos + 4], "big")
        fourcc = payload[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                if tolerate_truncated_tail and fourcc in opaque:
                    return
                raise ValueError(f"truncated MP4 largesize box at byte {pos}")
            size = int.from_bytes(payload[pos + 8 : pos + 16], "big")
            header = 16
        elif size == 0:
            size = end - pos
        if size < header:
            raise ValueError(f"invalid MP4 box size {size} at byte {pos}")
        if pos + size > end:
            if tolerate_truncated_tail and fourcc in opaque:
                return
            raise ValueError(f"invalid MP4 box size {size} at byte {pos}")
        yield fourcc, pos + header, pos + size
        pos += size


def parse_video_header(payload: bytes):
    """(width, height, duration_ms, timescale, n_tracks, format) from an
    MP4 / ISO base-media (ISO/IEC 14496-12) header — pure Python over the
    public box layout, no video library.  Raises ValueError otherwise.

    Box walk: top-level 'ftyp' identifies the container; 'moov' holds
    'mvhd' (timescale/duration) and one 'trak' per track whose 'tkhd'
    carries 16.16 fixed-point width/height.  Version-0 boxes use 32-bit
    creation/modification/duration fields (mvhd timescale at body offset
    +12, duration at +16; tkhd width/height at +76/+80); version-1 boxes
    widen those times to 64 bits, shifting the offsets (mvhd timescale
    +20, 64-bit duration +24; tkhd width/height at +88/+92) — modern
    encoders commonly emit v1, so both are handled.  64-bit largesize
    boxes (size==1) are handled in the walker.  The reported width/height
    come from the first track with nonzero dimensions (the video track;
    audio tracks store 0x0)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("unrecognized video container format")
    width = height = 0
    duration_ms = 0
    timescale = 0
    n_tracks = 0
    saw_moov = False
    saw_mvhd = False
    for fourcc, b0, b1 in _walk_boxes(
        payload, 0, len(payload), tolerate_truncated_tail=True
    ):
        if fourcc != b"moov":
            continue
        saw_moov = True
        for inner, i0, i1 in _walk_boxes(payload, b0, b1):
            if inner == b"mvhd":
                saw_mvhd = True
                if i0 >= i1:
                    raise ValueError("truncated mvhd box")
                version = payload[i0]
                if version == 0:
                    ts_off, dur_off, dur_len = 12, 16, 4
                elif version == 1:
                    # 64-bit creation/modification push timescale to +20,
                    # and the duration itself widens to 64 bits at +24
                    ts_off, dur_off, dur_len = 20, 24, 8
                else:
                    raise ValueError(f"unsupported mvhd version {version}")
                if i0 + dur_off + dur_len > i1:
                    raise ValueError("truncated mvhd box")
                timescale = int.from_bytes(
                    payload[i0 + ts_off : i0 + ts_off + 4], "big"
                )
                duration = int.from_bytes(
                    payload[i0 + dur_off : i0 + dur_off + dur_len], "big"
                )
                if timescale <= 0:
                    raise ValueError("invalid mvhd timescale")
                duration_ms = duration * 1000 // timescale
            elif inner == b"trak":
                n_tracks += 1
                for tb, t0, t1 in _walk_boxes(payload, i0, i1):
                    if tb != b"tkhd":
                        continue
                    if t0 >= t1:
                        raise ValueError("truncated tkhd box")
                    version = payload[t0]
                    if version == 0:
                        wh_off = 76
                    elif version == 1:
                        # 64-bit creation/modification/duration add 12 bytes
                        wh_off = 88
                    else:
                        raise ValueError(f"unsupported tkhd version {version}")
                    if t0 + wh_off + 8 > t1:
                        raise ValueError("truncated tkhd box")
                    # 16.16 fixed point; integer part only
                    w = int.from_bytes(
                        payload[t0 + wh_off : t0 + wh_off + 4], "big"
                    ) >> 16
                    h = int.from_bytes(
                        payload[t0 + wh_off + 4 : t0 + wh_off + 8], "big"
                    ) >> 16
                    if width == 0 and w > 0 and h > 0:
                        width, height = w, h
    if not saw_moov:
        raise ValueError("MP4 without moov box")
    if not saw_mvhd:
        # timescale 0 is illegal per ISO 14496-12; without mvhd the
        # duration would silently report as 0 instead of erroring
        raise ValueError("MP4 moov without mvhd box")
    return width, height, duration_ms, timescale, n_tracks, "mp4"


def _fake_video_decode(payload: bytes):
    """Deterministic md5-derived stub (mirrors the image/audio fakes)."""
    digest = hashlib.md5(payload or b"").digest()
    width = 160 + digest[0] % 64
    height = 90 + digest[1] % 64
    duration_ms = 1000 + digest[2] * 73
    timescale = (600, 1000, 90000)[digest[3] % 3]
    return width, height, duration_ms, timescale, 1, "fake", hashlib.md5(
        payload or b""
    ).hexdigest()


def decode_video_metadata(
    df: DataFrame,
    binary_col: str,
    out_col: str = "video_meta",
    fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Decode video metadata for every row via Arrow-batched mapInPandas.

    MP4 / ISO base-media headers are parsed for real
    (:func:`parse_video_header` — version-0 AND version-1 mvhd/tkhd,
    64-bit largesize boxes); other formats raise NotImplementedError
    unless ``fake=True`` (deterministic md5-derived stub).
    ``on_error="null"`` emits a NULL metadata struct plus the failure
    reason in ``{out_col}_error`` instead of aborting (see
    :func:`decode_image_metadata`)."""
    _check_on_error(on_error)
    fields = list(df.schema.fields) + [T.StructField(out_col, VIDEO_META_SCHEMA)]
    if on_error == "null":
        fields.append(T.StructField(out_col + "_error", T.StringType()))
    out_schema = T.StructType(fields)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            metas = []
            errors = []
            for payload in batch[binary_col]:
                raw = bytes(payload) if payload is not None else b""
                if fake:
                    w, h, dur, ts, nt, fmt, digest = _fake_video_decode(raw)
                else:
                    try:
                        w, h, dur, ts, nt, fmt = parse_video_header(raw)
                    except ValueError as e:
                        if on_error == "null":
                            metas.append(None)
                            errors.append(str(e))
                            continue
                        raise NotImplementedError(
                            f"cannot decode payload ({e}); only MP4/ISO-BMFF "
                            "header metadata is supported without a video "
                            "library — re-run with fake=True for the "
                            "deterministic stub, or on_error='null' to skip "
                            "undecodable payloads"
                        ) from e
                    digest = hashlib.md5(raw).hexdigest()
                metas.append(
                    {
                        "width": w,
                        "height": h,
                        "duration_ms": dur,
                        "timescale": ts,
                        "n_tracks": nt,
                        "format": fmt,
                        "content_md5": digest,
                    }
                )
                errors.append(None)
            batch = batch.copy()
            batch[out_col] = metas
            if on_error == "null":
                batch[out_col + "_error"] = errors
            yield batch

    return df.mapInPandas(decode_batches, schema=out_schema)
