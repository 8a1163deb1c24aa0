"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery (schemas, batch iteration, partition sizing, UDF
signatures) is real and tested. The codec layer has two tiers:

* **Real stdlib decoders** (no external libraries): ``decode_wav`` (RIFF/
  WAVE PCM via the ``wave`` module → duration/rate/RMS/peak/zero-crossings)
  and ``decode_png`` (chunk parse + ``zlib`` inflate + full five-filter
  unfilter for 8-bit gray/RGB/RGBA → dimensions/intensity stats), dispatched
  by magic bytes in ``stdlib_decoder``.
* **Injection point** for everything else (JPEG/MP4/...): the container has
  no Pillow/torchaudio/pyav, so ``real_decode_stub`` raises and a deployment
  passes its library decoder via ``extract_features(decoder=...)``.

Pattern: ``mapInPandas`` with an ``Iterator[pd.DataFrame]`` so one Arrow
batch of binary payloads is decoded at a time (bounded executor memory —
crucial when payloads are MBs each; pair with a small
``spark.sql.files.maxPartitionBytes`` / ``maxRecordsPerBatch`` at scale).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes int, feature array<float>"


def real_decode_stub(payload: bytes, kind: str):
    """The library-backed decode step for formats beyond PNG/WAV — NOT
    available in this container (no Pillow/torchaudio/pyav)."""
    raise NotImplementedError(
        "JPEG/MP4/... decode requires Pillow/torchaudio/pyav; inject a "
        "decoder via extract_features(decoder=...); PNG and WAV decode "
        "for real via stdlib_decoder"
    )


# --- real stdlib codecs ----------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_wav(payload: bytes) -> dict:
    """Real WAV (RIFF PCM) decode via the stdlib ``wave`` module: returns
    sample_rate, channels, duration_ms, and signal stats (rms, peak,
    zero-crossing rate) over the channel-averaged waveform."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw, fr, nf = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes(),
        )
        raw = w.readframes(nf)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"sample width {sw} not supported (PCM 8/16-bit only)")
    if nch > 1 and x.size:
        x = x[: (x.size // nch) * nch].reshape(-1, nch).mean(axis=1)
    dur_ms = int(round(nf * 1000.0 / fr)) if fr else 0
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    peak = float(np.max(np.abs(x))) if x.size else 0.0
    zcr = (
        float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if x.size > 1 else 0.0
    )
    return {
        "sample_rate": fr, "channels": nch, "duration_ms": dur_ms,
        "rms": rms, "peak": peak, "zcr": zcr,
    }


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytes:
    """Reverse the five PNG per-row filters (None/Sub/Up/Average/Paeth).
    Sequential by spec (each byte depends on the already-reconstructed
    left/up neighbors); plain loops are fine for feature extraction — a
    throughput deployment swaps in Pillow via the decoder hook."""
    out = bytearray(h * stride)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row = y * stride
        prev = row - stride
        for x in range(stride):
            fx = raw[pos + x]
            a = out[row + x - bpp] if x >= bpp else 0
            b = out[prev + x] if y > 0 else 0
            c = out[prev + x - bpp] if (y > 0 and x >= bpp) else 0
            if ft == 0:
                v = fx
            elif ft == 1:
                v = fx + a
            elif ft == 2:
                v = fx + b
            elif ft == 3:
                v = fx + (a + b) // 2
            elif ft == 4:
                v = fx + _paeth(a, b, c)
            else:
                raise ValueError(f"bad PNG filter type {ft}")
            out[row + x] = v & 0xFF
        pos += stride
    return bytes(out)


def decode_png(payload: bytes) -> dict:
    """Real PNG decode via stdlib ``zlib``: chunk walk, IDAT inflate, full
    five-filter unfilter. Supports 8-bit greyscale / grey+alpha / RGB /
    RGBA, non-interlaced (palette and 16-bit raise — inject a library
    decoder for those). Returns dimensions, channel count, and intensity
    stats."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, hdr = 8, b"", None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = hdr
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"PNG depth={depth} ctype={ctype} interlace={interlace}: "
            "only 8-bit non-interlaced gray/gray+a/RGB/RGBA supported"
        )
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    stride = w * nch
    px = np.frombuffer(
        _png_unfilter(zlib.decompress(idat), h, stride, nch), dtype=np.uint8
    ).reshape(h, w, nch)
    return {
        "width": w, "height": h, "channels": nch,
        "mean": float(px.mean()), "std": float(px.std()),
        "mean_first_channel": float(px[:, :, 0].mean()),
        "mean_last_channel": float(px[:, :, -1].mean()),
    }


def stdlib_decoder(payload: bytes, kind: str) -> list[float]:
    """Real decode dispatched on magic bytes — PNG and WAV need no external
    libraries. Emits the FEATURE_SCHEMA 8-float vector:

    * image: [1, w/4096, h/4096, mean/255, std/255, first_ch/255, last_ch/255, nch/4]
    * audio: [2, rate/48000, dur_ms/60000, rms, peak, zcr, nch/2, 0]

    Anything else raises — inject a library decoder for JPEG/MP4/...
    """
    if payload is None:
        return []
    if payload[:8] == _PNG_MAGIC:
        m = decode_png(payload)
        return [
            1.0, min(m["width"], 4096) / 4096.0, min(m["height"], 4096) / 4096.0,
            m["mean"] / 255.0, m["std"] / 255.0,
            m["mean_first_channel"] / 255.0, m["mean_last_channel"] / 255.0,
            m["channels"] / 4.0,
        ]
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        m = decode_wav(payload)
        return [
            2.0, min(m["sample_rate"], 48000) / 48000.0,
            min(m["duration_ms"], 60000) / 60000.0,
            m["rms"], m["peak"], m["zcr"], m["channels"] / 2.0, 0.0,
        ]
    return real_decode_stub(payload, kind)


def fake_decoder(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in decoder: 8 floats derived from the payload
    digest — lets the full Spark plumbing be exercised and asserted."""
    if payload is None:
        return []
    d = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in d[:8]]


def portable_decoder(payload: bytes, kind: str) -> list[float]:
    """fake_decoder's engine-portable twin: hashes the payload's lowercase
    hex encoding (a VARCHAR any SQL engine can sha256) instead of the raw
    bytes — used by the driver's oracle-checked query so DuckDB can
    recompute the exact feature vector."""
    if payload is None:
        return []
    d = hashlib.sha256(payload.hex().encode("ascii")).digest()
    return [b / 255.0 for b in d[:8]]


def extract_features(df: DataFrame, decoder=fake_decoder, strict: bool = False) -> DataFrame:
    """Binary payloads → fixed-size feature vectors via Arrow-batched
    ``mapInPandas``. Column pruning matters: only (media_id, kind, payload)
    are read from the scan.

    Quarantine-not-crash (same convention as the MARC resync and sink
    null-line drop): a corrupt/truncated payload that makes the decoder
    raise (zlib error, struct.unpack, IndexError, ...) yields an EMPTY
    feature vector instead of failing the whole job — at corpus scale one
    bad blob must not kill a 100 TB pass. ``strict=True`` restores
    fail-fast. ``NotImplementedError`` always propagates: it means a codec
    is missing (configuration error), not that one payload is bad."""

    def decode_one(p, k):
        if p is None:
            return []
        try:
            return decoder(p, k)
        except NotImplementedError:
            raise
        except Exception:
            if strict:
                raise
            return []

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_one(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp from
    metadata only (no decode) — the scheduling half of frame extraction,
    fully native."""
    return (
        df.filter((F.col("kind") == "video") & F.col("meta.duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = sha-derived bytes)."""
    base = spark.range(n).select(
        F.format_string("m%05d", F.col("id")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), 3) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256).alias("hex"),
        F.col("id"),
    )
    return base.select(
        "media_id",
        "kind",
        F.when(F.col("kind") == "image", "image/png")
        .when(F.col("kind") == "audio", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.to_binary("hex", F.lit("hex")).alias("payload"),
        F.struct(
            F.when(F.col("kind") == "image", (F.pmod(F.col("id"), 512) + 32).cast("int")).alias("width"),
            F.when(F.col("kind") == "image", (F.pmod(F.col("id"), 256) + 32).cast("int")).alias("height"),
            F.when(F.col("kind") != "image", (F.pmod(F.col("id"), 5000) + 1000).cast("int")).alias("duration_ms"),
            F.when(F.col("kind") == "audio", F.lit(16000)).alias("sample_rate"),
        ).alias("meta"),
    )
