import pytest
from pyspark.sql import functions as F

from anything2rdf_spark.operators import multimodal as MM


def test_synth_media_and_feature_extraction(spark):
    media = MM.synth_media(spark, n=32)
    feats = MM.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 32
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["n_bytes"] == 32 for r in rows)  # sha256 payload = 32 bytes
    # deterministic across partitioning
    feats2 = MM.extract_features(media.repartition(8))
    a = {(r["media_id"], tuple(r["feature"])) for r in rows}
    b = {(r["media_id"], tuple(r["feature"])) for r in feats2.collect()}
    assert a == b


def test_real_decode_is_stubbed(spark):
    with pytest.raises(NotImplementedError):
        MM.real_decode_stub(b"bytes", "image")


def test_frame_sample_plan(spark):
    media = MM.synth_media(spark, n=64)
    plan = MM.frame_sample_plan(media, every_ms=500)
    vids = media.filter(F.col("kind") == "video")
    assert plan.select("media_id").distinct().count() == vids.count()
    # every planned ts within duration
    joined = plan.join(vids.select("media_id", F.col("meta.duration_ms").alias("d")), "media_id")
    assert joined.filter(F.col("frame_ts_ms") > F.col("d")).count() == 0


def _make_wav(freq=440.0, dur_s=0.05, rate=8000, nch=1) -> bytes:
    import io
    import math
    import struct
    import wave

    n = int(rate * dur_s)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack(
                "<" + "h" * nch,
                *([int(20000 * math.sin(2 * math.pi * freq * i / rate))] * nch),
            )
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def _make_png(px, filters) -> bytes:
    """Minimal PNG encoder for the tests: ``px`` is an (h, w, nch) uint8
    array, ``filters`` one PNG filter type per row (0..4) — encoding with
    every filter type exercises every unfilter path in decode_png."""
    import struct
    import zlib

    import numpy as np

    h, w, nch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raw = bytearray()
    flat = px.reshape(h, w * nch).astype(np.int32)
    for y, ft in zip(range(h), filters):
        row = flat[y]
        prior = flat[y - 1] if y > 0 else np.zeros_like(row)
        raw.append(ft)
        for x in range(w * nch):
            a = int(row[x - nch]) if x >= nch else 0
            b = int(prior[x])
            c = int(prior[x - nch]) if (y > 0 and x >= nch) else 0
            v = int(row[x])
            if ft == 0:
                f = v
            elif ft == 1:
                f = v - a
            elif ft == 2:
                f = v - b
            elif ft == 3:
                f = v - (a + b) // 2
            else:
                f = v - paeth(a, b, c)
            raw.append(f & 0xFF)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_roundtrip_all_filters():
    """Every PNG filter path (None/Sub/Up/Average/Paeth) must reconstruct
    the original pixels: encode a deterministic RGB gradient with one
    filter type per row, decode, compare stats to numpy ground truth."""
    import numpy as np

    h, w, nch = 5, 7, 3
    px = (
        (np.arange(h * w * nch, dtype=np.int64) * 37 + 11) % 256
    ).astype(np.uint8).reshape(h, w, nch)
    payload = _make_png(px, filters=[0, 1, 2, 3, 4])
    m = MM.decode_png(payload)
    assert (m["width"], m["height"], m["channels"]) == (w, h, nch)
    assert abs(m["mean"] - float(px.mean())) < 1e-9
    assert abs(m["std"] - float(px.std())) < 1e-9
    assert abs(m["mean_first_channel"] - float(px[:, :, 0].mean())) < 1e-9


def test_decode_wav_real_signal():
    payload = _make_wav(freq=440.0, dur_s=0.05, rate=8000, nch=2)
    m = MM.decode_wav(payload)
    assert m["sample_rate"] == 8000
    assert m["channels"] == 2
    assert m["duration_ms"] == 50
    # amplitude 20000/32768 ≈ 0.610; a sine's rms ≈ peak/sqrt(2) ≈ 0.432
    assert 0.40 < m["rms"] < 0.46 and 0.60 < m["peak"] < 0.62
    # 440 Hz at 8 kHz → 2*440/8000 ≈ 0.11 zero crossings per sample
    assert 0.08 < m["zcr"] < 0.14


def test_stdlib_decoder_through_spark(spark):
    """The real stdlib codecs run inside the Arrow-batched mapInPandas
    plumbing: PNG and WAV payloads decode on executors with no external
    libraries; unknown containers raise the documented injection error."""
    import numpy as np

    px = (np.arange(4 * 4 * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(4, 4, 3)
    png, wav = _make_png(px, filters=[0, 1, 2, 4]), _make_wav()
    rows = [("img1", "image", "image/png", png, None),
            ("aud1", "audio", "audio/wav", wav, None)]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           MM.extract_features(df, decoder=MM.stdlib_decoder).collect()}
    img, aud = got["img1"], got["aud1"]
    assert img["n_bytes"] == len(png) and aud["n_bytes"] == len(wav)
    assert img["feature"][0] == 1.0 and aud["feature"][0] == 2.0
    exp_img = MM.stdlib_decoder(png, "image")
    assert np.allclose(img["feature"], np.array(exp_img, dtype=np.float32))
    with pytest.raises(Exception, match="Pillow|decoder"):
        bad = spark.createDataFrame(
            [("x", "video", "video/mp4", b"\x00\x01\x02\x03mp4x", None)],
            MM.MEDIA_SCHEMA,
        )
        MM.extract_features(bad, decoder=MM.stdlib_decoder).collect()


def test_corrupt_payload_quarantined_not_crash(spark):
    """A truncated/corrupt PNG or WAV raises inside the stdlib decoder;
    extract_features quarantines it to an empty feature vector instead of
    failing the job (ADVICE r4), keeping n_bytes for triage. strict=True
    restores fail-fast; missing-codec NotImplementedError still propagates
    (tested above)."""
    import numpy as np

    px = (np.arange(4 * 4 * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(4, 4, 3)
    good_png = _make_png(px, filters=[0, 0, 0, 0])
    corrupt_png = good_png[:40] + b"\x00" * 8 + good_png[48:]  # mangle IDAT zlib
    truncated_wav = _make_wav()[:16]
    rows = [("ok", "image", "image/png", good_png, None),
            ("bad1", "image", "image/png", corrupt_png, None),
            ("bad2", "audio", "audio/wav", truncated_wav, None)]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           MM.extract_features(df, decoder=MM.stdlib_decoder).collect()}
    assert len(got["ok"]["feature"]) == 8
    assert list(got["bad1"]["feature"]) == [] and list(got["bad2"]["feature"]) == []
    assert got["bad1"]["n_bytes"] == len(corrupt_png)
    with pytest.raises(Exception):
        MM.extract_features(df, decoder=MM.stdlib_decoder, strict=True).collect()
