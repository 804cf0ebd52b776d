"""Golden tests for Debezium type encodings (the reference's
kafka2_test.go / kafka3_test.go analogues, values derived from the
documented encodings — not copied) and multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dtle_spark.functions import multimodal as mm
from dtle_spark.sinks import debezium as dz


def test_decimal_base64_bytes(spark):
    """DECIMAL -> base64(big-endian two's-complement unscaled bytes)
    (kafka2.go:339-381 semantics). 123.45 scale 2 -> 12345 -> 0x3039."""
    df = spark.createDataFrame(
        [Row(u=12345), Row(u=-1), Row(u=0), Row(u=None), Row(u=255)]
    )
    out = [r["b"] for r in df.select(dz.encode_decimal_bytes("u").alias("b")).collect()]
    # 12345 = 0x3039 -> bytes 30 39 -> "MDk="; -1 -> 0xff -> "/w==";
    # 0 -> 0x00 -> "AA=="; 255 needs a sign byte -> 0x00ff -> "AP8="
    assert out == ["MDk=", "/w==", "AA==", None, "AP8="]


def test_time_micros_signed(spark):
    """MySQL TIME is a signed interval; -01:02:03.000004 must encode as
    negative total micros (kafka2.go:397-454)."""
    df = spark.createDataFrame([Row(h=1, m=2, s=3, us=4, neg=True), Row(h=1, m=2, s=3, us=4, neg=False)])
    out = [
        r["t"]
        for r in df.select(
            dz.encode_time_micros(F.col("h"), F.col("m"), F.col("s"), F.col("us"), F.col("neg")).alias("t")
        ).collect()
    ]
    expect = (1 * 3600 + 2 * 60 + 3) * 1_000_000 + 4
    assert out == [-expect, expect]


def test_date_and_datetime_encodings(spark):
    df = spark.createDataFrame([Row(d="1970-01-02", ts="1970-01-01 00:00:01.5")])
    out = df.select(
        dz.encode_date_epoch_days(F.col("d").cast("date")).alias("days"),
        dz.encode_datetime_millis(F.col("ts").cast("timestamp")).alias("ms"),
    ).collect()[0]
    assert out["days"] == 1 and out["ms"] == 1500


class TestReferenceGoldenVectors:
    """Bit-for-bit parity with the reference's OWN kafka test vectors
    (kafka2_test.go:8-22 decimal/time, kafka3_test.go:5-98 binary/bit)."""

    def test_decimal_zero_is_single_zero_byte(self, spark):
        # DecimalValueFromStringMysql("0") == base64([0x00]) == "AA=="
        df = spark.createDataFrame([Row(u=0)])
        out = df.select(dz.encode_decimal_bytes(F.col("u")).alias("b")).collect()
        assert out[0]["b"] == "AA=="

    def test_time_values(self, spark):
        # TimeValue("01:02:03") and TimeValue("-800:02:03.100000")
        df = spark.createDataFrame([
            Row(h=1, m=2, s=3, us=0, neg=False),
            Row(h=800, m=2, s=3, us=100000, neg=True),
        ])
        out = [r["t"] for r in df.select(
            dz.encode_time_micros(F.col("h"), F.col("m"), F.col("s"),
                                  F.col("us"), F.col("neg")).alias("t")
        ).collect()]
        assert out[0] == (1 * 3600 + 2 * 60 + 3) * 1_000_000
        assert out[1] == -((800 * 3600 + 2 * 60 + 3) * 1_000_000 + 100000)

    def test_binary16_empty_pads_to_16_zero_bytes(self, spark):
        # getBinaryValue("binary(16)", "") -> "AAAAAAAAAAAAAAAAAAAAAA=="
        df = spark.createDataFrame([Row(b=b"")])
        out = df.select(dz.encode_binary_padded("b", 16).alias("v")).collect()
        assert out[0]["v"] == "AAAAAAAAAAAAAAAAAAAAAA=="

    @pytest.mark.parametrize("bits,value,want", [
        (8, 0, "AA=="),
        (8, 9, "CQ=="),
        (16, 9, "CQA="),
        (16, 19, "EwA="),
        (59, 9, "CQAAAAAAAAA="),
        (59, 19, "EwAAAAAAAAA="),
    ])
    def test_bit_values(self, spark, bits, value, want):
        # getBitValue goldens: little-endian ceil(n/8) bytes
        df = spark.createDataFrame([Row(v=value)])
        out = df.select(dz.encode_bit_le(F.col("v"), bits).alias("b")).collect()
        assert out[0]["b"] == want


def test_envelope_snapshot_flag(spark):
    """Snapshot rows emit op=c with snapshot:true (kafka3.go:684-865)."""
    from dtle_spark.plans import cdc_demo

    changes = cdc_demo.orders_changes(spark, "/root/testdata/sf0.001").limit(5)
    fields = [("o_orderkey", lambda w: F.col(f"{w}.o_orderkey"))]
    out = dz.envelope(changes, ["o_orderkey"], fields, snapshot=True).collect()
    assert all('"snapshot":true' in r["value"] and '"op":"c"' in r["value"] for r in out)


def test_envelope_delete_tombstone_and_ts_ms(spark):
    """Every delete emits a second frame: same key, NULL value, so
    log-compacted topics purge the key (kafka3.go:1021-1036); ts_ms is
    epoch millis from the change's ts (not the binlog seq)."""
    from pyspark.sql import Row as R
    from pyspark.sql import types as T

    from dtle_spark.model import change_schema

    row_t = T.StructType([T.StructField("id", T.LongType())])
    rows = [
        {"sid": "s", "gno": 1, "seq": 10, "lc": 0, "op": "i", "ts": None,
         "schema_name": "db1", "table_name": "t", "before": None,
         "after": {"id": 1}, "query": None},
        {"sid": "s", "gno": 2, "seq": 20, "lc": 0, "op": "d",
         "ts": __import__("datetime").datetime(2020, 1, 1, tzinfo=__import__("datetime").timezone.utc),
         "schema_name": "db1", "table_name": "t", "before": {"id": 1},
         "after": None, "query": None},
    ]
    changes = spark.createDataFrame([R(**r) for r in rows], change_schema(row_t))
    fields = [("id", lambda w: F.col(f"{w}.id"))]
    out = dz.envelope(changes, ["id"], fields).collect()
    assert len(out) == 3  # insert env + delete env + tombstone
    tomb = [r for r in out if r["value"] is None]
    assert len(tomb) == 1 and tomb[0]["key"] == '{"id":1}'
    del_env = [r for r in out if r["value"] and '"op":"d"' in r["value"]][0]
    assert '"ts_ms":1577836800000' in del_env["value"]  # 2020-01-01 UTC millis
    ins_env = [r for r in out if r["value"] and '"op":"c"' in r["value"]][0]
    assert '"ts_ms":10' in ins_env["value"]  # null ts falls back to seq


def test_multimodal_decode_fails_loudly(spark):
    """Corrupt/unsupported media must fail loudly, not fake silently:
    a truncated PNG errors in the REAL decoder; a non-PNG image
    container (pixel decode needs PIL) raises NotImplementedError."""
    truncated = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8  # magic but no IHDR/IDAT
    media = spark.createDataFrame(
        [Row(doc_id=1, payload=truncated, mime="image/png")]
    )
    with pytest.raises(Exception) as e:
        mm.extract_features(media).collect()
    assert "PNG" in str(e.value)
    # corrupt JPEG: header walk errors loudly too
    jpeg_bad = b"\xff\xd8\xff\xe0" + b"\x00" * 32  # magic, desynced segments
    media2 = spark.createDataFrame([Row(doc_id=1, payload=jpeg_bad, mime="image/jpeg")])
    with pytest.raises(Exception) as e2:
        mm.extract_features(media2).collect()
    assert "JPEG" in str(e2.value)
    # valid JPEG header: metadata tier works, but PIXEL work (resize)
    # raises — that is the PIL seam
    import struct as _s

    jpeg_ok = (
        b"\xff\xd8"
        + b"\xff\xc0" + _s.pack(">H", 17) + bytes([8]) + _s.pack(">HH", 10, 20)
        + b"\x03" + b"\x00" * 9
    )
    media3 = spark.createDataFrame([Row(doc_id=1, payload=jpeg_ok, mime="image/jpeg")])
    feats = mm.extract_features(media3).collect()[0]
    assert (feats["width"], feats["height"]) == (20, 10)
    with pytest.raises(Exception) as e3:
        mm.resize_images(media3, max_side=8).collect()
    assert "PIL" in str(e3.value)


def test_multimodal_batch_shape(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    out = mm.extract_features(mm.attach_fake_payload(docs))
    assert out.columns == ["doc_id", "n_bytes", "checksum", "width", "height"]
    rows = out.collect()
    assert len(rows) == 20 and all(0 <= r["width"] < 256 for r in rows)


def test_enum_set_bit_charset_encodings(spark):
    """K3 remainder: enum index->label, set bitmask->CSV, bit byte
    reversal; F10 charset decode (gbk -> utf-8)."""
    from dtle_spark.operators.projection import charset_to_utf8

    df = spark.createDataFrame(
        [Row(e=2, s=5, b=b"\x01\x02", g="中文".encode("gbk"))]
    )
    out = df.select(
        dz.encode_enum_label(F.col("e"), ["a", "b", "c"]).alias("enum"),
        dz.encode_set_csv(F.col("s"), ["x", "y", "z"]).alias("set"),
        dz.encode_bit_reversed("b").alias("bit"),
    ).collect()[0]
    assert out["enum"] == "b"
    assert out["set"] == "x,z"  # mask 5 = bits 0 and 2
    assert bytes(out["bit"]) == b"\x02\x01"

    decoded = charset_to_utf8(df.select("g"), {"g": "gbk"}).collect()[0]["g"]
    assert decoded == "中文"


def test_enum_zero_and_invalid(spark):
    df = spark.createDataFrame([Row(e=0), Row(e=99)])
    out = [r["x"] for r in df.select(dz.encode_enum_label(F.col("e"), ["a"]).alias("x")).collect()]
    assert out == ["", None]


def test_multimodal_resize_and_frames(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(10)
    media = mm.attach_fake_payload(docs)
    resized = mm.resize_images(media, max_side=64).collect()
    assert len(resized) == 10 and all(
        max(r["width"], r["height"]) <= 64 for r in resized
    )
    frames = mm.sample_frames(media, every_n_bytes=100).collect()
    assert len(frames) > 10  # multi-frame explode shape
    by_doc = {}
    for f in frames:
        by_doc.setdefault(f["doc_id"], []).append(f)
    # frames reassemble to the original payload
    sample = resized[0]["doc_id"]
    reassembled = b"".join(
        bytes(f["frame_payload"]) for f in sorted(by_doc[sample], key=lambda x: x["frame_idx"])
    )
    orig = [bytes(r["payload"]) for r in media.collect() if r["doc_id"] == sample][0]
    assert reassembled == orig


class TestImageHeaderParsers:
    """Real stdlib container-header parsing goldens (no codec libs)."""

    def test_png_roundtrip_and_goldens(self):
        data = mm.make_png(640, 480)
        assert mm.parse_image_header(data) == {"format": "png", "width": 640, "height": 480}
        # 1x1 edge + non-square
        assert mm.parse_image_header(mm.make_png(1, 1))["width"] == 1
        assert mm.parse_image_header(mm.make_png(3, 200)) == {
            "format": "png", "width": 3, "height": 200}

    def test_jpeg_sof_walk(self):
        import struct
        # SOI + APP0(JFIF) + DQT (skipped) + SOF0 carrying 31x17
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        dqt = b"\xff\xdb" + struct.pack(">H", 5) + b"\x00\x01\x02"
        sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 17, 31) + b"\x01\x11\x00"
        jpg = b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"
        assert mm.parse_image_header(jpg) == {"format": "jpeg", "width": 31, "height": 17}
        # progressive (SOF2) also carries dims
        jpg2 = b"\xff\xd8" + (b"\xff\xc2" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 9, 7) + b"\x01\x11\x00")
        assert mm.parse_image_header(jpg2) == {"format": "jpeg", "width": 7, "height": 9}

    def test_gif_bmp(self):
        import struct
        gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
        assert mm.parse_image_header(gif) == {"format": "gif", "width": 320, "height": 200}
        # BITMAPINFOHEADER, negative height = top-down -> abs
        bmp = b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack("<ii", 800, -600)
        assert mm.parse_image_header(bmp) == {"format": "bmp", "width": 800, "height": 600}

    def test_unknown_and_corrupt(self):
        import pytest as _pytest
        assert mm.parse_image_header(b"plain text here") is None
        with _pytest.raises(ValueError):  # PNG magic but no IHDR
            mm.parse_image_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
        with _pytest.raises(ValueError):  # JPEG with no SOF
            mm.parse_image_header(b"\xff\xd8\xff\xd9")

    def test_wav_header(self):
        import struct
        fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
        pcm = b"\x00" * 88200  # 0.5 s of 16-bit stereo
        data = b"data" + struct.pack("<I", len(pcm)) + pcm
        riff_body = b"WAVE" + fmt + data
        wav = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
        out = mm.parse_wav_header(wav)
        assert out == {"format": "wav", "channels": 2, "sample_rate": 44100,
                       "bits": 16, "n_frames": 22050}
        assert mm.parse_wav_header(b"not riff") is None


def test_image_roundtrip_through_spark(spark):
    """synthesize REAL PNGs -> parse headers back, all inside
    mapInPandas stages (the registry query's machinery)."""
    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = mm.synthesize_png_media(ids)
    out = {r["doc_id"]: r for r in mm.extract_image_features(media).collect()}
    assert len(out) == 40
    for i in range(40):
        assert out[i]["format"] == "png"
        assert out[i]["width"] == 1 + i % 64
        assert out[i]["height"] == 1 + (i * 7) % 64
        assert out[i]["n_bytes"] > 50


def test_resize_uses_real_dims(spark):
    """resize stage consumes REAL parsed dims for image payloads."""
    media = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(mm.make_png(512, 128)), mime="image/png")]
    )
    out = mm.resize_images(media, max_side=256).collect()[0]
    assert (out["width"], out["height"]) == (256, 64)


def test_schema_change_topic_frames(spark):
    """DDL events route to the schema-change topic as HistoryRecord-
    shaped payloads with a JSON null key (kafka3.go:292-293 default
    topic, :897-915 payload, ddl.go:42-51 field names); DML events are
    excluded — envelope() and schema_change_frames() partition the
    stream with no loss or overlap."""
    import datetime as dt
    import json

    from pyspark.sql import Row as R
    from pyspark.sql import types as T

    from dtle_spark.model import change_schema

    row_t = T.StructType([T.StructField("id", T.LongType())])
    rows = [
        {"sid": "uuid-a", "gno": 7, "seq": 10, "lc": 0, "op": "ddl",
         "ts": dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc),
         "schema_name": "db1", "table_name": "t", "before": None,
         "after": None, "query": "ALTER TABLE t ADD COLUMN x INT"},
        {"sid": "uuid-a", "gno": 8, "seq": 11, "lc": 0, "op": "i", "ts": None,
         "schema_name": "db1", "table_name": "t", "before": None,
         "after": {"id": 1}, "query": None},
    ]
    changes = spark.createDataFrame([R(**r) for r in rows], change_schema(row_t))
    frames = dz.schema_change_frames(changes, topic_prefix="dtle").collect()
    assert len(frames) == 1
    f = frames[0]
    assert f["topic"] == "schema-changes.dtle" and f["key"] == "null"
    v = json.loads(f["value"])
    assert v["databaseName"] == "db1"
    assert v["ddl"] == "ALTER TABLE t ADD COLUMN x INT"
    assert v["source"] == {"server": dz.SOURCE_NAME}
    assert v["position"]["ts_sec"] == 1577836800
    assert v["position"]["pos"] == 10
    assert v["position"]["gtids"] == "uuid-a:7"
    assert v["tableChanges"] is None
    # partition property: env side sees exactly the non-DDL rows
    fields = [("id", lambda w: F.col(f"{w}.id"))]
    env = dz.envelope(changes, ["id"], fields).collect()
    assert len(env) == 1 and '"op":"c"' in env[0]["value"]


class TestRealPngDecoder:
    def test_roundtrip_every_filter_gray_and_rgb(self):
        """decode_png inverts encode_png for all five scanline filters
        in both color types — pixel-exact."""
        import random

        rng = random.Random(7)
        for channels in (1, 3):
            w, h = 13, 9
            pixels = bytes(rng.randrange(256) for _ in range(w * h * channels))
            for ft in range(5):
                data = mm.encode_png(w, h, channels, pixels, filter_type=ft)
                d = mm.decode_png(data)
                assert (d["width"], d["height"], d["channels"]) == (w, h, channels)
                assert d["pixels"] == pixels, (channels, ft)

    def test_decode_validates(self):
        import pytest as _p

        with _p.raises(ValueError):
            mm.decode_png(b"nope")
        # 16-bit depth is out of the honest subset -> loud
        import struct as _s
        import zlib as _z

        def chunk(tag, body):
            return (_s.pack(">I", len(body)) + tag + body
                    + _s.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF))

        deep = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", _s.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
                + chunk(b"IDAT", _z.compress(b"\x00\x00\x00"))
                + chunk(b"IEND", b""))
        with _p.raises(NotImplementedError):
            mm.decode_png(deep)

    def test_real_resize_pixels(self, spark):
        """The resize stage now produces a REAL smaller PNG: decoding
        the output gives exactly the nearest-neighbor resample of the
        input pixels."""
        src = mm.make_png(8, 4)
        media = spark.createDataFrame(
            [Row(doc_id=1, payload=bytearray(src), mime="image/png")]
        )
        out = mm.resize_images(media, max_side=4).collect()[0]
        assert (out["width"], out["height"]) == (4, 2)
        decoded = mm.decode_png(bytes(out["payload"]))
        orig = mm.decode_png(src)
        expect = mm.resize_nearest(orig["pixels"], 8, 4, 1, 4, 2)
        assert decoded["pixels"] == expect


class TestRealWavDecoder:
    def test_roundtrip_and_features(self, spark):
        """decode_wav inverts make_wav sample-exact; the audio feature
        stage computes rate/frames/duration/RMS from REAL decoded
        samples through the Arrow plumbing."""
        import math

        samples = [int(8000 * math.sin(i / 10.0)) for i in range(1600)]
        wav = mm.make_wav(samples, sample_rate=8000)
        d = mm.decode_wav(wav)
        assert d["samples"] == samples
        assert (d["sample_rate"], d["channels"], d["n_frames"]) == (8000, 1, 1600)
        # header tier agrees with the full decode
        h = mm.parse_wav_header(wav)
        assert (h["sample_rate"], h["channels"], h["n_frames"]) == (8000, 1, 1600)

        media = spark.createDataFrame(
            [Row(doc_id=7, payload=bytearray(wav), mime="audio/wav")]
        )
        out = mm.extract_audio_features(media).collect()[0]
        assert (out["sample_rate"], out["channels"], out["n_frames"]) == (8000, 1, 1600)
        assert out["duration_ms"] == 200
        expect_rms = math.sqrt(sum(s * s for s in samples) / len(samples))
        assert abs(out["rms"] - expect_rms) < 1e-9

    def test_non_pcm_raises(self):
        import struct as _s

        fmt = _s.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float32 wav
        wav = (b"RIFF" + _s.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
               + b"fmt " + _s.pack("<I", len(fmt)) + fmt)
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            mm.decode_wav(wav)
        with pytest.raises(ValueError):
            mm.decode_wav(b"junk")


def test_multimodal_features_header_tier_vs_pixel_validation(spark):
    """ADVICE r4: the scan-tier metadata pass must be O(header bytes) —
    a PNG with a valid IHDR but corrupt IDAT passes the default
    (header-parse) tier and only fails under validate_pixels=True,
    proving the full decode no longer runs per-doc by default."""
    import struct as _s
    import zlib as _z

    def _chunk(tag, body):
        return (
            _s.pack(">I", len(body)) + tag + body
            + _s.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = _s.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"\x00garbage-not-zlib")
        + _chunk(b"IEND", b"")
    )
    media = spark.createDataFrame([Row(doc_id=1, payload=bad, mime="image/png")])
    feats = mm.extract_features(media).collect()[0]  # header tier: fine
    assert (feats["width"], feats["height"]) == (3, 2)
    with pytest.raises(Exception):
        mm.extract_features(media, validate_pixels=True).collect()


def test_video_container_roundtrip_and_sampling():
    """MJPN mux -> header walk -> stride sample is the identity on
    real PNG frame bytes; the header walk never decodes a frame; a
    foreign container raises the ffmpeg seam loudly."""
    import pytest

    frames = [mm.make_png(3, 4), mm.make_png(5, 6), mm.make_png(7, 8)]
    v = mm.make_video(frames)
    hdr = mm.parse_video_header(v)
    assert hdr["format"] == "mjpn" and hdr["n_frames"] == 3
    sampled = mm.sample_video_frames(v, stride=2)
    assert [i for i, _ in sampled] == [0, 2]
    assert sampled[0][1] == frames[0] and sampled[1][1] == frames[2]
    # frame bytes parse with the real PNG header tier
    assert mm.parse_image_header(sampled[1][1]) == {
        "format": "png", "width": 7, "height": 8}
    # CORRUPT MJPN (magic intact, truncated body / trailing bytes) is
    # data corruption, not the codec seam
    with pytest.raises(ValueError, match="truncated MJPN"):
        mm.parse_video_header(v[:-3])
    with pytest.raises(ValueError, match="trailing bytes"):
        mm.parse_video_header(v + b"junk")
    # a FOREIGN container raises the ffmpeg seam
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        mm.sample_video_frames(b"\x00\x00\x00\x18ftypmp42", stride=2)


def test_video_feature_extraction_plumbing(spark):
    """The mapInPandas stage: one row per SAMPLED frame with real
    header dims, frame counts from the container walk."""
    ids = spark.range(4).withColumnRenamed("id", "doc_id")
    media = mm.synthesize_video_media(ids)
    rows = mm.extract_video_frame_features(media, stride=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        n = 1 + doc_id % 5
        assert all(r["n_frames"] == n for r in rs)
        assert [r["frame_idx"] for r in sorted(rs, key=lambda x: x["frame_idx"])] \
            == list(range(0, n, 2))
        for r in rs:
            assert r["width"] == 1 + (doc_id * 31 + r["frame_idx"]) % 64
            assert r["height"] == 1 + (doc_id * 17 + r["frame_idx"] * 3) % 64
